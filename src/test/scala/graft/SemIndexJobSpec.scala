package graft

import graft.jobs.SemIndexJob
import graft.queries.SimilarityOps
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The SemIndexJob CLI surface re-proves the bench loop's invariant
  * through the on-disk layout a production operator would actually run:
  * train → bootstrap → day ticks (with a mid-loop compact) must emit, in
  * union, exactly the pair set of the frozen full-batch pipeline. */
class SemIndexJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emb(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi).map(i => (i, CorpusScaleBench.synVec(i)))
      .toDF("vec_id", "embedding")
  }

  test("CLI maintenance loop equals the frozen full-batch run (with compaction)") {
    val root = Files.createTempDirectory("graft-semjob").toString
    val indexDir = s"$root/index"
    val standingDir = s"$root/standing"
    val n = 2000L
    val batch = 200L
    val days = 3
    val bootLo = batch * days // 600

    SemIndexJob.train(spark, emb(bootLo, n), indexDir)
    SemIndexJob.bootstrap(spark, emb(bootLo, n), indexDir, standingDir,
      probes = 1, margin = Double.PositiveInfinity)
    val bootPiece = spark.read.parquet(s"$standingDir/piece_boot")
    assert(bootPiece.count() == n - bootLo, "bootstrap piece lost vectors")
    // materialized BEFORE the loop: the mid-loop compact deletes
    // piece_boot (stage+swap), so a lazy read of it would dangle
    val bootPairs = SimilarityOps
      .semDupPairsAssigned(spark, bootPiece, 0.9, multiAssigned = false)
      .localCheckpoint(true)

    val dayPairs = (0 until days).map { d =>
      val out = s"$root/pairs_d$d"
      val found = SemIndexJob.day(spark,
        emb(d * batch, (d + 1) * batch), indexDir, standingDir, out,
        tau = 0.9, probes = 1, margin = Double.PositiveInfinity)
      assert(found > 0, s"day $d found no pairs — vacuous loop")
      if (d == 1) SemIndexJob.compact(spark, standingDir)
      spark.read.parquet(out)
    }

    // chained = bootstrap-internal pairs ∪ every day's emission
    val index = SimilarityOps.SemIndex(
      spark.read.parquet(s"$indexDir/coarse"),
      spark.read.parquet(s"$indexDir/sub"))
    val chained = dayPairs.reduce(_ unionByName _).unionByName(bootPairs)

    val fullA = SimilarityOps.semIndexAssign(spark, emb(0, n), index)
    val full = SimilarityOps
      .semDupPairsAssigned(spark, fullA, 0.9, multiAssigned = false)
    assert(full.count() > 0)
    val cols = Seq("vec_a", "vec_b", "cos")
    assert(full.join(chained, cols, "left_anti").count() == 0,
      "CLI loop missed pairs the full-batch run finds")
    assert(chained.join(full, cols, "left_anti").count() == 0,
      "CLI loop emitted pairs the full-batch run does not")

    // the compact rewrote pieces into one; later days appended after it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(standingDir), spark.sparkContext.hadoopConfiguration)
    val pieceDirs = fs.listStatus(new org.apache.hadoop.fs.Path(standingDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("piece_"))
    assert(pieceDirs.exists(_.getPath.getName == "piece_compacted"))
    val standing = pieceDirs.map(p => spark.read.parquet(p.getPath.toString))
      .reduce(_ unionByName _)
    assert(standing.count() == n, "standing pieces lost or duplicated vectors")
  }
}
