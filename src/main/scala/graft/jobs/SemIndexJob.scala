package graft.jobs

import graft.queries.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing semantic index as a runnable job surface — the CLI twin
  * of the `CorpusScaleBench --semantic --daily` maintenance loop, so the
  * incremental SemDeDup path is operable outside the bench (the same
  * pattern as [[MergeJob]] / CorpusBuildJob: library core in
  * `graft.queries`, thin deterministic CLI here).
  *
  * Layout on disk (all parquet):
  *   <indexDir>/coarse      (c, m)        — √k level-1 centroids
  *   <indexDir>/sub         (cell, sub, m) — level-2 sub-centroids
  *   <standingDir>/piece_*  (vec_id, cluster, embedding) — assignment
  *                          pieces, one per ingested batch (+ bootstrap)
  *
  * Commands:
  *   train <embeddings> <indexDir>
  *     Train + FREEZE the two-level quantizer on the bootstrap corpus.
  *   bootstrap <embeddings> <indexDir> <standingDir>
  *     Assign the bootstrap corpus through the frozen index and write
  *     piece_boot; emit its internal dup pairs to stdout count only.
  *   day <freshEmbeddings> <indexDir> <standingDir> <pairsOut>
  *     One maintenance tick: assign the fresh batch, pair it against
  *     ONLY the standing members of the clusters it touches, write the
  *     new pairs to <pairsOut>, append the batch as a new piece.
  *   compact <standingDir>
  *     Rewrite all pieces into one (the probe-cost bound — README's
  *     measured +57 % drift at 20 uncompacted pieces).
  *
  * Flags: --probes=N --margin=F (frozen-index level-1 boundary-margin
  * multiprobe) and --sub-margin=F (the level-2 runner-up rule) —
  * README's measured recall knobs; --tau=T (pair cosine threshold,
  * default 0.9).
  *
  * Every command is deterministic given its inputs: the frozen index
  * assigns per-vector, so day-by-day ingestion reproduces the full-batch
  * pair set over the same index exactly (the CorpusScaleBench
  * `sym_diff 0` invariant; SemIndexJobSpec re-proves it through THIS
  * CLI surface at spec scale). */
object SemIndexJob {

  private def pieces(spark: SparkSession, standingDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(standingDir),
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(standingDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("piece_"))
      .map(_.getPath.toString)
    require(dirs.nonEmpty, s"no piece_* dirs under $standingDir")
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  private def loadIndex(spark: SparkSession, indexDir: String) =
    SimilarityOps.SemIndex(
      spark.read.parquet(s"$indexDir/coarse"),
      spark.read.parquet(s"$indexDir/sub"))

  def train(spark: SparkSession, emb: DataFrame, indexDir: String): Unit = {
    val ix = SimilarityOps.semIndexTrain(spark, emb, emb.count())
    ix.coarse.write.mode("overwrite").parquet(s"$indexDir/coarse")
    ix.sub.write.mode("overwrite").parquet(s"$indexDir/sub")
  }

  def bootstrap(spark: SparkSession, emb: DataFrame, indexDir: String,
      standingDir: String, probes: Int, margin: Double,
      subMargin: Double = 0.0): Unit =
    SimilarityOps
      .semIndexAssign(spark, emb, loadIndex(spark, indexDir), probes,
        margin, subMargin)
      .write.mode("overwrite").parquet(s"$standingDir/piece_boot")

  /** One maintenance tick; returns the number of new pairs found. */
  def day(spark: SparkSession, fresh: DataFrame, indexDir: String,
      standingDir: String, pairsOut: String, tau: Double,
      probes: Int, margin: Double, subMargin: Double = 0.0): Long = {
    val index = loadIndex(spark, indexDir)
    val freshA = SimilarityOps
      .semIndexAssign(spark, fresh, index, probes, margin, subMargin)
      .localCheckpoint(true)
    val standing = pieces(spark, standingDir)
    val members = standing.join(
      broadcast(freshA.select("cluster").distinct()),
      Seq("cluster"), "left_semi")
    // pairs between two standing members were already emitted by an
    // earlier tick (or the bootstrap) — keep only pairs touching the
    // fresh batch, exactly the CorpusScaleBench daily emission. Unlike
    // the bench (contiguous id ranges), the CLI can't assume fresh ids
    // form a range, so the either-endpoint test is two broadcast left
    // joins + an OR filter over ONE pair pass.
    val freshIds = freshA.select(col("vec_id")).distinct()
    val fa = freshIds.select(col("vec_id").as("vec_a"), lit(1).as("ta"))
    val fb = freshIds.select(col("vec_id").as("vec_b"), lit(1).as("tb"))
    val dp = SimilarityOps
      .semDupPairsAssigned(spark, members.unionByName(freshA), tau,
        multiAssigned = probes > 1 || subMargin > 1.0)
      .join(broadcast(fa), Seq("vec_a"), "left")
      .join(broadcast(fb), Seq("vec_b"), "left")
      .filter(col("ta").isNotNull || col("tb").isNotNull)
      .select("vec_a", "vec_b", "cos")
    dp.write.mode("overwrite").parquet(pairsOut)
    val stamp = java.lang.Long.toHexString(System.nanoTime())
    freshA.write.mode("errorifexists")
      .parquet(s"$standingDir/piece_$stamp")
    spark.read.parquet(pairsOut).count()
  }

  def compact(spark: SparkSession, standingDir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(standingDir),
      spark.sparkContext.hadoopConfiguration)
    val old = fs.listStatus(new org.apache.hadoop.fs.Path(standingDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("piece_"))
      .map(_.getPath)
    require(old.nonEmpty, s"nothing to compact under $standingDir")
    val merged = old.map(p => spark.read.parquet(p.toString))
      .reduce(_ unionByName _)
    // stage + swap, the Sinks.compactDailyArchive discipline: readers
    // race at most a directory rename, never a half-written piece
    merged.write.mode("overwrite").parquet(s"$standingDir/.compact_stage")
    old.foreach(p => fs.delete(p, true))
    fs.rename(new org.apache.hadoop.fs.Path(s"$standingDir/.compact_stage"),
      new org.apache.hadoop.fs.Path(s"$standingDir/piece_compacted"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def opt(name: String): Option[String] =
      args.find(_.startsWith(s"--$name=")).map(_.stripPrefix(s"--$name="))
    val probes = opt("probes").map(_.toInt).getOrElse(1)
    val margin = opt("margin").map(_.toDouble)
      .getOrElse(Double.PositiveInfinity)
    val subMargin = opt("sub-margin").map(_.toDouble).getOrElse(0.0)
    val tau = opt("tau").map(_.toDouble).getOrElse(0.9)
    val pos = args.filterNot(_.startsWith("--")).toSeq
    pos match {
      case Seq("train", embPath, indexDir) =>
        train(spark, spark.read.parquet(embPath), indexDir)
      case Seq("bootstrap", embPath, indexDir, standingDir) =>
        bootstrap(spark, spark.read.parquet(embPath), indexDir, standingDir,
          probes, margin, subMargin)
      case Seq("day", freshPath, indexDir, standingDir, pairsOut) =>
        val n = day(spark, spark.read.parquet(freshPath), indexDir,
          standingDir, pairsOut, tau, probes, margin, subMargin)
        println(s"""{"metric":"sem_index_day","new_pairs":$n}""")
      case Seq("compact", standingDir) =>
        compact(spark, standingDir)
      case other => sys.error(
        "usage: SemIndexJob train <emb> <indexDir> | " +
          "bootstrap <emb> <indexDir> <standingDir> | " +
          "day <fresh> <indexDir> <standingDir> <pairsOut> | " +
          "compact <standingDir>  [--probes=N --margin=F --sub-margin=F --tau=T]" +
          s" (got: ${other.mkString(" ")})")
    }
    spark.stop()
  }
}
