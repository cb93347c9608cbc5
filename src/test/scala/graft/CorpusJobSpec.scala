package graft

import graft.jobs.CorpusBuild
import graft.queries.TextOps
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end checks for the corpus-build job (the training-data twin of
  * MergeJobSpec): funnel consistency, PII-free output, dedup/decon
  * semantics, shard layout round-trip. */
class CorpusJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def inputs = {
    val docs = Tables.documents(spark, sf)
    // the held-out split doubles as the eval set, like q_decontaminate
    CorpusBuild.Inputs(
      docs.filter(col("doc_id") % 97 =!= 0),
      Some(docs.filter(col("doc_id") % 97 === 0)))
  }

  test("corpus build: funnel is monotone and consistent with the outputs") {
    val r = CorpusBuild.run(spark, inputs)
    val counts = r.funnel.orderBy("stage").collect().map(_.getLong(2))
    assert(counts.length == 5)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${counts.mkString(",")}")
    assert(counts.head == inputs.docs.count())
    // the last funnel stage IS the kept corpus
    assert(counts.last == r.kept.count())
  }

  test("corpus build: output carries no PII and no duplicate texts") {
    val kept = CorpusBuild.run(spark, inputs).kept.cache()
    assert(kept.filter(col("text").rlike(TextOps.PiiRe)).count() == 0,
      "PII survived redaction")
    val n = kept.count()
    assert(kept.select(md5(col("text"))).distinct().count() == n,
      "duplicate texts survived dedup")
    // decontamination: no kept text matches a redacted eval fingerprint
    val evalFps = inputs.evalDocs.get
      .select(md5(TextOps.redactPii(col("text"))).as("h"))
    assert(kept.select(md5(col("text")).as("h"))
      .join(evalFps, Seq("h"), "left_semi").count() == 0,
      "a contaminated doc survived")
  }

  test("corpus build: sharded write round-trips with shard layout") {
    val out = Files.createTempDirectory("graft-corpus").toString
    val r = CorpusBuild.run(spark, inputs)
    CorpusBuild.write(r, out)
    val back = spark.read.parquet(s"$out/corpus")
    assert(back.count() == r.kept.count())
    assert(back.select("shard").distinct().count() == 16,
      "md5 nibble must populate all 16 shards")
    // every row landed in the shard its doc_id hashes to
    val misplaced = back.filter(col("shard") =!=
      expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1"))
    assert(misplaced.count() == 0)
    // reports are readable CSVs
    val funnel = spark.read.option("header", "true").csv(s"$out/funnel")
    assert(funnel.count() == 5)
  }
}
