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

  test("sem presets resolve to exactly the measured operating points") {
    // VERDICT r13 item 4: the README frontier row (p2 m1.02 s1.1) must be
    // reachable BY NAME — pin the constants so a knob edit can't silently
    // detach the preset from the measured numbers
    import graft.queries.SimilarityOps.SemPreset
    assert(SemPreset.parse("frontier").contains(SemPreset(2, 1.02, 1.1)))
    assert(SemPreset.parse("exact")
      .contains(SemPreset(1, Double.PositiveInfinity, 0.0)))
    assert(SemPreset.parse("off").isEmpty)
    assertThrows[RuntimeException](SemPreset.parse("frontierr"))
  }

  test("corpus build with --sem-preset drops semantic losers upstream of the gates") {
    import graft.queries.SimilarityOps
    val emb = Tables.embeddings(spark, sf)
    // τ = 0.25: the fixtures' planted semantic-dup scale (the same
    // threshold q_dedup_semantic / q_dedup_apply use) — at the 0.9
    // default this fixture has no dups and the equality below would be
    // vacuously 0 == 0
    val tau = 0.25
    val semIn = CorpusBuild.Inputs(inputs.docs, inputs.evalDocs,
      Some(CorpusBuild.SemDedup(emb, SimilarityOps.SemPreset.Frontier, tau)))
    val r = CorpusBuild.run(spark, semIn)
    val rows = r.funnel.orderBy("stage").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(1)).toSeq == Seq("all", "semantic_dedup",
      "min_length", "stopword_evidence", "exact_dedup", "decontaminate"))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${counts.mkString(",")}")
    assert(counts.head == inputs.docs.count())
    assert(counts.last == r.kept.count())
    // the losers the preset computes are exactly the docs that vanished
    // between stage 0 and stage 1 — and none of them survive to kept
    val (loserIds, releaseLosers) = SimilarityOps.semLosers(spark, emb,
      SimilarityOps.SemPreset.Frontier, tau)
    val losers = loserIds
      .join(inputs.docs.select("doc_id"), Seq("doc_id"), "left_semi").cache()
    assert(losers.count() > 0, "fixture has no semantic losers — the " +
      "stage-drop equality below would be vacuous")
    assert(counts(0) - counts(1) == losers.count())
    assert(r.kept.join(losers, Seq("doc_id"), "left_semi").count() == 0,
      "a semantic loser survived to the kept corpus")
    losers.unpersist()
    releaseLosers()
    r.release()
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
