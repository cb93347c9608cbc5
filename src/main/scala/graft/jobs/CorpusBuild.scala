package graft.jobs

import graft.queries.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus build pipeline — the engine's North-star operators
  * composed into one runnable job, the training-data twin of the mempool
  * [[Merge]] DAG: quality gate → PII redaction → exact dedup (earliest
  * keeper) → eval-set decontamination → deterministic shard assignment →
  * sharded parquet write, plus the per-stage attrition report and
  * per-shard balance stats a pipeline operator reads after every run.
  *
  * Scale shape (the same discipline as Merge.run): the flag gates are
  * scan-local; PII redaction is a narrow map; dedup shuffles a 128-bit
  * digest, never the text; decontamination anti-joins a BROADCAST eval
  * fingerprint set (or its Bloom form at larger eval scale — see
  * q_decontaminate_bloom); the shard id is the final partitionBy key, so
  * the write is one shuffle on a uniform md5 nibble. Near-dup clustering
  * composes upstream of this job at the embedding level (q_dedup_apply).
  */
object CorpusBuild {

  final case class Inputs(docs: DataFrame, evalDocs: Option[DataFrame])

  /** `kept` is the final sharded corpus; `funnel` the attrition report;
    * `shards` the per-shard balance table. All unmaterialized plans.
    * `release` unpersists the run's internal post-redaction cache — call
    * it after the last consumer (the same ownership contract as
    * [[Merge.Output.parsed]]). */
  final case class Result(kept: DataFrame, funnel: DataFrame, shards: DataFrame,
      release: () => Unit = () => ())

  def run(spark: SparkSession, in: Inputs): Result = {
    val docs = in.docs
    // the SAME gate predicates the differential-tested q_filter_funnel
    // uses — one definition, no drift
    val f1 = TextOps.gateMinLength
    val f2 = TextOps.gateStopword

    // gate, then redact — the digest (and the corpus) must never carry
    // PII. Persisted: the regex+digest pass is the expensive narrow work
    // and feeds dedup, decon, the funnel tail, AND the final write —
    // without it the chain re-executes once per downstream action.
    // DISK_ONLY for the same measured reason as Merge's parsed stage
    // (jobs/Merge.scala): an O(corpus) intermediate read a handful of
    // times shouldn't compete with the dedup window and the sharded
    // write for the unified memory pool.
    val gated = docs.filter(f2)
      .withColumn("text", TextOps.redactPii(col("text")))
      .withColumn("h", md5(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // earliest-keeper exact dedup: at most ONE digest-keyed exchange —
    // and Catalyst compiles the rn=1 filter to a partial+final
    // WindowGroupLimit (ScalePlanSpec-asserted), so each input task
    // forwards only its best candidate per digest and the exchange
    // carries keeper candidates, not the corpus. Replaces the previous
    // digest aggregate + (h, doc_id) semi-join, which moved the full
    // text through a second exchange for the same emission set.
    val keepWin = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("doc_id")
    val deduped = gated.withColumn("rn", row_number().over(keepWin))
      .filter(col("rn") === 1).drop("rn")

    // decontamination: eval fingerprints broadcast (bounded BY CONTRACT —
    // an eval benchmark is a fixed set, not a scaling input), training
    // side streams
    val clean = in.evalDocs match {
      case Some(ev) =>
        val fps = ev.select(md5(TextOps.redactPii(col("text"))).as("h")).distinct()
        deduped.join(broadcast(fps), Seq("h"), "left_anti")
      case None => deduped
    }

    val kept = clean
      .withColumn("shard",
        expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1"))
      .drop("h")

    val flagCounts = docs
      .select(f1.cast("long").as("p1"), f2.cast("long").as("p2"))
      .agg(count(lit(1)).as("n0"), sum("p1").as("n1"), sum("p2").as("n2"))
    val head = flagCounts.select(explode(array(
      struct(lit(0).as("stage"), lit("all").as("gate"), col("n0").as("n_docs")),
      struct(lit(1).as("stage"), lit("min_length").as("gate"), col("n1").as("n_docs")),
      struct(lit(2).as("stage"), lit("stopword_evidence").as("gate"), col("n2").as("n_docs"))))
      .as("r")).select("r.*")
    val tail = deduped.agg(count(lit(1)).as("n3"))
      .crossJoin(kept.agg(count(lit(1)).as("n4")))
      .select(explode(array(
        struct(lit(3).as("stage"), lit("exact_dedup").as("gate"), col("n3").as("n_docs")),
        struct(lit(4).as("stage"), lit("decontaminate").as("gate"), col("n4").as("n_docs"))))
        .as("r")).select("r.*")
    val funnel = head.unionAll(tail)

    val shards = kept.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_tokens"))

    Result(kept, funnel, shards, () => { gated.unpersist(false); () })
  }

  /** Write the corpus sharded (`shard=N/` dirs) plus the two report CSVs. */
  def write(result: Result, outDir: String): Unit = {
    result.kept
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/corpus")
    result.funnel.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/funnel")
    result.shards.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/shards")
  }
}

/** CLI: corpus build over JSONL or parquet document inputs.
  *
  * usage: CorpusBuildJob <docsPath> <outDir> [evalDocsPath]
  *
  * `docsPath` ending in .parquet reads the parquet documents table;
  * anything else is JSON-lines (plain or .gz) in the documents schema.
  */
object CorpusBuildJob {
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

    val (docsPath, outDir, evalPath) = args.toSeq match {
      case Seq(d, o)     => (d, o, None)
      case Seq(d, o, e)  => (d, o, Some(e))
      case _ => sys.error("usage: CorpusBuildJob <docsPath> <outDir> [evalDocsPath]")
    }
    def read(p: String) =
      if (p.endsWith(".parquet")) spark.read.parquet(p)
      else graft.ops.Sources.readDocumentsJsonl(spark, p)

    val result = CorpusBuild.run(spark,
      CorpusBuild.Inputs(read(docsPath), evalPath.map(read)))
    CorpusBuild.write(result, outDir)
    result.funnel.orderBy("stage").collect().foreach { r =>
      println(f"${r.getInt(0)}%d ${r.getString(1)}%-20s ${r.getLong(2)}%d")
    }
    spark.stop()
  }
}
