package graft.streaming

import graft.ops.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus intake — the training-data twin of [[Collect]]: a
  * JSONL document stream goes through the quality gate, a TTL fingerprint
  * dedup, and lands language-partitioned, with rejects to a dead-letter
  * side output (the same split-and-bucket shape as the collector's
  * validate → trash → hourly sink chain).
  *
  * Scale notes: the gate and fingerprint are scan-local; dedup state is
  * bounded by the watermark TTL exactly like the collector's 30-minute
  * `knownTxs` suppressor (full-corpus dedup stays a batch job —
  * q_dedup_* — just as the reference defers real dedup to the daily
  * merge); the sink partitions by language so downstream per-language
  * mixing reads only its partition.
  */
object CorpusIntake {

  /** JSONL document stream with ingest time stamped per micro-batch.
    * Schema is fixed ([[Sources.documentsJsonlSchema]]) — no inference. */
  def feed(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema(Sources.documentsJsonlSchema)
      .option("maxFilesPerTrigger", 16)
      .json(inDir)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("ingest_ts", current_timestamp())

  /** Quality gate: the q_text_quality thresholds as a streaming verdict
    * column (good/fair pass, poor is dead-lettered). */
  def gate(stream: DataFrame): DataFrame = {
    val nStop = size(regexp_extract_all(col("text"),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0)))
    stream.withColumn("quality",
      when(length(col("text")) >= 200 && nStop >= 3, "good")
        .when(length(col("text")) >= 50, "fair")
        .otherwise("poor"))
  }

  /** TTL duplicate suppressor on the normalized-text fingerprint: drops
    * re-ingested copies arriving within the watermark window; state is
    * bounded by the TTL. */
  def dedup(stream: DataFrame, ttl: String = "30 minutes"): DataFrame =
    stream
      .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .withWatermark("ingest_ts", ttl)
      .dropDuplicatesWithinWatermark("fp")

  /** gate → split → dedup accepted docs → lang-partitioned parquet, poor
    * docs to a dead-letter dir with their verdict. */
  def run(spark: SparkSession, inDir: String, outDir: String,
      ttl: String = "30 minutes"): Seq[StreamingQuery] = {
    val gated = gate(feed(spark, inDir))
    val accepted = dedup(gated.filter(col("quality") =!= "poor"), ttl)
      .select("doc_id", "text", "lang", "source", "n_chars", "quality")
    val rejected = gated.filter(col("quality") === "poor")
      .select("doc_id", "lang", "source", "quality")
    Seq(
      accepted.writeStream
        .format("parquet")
        .option("path", s"$outDir/accepted")
        .option("checkpointLocation", s"$outDir/_cp_accepted")
        .partitionBy("lang")
        .trigger(Trigger.AvailableNow())
        .start(),
      rejected.writeStream
        .format("parquet")
        .option("path", s"$outDir/rejected")
        .option("checkpointLocation", s"$outDir/_cp_rejected")
        .trigger(Trigger.AvailableNow())
        .start())
  }
}
