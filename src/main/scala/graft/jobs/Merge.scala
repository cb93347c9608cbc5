package graft.jobs

import graft.functions.ParseTx
import graft.ops.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship batch job (SURVEY.md §3.1; cmd/merge/transactions.go:22-185)
  * as one declarative Spark DAG:
  *
  *   raw tx CSVs ─ validate (P11) ─ dedup earliest-wins on RAW rows (A1)
  *      ─ blacklist anti-join (J2) ─ parse_raw_tx (P1) ─ split valid/trash (F2)
  *      ─ sources-attach (J1/A2/O3) ─ inclusion enrich (J3/P13)
  *      ─ already-included filter (F1) ─ global sort (O1)
  *
  * Scale notes (100 TB design):
  *  - dedup + anti-join run on the cheap 3-column raw rows BEFORE the
  *    expensive parse UDF (§4.1 design rule — Catalyst cannot reorder
  *    through a non-deterministic-looking UDF, so the DAG orders it);
  *  - the two aggregations (tx dedup, sourcelog dedup) and the attach join
  *    all hash-partition on `hash`, so AQE coalesces into one co-located
  *    exchange chain; blacklist and blocks broadcast only when Catalyst's
  *    size estimate fits the session threshold (blocks is ~25 % of input
  *    rows, not a bounded dim — see [[Merge.broadcastIfSmall]]), else the
  *    join degrades to a shuffle on the already-partitioned `hash` key;
  *  - the final sort is a range-partitioned total order (SortExec spills).
  */
object Merge {

  val TxAlreadyIncludedThresholdMs = 12000L // common/consts.go:23-24

  final case class Inputs(
      rawTxs: DataFrame, // timestamp_ms LONG, hash STRING, raw_tx_hex STRING
      sourcelog: DataFrame, // timestamp_ms LONG, hash STRING, source STRING
      blacklist: Option[DataFrame] = None, // hash STRING
      blocks: Option[DataFrame] = None, // hash STRING, block_number LONG, block_ts_ms LONG
      // live-RPC alternative to `blocks` (reference's actual shape —
      // cmd/merge/inclusioncheck.go); used only when `blocks` is None
      inclusionRpc: Option[InclusionCheck.ResolverFactory] = None)

  /** `parsed` is the job's internal post-parse cache (both outputs read
    * it); exposed so owners can unpersist it with the rest of the DAG
    * instead of pinning ~1 KB/row of raw-tx hex until session end. */
  final case class Output(transactions: DataFrame, trash: DataFrame,
      parsed: DataFrame)

  /** P11 hash validity (common/sourcelog.go:41-48). */
  def validHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    length(c) === 66 && c.rlike("^0x[0-9a-f]{64}$")

  /** [[graft.ops.Hints.broadcastIfSmall]] for the blacklist and blocks
    * sides: both derive from the scaling input (blocks is the included-tx
    * subset, ~25 % of all rows), so the hint is size-gated — and since
    * `hash` is already the partition key of the adjacent exchanges, the
    * shuffle fallback adds no new exchange for the big side. */
  private[jobs] def broadcastIfSmall(df: DataFrame): DataFrame =
    graft.ops.Hints.broadcastIfSmall(df)

  def run(spark: SparkSession, in: Inputs): Output = {
    // ── validate + dedup raw rows (F3, A1) ────────────────────────────
    val raw = in.rawTxs
      .withColumn("hash", lower(col("hash")))
      .filter(validHash(col("hash")) && col("timestamp_ms").isNotNull)
    val deduped = raw
      .groupBy("hash")
      .agg(min(struct(col("timestamp_ms"), col("raw_tx_hex"))).as("f"))
      .select(col("hash"), col("f.timestamp_ms").as("timestamp_ms"),
        col("f.raw_tx_hex").as("raw_tx_hex"))

    // ── blacklist anti-join before the parse (J2) ─────────────────────
    val fresh = in.blacklist match {
      case Some(bl) =>
        val blNorm = bl.select(lower(col("hash")).as("hash")).distinct()
        deduped.join(broadcastIfSmall(blNorm), Seq("hash"), "left_anti")
      case None => deduped
    }

    // ── parse (P1) + validation split (F2) ────────────────────────────
    // DISK_ONLY by measurement (VERDICT r10 #4, all at the default 8 g
    // fork heap, 10 M txs): MEMORY_AND_DISK 303 s — cached columnar
    // batches squeeze the unified pool and the sort/shuffle working set
    // thrashes; MEMORY_AND_DISK_SER OOMs — building serialized blocks
    // adds a peak-memory copy; DISK_ONLY 276 s, faster than r10's
    // 48 g-heap run (282 s). The parsed stage is O(input bytes) and read
    // at most twice (valid + trash branches), so per-executor memory is
    // better spent on the joins and the range sort than on caching it —
    // the reads come back through the OS page cache anyway.
    val parsed = ParseTx.project(fresh.drop("hash"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val valid = parsed.filter(col("reason").isNull).drop("reason")
    val trash = parsed.filter(col("reason").isNotNull)
      .select(col("timestamp").as("timestamp_ms"), col("hash"),
        lit("merge").as("source"), col("reason"), lit("").as("notes"))

    // ── sources attach (A2 dedup → J1 join, O3 order) ─────────────────
    val sourcesByHash = in.sourcelog
      .withColumn("hash", lower(col("hash")))
      .filter(validHash(col("hash")))
      .groupBy("hash", "source").agg(min("timestamp_ms").as("first_ts")) // A2
      .groupBy("hash")
      .agg(transform(
        array_sort(collect_list(struct(col("first_ts"), col("source")))),
        x => x.getField("source")).as("sources"))

    val withSources = valid
      .join(sourcesByHash, Seq("hash"), "left")
      .withColumn("sources", coalesce(col("sources"), array()))

    // ── inclusion enrichment (J3) + delay (P13) ───────────────────────
    val enriched = (in.blocks, in.inclusionRpc) match {
      case (Some(blocks), _) =>
        val dim = blocks.select(lower(col("hash")).as("hash"),
          col("block_number"), col("block_ts_ms"))
        withSources.join(broadcastIfSmall(dim), Seq("hash"), "left")
          .withColumn("includedAtBlockHeight", coalesce(col("block_number"), lit(0L)))
          .withColumn("includedBlockTimestamp", coalesce(col("block_ts_ms"), lit(0L)))
          .withColumn("inclusionDelayMs",
            when(col("block_ts_ms").isNotNull, col("block_ts_ms") - col("timestamp"))
              .otherwise(lit(0L)))
          .drop("block_number", "block_ts_ms")
      case (None, Some(factory)) =>
        InclusionCheck.enrich(withSources, factory)
      case (None, None) =>
        withSources
          .withColumn("includedAtBlockHeight", lit(0L))
          .withColumn("includedBlockTimestamp", lit(0L))
          .withColumn("inclusionDelayMs", lit(0L))
    }

    // ── F1 discard + O1 global sort, reference column order ───────────
    val out = enriched
      .filter(!(col("includedAtBlockHeight") > 0 &&
        col("inclusionDelayMs") <= -TxAlreadyIncludedThresholdMs))
      .select("timestamp", "hash", "chainId", "txType", "from", "to", "value",
        "nonce", "gas", "gasPrice", "gasTipCap", "gasFeeCap", "dataSize",
        "data4Bytes", "sources", "includedAtBlockHeight",
        "includedBlockTimestamp", "inclusionDelayMs", "rawTx")
      .orderBy("timestamp")

    Output(out, trash, parsed)
  }

  /** A2 standalone: sourcelog merge (cmd/merge/sourcelog.go:64-108 +
    * common/sourcelog.go:12-65): normalize source tags, keep the earliest
    * timestamp per (hash, source). One hash-partitioned aggregate with
    * map-side partial min — no other shuffle at any scale. */
  def mergeSourcelog(sourcelog: DataFrame): DataFrame =
    sourcelog
      .withColumn("source", Sources.normalizeSource(col("source")))
      .groupBy("hash", "source")
      .agg(min("timestamp_ms").as("timestamp_ms"))
      .select("timestamp_ms", "hash", "source")

  /** A3 standalone: trash merge (cmd/merge/trash.go:64-108 +
    * common/trashfile.go:66-103): earliest entry per (hash, source) wins,
    * carrying its reason/notes (min-struct, same shape as the A1 dedup). */
  def mergeTrash(trash: DataFrame): DataFrame =
    trash
      .withColumn("source", Sources.normalizeSource(col("source")))
      .withColumn("notes", coalesce(col("notes"), lit("")))
      .groupBy("hash", "source")
      .agg(min(struct(col("timestamp_ms"), col("reason"), col("notes"))).as("f"))
      .select(col("f.timestamp_ms").as("timestamp_ms"), col("hash"),
        col("source"), col("f.reason").as("reason"), col("f.notes").as("notes"))
}
