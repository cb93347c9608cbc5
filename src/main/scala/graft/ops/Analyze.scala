package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The analyzer aggregate pack (SURVEY.md §3.2; common/analyzer.go:53-213):
  * A6-A12 computed as a handful of Spark aggregation jobs over one cached
  * DataFrame, plus a driver-side text renderer in the reference's summary
  * layout. Only final aggregate rows are collected — never the data.
  */
object Analyze {

  final case class TypeStat(txType: Long, n: Long, bytes: Long)
  final case class SourceStat(source: String, n: Long, onChain: Long, notOnChain: Long,
      exclusive: Long, exclusiveIncluded: Long)
  final case class Summary(
      nUnique: Long, nIncluded: Long, nNotIncluded: Long,
      tsFirstMs: Long, tsLastMs: Long,
      perType: Seq[TypeStat], perSource: Seq[SourceStat])

  /** txs: the merged transactions DataFrame (reference parquet schema).
    * Applies the F1 filter itself, like NewAnalyzer2 (common/analyzer.go:68-73). */
  def summarize(txsIn: DataFrame): Summary = {
    // metadata-only archives (no rawTx) still analyze; byte stats become 0
    val rawBytes =
      if (txsIn.columns.contains("rawTx")) length(col("rawTx")).cast("long")
      else lit(0L)
    val txs = txsIn
      .filter(!(col("includedAtBlockHeight") > 0 && col("inclusionDelayMs") <= -12000))
      .select(col("hash"), col("txType"), rawBytes.as("rawBytes"),
        col("sources"), col("includedAtBlockHeight"), col("timestamp"))
      .withColumn("included", col("includedAtBlockHeight") =!= 0)
      .cache()

    // A6, A7, A12 in one pass
    val g = txs.agg(
      count(lit(1)).as("n"),
      sum(when(col("included"), 1L).otherwise(0L)).as("inc"),
      min(col("timestamp").cast("long")).as("first"),
      max(col("timestamp").cast("long")).as("last")).head()
    val n = g.getLong(0)
    val inc = if (g.isNullAt(1)) 0L else g.getLong(1)

    // A8: per type count + byte volume (rawTx is binary → length = bytes)
    val perType = txs.groupBy("txType")
      .agg(count(lit(1)).as("n"), sum(col("rawBytes")).as("bytes"))
      .orderBy("txType").collect().toSeq
      .map(r => TypeStat(r.getLong(0), r.getLong(1), r.getLong(2)))

    // A9-A11: per source: totals, landed split, exclusive orderflow
    val perSource = txs
      .select(col("included"), size(col("sources")).as("nSrc"),
        explode(col("sources")).as("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("included"), 1L).otherwise(0L)).as("onChain"),
        sum(when(!col("included"), 1L).otherwise(0L)).as("notOnChain"),
        sum(when(col("nSrc") === 1, 1L).otherwise(0L)).as("exclusive"),
        sum(when(col("nSrc") === 1 && col("included"), 1L).otherwise(0L)).as("exclusiveIncluded"))
      .orderBy("source").collect().toSeq
      .map(r => SourceStat(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    txs.unpersist()
    Summary(n, inc, n - inc,
      if (g.isNullAt(2)) 0L else g.getLong(2),
      if (g.isNullAt(3)) 0L else g.getLong(3),
      perType, perSource)
  }

  /** Per-source stats as a DataFrame (for queries / sinks) — same
    * aggregation, fully distributed. */
  def perSourceStats(txs: DataFrame): DataFrame =
    txs
      .filter(!(col("includedAtBlockHeight") > 0 && col("inclusionDelayMs") <= -12000))
      .select((col("includedAtBlockHeight") =!= 0).as("included"),
        size(col("sources")).as("nSrc"), explode(col("sources")).as("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("included"), 1L).otherwise(0L)).as("on_chain"),
        sum(when(!col("included"), 1L).otherwise(0L)).as("not_on_chain"),
        sum(when(col("nSrc") === 1, 1L).otherwise(0L)).as("exclusive"))

  private def pct(a: Long, b: Long): String =
    if (b == 0) "0.0%" else f"${math.floor(a.toDouble / b * 1000) / 10}%.1f%%"

  private def fmtUtc(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString.replace("T", " ").replace("Z", "")

  /** Text report in the reference's summary.txt layout
    * (common/analyzer.go:156-213). */
  def sprint(s: Summary): String = {
    val sb = new StringBuilder
    sb.append("Mempool Summary\n")
    sb.append("===============\n\n")
    sb.append(s"- From: ${fmtUtc(s.tsFirstMs)} UTC\n")
    sb.append(s"- To:   ${fmtUtc(s.tsLastMs)} UTC\n\n")
    sb.append(f"Unique transactions: ${s.nUnique}%,10d\n\n")
    sb.append(f"- Included on-chain: ${s.nIncluded}%,10d (${pct(s.nIncluded, s.nUnique)}%5s)\n")
    sb.append(f"- Not included:      ${s.nNotIncluded}%,10d (${pct(s.nNotIncluded, s.nUnique)}%5s)\n\n")
    sb.append("| Tx Type | Count | Bytes |\n|---|---|---|\n")
    s.perType.foreach(t => sb.append(f"| ${t.txType} | ${t.n}%,d (${pct(t.n, s.nUnique)}) | ${t.bytes}%,d |\n"))
    sb.append("\n| Source | Count | OnChain | NotOnChain | Exclusive |\n|---|---|---|---|---|\n")
    s.perSource.foreach(src => sb.append(
      f"| ${src.source} | ${src.n}%,d | ${src.onChain}%,d | ${src.notOnChain}%,d | ${src.exclusive}%,d |\n"))
    sb.toString
  }
}
