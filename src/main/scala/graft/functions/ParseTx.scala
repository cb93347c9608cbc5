package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1 — the core projection (SURVEY.md §2.2): raw RLP bytes → 15-column
  * transaction summary, as a Spark UDF over [[EthTx]].
  *
  * This is the one genuinely custom piece of the engine (§2.8): RLP +
  * keccak + secp256k1 cannot be expressed with built-ins. Everything
  * downstream of it (dedup, joins, filters) stays declarative so Catalyst
  * can still prune/push around the parse boundary — the merge job runs
  * cheap hash-dedup and blacklist anti-join BEFORE this projection
  * (SURVEY.md §4.1 design rule).
  */
object ParseTx {

  /** Row-shaped parse result; `reason` is the F2 validation verdict
    * (null = valid), `ok` is false when the bytes are not decodable at all. */
  final case class TxSummaryCols(
      hash: String, chainId: String, txType: Long, from: String, to: String,
      value: String, nonce: String, gas: String, gasPrice: String,
      gasTipCap: String, gasFeeCap: String, dataSize: Long, data4Bytes: String,
      rawTx: Array[Byte], fromValid: Boolean, hasBlobSidecar: Boolean,
      reason: Option[String])

  def parseHex(rawHex: String): Option[TxSummaryCols] =
    try {
      val p = EthTx.decodeHex(rawHex)
      Some(TxSummaryCols(
        p.hash, p.chainId, p.txType, p.from, p.to, p.value, p.nonce, p.gas,
        p.gasPrice, p.gasTipCap, p.gasFeeCap, p.dataSize, p.data4Bytes,
        p.rawTx, p.fromValid, p.hasBlobSidecar, EthTx.validationReason(p)))
    } catch { case _: Exception => None }

  /** parse_raw_tx(rawHex STRING) → STRUCT(...); null on undecodable input. */
  val parseRawTxUdf = udf((rawHex: String) =>
    if (rawHex == null) None else parseHex(rawHex))

  def parse_raw_tx(c: Column): Column = parseRawTxUdf(c)

  /** The merge-job projection: (timestamp_ms, hash, raw hex) rows →
    * TxSummaryEntry-shaped DataFrame (reference parquet schema,
    * common/txsummary.go:42-69). Undecodable rows are dropped (they go to
    * the trash side-output upstream). */
  def project(raw: DataFrame, tsCol: String = "timestamp_ms",
      rawHexCol: String = "raw_tx_hex"): DataFrame = {
    raw
      .withColumn("p", parse_raw_tx(col(rawHexCol)))
      .filter(col("p").isNotNull)
      .select(
        col(tsCol).as("timestamp"),
        col("p.hash").as("hash"),
        col("p.chainId").as("chainId"),
        col("p.txType").as("txType"),
        col("p.from").as("from"),
        col("p.to").as("to"),
        col("p.value").as("value"),
        col("p.nonce").as("nonce"),
        col("p.gas").as("gas"),
        col("p.gasPrice").as("gasPrice"),
        col("p.gasTipCap").as("gasTipCap"),
        col("p.gasFeeCap").as("gasFeeCap"),
        col("p.dataSize").as("dataSize"),
        col("p.data4Bytes").as("data4Bytes"),
        col("p.rawTx").as("rawTx"),
        col("p.reason").as("reason"))
  }
}
