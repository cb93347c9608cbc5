package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operation exercised on the driver testdata: the Spark
  * implementation plus, when SQL-expressible, an equivalent DuckDB oracle
  * query (driver hash-compares results on sf0.01; BASELINE.md t2 gate).
  *
  * Oracle-parity rules used throughout:
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are computed exactly (decimal sums) then cast to
  *    double, so the value is order-of-summation independent and bit-equal
  *    across engines;
  *  - integer sums are CAST AS BIGINT in DuckDB (which otherwise widens to
  *    HUGEINT);
  *  - row order is never relied upon (the driver sorts before hashing).
  */
final case class QueryDef(
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  /** SQL-expressible operator: differential-tested against DuckDB. */
  def sql(doc: String, oracleSql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(doc, Some(oracleSql), fn)

  /** Not expressible in ANSI SQL (custom UDF/sketch); driver falls back to a
    * rows-only check. */
  def rowsOnly(doc: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(doc, None, fn)

  /** Where frozen golden-result parquets live (one per [[golden]] query).
    * Absolute because the oracle SQL is executed by the driver's DuckDB
    * from an unknown working directory. Regenerate with [[graft.GoldenGen]];
    * drift is gated by GoldenParitySpec. */
  val goldenDir: String =
    sys.env.getOrElse("SPARK_GRAFT_GOLDEN_DIR", "/root/repo/golden")

  /** Oracle for a golden query: DuckDB reads the frozen result verbatim. */
  def goldenOracle(name: String): String =
    s"SELECT * FROM read_parquet('$goldenDir/$name.parquet')"

  /** Non-SQL-expressible operator (keccak/secp256k1/wire-codec paths DuckDB
    * cannot compute) verified against a FROZEN GOLDEN RESULT: the query's
    * own sf0.01 output, generated once by [[graft.GoldenGen]], validated
    * against the reference golden vectors (EthTxSpec et al.), and checked
    * into the repo. The driver's DuckDB oracle just reads the frozen file,
    * so the differential hash-compare is as hard as for SQL oracles: any
    * behavioral drift in the engine breaks the hash. `name` must equal the
    * query's key in SparkEntry. */
  def golden(doc: String, name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(doc, Some(goldenOracle(name)), fn)
}
