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
}
