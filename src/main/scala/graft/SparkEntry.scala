package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named [[QueryDef]];
  * SQL-expressible ones carry a DuckDB oracle for the driver's differential
  * hash-compare on sf0.01.
  */
object SparkEntry {

  /** Full inventory, grouped by SURVEY.md §2 family. */
  val all: Map[String, QueryDef] =
    ListMap.empty[String, QueryDef] ++
      graft.queries.Core.defs ++
      graft.queries.SinkOracles.defs ++
      graft.queries.Joins.defs ++
      graft.queries.Mempool.defs ++
      graft.queries.MempoolParse.defs ++
      graft.queries.TextOps.defs ++
      graft.queries.DedupOps.defs ++
      graft.queries.SimilarityOps.defs ++
      graft.queries.MultimodalOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q_merge_pipeline").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(o), _)) => k -> o }
}
