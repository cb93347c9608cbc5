package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract for the driver testdata (TESTDATA.md).
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * physical types before (r9: events.ts TIMESTAMP(NANOS) → timestamp[us]),
  * which broke 18 queries across 8 scattered tests with the same opaque
  * analysis error. This spec pins the LOADED schema of every table at
  * sf0.001 so the next silent regeneration fails exactly one named test
  * that says what moved.
  *
  * The contract is the post-[[Tables]] view, not the raw parquet: e.g.
  * `events.ts` must come out as session-UTC TimestampType whatever the
  * file carries, because every events query and the DuckDB oracle assume
  * it.
  */
class TablesSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, true),
      "label" -> IntegerType))

  test("Tables.names covers exactly the contracted tables") {
    assert(Tables.names.toSet == expected.keySet)
  }

  Tables.names.foreach { name =>
    test(s"$name loads with the contracted schema") {
      val got = Tables.table(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == expected(name),
        s"testdata contract drift for '$name' — driver likely regenerated " +
          s"/root/testdata with new physical types; got $got")
    }
  }
}
