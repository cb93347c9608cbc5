package graft

import graft.functions.{GraftFunctions, Keccak256}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native keccak256 Expression through the SQL surface. */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("keccak256 expression matches the reference implementation and stays codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val lit = Seq("", "abc", "graft").toDF("s")
      .selectExpr("s", "hex(keccak256(cast(s as binary))) AS h")
    val got = lit.collect().map(r => r.getString(0) -> r.getString(1).toLowerCase).toMap
    Seq("", "abc", "graft").foreach { s =>
      assert(got(s) == Keccak256.hex(Keccak256.hash(s.getBytes("UTF-8"))))
    }
    // over a real scan the expression must stay inside whole-stage codegen
    // (a literal frame is constant-folded away, which also proves eval works)
    val scan = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("hex(keccak256(cast(text as binary))) AS h")
    // "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hex(keccak256"), plan)
    assert(scan.distinct().count() > 0)
  }

  test("vec_dot expression: exact dot product, array-native, codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
      .selectExpr("vec_dot(a, b) AS d")
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(32.0, 0.0, 0.0))
    // over a real scan it stays in whole-stage codegen
    val scan = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_dot(embedding, embedding) AS n2")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot"), plan)
    // differential vs the exploded-sum formulation on real embeddings
    val viaExpr = scan.agg(sum("n2")).head().getDouble(0)
    val viaExplode = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(explode(col("embedding")).as("v"))
      .agg(sum(col("v").cast("double") * col("v").cast("double"))).head().getDouble(0)
    assert(math.abs(viaExpr - viaExplode) < 1e-6 * math.abs(viaExplode))
  }

  test("GraftExtensions wires the function injection") {
    // the extension builder runs against a fresh extensions registry (a
    // session picks it up via spark.sql.extensions at first creation)
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(e)
    // and the same function through the session registry returns the KAT
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT hex(keccak256(cast('abc' as binary))) h").head().getString(0)
      .equalsIgnoreCase("4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"))
  }

  test("parse_raw_tx is SQL-callable") {
    GraftFunctions.register(spark)
    val hex = graft.functions.TxFixtures.rawTxHex(7L)
    val row = spark.sql(s"SELECT parse_raw_tx('$hex').hash AS h").head()
    assert(row.getString(0).startsWith("0x") && row.getString(0).length == 66)
  }
}
