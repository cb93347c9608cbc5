package graft

import graft.functions.VecOps.{vec_pack, vec_unpack_float}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the object-boundary pack/unpack expressions (r15):
  * bit-exact round-trips are what lets the packed pipelines claim
  * identical results to the unpacked ones. */
class VecPackSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark
    graft.functions.GraftFunctions.register(s); s }

  test("float arrays round-trip bit-exactly, NaN payloads and signed zero included") {
    import spark.implicits._
    val weird = Array(0.0f, -0.0f, Float.MinPositiveValue, Float.MaxValue,
      Float.NegativeInfinity, java.lang.Float.intBitsToFloat(0x7fc00123),
      1.5f, -3.25e-30f)
    val df = Seq((1L, weird.toSeq), (2L, Seq.empty[Float]))
      .toDF("id", "v")
      .select(col("id"), col("v"),
        vec_unpack_float(vec_pack(col("v"))).as("rt"))
    val rows = df.orderBy("id").collect()
    val (orig, rt) = (rows(0).getSeq[Float](1), rows(0).getSeq[Float](2))
    assert(orig.length == rt.length)
    orig.zip(rt).foreach { case (a, b) =>
      assert(java.lang.Float.floatToRawIntBits(a) ==
        java.lang.Float.floatToRawIntBits(b),
        s"bits diverged: $a vs $b")
    }
    assert(rows(1).getSeq[Float](2).isEmpty, "empty array must round-trip")
  }

  test("packed layout is little-endian raw bits at the documented width") {
    import spark.implicits._
    val bytesF = Seq(Tuple1(Seq(1.0f))).toDF("v")
      .select(vec_pack(col("v"))).head().getAs[Array[Byte]](0)
    assert(bytesF.toSeq == Seq[Byte](0, 0, -128, 63), // 0x3f800000 LE
      s"float layout: ${bytesF.mkString(",")}")
    val bytesD = Seq(Tuple1(Seq(1.0d))).toDF("v")
      .select(vec_pack(col("v"))).head().getAs[Array[Byte]](0)
    assert(bytesD.length == 8 && bytesD.toSeq.last == 0x3f.toByte,
      s"double layout: ${bytesD.mkString(",")}")
  }

  test("null elements are rejected loudly, not packed as 0.0") {
    // ADVICE r15: the type check admits containsNull = true schemas
    // (parquet embeddings carry it with no actual nulls), so a REAL null
    // element must fail loudly in both eval paths rather than silently
    // packing as whatever the null slot reads back
    import spark.implicits._
    // codegen path
    val ex1 = intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 3.0f))).toDF("v")
        .select(vec_pack(col("v"))).collect()
    }
    assert(ex1.toString.contains("null element") ||
      Option(ex1.getCause).exists(_.toString.contains("null element")),
      s"unexpected failure: $ex1")
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val withNull = new GenericArrayData(Array[Any](1.0f, null, 3.0f))
    val ex2 = intercept[IllegalArgumentException] {
      graft.functions.VecPack(
        Literal(withNull, ArrayType(FloatType, containsNull = true)))
        .eval(null)
    }
    assert(ex2.getMessage.contains("null element at index 1"))
    // a containsNull = true schema with NO actual nulls still packs fine
    val ok = Seq(Tuple1(Seq[java.lang.Float](1.0f, 2.0f))).toDF("v")
      .select(vec_unpack_float(vec_pack(col("v")))).head()
      .getSeq[Float](0)
    assert(ok == Seq(1.0f, 2.0f))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path via direct expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val arr = ArrayData.toArrayData(Array(1.5f, -2.25f))
    val packed = graft.functions.VecPack(
      Literal(arr, ArrayType(FloatType, containsNull = false)))
      .eval(null).asInstanceOf[Array[Byte]]
    val back = graft.functions.VecUnpackFloat(
      Literal(packed, BinaryType)).eval(null)
      .asInstanceOf[ArrayData].toFloatArray()
    assert(back.toSeq == Seq(1.5f, -2.25f))
  }
}
