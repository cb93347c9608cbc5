package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** vec_d2_dec must reproduce the per-dim-exploded oracle-twin sum —
  * SUM(CAST((v − cv)·(v − cv) AS DECIMAL(28,12))) — bit-for-bit,
  * including the non-ansi cast's NaN/∞/overflow → null-term skips and
  * the all-null → NULL degenerate. The exact ANN twins (ivfExact) fold
  * with it instead of exploding n·dims·k rows through a decimal
  * aggregate, so any divergence here is an oracle-hash break. */
class VecD2DecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The exploded reference sum, exactly as the twin chains wrote it. */
  private def explodedD2(rows: Seq[(Long, Seq[Double])], cents: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    val flat = rows.toDF("vec_id", "e")
      .select(col("vec_id"), posexplode(col("e")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").as("v"))
    val cflat = cents.toDF("c", "m")
      .select(col("c"), posexplode(col("m")))
      .select(col("c"), (col("pos") + 1).as("i"), col("col").as("cv"))
    flat.join(broadcast(cflat), Seq("i"))
      .groupBy("vec_id", "c")
      .agg(sum(((col("v") - col("cv")) * (col("v") - col("cv")))
        .cast(DecimalType(28, 12))).as("d2"))
  }

  private def foldedD2(rows: Seq[(Long, Seq[Double])], cents: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    rows.toDF("vec_id", "e")
      .crossJoin(broadcast(cents.toDF("c", "m")))
      .select(col("vec_id"), col("c"),
        graft.functions.VecOps.vec_d2_dec(col("e"), col("m")).as("d2"))
  }

  /** vec_d2_dec implements the NON-ANSI cast's null-term semantics (a
    * NaN/∞/overflow term is skipped, as SUM skips a null) — the twin
    * fixture data never produces such a term, so the chains agree under
    * either ANSI setting there; the degenerate-term tests compare
    * against the non-ansi reference explicitly. */
  private def withNonAnsi[T](f: => T): T = {
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def both(rows: Seq[(Long, Seq[Double])], cents: Seq[(Long, Seq[Double])]) =
    withNonAnsi {
      val key = Seq("vec_id", "c")
      val a = explodedD2(rows, cents).orderBy(key.map(col): _*).collect().toSeq
      val b = foldedD2(rows, cents).orderBy(key.map(col): _*).collect().toSeq
      (a, b)
    }

  test("matches the exploded decimal sum on ordinary vectors (values AND type)") {
    val rows = (0L until 17L).map(i => i -> (0 until 64).map(d =>
      math.sin(i * 64.0 + d) * 3.7 + d * 0.001))
    val cents = (0L until 5L).map(c => c -> (0 until 64).map(d =>
      math.cos(c * 64.0 + d) * 2.9))
    val (a, b) = both(rows, cents)
    assert(a == b)
    assert(foldedD2(rows, cents).schema("d2").dataType == DecimalType(38, 12))
    assert(explodedD2(rows, cents).schema("d2").dataType == DecimalType(38, 12))
  }

  test("NaN / infinite / decimal-overflow terms are skipped like the cast-null sum") {
    val rows = Seq(
      0L -> Seq(Double.NaN, 1.0, 2.0),           // NaN term skipped
      1L -> Seq(1e200, 1.0, 2.0),                // (1e200)² = ∞ term skipped
      2L -> Seq(1e9, 1.0, 2.0),                  // (1e9)² = 1e18 > 10^16 → DECIMAL(28,12) overflow null
      3L -> Seq(0.25, -1.5, 3.125))              // plain
    val cents = Seq(10L -> Seq(0.0, 0.0, 0.0))
    val (a, b) = both(rows, cents)
    assert(a == b)
  }

  test("all terms null folds to NULL, the SUM degenerate") {
    withNonAnsi {
      val rows = Seq(0L -> Seq(Double.NaN, Double.PositiveInfinity))
      val cents = Seq(1L -> Seq(0.0, 0.0))
      val got = foldedD2(rows, cents).collect()
      assert(got.length == 1 && got(0).isNullAt(2))
      val ref = explodedD2(rows, cents).collect()
      assert(ref.length == 1 && ref(0).isNullAt(2))
    }
  }

  test("float arrays widen per element like the exploded chain's cast") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val fRows = Seq((0L, Seq(1.5f, -2.25f, 0.125f)))
    val fCents = Seq((1L, Seq(0.5f, 0.75f, -0.375f)))
    val folded = fRows.toDF("vec_id", "e").crossJoin(broadcast(fCents.toDF("c", "m")))
      .select(graft.functions.VecOps.vec_d2_dec(col("e"), col("m")).as("d2"))
      .collect()(0).getDecimal(0)
    val expl = explodedD2(
      fRows.map { case (i, e) => i -> e.map(_.toDouble) },
      fCents.map { case (c, m) => c -> m.map(_.toDouble) })
      .collect()(0).getDecimal(2)
    assert(folded == expl)
  }
}
