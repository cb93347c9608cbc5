package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for the frozen golden results (QueryDef.golden — the
  * secp256k1/keccak/RLP parse family DuckDB cannot recompute).
  *
  * For every golden query, re-runs the live engine at the goldens'
  * generation SF (sf0.01) and asserts the result equals
  * `golden/<name>.parquet` row-for-row (both-direction exceptAll). A parse
  * path change without a GoldenGen re-run fails HERE, locally, with the
  * query named — not as an unexplained driver hash mismatch a round later.
  *
  * Goldens are frozen at sf0.01 specifically (row counts scale with the SF
  * inferred from the data dir), so this spec must not be pointed elsewhere.
  */
class GoldenParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("golden registry is non-empty and every golden file exists") {
    val names = GoldenGen.goldenNames
    assert(names.nonEmpty)
    names.foreach { n =>
      val p = Paths.get(QueryDef.goldenDir, s"$n.parquet")
      assert(Files.isRegularFile(p), s"missing golden file $p — run GoldenGen")
    }
  }

  GoldenGen.goldenNames.sorted.foreach { name =>
    test(s"$name reproduces its frozen golden exactly") {
      val live = SparkEntry.all(name).fn(spark, sf)
      val frozen = spark.read.parquet(
        Paths.get(QueryDef.goldenDir, s"$name.parquet").toString)
      assert(live.columns.toSeq == frozen.columns.toSeq,
        s"$name column drift: live=${live.columns.toSeq} frozen=${frozen.columns.toSeq}")
      val l = live.cache()
      try {
        val extra   = l.exceptAll(frozen).count()
        val missing = frozen.exceptAll(l).count()
        assert(extra == 0 && missing == 0,
          s"$name drifted from golden: $extra live-only rows, " +
            s"$missing golden-only rows — intentional change? re-run GoldenGen")
      } finally l.unpersist()
    }
  }
}
