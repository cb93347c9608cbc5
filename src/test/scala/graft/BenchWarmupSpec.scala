package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench/campaign harness helpers that are otherwise only
  * exercised inside swallowing try/catch blocks: a broken RPC warm-up
  * would be silently eaten by Bench's warm-up catch and q_rpc_enrich's
  * first-touch jitter would quietly return; a broken counter would turn
  * every campaign's shuffle_write_gb into zeros that read as "free". */
class BenchWarmupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ShuffleWriteCounter observes a shuffle, settles, and removes cleanly") {
    val c = new ShuffleWriteCounter(spark.sparkContext)
    try {
      val before = c.settled()
      // a genuine exchange: distinct over 32 partitions must shuffle
      spark.range(0, 200000, 1, 32)
        .selectExpr("id % 1000 as k").distinct().count()
      val after = c.settled()
      assert(after > before,
        s"counter saw no shuffle-write bytes ($before -> $after)")
    } finally c.remove()
    // after removal the counter no longer accumulates
    val frozen = c.settled()
    spark.range(0, 200000, 1, 32)
      .selectExpr("id % 1000 as k").distinct().count()
    assert(c.settled() == frozen, "removed listener still counted")
  }

  test("warmRpcStack completes a real loopback enrich pass, twice") {
    // must not throw — Bench's warm-up block would swallow the failure
    // and the first-touch jitter would silently return. Running twice
    // pins that each call stands up (and tears down) its own throwaway
    // server rather than leaking a bound port between calls.
    queries.SinkOracles.warmRpcStack(spark)
    queries.SinkOracles.warmRpcStack(spark)
  }
}
