package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contended-artifact decision (Bench.contendedLabel) to the
  * measured episodes that shaped it — each case below is a real artifact
  * from a past round, so a threshold drift that would have mislabeled one
  * of them fails here instead of in a graded bench. */
class BenchLabelSpec extends AnyFunSuite {
  private def label(cal: Double, start: Double, end: Double,
      cores: Int = 32, threads: Int = 32, scan: Double = 0.16) =
    Bench.contendedLabel(Some(cal), Some(scan), start, end, cores, threads)

  test("idle run labels clean") {
    // r12 clean runs: calibration 0.148-0.190, scan ~0.15-0.17, load
    // well under thresholds
    assert(label(0.16, 1.5, 7.0) == (false, ""))
  }

  test("inflated calibration is authoritative") {
    // the driver's r14 artifact: calibration 0.262, load start 8.23
    val (c, by) = label(0.262, 8.23, 10.0)
    assert(c && by == "calibration|loadStart")
  }

  test("warm-box I/O contention trips calibrationScan (the r15 artifact)") {
    // BENCH_r15: CPU calibration 0.181 (idle-level — it exculpated the
    // stale loadStart 4.27 and the run self-labeled CLEAN), but the scan
    // calibration read 0.234 vs the ~0.16 idle band, and per-query times
    // were NON-uniformly inflated (q_dedup_apply 8.59 s vs 1.99 s idle,
    // 4.3×). The I/O probe caught the page-cache/disk contention the CPU
    // probe can't see — it must now trip the label on its own
    // (VERDICT r15 item 1).
    val (c, by) = label(0.181, 4.27, 8.2, scan = 0.234)
    assert(c && by == "calibrationScan")
  }

  test("idle scan calibration stays clean") {
    // my r15 idle re-run: calibration 0.163, scan 0.161
    assert(label(0.163, 1.2, 7.5, scan = 0.161) == (false, ""))
  }

  test("stale loadStart with idle calibration is exculpated") {
    // the r14 false positive: a just-finished verify JVM left 1-min load
    // at 6.9, but the calibration (measured AFTER the sample) was 0.135 —
    // idle-perfect. The old rule flagged it; the label must not.
    assert(label(0.135, 6.9, 5.0) == (false, ""))
  }

  test("loadStart with non-idle calibration still trips") {
    val (c, by) = label(0.22, 6.9, 5.0)
    assert(c && by == "loadStart")
  }

  test("mid-sweep contention trips loadEnd") {
    // a concurrent same-width job pushes end load toward 2x threads
    val (c, by) = label(0.18, 1.0, 55.0)
    assert(c && by == "loadEnd")
  }

  test("the sweep's own self-load never trips loadEnd") {
    // the driver's CLEAN r13 artifact ended at load 7.0 — and an
    // oversubscribed local[32] on a 16-core box can end near `threads`
    // from its own runnable threads (ADVICE r14: cores/2 mislabeled it)
    assert(label(0.18, 1.0, 7.0) == (false, ""))
    assert(label(0.18, 1.0, 30.0, cores = 16, threads = 32) == (false, ""))
  }

  test("canary self-check: r15's non-uniform inflation trips, warm-box tax stays silent") {
    // the mode no probe carries: BENCH_r15's q_dedup_apply read 8.59 s
    // (4.9× its clean floor) while its dedup siblings sat under 2× —
    // mid-sweep I/O contention the before/after calibrations missed
    val r15 = Map("q_dedup_apply" -> 8.59, "q_dedup_ngram_jaccard" -> 4.80,
      "q_dedup_semantic" -> 3.06, "q_mempool_merge" -> 4.60)
    assert(Bench.canaryOutliers(r15, 3.0) == Seq("q_dedup_apply"))
    // uniform warm-box tax (+10 %) and run-to-run noise (±20 %) never
    // reach even the 2.5× annotation threshold
    assert(Bench.canaryOutliers(
      Bench.CanaryFloorSec.view.mapValues(_ * 1.1).toMap, 2.5).isEmpty)
    assert(Bench.canaryOutliers(
      Bench.CanaryFloorSec.view.mapValues(_ * 1.2).toMap, 2.5).isEmpty)
    // a failed (filtered-out) query is not an outlier
    assert(Bench.canaryOutliers(Map.empty[String, Double], 3.0).isEmpty)
  }

  test("Verify mode (no calibrations): load signals stand un-exculpated") {
    // Verify runs no calibration jobs — loadStart > 6 can't be talked
    // down by an idle CPU probe that was never measured (VERDICT r15
    // item 3: the old inline Verify rule, now routed through the one
    // shared function)
    def vlabel(start: Double, end: Double, cores: Int = 32, threads: Int = 4) =
      Bench.contendedLabel(None, None, start, end, cores, threads)
    assert(vlabel(1.0, 3.0) == (false, ""))
    val (c1, by1) = vlabel(6.9, 3.0)
    assert(c1 && by1 == "loadStart")
    // end threshold still scales with the configured width (ADVICE r14)
    val (c2, by2) = vlabel(1.0, 17.0, cores = 32, threads = 4)
    assert(c2 && by2 == "loadEnd")
    assert(vlabel(1.0, 9.0, cores = 32, threads = 4) == (false, ""))
  }
}
