package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contended-artifact decision (Bench.contendedLabel) to the
  * measured episodes that shaped it — each case below is a real artifact
  * from a past round, so a threshold drift that would have mislabeled one
  * of them fails here instead of in a graded bench. */
class BenchLabelSpec extends AnyFunSuite {
  private def label(cal: Double, start: Double, end: Double,
      cores: Int = 32, threads: Int = 32) =
    Bench.contendedLabel(cal, start, end, cores, threads)

  test("idle run labels clean") {
    // r12 clean runs: calibration 0.148-0.190, load well under thresholds
    assert(label(0.16, 1.5, 7.0) == (false, ""))
  }

  test("inflated calibration is authoritative") {
    // the driver's r14 artifact: calibration 0.262, load start 8.23
    val (c, by) = label(0.262, 8.23, 10.0)
    assert(c && by == "calibration|loadStart")
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
}
