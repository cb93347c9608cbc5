package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contended-artifact decision (Bench.contendedLabel) to the
  * measured episodes that shaped it — each case below is a real artifact
  * from a past round, so a threshold drift that would have mislabeled one
  * of them fails here instead of in a graded bench. */
class BenchLabelSpec extends AnyFunSuite {
  // legacy 2-field view: (contended, contendedBy) — most episodes below
  // predate the io_credits third element and pass no end-scan/canary
  // evidence, so the conservative defaults apply
  private def label(cal: Double, start: Double, end: Double,
      cores: Int = 32, threads: Int = 32, scan: Double = 0.16) = {
    val (c, by, _) = Bench.contendedLabel(Some(cal), Some(scan), start, end,
      cores, threads)
    (c, by)
  }

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

  test("canary breadth rule: both recorded mid-sweep episodes trip, noise stays silent") {
    // the mode no probe carries — mid-sweep contention between the
    // before/after calibrations. Trip rule: ≥ 2 DISTINCT families with
    // any sentinel > 1.5× (VERDICT r16 item 1).
    // BENCH_r15: q_dedup_apply 4.9× its floor, jaccard 2.0×, sem 1.65×
    val r15 = Map("q_dedup_apply" -> 8.59, "q_dedup_ngram_jaccard" -> 4.80,
      "q_dedup_semantic" -> 3.06, "q_mempool_merge" -> 4.60)
    assert(Bench.canaryOutliers(r15, 3.0) == Seq("q_dedup_apply"))
    assert(Bench.canaryFamiliesOver(r15, 1.5) ==
      Seq("jaccard", "kmeans", "pairs"))
    // BENCH_r16: a contiguous sim/embed family at 1.5–2.2× while every
    // then-canary AND both calibrations sat idle — the episode the old
    // any-canary-3× rule missed (no sentinel cleared 3×). The new
    // sentinels (kmeans family incl. the coarse_sec timer, ivf) plus
    // jaccard put three families over 1.5×.
    // q_dedup_apply's artifact value (1.719 s, ratio 1.02 against the
    // then-floor 1.69) predates the r17 CC-label memo that cut its clean
    // time to ~0.3 s — the episode pins RATIOS, so the entry is restated
    // at the same 1.02× of the post-memo floor
    val r16 = Map("q_embed_kmeans" -> 2.322, "coarse_sec" -> 2.137,
      "q_sim_ann_ivf" -> 3.384, "q_dedup_ngram_jaccard" -> 3.673,
      "q_dedup_apply" -> 0.306, "merge_sec" -> 4.105,
      "pairs_sec" -> 0.589, "pq_sec" -> 1.837, "q_embed_pq" -> 1.999)
    assert(Bench.canaryFamiliesOver(r16, 1.5) ==
      Seq("ivf", "jaccard", "kmeans"))
    assert(Bench.canaryFamiliesOver(r16, 1.5).size >= 2, "r16 must trip")
    // a LONE hot sentinel (one query 4× its floor, every sibling and
    // family twin quiet) is the signature of a code REGRESSION — it must
    // NOT reach the 2-family trip (ADVICE r16: self-labeling it
    // contended would mask the regression); it surfaces via the
    // canary_hot annotation instead
    val regression = Map("q_dedup_apply" -> 7.0,
      "q_dedup_ngram_jaccard" -> 2.4, "q_embed_kmeans" -> 1.2,
      "coarse_sec" -> 1.0, "merge_sec" -> 4.1)
    assert(Bench.canaryFamiliesOver(regression, 1.5) == Seq("pairs"))
    assert(Bench.canaryOutliers(regression, 3.0) == Seq("q_dedup_apply"))
    // a same-path twin pair (q_embed_kmeans + coarse_sec both carry the
    // coarse k-means build) counts as ONE family — a one-commit
    // regression there can't fake contention breadth
    val twinRegression = Map("q_embed_kmeans" -> 2.5, "coarse_sec" -> 2.2)
    assert(Bench.canaryFamiliesOver(twinRegression, 1.5) == Seq("kmeans"))
    // families are the full CONSUMER set of a shared artifact, not just
    // build-path twins (review r17): a regression that grows the shared
    // pair set inflates its timer AND its consumer, a coarse-k-means
    // regression reaches q_dedup_semantic — each must still count ONE
    assert(Bench.canaryFamiliesOver(
      Map("pairs_sec" -> 1.2, "q_dedup_apply" -> 3.5), 1.5) == Seq("pairs"))
    assert(Bench.canaryFamiliesOver(
      Map("coarse_sec" -> 2.1, "q_embed_kmeans" -> 2.4,
        "q_dedup_semantic" -> 3.2), 1.5) == Seq("kmeans"))
    // uniform warm-box tax (+10–20 %) never reaches even the 1.5×
    // breadth threshold, let alone the 2.5× annotation
    assert(Bench.canaryFamiliesOver(
      Bench.AllFloorSec.view.mapValues(_ * 1.2).toMap, 1.5).isEmpty)
    assert(Bench.canaryOutliers(
      Bench.AllFloorSec.view.mapValues(_ * 1.2).toMap, 2.5).isEmpty)
    // a failed (filtered-out) query is not an outlier
    assert(Bench.canaryOutliers(Map.empty[String, Double], 3.0).isEmpty)
    // every sentinel with a floor belongs to a family (a floor without a
    // family silently drops out of the breadth count)
    assert((Bench.AllFloorSec.keySet -- Bench.SentinelFamily.keySet).isEmpty)
  }

  test("I/O-credit state reclassifies a scan-only trip (the r17/r18 artifacts)") {
    // VERDICT r18 item 1: every driver artifact and judge run since r17
    // read scan 0.225–0.235 with an idle CPU calibration, in-band
    // totals, zero canary families, and loads under threshold — the
    // README's burst-credit exhaustion signature (a volume STATE that
    // persists for hours), yet the scan trip alone labeled them
    // contended. With quiet canaries and a persistent end-of-sweep
    // reading, the label must now read clean with io_state naming the
    // cause. The exact r18 driver artifact: cal 0.156, scan 0.228,
    // loadStart 7.86 (own warm-up residue), loadEnd 4.40.
    assert(Bench.contendedLabel(Some(0.156), Some(0.228), 7.86, 4.40, 32, 32,
      calibrationScanEndSec = Some(0.231), canariesQuiet = true) ==
      (false, "", "io_credits"))
    // no end-scan probe (older caller): the reclassification still
    // stands on the quiet quartet, but the state must NOT read
    // "io_credits" — that is a persistence claim the caller never
    // measured (ADVICE r19: the old forall read "unmeasured" as "still
    // elevated"). The artifact records that the check never ran.
    assert(Bench.contendedLabel(Some(0.156), Some(0.228), 7.86, 4.40, 32, 32,
      canariesQuiet = true) == (false, "", "io_unmeasured"))
    // the r15 episode must STILL trip: same scan/CPU shape but the
    // canaries were NOT quiet (apply 4.3×, three families over) — real
    // mid-sweep I/O contention, not volume state
    assert(Bench.contendedLabel(Some(0.181), Some(0.234), 4.27, 8.2, 32, 32,
      calibrationScanEndSec = Some(0.230), canariesQuiet = false) ==
      (true, "calibrationScan", ""))
    // a start-only spike that RECOVERED by the end of the sweep, with
    // the full quiet quartet, is pre-sweep I/O warmth that never reached
    // the sweep — the live r19 episode: a 92.6 s in-band run, zero
    // families, cal 0.172, scan 0.220 → 0.170, labeled contended off
    // the one marginal probe while four independent signals read quiet.
    // io_state names the recovered shape distinctly from credits.
    assert(Bench.contendedLabel(Some(0.172), Some(0.220), 1.0, 2.89, 32, 32,
      calibrationScanEndSec = Some(0.170), canariesQuiet = true) ==
      (false, "", "io_transient_start"))
    // …but WITHOUT quiet canaries the recovered spike keeps the label
    // (contention that arrived pre-sweep can have lingered into it; the
    // canaries are the witness that it did not)
    assert(Bench.contendedLabel(Some(0.172), Some(0.220), 1.0, 2.89, 32, 32,
      calibrationScanEndSec = Some(0.170), canariesQuiet = false) ==
      (true, "calibrationScan", ""))
    // an inflated CPU calibration is never credits (live contention
    // slows both probes) — calibration still trips on its own
    assert(Bench.contendedLabel(Some(0.262), Some(0.234), 1.0, 4.0, 32, 32,
      calibrationScanEndSec = Some(0.232), canariesQuiet = true) ==
      (true, "calibration|calibrationScan", ""))
    // mid-sweep load past threshold blocks the reclassification too
    assert(Bench.contendedLabel(Some(0.156), Some(0.228), 1.0, 55.0, 32, 32,
      calibrationScanEndSec = Some(0.230), canariesQuiet = true) ==
      (true, "calibrationScan|loadEnd", ""))
    // a clean run never carries io_state
    assert(Bench.contendedLabel(Some(0.16), Some(0.17), 1.0, 5.0, 32, 32,
      calibrationScanEndSec = Some(0.18), canariesQuiet = true) ==
      (false, "", ""))
  }

  test("label invariants hold across the whole input space (properties)") {
    // the episode pins above are point cases; these are the rules no
    // input may violate. Raw ScalaCheck generators with fixed seeds,
    // same idiom as PropertySpec (the scalatest bridge isn't cached).
    import org.scalacheck.{Arbitrary, Gen}
    import org.scalacheck.rng.Seed
    val genCase = for {
      cal <- Gen.option(Gen.chooseNum(0.05, 0.6))
      scan <- Gen.option(Gen.chooseNum(0.05, 0.8))
      scanEnd <- Gen.option(Gen.chooseNum(0.05, 0.8))
      ls <- Gen.chooseNum(0.0, 40.0)
      le <- Gen.chooseNum(0.0, 80.0)
      quiet <- Arbitrary.arbBool.arbitrary
    } yield (cal, scan, scanEnd, ls, le, quiet)
    val cases = (0 until 2000).flatMap(i =>
      genCase.apply(Gen.Parameters.default, Seed(7L + i)))
    for ((cal, scan, scanEnd, ls, le, quiet) <- cases) {
      val (c, by, io) = Bench.contendedLabel(cal, scan, ls, le, 32, 32,
        scanEnd, quiet)
      // contended ⇔ at least one named signal
      assert(c == by.nonEmpty)
      // an io_state is only ever a RECLASSIFIED genuine scan trip under
      // the full quiet quartet — never a synonym for "scan also tripped"
      if (io.nonEmpty) {
        assert(!by.contains("calibrationScan"))
        assert(scan.exists(_ > 0.21) && cal.exists(_ <= 0.20) && quiet &&
          le <= math.max(32 / 2.0, 32 + 6.0))
        // the end probe names the shape exactly; the persistence claim
        // (io_credits) requires a MEASURED elevated end reading, and an
        // absent probe is recorded as unmeasured, never as credits
        if (io == "io_credits") assert(scanEnd.exists(_ > 0.21))
        else if (io == "io_unmeasured") assert(scanEnd.isEmpty)
        else { assert(io == "io_transient_start")
          assert(scanEnd.exists(_ <= 0.21)) }
      }
      // non-quiet canaries always veto the reclassification
      if (!quiet) assert(io.isEmpty)
      // a LOWER CPU calibration can never make a run MORE contended
      // (it only removes trips / enables the exculpation)
      cal.foreach { c0 =>
        val (c2, _, _) = Bench.contendedLabel(Some(c0 / 2), scan, ls, le,
          32, 32, scanEnd, quiet)
        assert(!c2 || c, s"lowering calibration $c0 flipped clean→contended")
      }
    }
  }

  test("probe bands load from a recorded idle-baseline artifact, constants as fallback") {
    // VERDICT r19 item 6: the 0.25/0.20/0.21 thresholds are THIS
    // container's measured idle bands — on other hardware a recorded
    // BANDS.json overrides them; missing/garbled files fall back whole,
    // never half-applied.
    assert(Bench.DefaultBands == Bench.Bands(0.25, 0.20, 0.21))
    assert(Bench.loadBands("/does/not/exist.json").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bands")
    def write(name: String, txt: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      p.toString
    }
    val good = write("good.json",
      """{"cpu_trip": 0.50, "cpu_quiet": 0.40, "scan_trip": 0.42,
        |"idle_calibration_sec": 0.31, "source": "BENCH_rX.json"}""".stripMargin)
    assert(Bench.loadBands(good).contains(Bench.Bands(0.50, 0.40, 0.42)))
    // garbled / partial / inconsistent (quiet > trip) → fallback
    assert(Bench.loadBands(write("junk.json", "not json")).isEmpty)
    assert(Bench.loadBands(write("partial.json",
      """{"cpu_trip": 0.5}""")).isEmpty)
    assert(Bench.loadBands(write("inverted.json",
      """{"cpu_trip": 0.3, "cpu_quiet": 0.4, "scan_trip": 0.4}""")).isEmpty)
    assert(Bench.loadBands(write("absurd.json",
      """{"cpu_trip": 500, "cpu_quiet": 0.4, "scan_trip": 0.4}""")).isEmpty)
    // the label actually decides WITH the loaded bands: a slower box's
    // recorded bands (scan idle ~0.35) keep its healthy 0.38 scan
    // reading clean where the builtin 0.21 would trip it…
    val slowBox = Bench.Bands(0.50, 0.40, 0.42)
    assert(Bench.contendedLabel(Some(0.30), Some(0.38), 1.0, 5.0, 32, 32,
      Some(0.36), canariesQuiet = true, bands = slowBox) == (false, "", ""))
    assert(Bench.contendedLabel(Some(0.30), Some(0.38), 1.0, 5.0, 32, 32,
      Some(0.36), canariesQuiet = true)._1)
    // …and a genuinely contended reading still trips against them
    assert(Bench.contendedLabel(Some(0.60), Some(0.50), 1.0, 5.0, 32, 32,
      Some(0.50), canariesQuiet = false, bands = slowBox) ==
      (true, "calibration|calibrationScan", ""))
  }

  test("Verify mode (no calibrations): load signals stand un-exculpated") {
    // Verify runs no calibration jobs — loadStart > 6 can't be talked
    // down by an idle CPU probe that was never measured (VERDICT r15
    // item 3: the old inline Verify rule, now routed through the one
    // shared function)
    def vlabel(start: Double, end: Double, cores: Int = 32, threads: Int = 4) = {
      val (c, by, _) = Bench.contendedLabel(None, None, start, end, cores,
        threads)
      (c, by)
    }
    assert(vlabel(1.0, 3.0) == (false, ""))
    val (c1, by1) = vlabel(6.9, 3.0)
    assert(c1 && by1 == "loadStart")
    // end threshold still scales with the configured width (ADVICE r14)
    val (c2, by2) = vlabel(1.0, 17.0, cores = 32, threads = 4)
    assert(c2 && by2 == "loadEnd")
    assert(vlabel(1.0, 9.0, cores = 32, threads = 4) == (false, ""))
  }
}
