#!/usr/bin/env python3
"""Stamp BANDS.json — the probe-threshold idle baseline Bench reads.

The contended-label thresholds in src/main/scala/graft/Bench.scala
(cpu_trip 0.25 / cpu_quiet 0.20 / scan_trip 0.21) are THIS container's
measured idle bands; on different hardware they mislabel (VERDICT r19
item 6 — the same portability class as the prune-verify cutover
constant). This derives a BANDS.json from one or more CLEAN bench
artifacts (contended:false, zero canary families, box idle):

    python3 tools/bands.py clean_run1.json [clean_run2.json ...]

Derivation mirrors how the builtin constants sit over their idle bands:
the idle reading is the MINIMUM calibration across the given runs
(minima reject one run's residual warmth, the floors.py rule), then

    cpu_quiet = idle_cpu  * 1.35   (0.148 idle -> 0.20)
    cpu_trip  = idle_cpu  * 1.70   (0.148 idle -> 0.25)
    scan_trip = idle_scan * 1.30   (0.161 idle -> 0.21)

Bench falls back to the builtin constants when BANDS.json is missing or
garbled; SPARK_GRAFT_BANDS overrides the path.
"""
import json
import re
import sys


def bench_line(path):
    for line in open(path):
        m = re.search(r'\{"metric":"total".*\}', line.strip())
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{path}: no bench JSON line found")


def main(paths):
    if not paths:
        raise SystemExit(__doc__)
    runs = [bench_line(p) for p in paths]
    for p, r in zip(paths, runs):
        if r.get("contended") not in (False, "false"):
            raise SystemExit(f"{p}: contended run — only feed clean artifacts")
    idle_cpu = min(float(r["calibration_sec"]) for r in runs)
    idle_scan = min(float(r["calibration_scan_sec"]) for r in runs)
    bands = {
        "cpu_trip": round(idle_cpu * 1.70, 3),
        "cpu_quiet": round(idle_cpu * 1.35, 3),
        "scan_trip": round(idle_scan * 1.30, 3),
        "idle_calibration_sec": round(idle_cpu, 3),
        "idle_calibration_scan_sec": round(idle_scan, 3),
        "sources": paths,
    }
    json.dump(bands, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main(sys.argv[1:])
