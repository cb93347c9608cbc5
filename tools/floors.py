#!/usr/bin/env python3
"""Re-derive Bench canary/timer floors from clean bench JSON lines.

The canary floors in src/main/scala/graft/Bench.scala are per-query
clean-run seconds; they go stale silently when a query's implementation
changes (ADVICE r16). This prints the two Scala map literals from the
MINIMUM across the given runs, so a refresh is one command:

    python3 tools/floors.py idle_run1.json [idle_run2.json ...]

Each input is a file containing the Bench full JSON line (the one with
the per-query "queries" object), e.g. captured via
`SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
 > run.log` — the script greps the line out of surrounding sbt noise.
Only feed it CLEAN runs (contended:false, calibration in the idle band,
box idle); floors from a contended run would mask future contention.
"""
import json
import re
import sys

CANARIES = [
    "q_dedup_apply", "q_dedup_ngram_jaccard", "q_dedup_semantic",
    "q_mempool_merge", "q_sink_hourly", "q_bpe_train6",
    "q_archive_compact", "q_dedup_incremental_sem", "q_stream_dedup_ttl",
    "q_rpc_enrich", "q_embed_kmeans", "q_sim_ann_ivf", "q_embed_pq",
]
TIMERS = ["merge_sec", "pairs_sec", "pq_sec", "coarse_sec"]


def bench_line(path):
    for line in open(path):
        line = line.strip()
        # sbt may prefix [info]; the full line is the one carrying the
        # per-query object
        m = re.search(r'\{"metric":"total".*"queries":\{.*\}$', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{path}: no full bench JSON line (with queries) found")


def main(paths):
    runs = [bench_line(p) for p in paths]
    for r, p in zip(runs, paths):
        if r.get("contended"):
            print(f"WARNING: {p} self-labeled contended_by="
                  f"{r.get('contended_by')!r} — floors from it would mask "
                  "contention; drop it", file=sys.stderr)
    def floor(key, from_queries):
        vals = [(r["queries"].get(key) if from_queries else r.get(key))
                for r in runs]
        vals = [v for v in vals if isinstance(v, (int, float)) and v >= 0]
        return min(vals) if vals else None
    def literal(names, from_queries):
        pairs = [(n, floor(n, from_queries)) for n in names]
        missing = [n for n, v in pairs if v is None]
        if missing:
            print(f"WARNING: no values for {missing}", file=sys.stderr)
        return ", ".join(f'"{n}" -> {v:.2f}' for n, v in pairs
                         if v is not None)
    print("  private[graft] val CanaryFloorSec: Map[String, Double] = Map(")
    print(f"    {literal(CANARIES, True)})")
    print()
    print("  private[graft] val TimerFloorSec: Map[String, Double] = Map(")
    print(f"    {literal(TIMERS, False)})")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
