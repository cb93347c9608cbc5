#!/usr/bin/env python3
"""Planted recall of a pair dump: the synthetic corpus plants one
near-dup pair per id decade (vec_b = vec_a + 9), so a day batch of N
vectors carries N/10 planted pairs. Usage: recall.py <pairsDir> <nPlanted>."""
import sys, glob, duckdb

pairs_dir, n_planted = sys.argv[1], int(sys.argv[2])
files = glob.glob(f"{pairs_dir}/*.parquet")
hit = duckdb.sql(
    # decade alignment (vec_a % 10 = 0) matches the planting scheme —
    # without it a coincidental same-component pair whose ids happen to
    # differ by 9 would count as a planted hit
    f"SELECT count(*) FROM read_parquet({files!r}) "
    f"WHERE vec_a = vec_b - 9 AND vec_a % 10 = 0"
).fetchone()[0]
print(f'{{"pairs_dir":"{pairs_dir}","planted_hit":{hit},'
      f'"planted":{n_planted},"recall":{hit / n_planted:.4f}}}')
