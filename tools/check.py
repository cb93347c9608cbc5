#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against the DuckDB oracle (sorted columns, sorted rows).

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell repr → stable sort + exact compare
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pq.ParquetDataset(files).read().to_pandas())
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            neq = (got != exp).any(axis=1)
            idx = neq[neq].index[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ, e.g.:")
            for i in idx:
                print(f"  spark: {got.loc[i].to_dict()}")
                print(f"  duck : {exp.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries (no oracle): just confirm output exists
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle:
            files = glob.glob(os.path.join(full, "*.parquet"))
            nrows = pq.ParquetDataset(files).read().num_rows if files else 0
            status = "PASS" if nrows > 0 else "FAIL"
            print(f"{status} {d} (rows-only, {nrows} rows)")
            if nrows > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
