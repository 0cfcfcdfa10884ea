#!/usr/bin/env python3
"""Local dev mirror of the driver's t2 correctness check.

Runs DuckDB oracle SQL from outDir/oracle_sql.json against the testdata
parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name (like the driver), sorts rows, and compares values.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_vals(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return (a is None or (isinstance(a, float) and math.isnan(a))) and \
                   (b is None or (isinstance(b, float) and math.isnan(b)))
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    n_skipped = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        import os
        if not os.path.exists(f"{out_dir}/{name}"):
            # dev loop convenience: Verify was run on a subset of queries;
            # absent dumps are "not checked", not failures (the driver
            # always dumps the full registry, so it never hits this)
            n_skipped += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: duck={list(want.columns)} spark={list(got.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ: duck={len(want)} spark={len(got)}")
            n_bad += 1
            continue
        dt_mismatch = [(c, str(want[c].dtype), str(got[c].dtype))
                       for c in want.columns if str(want[c].dtype) != str(got[c].dtype)]
        bad_cells = []
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not cmp_vals(a, b):
                    bad_cells.append((c, i, a, b))
                    if len(bad_cells) > 3:
                        break
            if len(bad_cells) > 3:
                break
        if bad_cells:
            print(f"FAIL {name}: value mismatches {bad_cells[:3]}")
            n_bad += 1
        elif dt_mismatch:
            print(f"WARN {name}: rows/values ok but dtypes differ: {dt_mismatch}")
        else:
            print(f"OK   {name} ({len(want)} rows)")
    checked = len(oracle) - n_skipped
    skip_note = f" ({n_skipped} not dumped, skipped)" if n_skipped else ""
    print(f"\n{checked - n_bad}/{checked} queries match{skip_note}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
