#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, sorts columns by name + rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

import numpy as np

def normcell(v):
    # Normalize BEFORE sorting so float jitter can't reorder rows (ADVICE r1).
    # Full-precision repr: the driver's gate hashes exact values, so the local
    # gate must too. Crucially this keeps the int/float distinction visible —
    # DuckDB integer sum() returns HUGEINT which pandas renders as float64
    # ("123.0" vs Spark's "123"), the root cause of the r2 hash mismatches;
    # oracles must CAST integer sums to BIGINT.
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f == 0.0:
            f = 0.0  # map -0.0 to 0.0
        return repr(f)
    return str(v)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.map(normcell) if hasattr(df, "map") else df.applymap(normcell)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            sdf = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ddf = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); fail += 1; continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}"); fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); fail += 1; continue
        # value compare: cells are already normalized strings (see canon)
        mism = 0
        for c in sdf.columns:
            a = sdf[c].tolist(); b = ddf[c].tolist()
            if a != b:
                mism += 1
                diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                print(f"  {name}.{c} diff sample: {diffs}")
        if mism:
            print(f"FAIL {name}: {mism} mismatching columns"); fail += 1
        else:
            print(f"OK   {name} ({len(sdf)} rows)"); ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
