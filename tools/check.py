#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against
the parquet tables in <sfDir>, loads the Spark result parquet from
<outDir>/<name>/, sorts columns by name and rows by all columns, and
compares values exactly (with a float diff report when exactness
fails). Dev tool only — the real gate is driver-side.

Usage: python3 tools/check.py <sfDir> <outDir> [only,names]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        return False
    try:
        import pandas as pd
        if a is pd.NaT or b is pd.NaT:
            return a is b
    except Exception:
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:  # comma-separated name subset (sf1 spot-checks)
        names = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in names}

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = canon(con.sql(sql).df())
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        bad = []
        for col in expect.columns:
            ev, gv = expect[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cmp_cell(b, a):
                    bad.append((col, i, a, b))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expect)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
