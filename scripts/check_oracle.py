#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the oracle SQL in
DuckDB over the same testdata parquet tables, and compares values
exactly (columns sorted by name, rows compared as written).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
        ok = list(got.columns) == list(want.columns) and len(got) == len(want)
        detail = ""
        if ok:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) != str(b.dtype):
                    detail = f"col {c} dtype: spark={a.dtype} duck={b.dtype}"
                    ok = False
                    break
                try:
                    same = (a.values == b.values) | (a.isna().values & b.isna().values)
                except Exception:
                    same = a.astype(str).values == b.astype(str).values
                if not same.all():
                    idx = int((~same).argmax())
                    detail = f"col {c} row {idx}: spark={a.iloc[idx]!r} duck={b.iloc[idx]!r}"
                    ok = False
                    break
        else:
            detail = (f"shape/cols: spark {got.shape} {list(got.columns)} "
                      f"vs duck {want.shape} {list(want.columns)}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
