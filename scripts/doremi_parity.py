#!/usr/bin/env python3
"""Replay the d_doremi_weights oracle SQL in DuckDB over the
GenDoremiParity adversarial corpora and diff against the engine dump.

Usage: python3 scripts/doremi_parity.py <base>
  where <base> was the arg to `Test/runMain graft.tools.GenDoremiParity`.

Exit 0 iff every case matches exactly (same rows, NULLs included).
"""
import sys, glob, duckdb

base = sys.argv[1]
sql = open(f"{base}/oracle_sql.txt").read()

rc = 0
for case in ("mixed", "single"):
    con = duckdb.connect()
    doc = glob.glob(f"{base}/{case}/documents.parquet/*.parquet")
    eng = glob.glob(f"{base}/{case}/engine.parquet/*.parquet")
    assert doc and eng, f"missing parquet under {base}/{case}"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet({doc!r})")
    oracle = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    engine = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet({eng!r}) "
        "ORDER BY source").fetchall()
    key = lambda r: (r[0] is None, r[0])
    o, e = sorted(oracle, key=key), sorted(engine, key=key)
    if o == e:
        print(f"PASS {case} ({len(o)} rows)")
    else:
        rc = 1
        print(f"FAIL {case}:\n  oracle={o}\n  engine={e}")
sys.exit(rc)
