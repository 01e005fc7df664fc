#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOut>
For each query in <verifyOut>/oracle_sql.json: register sfDir tables as
views, run the oracle SQL, load the engine parquet, sort columns by
name, compare row counts, schemas (loosely), and values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, vout = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle error: {e}"))
        continue
    eng_path = os.path.join(vout, name)
    files = glob.glob(os.path.join(eng_path, "*.parquet"))
    if not files:
        bad.append((name, "no engine output"))
        continue
    edf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    odf = odf[sorted(odf.columns)]
    edf = edf[sorted(edf.columns)]
    if list(odf.columns) != list(edf.columns):
        bad.append((name, f"columns: oracle={list(odf.columns)} engine={list(edf.columns)}"))
        continue
    if len(odf) != len(edf):
        bad.append((name, f"rows: oracle={len(odf)} engine={len(edf)}"))
        continue
    diffs = []
    for c in odf.columns:
        o, e = odf[c], edf[c]
        if o.dtype.kind == 'f' or e.dtype.kind == 'f':
            o = o.astype(float); e = e.astype(float)
            # signbit check: the driver hash-compares BYTES, so
            # -0.0 vs +0.0 (numerically equal) must count as a diff
            sb = np.signbit(o.fillna(0).values) == np.signbit(e.fillna(0).values)
            neq = ~((o.isna() & e.isna()) | ((o == e) & sb))
        else:
            neq = ~((o.isna() & e.isna()) | (o.astype(str) == e.astype(str)))
        if neq.any():
            i = int(np.argmax(neq.values))
            diffs.append(f"{c}: {int(neq.sum())} diffs, first at row {i}: oracle={o.iloc[i]!r} engine={e.iloc[i]!r}")
    if diffs:
        bad.append((name, "; ".join(diffs)))
    else:
        ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
for n, msg in bad:
    print(f"FAIL {n}: {msg[:400]}")
sys.exit(1 if bad else 0)
