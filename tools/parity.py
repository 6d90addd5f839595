#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py /tmp/vout /root/testdata/sf0.01
Loads each <out>/<name> parquet (Spark result), runs the matching SQL
from oracle_sql.json in DuckDB over views named after the testdata
tables, and compares after sorting columns by name and rows by value.
Reports exact-match, near-match (fp tolerance), or mismatch.
"""
import sys, json, math
import duckdb
import pandas as pd

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
import os as _os
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    p = f'{sf}/{t}.parquet'
    # GenSf-produced tables are directories of part files
    src = f'{p}/*.parquet' if _os.path.isdir(p) else p
    con.execute(f"create view {t} as select * from '{src}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
        got = pd.read_parquet(f'{out}/{name}')
    except Exception as e:
        print(f'{name}: ERROR {e}')
        fails.append(name)
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f'{name}: COLS exp={list(exp.columns)} got={list(got.columns)}')
        fails.append(name); continue
    if len(exp) != len(got):
        print(f'{name}: ROWS exp={len(exp)} got={len(got)}')
        fails.append(name); continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ok = True; worst = 0.0; col_bad = None
    for c in exp.columns:
        e, g = exp[c], got[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            e = e.astype(float); g = g.astype(float)
            # NaN-mask mismatch is a real mismatch (NaN poisons the
            # relative-error comparison below into a silent pass).
            import numpy as np
            en, gn = np.isnan(e.values), np.isnan(g.values)
            if (en ^ gn).any():
                ok = False; col_bad = c; worst = float('nan')
                continue
            if not e.equals(g):
                diff = (e - g).abs()
                rel = diff / e.abs().clip(lower=1e-12)
                m = float(np.nanmax(rel.values)) if len(rel) else 0.0
                if m > worst: worst, col_bad = m, c
                if m > 1e-9: ok = False
        else:
            es = e.astype(str); gs = g.astype(str)
            if not es.equals(gs):
                ok = False; col_bad = c; worst = float('nan')
    if ok and worst == 0.0:
        print(f'{name}: EXACT ({len(exp)} rows)')
    elif ok:
        print(f'{name}: NEAR maxrel={worst:.2e} col={col_bad} ({len(exp)} rows)')
    else:
        print(f'{name}: MISMATCH col={col_bad} maxrel={worst}')
        fails.append(name)
import os
dirs = {d for d in os.listdir(out)
        if os.path.isdir(os.path.join(out, d))}
no_oracle = sorted(dirs - set(oracle))
no_result = sorted(set(oracle) - dirs)
print('---')
if no_oracle: print(f'spark results WITHOUT oracle entry: {no_oracle}')
if no_result: print(f'oracle entries WITHOUT spark result: {no_result}')
print(f'{len(oracle)-len(fails)}/{len(oracle)} pass; fails: {fails}')
