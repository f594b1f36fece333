#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: check.py [SF_DIR] [VERIFY_OUT] [query ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata parquet,
sorts columns by name (the driver does), and compares row count, column
names, and values exactly. Dev-only tool — not part of the shipped library.
"""
import duckdb, sys, glob, json, math
import numpy as np
import pyarrow.parquet as pq

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def norm(df):
    import pandas as pd
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[ns]').astype('int64')
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    only = set(sys.argv[3:])
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        sql = oracle[name]
        files = glob.glob(f'{out}/{name}/*.parquet')
        if not files:
            print(f'{name:28s} FAIL no-spark-output'); n_fail += 1; continue
        sdf = pq.read_table(files[0]).to_pandas()
        try:
            ddf = con.execute(sql).fetch_df()
        except Exception as e:
            print(f'{name:28s} FAIL duckdb: {str(e)[:200]}'); n_fail += 1; continue
        sdf, ddf = norm(sdf), norm(ddf)
        if list(sdf.columns) != list(ddf.columns):
            print(f'{name:28s} FAIL cols spark={list(sdf.columns)} duck={list(ddf.columns)}')
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f'{name:28s} FAIL rows spark={len(sdf)} duck={len(ddf)}'); n_fail += 1; continue
        bad = []
        for c in sdf.columns:
            a, b = sdf[c].values, ddf[c].values
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype('float64'); bf = b.astype('float64')
                # bitwise compare: the driver hashes values, so -0.0 vs 0.0
                # (DuckDB round() keeps the sign of tiny negatives; Spark's
                # BigDecimal round does not) must count as a diff here too.
                neq = ~((af.view('int64') == bf.view('int64')) |
                        (np.isnan(af) & np.isnan(bf)))
            else:
                neq = np.array([x != y for x, y in zip(a, b)])
            if neq.any():
                i = int(np.argmax(neq))
                bad.append((c, int(neq.sum()), a[i], b[i], i))
        if bad:
            det = '; '.join(f'{c}: {n} diffs e.g. row {i} spark={x!r} duck={y!r}'
                            for c, n, x, y, i in bad[:3])
            print(f'{name:28s} FAIL values {det}'); n_fail += 1
        else:
            print(f'{name:28s} OK   rows={len(sdf)} dtypes_ok')
            n_ok += 1
    print(f'== {n_ok} ok, {n_fail} fail')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
