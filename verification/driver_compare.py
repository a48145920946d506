# Local replica of the driver's CORRECTNESS gate (dev tooling only; the
# shipped engine is Scala). Reads the parquet dumps written by
# `runMain graft.Verify <sfDir> <outDir>` plus its oracle_sql.json, runs each
# oracle in DuckDB over the same tables, and compares the way the driver
# does: sort columns by name, sort rows by all columns, then compare values.
import json, sys, math, glob, os
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return 'NULL'
    if isinstance(v, float):
        return '%.4f' % v
    return str(v)

def canon_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    cells = df.astype(object).where(pd.notnull(df), None)
    lines = sorted('|'.join(canon_cell(v) for v in row)
                   for row in cells.itertuples(index=False, name=None))
    return lines

npass = nfail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    pq = f'{out}/{name}'
    if not glob.glob(f'{pq}/*.parquet'):
        print(f'MISSING {name} (no spark output)'); nfail += 1; continue
    sdf = pd.read_parquet(pq)
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f'ORAERR  {name}: {str(e)[:160]}'); nfail += 1; continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f'SCHEMA  {name}: spark={scols} oracle={ocols}'); nfail += 1; continue
    if len(sdf) != len(odf):
        print(f'ROWS    {name}: spark={len(sdf)} oracle={len(odf)}'); nfail += 1; continue
    sl, ol = canon_df(sdf), canon_df(odf)
    if sl != ol:
        nfail += 1
        diffs = [(a, b) for a, b in zip(sl, ol) if a != b][:3]
        print(f'HASH    {name}: {len([1 for a,b in zip(sl,ol) if a!=b])} differing lines')
        for a, b in diffs:
            print(f'  spark : {a[:200]}')
            print(f'  oracle: {b[:200]}')
    else:
        npass += 1
        print(f'PASS    {name} rows={len(sdf)}')
print(f'== {npass} pass, {nfail} fail ==')
sys.exit(1 if nfail else 0)
