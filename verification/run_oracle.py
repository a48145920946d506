# Recompute expected canonical hashes at sf0.01 by running the DuckDB side
# of every corpus query (local tooling only; the shipped engine is Scala).
#
# The canonical corpus lives in src/main/scala/graft/Corpus.scala; pass the
# oracle_sql.json dumped by `runMain graft.Verify <sf> <out>` as argv[2] to
# hash exactly what the engine declares (t2_corpus.py is the round-1
# snapshot, used as fallback).
import json, sys, duckdb
from t2_canon import canon_rows

if len(sys.argv) > 2:
    CORPUS = {k: {'duckdb': v} for k, v in json.load(open(sys.argv[2])).items()}
else:
    from t2_corpus import CORPUS

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")
out = {}
for name, spec in CORPUS.items():
    sql = spec.get('duckdb', spec.get('sql'))
    try:
        rows = con.execute(sql).fetchall()
        h, lines = canon_rows(rows)
        out[name] = {'hash': h, 'rows': len(rows)}
    except Exception as e:
        out[name] = {'hash': 'ERROR', 'rows': -1, 'err': str(e)[:200]}
        print('ERR', name, str(e)[:200])
json.dump(out, open('expected_hashes_sf0.01.json','w'), indent=1)
print('wrote', len(out), 'hashes')
