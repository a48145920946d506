# Recompute expected canonical hashes at sf0.01 by running the DuckDB side
# of every corpus query (local tooling only; the shipped engine is Scala).
#
# The ONE source of truth is src/main/scala/graft/Corpus.scala: this script
# consumes only the oracle_sql.json generated from it by
# `runMain graft.Verify <sf> <out>` (argv[2]; defaults to the committed
# dump at verification/oracle_sql.json). t2_corpus.py is a round-1
# historical snapshot and is deliberately NOT read.
import json, os, sys, duckdb
from t2_canon import canon_rows

_default = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'oracle_sql.json')
_src = sys.argv[2] if len(sys.argv) > 2 else _default
CORPUS = {k: {'duckdb': v} for k, v in json.load(open(_src)).items()}

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
