# Build an sf1-EQUIVALENT performance-probe corpus (local tooling only; the
# shipped engine is Scala and correctness stays gated on the driver's
# read-only testdata). Replicates sf0.1 ten times with key offsets so every
# intra-replica join relationship is preserved and keys stay unique across
# replicas; dimension tables (region/nation) are fixed-size and copied once.
#
# Usage: python3 make_scale_probe.py [src=/root/testdata/sf0.1] [dst=/tmp/sfprobe] [copies=10]
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfprobe'
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000  # > any key in sf0.1

KEYS = {
    'region': [], 'nation': [],
    'customer': ['c_custkey'],
    'supplier': ['s_suppkey'],
    'part': ['p_partkey'],
    'orders': ['o_orderkey', 'o_custkey'],
    'lineitem': ['l_orderkey', 'l_partkey', 'l_suppkey'],
    'events': ['event_id', 'user_id'],
    'documents': ['doc_id'],
    'embeddings': ['vec_id'],
}

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for t, keys in KEYS.items():
    n = 1 if not keys else copies
    selects = []
    for i in range(n):
        cols = ', '.join(
            f'{k} + {i * OFF} as {k}' if k in keys else k
            for k in [r[0] for r in con.execute(
                f"describe select * from read_parquet('{src}/{t}.parquet')").fetchall()])
        selects.append(f"select {cols} from read_parquet('{src}/{t}.parquet')")
    sql = ' union all '.join(selects)
    con.execute(f"copy ({sql}) to '{dst}/{t}.parquet' (format parquet)")
    rows = con.execute(f"select count(*) from read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f'{t}: {rows} rows')
print('done:', dst)
