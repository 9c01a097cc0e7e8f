"""Check one registered query: oracle parity at sf0.01, then timed runs at
sf0.1 (bench-style, same session). Usage: python one_query.py NAME [N_TIMED]"""

import datetime as dt
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as em
from demo_iceberg_permanent_delete_spark.session import get_spark

name = sys.argv[1]
n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 3

# the TUNED session (same as bench.py) so timings here are comparable to
# BENCH_r*.json entries — a bare builder drops Arrow/AQE/timestamp confs
spark = get_spark(app_name="one-query")
spark.sparkContext.setLogLevel("ERROR")

qs, oracles = em.queries(), em.oracle_sql()

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "__NaN__"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


sdf = qs[name](spark, SF)
scols = list(sdf.columns)
srows = [tuple(r) for r in sdf.collect()]
if name in oracles:
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = (
        sorted(scols) == sorted(dcols)
        and len(srows) == len(drows)
        and canon(scols, srows) == canon(dcols, drows)
    )
    print(f"oracle parity: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
    if not ok:
        sys.exit(1)
else:
    print(f"rows-only: {len(srows)} rows")

SFB = "/root/testdata/sf0.1"
for i in range(n_timed):
    t0 = time.time()
    qs[name](spark, SFB).collect()
    print(f"sf0.1 run {i}: {time.time() - t0:.3f}s")
spark.stop()
