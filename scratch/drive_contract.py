"""Driver simulation: import __spark_entry__ the way the external driver
does (repo root on path, vanilla SparkSession with none of our tuned confs),
run entry() at sf0.001, then every queries() entry at sf0.01 against its
oracle_sql() twin in DuckDB, comparing row count + column names +
order-insensitive values."""

import datetime as dt
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

spark = (
    SparkSession.builder.master("local[32]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- smoke: entry() ---
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# run twice: stable schema + same content
df2 = entrymod.entry(spark)
assert [f.name for f in df2.schema.fields] == [f.name for f in df.schema.fields]
assert sorted(map(str, df2.collect())) == sorted(map(str, rows))
print("entry() rerun: stable schema and values")

# --- correctness: queries vs oracles at sf0.01 ---
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for name in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")


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


qs = entrymod.queries()
oracles = entrymod.oracle_sql()
print(f"{len(qs)} queries declared, {len(oracles)} with oracles")
fails = []
for name in sorted(qs):
    sdf = qs[name](spark, SF)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        print(f"  ◦ {name}: rows-only, {len(srows)} rows")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    status = []
    if sorted(scols) != sorted(dcols):
        status.append(f"COLS spark={sorted(scols)} duck={sorted(dcols)}")
    elif len(srows) != len(drows):
        status.append(f"COUNT spark={len(srows)} duck={len(drows)}")
    else:
        s, d = canon(scols, srows), canon(dcols, drows)
        bad = [(a, b) for a, b in zip(s, d) if a != b]
        if bad:
            status.append(f"VALUES {len(bad)} mismatched rows; first: {bad[0]}")
    if status:
        fails.append((name, status))
        print(f"  ✗ {name}: {status}")
    else:
        print(f"  ✓ {name}: {len(srows)} rows hash-identical")

print("RESULT:", "FAIL" if fails else "ALL MATCH")
spark.stop()
sys.exit(1 if fails else 0)
