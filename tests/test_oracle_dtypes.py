"""Oracle type-drift audit (VERDICT r1 item 6): for every registered
oracle, the DuckDB result column types must canonically match the Spark
query's schema. This is the class of failure behind round 1's two
CORRECTNESS misses — DuckDB's ``to_timestamp`` is TIMESTAMP WITH TIME ZONE
while Spark windows are plain TIMESTAMP, and DuckDB's windowed ``sum(int)``
is HUGEINT (int128 → float64 through pandas) while Spark's is BIGINT.
Values were equal; the hashes were not.

DuckDB side uses ``DESCRIBE`` (plan-only, no execution) so the audit is
cheap; the Spark side builds each DataFrame at sf0.001 and reads
``df.schema`` (streaming/lake queries execute their small fixtures).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from demo_iceberg_permanent_delete_spark.registry import all_oracles, all_queries

from .conftest import SF_SMOKE


def canon_duck(t: str) -> str:
    t = t.strip().upper()
    m = re.match(r"^(.*)\[\]$", t)
    if m:
        return f"list<{canon_duck(m.group(1))}>"
    m = re.match(r"^DECIMAL\((\d+),(\d+)\)$", t)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    m = re.match(r"^MAP\((.+),\s*(.+)\)$", t)
    if m:
        return f"map<{canon_duck(m.group(1))},{canon_duck(m.group(2))}>"
    if t.startswith("STRUCT"):
        return "struct"
    return {
        # Narrow int widths collapse to one class: values are identical
        # through the driver's fetch (Python ints), so i32-vs-i64 drift is
        # benign (round 1 verified: rank()/length() queries hash-matched).
        # HUGEINT stays distinct — pandas renders int128 as float64, which
        # DOES change the hashed values.
        "BIGINT": "int",
        "INTEGER": "int",
        "SMALLINT": "int",
        "TINYINT": "int",
        "UBIGINT": "u64",
        "HUGEINT": "i128",
        "DOUBLE": "f64",
        "FLOAT": "f32",
        "VARCHAR": "str",
        "BOOLEAN": "bool",
        "DATE": "date",
        # all naive timestamp precisions hash alike through the driver's
        # normalization; zoned timestamps do not
        "TIMESTAMP": "ts",
        "TIMESTAMP_NS": "ts",
        "TIMESTAMP_MS": "ts",
        "TIMESTAMP_S": "ts",
        "TIMESTAMP WITH TIME ZONE": "tstz",
        "INTERVAL": "interval",
    }.get(t, t.lower())


def canon_spark(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    return {
        T.LongType: "int",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.DoubleType: "f64",
        T.FloatType: "f32",
        T.StringType: "str",
        T.BooleanType: "bool",
        T.DateType: "date",
        T.TimestampType: "ts",
        T.TimestampNTZType: "ts",
        T.DayTimeIntervalType: "interval",
    }.get(type(dt), dt.simpleString())


_ORACLES = sorted(all_oracles())


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_dtypes_match_spark(name, spark, duck):
    queries = all_queries()
    oracle = all_oracles()[name]
    sdf = queries[name](spark, SF_SMOKE)
    spark_types = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}

    rows = duck.execute(f"DESCRIBE SELECT * FROM ({oracle}) __q").fetchall()
    duck_types = {r[0]: canon_duck(r[1]) for r in rows}

    assert set(spark_types) == set(duck_types), (
        f"{name}: column sets differ: spark={sorted(spark_types)} "
        f"duck={sorted(duck_types)}"
    )
    diffs = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not diffs, f"{name}: dtype drift (spark, duck): {diffs}"
