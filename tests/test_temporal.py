"""As-of join and bounded range join: semantics edge cases, equivalence with
a naive formulation, and the plan shapes the 100 TB design depends on."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.temporal import (
    RANGE_WINDOW_US,
    asof_join,
    range_agg_join,
    temporal_asof_range_join,
)
from demo_iceberg_permanent_delete_spark.plans import explain_str
from tests.conftest import SF_ORACLE


def ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts(0)),   # before any anchor -> NULL
            (2, 10, ts(5)),   # exactly at anchor a1 -> inclusive match
            (3, 10, ts(7)),   # between a1 and a2 -> a1
            (4, 10, ts(20)),  # after both -> latest (a2)
            (5, 99, ts(20)),  # key with no anchors -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 10, ts(5), 1.5), (102, 10, ts(9), 2.5)],
        "anchor_id long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts", right_time="ts",
        payload={"a_id": "anchor_id", "a_v": "v"},
    )
    got = {r["event_id"]: (r["a_id"], r["a_v"]) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (101, 1.5),
        3: (101, 1.5),
        4: (102, 2.5),
        5: (None, None),
    }


def test_asof_join_payload_columns_come_from_same_row(spark):
    # Two anchors at distinct times: the id and value carried must pair up.
    left = spark.createDataFrame([(1, 1, ts(30))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(201, 1, ts(10), 10.0), (202, 1, ts(20), 20.0)],
        "anchor_id long, user_id long, ts timestamp, v double",
    )
    row = asof_join(
        left, right, on="user_id", left_time="ts", right_time="ts",
        payload={"a_id": "anchor_id", "a_v": "v"},
    ).collect()[0]
    assert (row["a_id"], row["a_v"]) == (202, 20.0)


def test_range_agg_join_boundaries_and_bucket_crossing(spark):
    w = 600_000_000  # 10 min in µs
    # anchor at t=0; points at t=0 (excluded: strictly after), t=1 (in),
    # t=w (in: inclusive end), t=w+1 (out). The t=w point lands in the NEXT
    # bucket — covered only via the anchor's exploded second bucket id.
    anchors = spark.createDataFrame([(1, 7, 0)], "a_id long, k long, a_us long")
    points = spark.createDataFrame(
        [(7, 0, 1.0), (7, 1, 2.0), (7, w, 4.0), (7, w + 1, 8.0)],
        "k long, p_us long, v double",
    )
    out = range_agg_join(
        anchors, points, on="k", anchor_time_us="a_us", point_time_us="p_us",
        window_us=w, aggs={"n": F.count("v"), "s": F.sum("v")},
    ).collect()[0]
    assert (out["n"], out["s"]) == (2, 6.0)


def test_range_agg_join_unmatched_anchor_keeps_left_semantics(spark):
    anchors = spark.createDataFrame([(1, 7, 0), (2, 8, 0)], "a_id long, k long, a_us long")
    points = spark.createDataFrame([(7, 50, 1.0)], "k long, p_us long, v double")
    got = {
        r["a_id"]: (r["n"], r["s"])
        for r in range_agg_join(
            anchors, points, on="k", anchor_time_us="a_us", point_time_us="p_us",
            window_us=600, aggs={"n": F.count("v"), "s": F.sum("v")},
        ).collect()
    }
    assert got == {1: (1, 1.0), 2: (0, None)}


def test_range_agg_join_matches_naive_inequality_join(spark):
    # Seeded pseudo-random micro-corpus, verified against the O(n·m) plan.
    anchors = spark.range(40).select(
        F.col("id").alias("a_id"),
        (F.col("id") % 5).alias("k"),
        ((F.col("id") * 7919) % 3000).alias("a_us"),
    )
    points = spark.range(300).select(
        (F.col("id") % 5).alias("k"),
        ((F.col("id") * 104729) % 3000).alias("p_us"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    w = 500
    fast = range_agg_join(
        anchors, points, on="k", anchor_time_us="a_us", point_time_us="p_us",
        window_us=w, aggs={"n": F.count("v"), "s": F.sum("v")},
    )
    naive = (
        anchors.join(
            points.withColumnRenamed("k", "pk"),
            (F.col("k") == F.col("pk"))
            & (F.col("p_us") > F.col("a_us"))
            & (F.col("p_us") <= F.col("a_us") + w),
            "left",
        )
        .groupBy("a_id", "k", "a_us")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_asof_plan_has_no_join_operator(spark):
    left = spark.range(10).select(
        F.col("id").alias("event_id"), (F.col("id") % 3).alias("user_id"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    right = spark.range(10).select(
        F.col("id").alias("anchor_id"), (F.col("id") % 3).alias("user_id"),
        F.col("id").cast("timestamp").alias("ts"), F.col("id").cast("double").alias("v"),
    )
    plan = explain_str(
        asof_join(left, right, on="user_id", left_time="ts", right_time="ts",
                  payload={"a_id": "anchor_id"})
    )
    # union + running last: a window over one exchange, no join at all
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_range_plan_is_equi_join_not_nested_loop(spark):
    df = temporal_asof_range_join(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_driver_query_matches_oracle_sample(spark, duck):
    from demo_iceberg_permanent_delete_spark.registry import all_oracles

    sp = temporal_asof_range_join(spark, SF_ORACLE).toPandas()
    oc = duck.execute(all_oracles()["temporal_asof_range_join"]).df()
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    oc = oc[cols].sort_values(cols).reset_index(drop=True)
    assert sp.equals(oc)


def test_resample_ffill_unit(spark):
    from demo_iceberg_permanent_delete_spark.operators.temporal import resample_ffill

    H = 3600 * 1_000_000
    rows = [
        # key 1: observations in hours 0, 3 (gap at 1-2)
        (1, 0 * H + 5, 10, 1.5),
        (1, 0 * H + 9, 11, 2.5),  # later in same bucket -> carries forward
        (1, 3 * H + 1, 12, 9.0),
        # key 2: single observation
        (2, 7 * H, 20, 4.0),
    ]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, v double")
    got = {
        (r["k"], r["bucket"]): (r["n"], r["val"])
        for r in resample_ffill(
            df, key="k", time_us_col="t_us", id_col="id", value_col="v"
        ).collect()
    }
    assert got == {
        (1, 0): (2, 2.5),
        (1, 1): (0, 2.5),  # gap forward-filled
        (1, 2): (0, 2.5),
        (1, 3): (1, 9.0),
        (2, 7): (1, 4.0),
    }


def test_asof_join_property_vs_duckdb(spark):
    """Randomized ground-truth check: for random key/time layouts —
    including time ties between and within sides, keys with no right rows,
    and empty sides — asof_join must agree row-for-row with DuckDB's
    native ASOF LEFT JOIN on the same data (right side deduped per
    (key, time), as the operator contract requires)."""
    import random

    import duckdb

    from demo_iceberg_permanent_delete_spark.operators.temporal import asof_join

    for seed in range(8):
        rnd = random.Random(seed)
        keys = [1, 2, 3]
        left = [
            (i, rnd.choice(keys), rnd.randint(0, 20))
            for i in range(rnd.randint(0, 25))
        ]
        best = {}
        for i in range(rnd.randint(0, 15)):
            rid, k, t = 100 + i, rnd.choice(keys), rnd.randint(0, 20)
            v = round(rnd.uniform(0, 10), 3)
            cur = best.get((k, t))
            if cur is None or rid > cur[0]:
                best[(k, t)] = (rid, v)
        right = [(rid, k, t, v) for (k, t), (rid, v) in best.items()]

        ldf = spark.createDataFrame(left, "lid long, k long, t long")
        rdf = spark.createDataFrame(right, "rid long, k long, t long, v double")
        got = sorted(
            (r["lid"], r["rid_out"], r["v_out"])
            for r in asof_join(
                ldf, rdf, on="k", left_time="t", right_time="t",
                payload={"rid_out": "rid", "v_out": "v"},
            ).collect()
        )

        con = duckdb.connect()
        con.execute("CREATE TABLE L(lid BIGINT, k BIGINT, t BIGINT)")
        con.execute("CREATE TABLE R(rid BIGINT, k BIGINT, t BIGINT, v DOUBLE)")
        if left:
            con.executemany("INSERT INTO L VALUES (?, ?, ?)", left)
        if right:
            con.executemany("INSERT INTO R VALUES (?, ?, ?, ?)", right)
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT l.lid, r.rid, r.v FROM L l "
                "ASOF LEFT JOIN R r ON l.k = r.k AND l.t >= r.t"
            ).fetchall()
        )
        assert got == want, f"seed {seed}: {got[:5]} != {want[:5]}"


def test_range_agg_join_property_vs_duckdb(spark):
    """Randomized ground-truth check for the bucketed range join: counts
    and sums per anchor must equal a direct DuckDB inequality join for
    random layouts — boundary ties (point exactly at anchor_t and at
    anchor_t + window), multiple anchors per key, keys with no points."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from demo_iceberg_permanent_delete_spark.operators.temporal import range_agg_join

    W = 10
    for seed in range(8):
        rnd = random.Random(1000 + seed)
        anchors = [
            (i, rnd.choice([1, 2, 3]), rnd.randint(0, 40))
            for i in range(rnd.randint(1, 12))
        ]
        points = [
            (100 + i, rnd.choice([1, 2, 3]), rnd.choice([0, 5, 10, 15, 20, 25, 30, 40, 50]))
            for i in range(rnd.randint(0, 30))
        ]
        adf = spark.createDataFrame(anchors, "aid long, k long, t long")
        pdf = spark.createDataFrame(points, "pid long, k long, t long")
        got = sorted(
            (r["aid"], r["n"], r["psum"])
            for r in range_agg_join(
                adf,
                pdf.select("k", F.col("t").alias("pt"), "pid"),
                on="k",
                anchor_time_us="t",
                point_time_us="pt",
                window_us=W,
                aggs={"n": F.count("pid"), "psum": F.sum("pid")},
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE A(aid BIGINT, k BIGINT, t BIGINT)")
        con.execute("CREATE TABLE P(pid BIGINT, k BIGINT, t BIGINT)")
        con.executemany("INSERT INTO A VALUES (?, ?, ?)", anchors)
        if points:
            con.executemany("INSERT INTO P VALUES (?, ?, ?)", points)
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""SELECT a.aid, count(p.pid), sum(p.pid)
                    FROM A a LEFT JOIN P p
                      ON p.k = a.k AND p.t > a.t AND p.t <= a.t + {W}
                    GROUP BY a.aid"""
            ).fetchall()
        )
        assert got == want, f"seed {seed}"
