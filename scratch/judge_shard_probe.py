"""Judge probe (round 7): exercise the NEW partition-sharded
rewrite_manifests fold end-to-end — no test in tests/ covers it.

Checks:
 1. fold on a partitioned table produces Snapshot.shards (>2 shards:
    per-group + delete shard), manifest_file=None, commit round-trips;
 2. a reloaded table's full read equals pre-fold read;
 3. a scoped scan on one partition opens FEWER shard files than the
    total (delta_file_reads), with identical results to a full filter;
 4. MOR delete file lands in the never-skipped delete shard and masked
    rows stay masked after the fold, scoped or not;
 5. time travel to a pre-fold snapshot still works;
 6. remove_orphan_files does NOT delete live shard files.
"""
import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from demo_iceberg_permanent_delete_spark.lake.catalog import Catalog  # noqa: E402

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
wh = tempfile.mkdtemp(prefix="judge-shard-")
ok = True


def check(name, cond, detail=""):
    global ok
    print(("PASS " if cond else "FAIL ") + name + (f"  [{detail}]" if detail else ""))
    ok = ok and bool(cond)


try:
    cat = Catalog(spark, wh)
    cat.create_namespace("default")
    t = cat.create_table(
        "default.sharded",
        "id bigint, d date, v string",
        partition_by=["days(d)"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    # 4 commits, one partition-day each -> 4 distinct partition groups
    for c in range(4):
        rows = [(c * 100 + i, dt.date(2024, 1, c + 1), f"r{c}-{i}") for i in range(20)]
        t.insert(spark.createDataFrame(rows, "id long, d date, v string"))
    pre_fold_snapshot = t.metadata.current_snapshot_id
    t.delete("id = 105")  # MOR position delete in day 2024-01-02
    before = sorted(r["id"] for r in t.read().collect())
    check("pre-fold masked", 105 not in before and len(before) == 79)

    stats = t.rewrite_manifests()
    head = t.metadata.snapshot_by_id(t.metadata.current_snapshot_id)
    check("fold ran", stats["added_manifests_count"] >= 1, str(stats))
    check(
        "head sharded",
        head.shards is not None and head.manifest_file is None,
        f"shards={len(head.shards or [])}",
    )
    if head.shards:
        n_data_shards = sum(
            1 for sh in head.shards if (sh.get("bounds") or {}).get("data_only")
        )
        check("multiple data shards", n_data_shards >= 2, f"{n_data_shards} data-only")
        check(
            "delete shard present (data_only=False)",
            any(not (sh.get("bounds") or {}).get("data_only") for sh in head.shards),
        )
        check(
            "shard files on disk",
            all(os.path.exists(sh["manifest_file"]) for sh in head.shards),
        )

    # reload from disk — full read identical
    t2 = cat.load_table("default.sharded")
    after = sorted(r["id"] for r in t2.read().collect())
    check("post-fold full read identical", after == before)

    # scoped scan: one-day predicate must open fewer shard files
    t3 = cat.load_table("default.sharded")
    got = sorted(r["id"] for r in t3.scan("d = DATE '2024-01-03'").collect())
    want = sorted(i for i in before if 200 <= i < 300)
    check("scoped scan correct", got == want, f"{len(got)} rows")
    opened = t3.metadata.delta_file_reads
    total_shards = len(head.shards or [])
    check(
        "scoped scan skipped shards",
        0 < opened < total_shards + 1,
        f"opened {opened} of {total_shards} shards(+delete)",
    )

    # masked row stays masked under a scoped scan of ITS partition
    t4 = cat.load_table("default.sharded")
    got2 = sorted(r["id"] for r in t4.scan("d = DATE '2024-01-02'").collect())
    check("MOR mask survives scoped fold read", 105 not in got2 and len(got2) == 19)

    # time travel to pre-fold snapshot
    tt = sorted(r["id"] for r in t2.read(snapshot_id=pre_fold_snapshot).collect())
    check("time travel pre-fold", len(tt) == 80 and 105 in tt)

    # orphan cleanup must not remove live shard files
    from demo_iceberg_permanent_delete_spark.lake import maintenance

    res = maintenance.remove_orphan_files(
        t2, older_than=dt.datetime.now() + dt.timedelta(days=365 * 50),
        enforce_safety=False,
    )
    t5 = cat.load_table("default.sharded")
    final = sorted(r["id"] for r in t5.read().collect())
    check("full read survives orphan GC", final == before, f"GC removed {res}")

    # next commit parents on the sharded base; read still right
    t5.insert(
        spark.createDataFrame(
            [(900, dt.date(2024, 1, 9), "x")], "id long, d date, v string"
        )
    )
    t6 = cat.load_table("default.sharded")
    final2 = sorted(r["id"] for r in t6.read().collect())
    check("append after sharded fold", final2 == sorted(before + [900]))
finally:
    shutil.rmtree(wh, ignore_errors=True)

print("RESULT:", "ALL PASS" if ok else "FAILURES")
sys.exit(0 if ok else 1)
