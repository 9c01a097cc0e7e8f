"""Incremental manifests (VERDICT r1 scale fix #1): commit payload must be
O(delta), not O(table × snapshots). Pure metadata-level tests — no Spark.
"""

from __future__ import annotations

import json
import os

from demo_iceberg_permanent_delete_spark.lake.metadata import (
    ManifestEntry,
    TableMetadata,
)


def _entry(i: int, snap_hint: int = 0) -> ManifestEntry:
    return ManifestEntry(
        file_path=f"/w/data/f{snap_hint}-{i}.parquet",
        content=0,
        record_count=100,
        file_size_in_bytes=1000,
        min_values={"k": i * 100},
        max_values={"k": i * 100 + 99},
    )


def _meta(tmp_path) -> TableMetadata:
    loc = str(tmp_path / "t")
    os.makedirs(os.path.join(loc, "metadata"), exist_ok=True)
    return TableMetadata(
        name="default.t", location=loc, schema_ddl="k bigint", properties={}
    )


def test_commit_payload_is_o_delta_across_100_commits(tmp_path):
    meta = _meta(tmp_path)
    manifest: list[ManifestEntry] = []
    delta_sizes = []
    for commit_no in range(100):
        added = [_entry(i, commit_no) for i in range(10)]
        manifest = manifest + added
        snap = meta.add_snapshot("append", list(manifest))
        for e in added:
            e.added_snapshot_id = snap.snapshot_id
        meta.commit()
        delta_sizes.append(os.path.getsize(snap.manifest_file))

    # the table has 1000 files now, but the 100th delta is the same size
    # class as the 1st (10 added entries each) — O(delta), not O(table)
    assert len(manifest) == 1000
    assert delta_sizes[-1] < delta_sizes[0] * 3, (
        f"delta file grew with table size: first={delta_sizes[0]}B "
        f"last={delta_sizes[-1]}B"
    )

    # header file carries snapshot headers only: its per-snapshot cost is
    # bounded and independent of the 1000-entry file list. The bound is a
    # CONSTANT-per-snapshot guard, not a byte budget — the round-10
    # SnapshotSummary running totals (total-records/-data-files/
    # -delete-files/-files-size) added ~40 bytes/snapshot, nudging it
    # from ~960 past the old 1000; what must never happen is the header
    # scaling with the FILE count, which the margin below still catches.
    header = meta.metadata_file(meta.version)
    per_snapshot = os.path.getsize(header) / len(meta.snapshots)
    assert per_snapshot < 1200, f"{per_snapshot:.0f} bytes/snapshot header"
    with open(header) as fh:
        doc = json.load(fh)
    assert all("manifest" not in s for s in doc["snapshots"]), (
        "headers must not inline the file list"
    )


def test_reload_reconstructs_full_sets_from_deltas(tmp_path):
    meta = _meta(tmp_path)
    manifest: list[ManifestEntry] = []
    ids = []
    for commit_no in range(5):
        added = [_entry(i, commit_no) for i in range(3)]
        # also remove one old file per commit after the second
        manifest = (manifest[1:] if commit_no >= 2 else manifest) + added
        snap = meta.add_snapshot("append", list(manifest))
        meta.commit()
        ids.append((snap.snapshot_id, {e.file_path for e in manifest}))

    fresh = TableMetadata.load(meta.location)
    for sid, expected_paths in ids:
        got = fresh.snapshot_by_id(sid).file_paths()
        assert got == expected_paths, f"snapshot {sid} mismatch after reload"


def test_expire_materializes_base_for_survivors(tmp_path):
    meta = _meta(tmp_path)
    manifest: list[ManifestEntry] = []
    all_ids = []
    for commit_no in range(4):
        manifest = manifest + [_entry(i, commit_no) for i in range(2)]
        snap = meta.add_snapshot("append", list(manifest))
        meta.commit()
        all_ids.append(snap.snapshot_id)

    expected = {e.file_path for e in manifest}
    meta.remove_snapshots(set(all_ids[:3]))
    meta.commit()
    assert [s.snapshot_id for s in meta.snapshots] == [all_ids[-1]]

    fresh = TableMetadata.load(meta.location)
    assert fresh.snapshot_by_id(all_ids[-1]).file_paths() == expected
