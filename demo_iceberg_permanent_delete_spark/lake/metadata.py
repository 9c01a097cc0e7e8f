"""Table metadata model: schema, properties, snapshots, manifests.

Stand-in for Iceberg's metadata.json + Avro manifest chain (the reference
reads these through metadata tables: notebooks/utils/file_summary_utils.py:
51-88 — manifest-lists/manifests as Avro, metadata log as JSON). We own the
format, so everything is one JSON document per version:

    warehouse/<ns>/<table>/metadata/v{N}.json

Each snapshot carries its *complete* manifest (every live file, data and
position-delete), which makes time travel and expire-reachability pure list
operations. Manifest entries carry per-file record counts, sizes, and
min/max column stats — the same stats Iceberg keeps, used for file-level
pruning at plan time (SURVEY.md §4: "record per-file min/max to emulate
Iceberg file-level pruning").

Commits are atomic: write ``v{N}.json.tmp`` then ``os.replace``. Single
writer assumed (documented limitation; the reference's REST catalog served
this role).

Scale note: a 100 TB table has ~800k 128-MiB files; one JSON manifest per
snapshot stays in the tens-of-MB range and is only touched on the driver.
Real deployments would shard manifests; the *reachability and pruning
algebra* here (set-of-files union/anti-join, stat-range filters) is the part
that transfers, and it is executed as Spark DataFrame ops wherever the input
can be large (see maintenance.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

# content codes, mirroring the Iceberg codes the reference decodes
# (file_summary_utils.py:143-148 and iceberg_pii_deletion_demo.py:204-216)
CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2  # (col=value) delete rows; read path anti-joins
# on the equality columns. The reference never *creates* these, but its
# display decode handles them (file_summary_utils.py:146) and its .files
# queries filter content IN (1,2) (iceberg_pii_deletion_demo.py:210,215,451).


def now_ms() -> int:
    return time.time_ns() // 1_000_000


def new_snapshot_id() -> int:
    return uuid.uuid4().int >> 75  # 53-bit positive id, JSON/long safe


@dataclass
class ManifestEntry:
    file_path: str  # absolute path, no scheme
    content: int  # 0 data / 1 position deletes / 2 equality deletes
    record_count: int
    file_size_in_bytes: int
    min_values: dict[str, Any] = field(default_factory=dict)
    max_values: dict[str, Any] = field(default_factory=dict)
    added_snapshot_id: int = 0
    # content=2 only: the columns whose equality defines the delete
    # (Iceberg's equality_ids, by name since we own the format)
    equality_columns: list[str] = field(default_factory=list)

    def to_json(self) -> dict[str, Any]:
        return {
            "file_path": self.file_path,
            "content": self.content,
            "record_count": self.record_count,
            "file_size_in_bytes": self.file_size_in_bytes,
            "min_values": self.min_values,
            "max_values": self.max_values,
            "added_snapshot_id": self.added_snapshot_id,
            "equality_columns": self.equality_columns,
        }

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> ManifestEntry:
        return cls(**d)


@dataclass
class Snapshot:
    snapshot_id: int
    committed_at_ms: int
    operation: str  # append / delete / overwrite / replace
    manifest: list[ManifestEntry]
    parent_id: int | None = None
    summary: dict[str, Any] = field(default_factory=dict)

    def data_files(self) -> list[ManifestEntry]:
        return [e for e in self.manifest if e.content == CONTENT_DATA]

    def delete_files(self) -> list[ManifestEntry]:
        return [e for e in self.manifest if e.content != CONTENT_DATA]

    def file_paths(self) -> set[str]:
        return {e.file_path for e in self.manifest}

    def to_json(self) -> dict[str, Any]:
        return {
            "snapshot_id": self.snapshot_id,
            "committed_at_ms": self.committed_at_ms,
            "operation": self.operation,
            "parent_id": self.parent_id,
            "summary": self.summary,
            "manifest": [e.to_json() for e in self.manifest],
        }

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> Snapshot:
        return cls(
            snapshot_id=d["snapshot_id"],
            committed_at_ms=d["committed_at_ms"],
            operation=d["operation"],
            parent_id=d.get("parent_id"),
            summary=d.get("summary", {}),
            manifest=[ManifestEntry.from_json(e) for e in d["manifest"]],
        )


@dataclass
class TableMetadata:
    name: str  # "<namespace>.<table>"
    location: str  # table root dir
    schema_ddl: str
    properties: dict[str, str]
    # PARTITIONED BY columns (identity transform). Inserts range-cluster on
    # these so manifest min/max stats give exact file-level partition
    # pruning (Iceberg's write.distribution-mode=range behavior).
    partition_by: list[str] = field(default_factory=list)
    snapshots: list[Snapshot] = field(default_factory=list)
    current_snapshot_id: int | None = None
    # [{"metadata_file": path, "timestamp_ms": int}] — mirrors
    # .metadata_log_entries (file_summary_utils.py:86-88)
    metadata_log: list[dict[str, Any]] = field(default_factory=list)
    version: int = 0

    # ------------------------------------------------------------------ io
    @property
    def metadata_dir(self) -> str:
        return os.path.join(self.location, "metadata")

    def metadata_file(self, version: int) -> str:
        return os.path.join(self.metadata_dir, f"v{version}.json")

    def to_json(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "location": self.location,
            "schema_ddl": self.schema_ddl,
            "properties": self.properties,
            "partition_by": self.partition_by,
            "current_snapshot_id": self.current_snapshot_id,
            "metadata_log": self.metadata_log,
            "version": self.version,
            "snapshots": [s.to_json() for s in self.snapshots],
        }

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> TableMetadata:
        return cls(
            name=d["name"],
            location=d["location"],
            schema_ddl=d["schema_ddl"],
            properties=dict(d["properties"]),
            partition_by=list(d.get("partition_by", [])),
            snapshots=[Snapshot.from_json(s) for s in d["snapshots"]],
            current_snapshot_id=d.get("current_snapshot_id"),
            metadata_log=list(d.get("metadata_log", [])),
            version=d.get("version", 0),
        )

    @classmethod
    def load(cls, location: str) -> TableMetadata:
        meta_dir = os.path.join(location, "metadata")
        versions = [
            int(f[1:-5])
            for f in os.listdir(meta_dir)
            if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
        ]
        if not versions:
            raise FileNotFoundError(f"no metadata versions under {meta_dir}")
        latest = max(versions)
        with open(os.path.join(meta_dir, f"v{latest}.json")) as fh:
            meta = cls.from_json(json.load(fh))
        meta.version = latest
        return meta

    def commit(self) -> str:
        """Atomically persist the next metadata version (temp + rename)."""
        self.version += 1
        os.makedirs(self.metadata_dir, exist_ok=True)
        path = self.metadata_file(self.version)
        self.metadata_log.append({"metadata_file": path, "timestamp_ms": now_ms()})
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(self.to_json(), fh, indent=1, default=str)
        os.replace(tmp, path)
        return path

    # ----------------------------------------------------------- snapshots
    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        from demo_iceberg_permanent_delete_spark.lake.errors import SnapshotNotFoundError

        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise SnapshotNotFoundError(
            f"snapshot {snapshot_id} not found for table {self.name} "
            f"(expired or never existed); time travel unavailable"
        )

    def add_snapshot(self, operation: str, manifest: list[ManifestEntry], summary=None) -> Snapshot:
        snap = Snapshot(
            snapshot_id=new_snapshot_id(),
            committed_at_ms=now_ms(),
            operation=operation,
            manifest=manifest,
            parent_id=self.current_snapshot_id,
            summary=summary or {},
        )
        self.snapshots.append(snap)
        self.current_snapshot_id = snap.snapshot_id
        return snap

    def all_referenced_files(self) -> set[str]:
        """Every file reachable from *any* retained snapshot."""
        out: set[str] = set()
        for s in self.snapshots:
            out |= s.file_paths()
        return out
