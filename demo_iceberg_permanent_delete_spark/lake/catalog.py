"""Filesystem catalog — stand-in for the reference's REST catalog
(docker-compose.yml:28-29, uri=http://rest:8181; table drop via REST DELETE
at notebooks/iceberg_pii_deletion_demo.py:67).

Layout::

    warehouse/
      catalog.json                      # {namespaces: [...], tables: {...}}
      <namespace>/<table>/metadata/v{N}.json
      <namespace>/<table>/data/*.parquet

Single-writer, local-FS. The catalog document is committed atomically
(temp + rename) like table metadata.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from demo_iceberg_permanent_delete_spark.lake.errors import NamespaceError, NoSuchTableError
from demo_iceberg_permanent_delete_spark.lake.metadata import TableMetadata
from demo_iceberg_permanent_delete_spark.lake.table import LakeTable


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._registry_path = os.path.join(warehouse, "catalog.json")
        if not os.path.exists(self._registry_path):
            self._write_registry({"namespaces": [], "tables": {}})

    # ----------------------------------------------------------- registry
    def _read_registry(self) -> dict:
        with open(self._registry_path) as fh:
            return json.load(fh)

    def _write_registry(self, reg: dict) -> None:
        tmp = self._registry_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(reg, fh, indent=1)
        os.replace(tmp, self._registry_path)

    # --------------------------------------------------------- namespaces
    def create_namespace(self, namespace: str, if_not_exists: bool = True) -> None:
        """CREATE NAMESPACE IF NOT EXISTS (reference: iceberg_pii_deletion_demo.py:71)."""
        reg = self._read_registry()
        if namespace in reg["namespaces"]:
            if if_not_exists:
                return
            raise NamespaceError(f"namespace {namespace!r} already exists")
        reg["namespaces"].append(namespace)
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)
        self._write_registry(reg)

    def list_namespaces(self) -> list[str]:
        return list(self._read_registry()["namespaces"])

    def drop_namespace(
        self,
        namespace: str,
        *,
        if_exists: bool = False,
        cascade: bool = False,
    ) -> dict[str, int]:
        """DROP NAMESPACE [IF EXISTS] ns [RESTRICT|CASCADE] — Spark's
        namespace DDL over the registry. RESTRICT (default) refuses a
        namespace that still holds tables or views, naming them; CASCADE
        drops the views and the tables first (non-purge, like Spark's
        CASCADE on external tables: data files linger as droppable
        orphans — DROP TABLE … PURGE each table first for a full
        erase)."""
        reg = self._read_registry()
        if namespace not in reg["namespaces"]:
            if if_exists:
                return {
                    "dropped_tables": 0,
                    "dropped_views": 0,
                    "dropped_namespaces": 0,
                }
            raise NamespaceError(f"namespace {namespace!r} not found")

        def under(n: str) -> bool:
            # the namespace itself or anything nested beneath it —
            # child NAMESPACES count too (review finding: a flat
            # rsplit-parent check let a populated child survive its
            # parent's drop, stranded under a nonexistent namespace)
            return n == namespace or n.startswith(namespace + ".")

        doomed_ns = [n for n in reg["namespaces"] if under(n)]
        tables = [n for n in reg["tables"] if under(n.rsplit(".", 1)[0])]
        views = [
            n for n in reg.get("views", {}) if under(n.rsplit(".", 1)[0])
        ]
        children = [n for n in doomed_ns if n != namespace]
        if (tables or views or children) and not cascade:
            raise NamespaceError(
                f"namespace {namespace!r} is not empty "
                f"(tables: {sorted(tables)}, views: {sorted(views)}, "
                f"child namespaces: {sorted(children)}); "
                "use CASCADE to drop its contents"
            )
        for v in views:
            self.drop_view(v)
        for t in tables:
            self.drop_table(t)
        reg = self._read_registry()  # re-read: the drops rewrote it
        reg["namespaces"] = [n for n in reg["namespaces"] if not under(n)]
        self._write_registry(reg)
        return {
            "dropped_tables": len(tables),
            "dropped_views": len(views),
            "dropped_namespaces": len(doomed_ns),
        }

    # ------------------------------------------------------------- tables
    def _qualify(self, name: str) -> tuple[str, str]:
        if "." not in name:
            raise NoSuchTableError(f"table name must be <namespace>.<table>, got {name!r}")
        ns, tbl = name.rsplit(".", 1)
        return ns, tbl

    def table_location(self, name: str) -> str:
        ns, tbl = self._qualify(name)
        return os.path.join(self.warehouse, ns, tbl)

    def _check_new_table_name(self, name: str, reg: dict) -> None:
        """Shared CREATE-path validation (create_table, CTAS, migrate,
        snapshot_table, register_table): namespace exists, no table OR
        VIEW already claims the name — a table created under a view's
        name would be silently shadowed at SELECT time (the facade
        expands views first), so the collision is rejected in BOTH
        directions (review finding)."""
        ns, _ = self._qualify(name)
        if ns not in reg["namespaces"]:
            raise NamespaceError(f"namespace {ns!r} does not exist")
        if name in reg["tables"]:
            raise NamespaceError(f"table {name!r} already exists")
        if name in reg.get("views", {}):
            raise NamespaceError(f"{name!r} is a view")

    def create_table(
        self,
        name: str,
        schema_ddl: str,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
        partition_by: list[str] | None = None,
    ) -> LakeTable:
        """CREATE TABLE … (reference DDL: iceberg_pii_deletion_demo.py:74-85)."""
        reg = self._read_registry()
        if name in reg["tables"] and if_not_exists:
            return self.load_table(name)
        self._check_new_table_name(name, reg)
        if partition_by:
            from demo_iceberg_permanent_delete_spark.lake.transforms import (
                parse_partition_by,
            )

            parse_partition_by(list(partition_by))  # fail fast on bad specs
        location = self.table_location(name)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        meta = TableMetadata(
            name=name,
            location=location,
            schema_ddl=schema_ddl,
            properties=dict(properties or {}),
            partition_by=list(partition_by or []),
        )
        meta.commit()
        reg["tables"][name] = {"location": location}
        self._write_registry(reg)
        return LakeTable(self.spark, meta)

    def migrate(
        self, name: str, source_dir: str, *, pattern: str = "*.parquet"
    ) -> LakeTable:
        """Iceberg's ``migrate`` procedure re-expressed for bare parquet
        directories: create a lake table whose schema is INFERRED from the
        files at ``source_dir`` and register those files in place via
        ``add_files`` (footer-only stats, zero copy, one append snapshot).
        The files become table-managed from that commit on — exactly
        add_files' documented ownership transfer."""
        df = self.spark.read.parquet(source_dir)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        t = self.create_table(name, ddl)
        try:
            t.add_files(source_dir, pattern=pattern)
        except Exception:
            # a failed registration must not leave an empty phantom table
            self.drop_table(name)
            raise
        return t

    # --------------------------------------------------------------- views
    def create_view(self, name: str, sql: str, replace: bool = False) -> None:
        """CREATE [OR REPLACE] VIEW — Iceberg's catalog views (view spec):
        the SQL text is stored in the catalog registry with a version
        history (REPLACE appends a version, Iceberg's view versioning);
        the facade expands references at query time."""
        from demo_iceberg_permanent_delete_spark.lake.metadata import now_ms

        ns, _ = self._qualify(name)
        reg = self._read_registry()
        if ns not in reg["namespaces"]:
            raise NamespaceError(f"namespace {ns!r} does not exist")
        if name in reg["tables"]:
            raise NamespaceError(f"{name!r} is a table")
        views = reg.setdefault("views", {})
        if name in views and not replace:
            raise NamespaceError(f"view {name!r} already exists")
        entry = views.get(name, {"versions": []})
        entry["versions"].append({"sql": sql, "created_at_ms": now_ms()})
        entry["sql"] = sql
        views[name] = entry
        self._write_registry(reg)

    def drop_view(self, name: str, if_exists: bool = True) -> None:
        reg = self._read_registry()
        views = reg.get("views", {})
        if name not in views:
            if if_exists:
                return
            raise NoSuchTableError(f"view {name!r} not found")
        views.pop(name)
        self._write_registry(reg)

    def list_views(self, namespace: str | None = None) -> list[str]:
        names = self._read_registry().get("views", {}).keys()
        if namespace is None:
            return sorted(names)
        return sorted(n for n in names if n.startswith(namespace + "."))

    def view_entry(self, name: str) -> dict | None:
        return self._read_registry().get("views", {}).get(name)

    def _view_or_raise(self, reg: dict, name: str) -> dict:
        views = reg.get("views", {})
        if name not in views:
            raise NoSuchTableError(f"view {name!r} not found")
        return views[name]

    def alter_view_sql(self, name: str, sql: str) -> None:
        """ALTER VIEW … AS — bump the view's version history (Iceberg view
        versioning: same append REPLACE performs, but the view must
        already exist)."""
        from demo_iceberg_permanent_delete_spark.lake.metadata import now_ms

        reg = self._read_registry()
        entry = self._view_or_raise(reg, name)
        entry["versions"].append({"sql": sql, "created_at_ms": now_ms()})
        entry["sql"] = sql
        self._write_registry(reg)

    def rename_view(self, old: str, new: str) -> None:
        """ALTER VIEW … RENAME TO — one registry move, same collision
        matrix as table renames (namespace exists, no table or view
        already claims the new name)."""
        reg = self._read_registry()
        self._view_or_raise(reg, old)
        self._check_new_table_name(new, reg)
        reg["views"][new] = reg["views"].pop(old)
        self._write_registry(reg)

    def set_view_properties(self, name: str, props: dict[str, str]) -> None:
        """ALTER VIEW … SET TBLPROPERTIES (Iceberg view spec carries a
        properties map beside the version history)."""
        reg = self._read_registry()
        entry = self._view_or_raise(reg, name)
        entry.setdefault("properties", {}).update(props)
        self._write_registry(reg)

    def unset_view_properties(self, name: str, keys: list[str]) -> None:
        reg = self._read_registry()
        entry = self._view_or_raise(reg, name)
        props = entry.setdefault("properties", {})
        for k in keys:
            props.pop(k, None)
        self._write_registry(reg)

    def snapshot_table(self, source_name: str, dest_name: str) -> LakeTable:
        """Iceberg's ``snapshot`` procedure: a zero-copy FORK of
        ``source_name`` — a new table whose single base snapshot
        references the source's current data/delete files in place (no
        bytes move). Commits to either table diverge independently.

        Like Iceberg, the fork sets ``gc.enabled=false``: its entries
        point into the SOURCE's data directory, so file-deleting
        maintenance (expire_snapshots, remove_orphan_files, DROP PURGE)
        is refused on the fork — it would destroy the source's files.
        Sequence-number and row-id counters carry over so equality-delete
        ordering and row lineage stay correct across the fork."""
        src = self.load_table(source_name).metadata
        reg = self._read_registry()
        self._check_new_table_name(dest_name, reg)
        location = self.table_location(dest_name)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        meta = TableMetadata(
            name=dest_name,
            location=location,
            schema_ddl=src.schema_ddl,
            properties={
                **src.properties,
                "gc.enabled": "false",
                # lets the source's DROP PURGE detect live forks
                "forked-from": src.location,
            },
            partition_by=list(src.partition_by),
            renames={k: list(v) for k, v in src.renames.items()},
            retired_columns=list(src.retired_columns),
            column_defaults={k: dict(v) for k, v in src.column_defaults.items()},
            write_defaults=dict(src.write_defaults),
            identifier_fields=list(src.identifier_fields),
            last_sequence_number=src.last_sequence_number,
            next_row_id=src.next_row_id,
        )
        cur = src.current_snapshot()
        entries = []
        if cur is not None:
            from demo_iceberg_permanent_delete_spark.lake.metadata import (
                ManifestEntry,
            )

            # deep copies preserving persisted sequence numbers and
            # first_row_id ranges (the ordering/lineage truth)
            entries = [ManifestEntry.from_json(e.to_json()) for e in cur.manifest]
        snap = meta.add_snapshot(
            "append",
            entries,
            summary={"snapshot-of": source_name, "added-files": len(entries)},
        )
        for e in entries:
            e.added_snapshot_id = snap.snapshot_id
        meta.commit()
        reg = self._read_registry()
        reg["tables"][dest_name] = {"location": location}
        self._write_registry(reg)
        return LakeTable(self.spark, meta)

    def register_table(self, name: str, location: str) -> LakeTable:
        """Iceberg's ``register_table`` procedure: attach an EXISTING
        table — its committed metadata at ``location`` — to this catalog
        under ``name``. Nothing is copied or rewritten; the registry just
        gains a pointer, so the table is instantly queryable (the
        migration companion to ``add_files``, which registers foreign
        FILES into an existing table). The metadata document keeps its
        original ``name`` field, like Iceberg, which renames only the
        catalog entry."""
        reg = self._read_registry()
        self._check_new_table_name(name, reg)
        # validates a committed metadata document exists at the location
        meta = TableMetadata.load(location)
        reg["tables"][name] = {"location": location}
        self._write_registry(reg)
        return LakeTable(self.spark, meta)

    def rename_table(self, old: str, new: str) -> None:
        """ALTER TABLE … RENAME TO — Iceberg renames only the CATALOG
        entry: the metadata document (and its internal ``name`` field)
        and every data/metadata file stay exactly where they are, so a
        rename is one registry write regardless of table size. The new
        name passes the same validation as CREATE (namespace exists, no
        table/view collision)."""
        reg = self._read_registry()
        if old not in reg["tables"]:
            raise NoSuchTableError(f"table {old!r} not found")
        self._check_new_table_name(new, reg)
        reg["tables"][new] = reg["tables"].pop(old)
        self._write_registry(reg)

    def load_table(self, name: str) -> LakeTable:
        reg = self._read_registry()
        if name not in reg["tables"]:
            raise NoSuchTableError(f"table {name!r} not found in catalog")
        return LakeTable(self.spark, TableMetadata.load(reg["tables"][name]["location"]))

    def table_exists(self, name: str) -> bool:
        return name in self._read_registry()["tables"]

    def list_tables(self, namespace: str | None = None) -> list[str]:
        names = self._read_registry()["tables"].keys()
        if namespace is None:
            return sorted(names)
        return sorted(n for n in names if n.startswith(namespace + "."))

    def drop_table(self, name: str, purge: bool = False, if_exists: bool = True) -> None:
        """DROP TABLE [IF EXISTS] (reference: iceberg_pii_deletion_demo.py:70;
        REST-DELETE drop at :67). ``purge`` removes the table directory —
        without it, files linger exactly like the reference's post-drop
        orphans."""
        reg = self._read_registry()
        if name not in reg["tables"]:
            if if_exists:
                return
            raise NoSuchTableError(f"table {name!r} not found")
        location = reg["tables"][name]["location"]
        if purge:
            # register_table twins: if ANOTHER catalog entry points at
            # the same location, purging destroys ITS data too (review
            # finding) — compared through realpath so a trailing slash,
            # relative spelling or symlink cannot evade the guard
            loc_real = os.path.realpath(location)
            twins = [
                n
                for n, e in reg["tables"].items()
                if n != name and os.path.realpath(e["location"]) == loc_real
            ]
            if twins:
                raise ValueError(
                    f"cannot purge {name!r}: location shared with "
                    f"{twins} (drop without PURGE)"
                )
            # snapshot_table forks reference files INSIDE this location;
            # purging the source would dangle every fork (review finding
            # — the reverse direction of the shared-files hazard). Forks
            # record their source ('forked-from'); a DROP PURGE is rare
            # and destructive enough to afford one metadata-head read
            # per registry entry.
            from demo_iceberg_permanent_delete_spark.lake.maintenance import (
                _check_gc_enabled,
            )
            from demo_iceberg_permanent_delete_spark.lake.metadata import (
                TableMetadata,
            )

            # Resolved TRANSITIVELY (round-9 advisor finding): a
            # fork-of-a-fork's entries still reference the ORIGINAL
            # table's files (snapshot_table is zero-copy all the way
            # down), but its 'forked-from' names the INTERMEDIATE fork —
            # which may itself have been dropped (without purge, so its
            # metadata document is still loadable and its own
            # 'forked-from' walkable). Visited-set capped, so a
            # hand-edited cycle terminates.
            for other, e in reg["tables"].items():
                if other == name:
                    continue
                loc = e["location"]
                seen: set[str] = set()
                while loc and os.path.realpath(loc) not in seen:
                    seen.add(os.path.realpath(loc))
                    try:
                        props = TableMetadata.load(loc).properties
                    except Exception:
                        break
                    src = props.get("forked-from", "")
                    if not src:
                        break
                    if os.path.realpath(src) == loc_real:
                        raise ValueError(
                            f"cannot purge {name!r}: {other!r} is a "
                            "zero-copy fork of it (drop without PURGE, "
                            "or drop the fork first)"
                        )
                    loc = src
            try:
                meta = TableMetadata.load(location)
            except Exception:
                meta = None
            if meta is not None:
                # Iceberg's gc.enabled=false rule — the helper's error
                # names the op and table
                _check_gc_enabled(meta, "DROP TABLE PURGE")
        reg["tables"].pop(name)
        self._write_registry(reg)
        if purge:
            shutil.rmtree(location, ignore_errors=True)
