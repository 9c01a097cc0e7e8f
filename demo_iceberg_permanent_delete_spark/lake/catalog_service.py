"""Control-plane seam: table-metadata HEAD management as a service
interface (round-5 verdict item 5).

The data plane — parquet data files and delta manifest JSONL — lives on
shared storage in every deployment. Only the HEAD pointer needs
transactional semantics: *atomically publish metadata version N* and
*what is the latest committed version*. That is exactly the job Iceberg
delegates to its catalog (HadoopTableOperations' rename CAS, or a
REST/Hive catalog's atomic swap — the reference's docker stack runs a
REST catalog for precisely this, docker-compose.yml). This module makes
the repo's equivalent a class swap:

- ``FileCatalogService`` (default): hard-link compare-and-swap plus an
  advisory ``version-hint.text`` — the single-filesystem implementation
  every other module has used since round 1, now behind the interface.
- ``InMemoryCatalogService``: a process-local fake with the identical
  contract — what a real catalog-service *client* would look like (one
  conditional PUT, one head read). The existing optimistic-concurrency
  tests run against both backends unchanged.

The contract is deliberately tiny (the whole point of the seam):

- ``claim_version(location, version, document)``: publish ``document``
  as metadata version ``version`` iff no other writer has claimed it;
  raise ``CommitConflictError`` otherwise. MUST be atomic.
- ``latest_version(location)``: highest committed version;
  ``FileNotFoundError`` when the table has none.
- ``read_document(location, version)``: the committed document text.
- ``doc_identity(location, version)``: opaque identity of the committed
  document (None = unknowable). OPTIONAL but load-bearing for caching: a
  backend without it runs correct-but-never-cached — the SQL facade's
  statement cache and the stream readers' poll cache reload on every
  statement/trigger.

Swap the active backend with ``set_service`` (e.g. an object-store
implementation backed by S3 conditional-PUT / DynamoDB, or a REST
catalog client); ``TableMetadata`` routes every head operation through
``get_service()`` and carries no storage assumptions of its own.
"""

from __future__ import annotations

import os
import threading
import uuid
from typing import Protocol


class CatalogService(Protocol):
    def claim_version(self, location: str, version: int, document: str) -> None:
        """Atomically publish ``document`` as version ``version`` of the
        table at ``location``; raise CommitConflictError if claimed."""
        ...

    def latest_version(self, location: str) -> int:
        """Highest committed version; FileNotFoundError when none."""
        ...

    def read_document(self, location: str, version: int) -> str:
        """The committed metadata document text for ``version``."""
        ...

    def doc_identity(self, location: str, version: int):
        """Opaque identity of the COMMITTED document at ``version`` —
        distinguishes a DROP + recreate that reaches the same version
        number from the original. None = unknowable (callers treat as
        never-matching). Comparable across calls only within one
        backend."""
        ...


def _meta_dir(location: str) -> str:
    return os.path.join(location, "metadata")


def _doc_path(location: str, version: int) -> str:
    return os.path.join(_meta_dir(location), f"v{version}.json")


def doc_identity(location: str, version: int):
    """Identity of a committed version document under the ACTIVE backend,
    or None when unknowable (callers must treat None as never-matching —
    reload). One scheme, one seam: the SQL facade's statement cache and
    the stream readers' poll cache both key on this (round-6 review
    findings — hand-rolled filesystem stats would both drift from the
    CAS layout and defeat or, worse, falsely satisfy the caches under a
    non-filesystem backend that shares a location with stale FS
    residue). Backends without the method degrade to never-cached."""
    fn = getattr(get_service(), "doc_identity", None)
    return fn(location, version) if fn is not None else None


class FileCatalogService:
    """Single-filesystem head management: hard-link CAS + version hint.

    The header lands via hard-link (compare-and-swap): linking the temp
    file to ``v{N}.json`` fails with EEXIST if any other writer claimed
    version N first — optimistic concurrency instead of the silent
    last-writer-wins an ``os.replace`` would give. ``version-hint.text``
    (Iceberg HadoopTableOperations' design) is written AFTER the CAS, so
    it can lag or go backwards under concurrency — readers treat it as a
    floor and probe forward, never as truth."""

    def claim_version(self, location: str, version: int, document: str) -> None:
        from demo_iceberg_permanent_delete_spark.lake.errors import (
            CommitConflictError,
        )

        meta_dir = _meta_dir(location)
        os.makedirs(meta_dir, exist_ok=True)
        path = _doc_path(location, version)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        try:
            with open(tmp, "w") as fh:
                fh.write(document)
        except OSError:
            # a failed write (disk full, fs error) must not leak the
            # partially-written temp until orphan GC finds it (ADVICE r6)
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        try:
            os.link(tmp, path)  # atomic claim of version N
        except FileExistsError:
            raise CommitConflictError(
                f"metadata version {path} was committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)
        # Advisory hint: lets readers find the head in O(1) instead of
        # listing a metadata dir that grows with every commit.
        hint_tmp = os.path.join(meta_dir, f".hint-tmp-{uuid.uuid4().hex}")
        try:
            with open(hint_tmp, "w") as fh:
                fh.write(str(version))
            os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
        except OSError:
            try:
                os.unlink(hint_tmp)
            except OSError:
                pass

    def latest_version(self, location: str) -> int:
        """Hint floor + probe-forward; one directory listing as the
        fallback (pre-hint tables, unreadable hint)."""
        meta_dir = _meta_dir(location)
        try:
            with open(os.path.join(meta_dir, "version-hint.text")) as fh:
                v = int(fh.read().strip())
            if v >= 1 and os.path.exists(_doc_path(location, v)):
                while os.path.exists(_doc_path(location, v + 1)):
                    v += 1
                return v
        except (OSError, ValueError):
            pass
        versions = [
            int(f[1:-5])
            for f in os.listdir(meta_dir)
            if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
        ]
        if not versions:
            raise FileNotFoundError(f"no metadata versions under {meta_dir}")
        return max(versions)

    def read_document(self, location: str, version: int) -> str:
        with open(_doc_path(location, version)) as fh:
            return fh.read()

    def doc_identity(self, location: str, version: int) -> tuple[int, int] | None:
        """(inode, mtime_ns) of the version document — a recreate cannot
        reproduce both, and the hard-link CAS never rewrites in place."""
        try:
            st = os.stat(_doc_path(location, version))
        except OSError:
            return None
        return (st.st_ino, st.st_mtime_ns)


class InMemoryCatalogService:
    """Process-local fake with the full contract — the shape of a real
    catalog-service client (conditional PUT + head read), used to prove
    the seam: the optimistic-concurrency tests pass against it unchanged.
    Knows nothing about directories, so a DROP PURGE of the table path
    does not forget its versions — call ``clear()`` between tests that
    reuse a location."""

    def __init__(self) -> None:
        self._docs: dict[str, dict[int, str]] = {}
        self._tokens: dict[tuple[str, int], str] = {}
        self._lock = threading.Lock()

    def claim_version(self, location: str, version: int, document: str) -> None:
        from demo_iceberg_permanent_delete_spark.lake.errors import (
            CommitConflictError,
        )

        with self._lock:
            table = self._docs.setdefault(location, {})
            if version in table:
                raise CommitConflictError(
                    f"metadata version v{version}.json of {location} was "
                    "committed by another writer"
                )
            table[version] = document
            # per-claim identity token: a clear() + re-claim of the same
            # version is a DIFFERENT table state and must not satisfy
            # identity-guarded caches
            self._tokens[(location, version)] = uuid.uuid4().hex

    def latest_version(self, location: str) -> int:
        with self._lock:
            versions = self._docs.get(location)
            if not versions:
                raise FileNotFoundError(
                    f"no metadata versions under {_meta_dir(location)}"
                )
            return max(versions)

    def read_document(self, location: str, version: int) -> str:
        with self._lock:
            try:
                return self._docs[location][version]
            except KeyError:
                raise FileNotFoundError(
                    f"{_doc_path(location, version)} not committed"
                ) from None

    def doc_identity(self, location: str, version: int) -> str | None:
        with self._lock:
            return self._tokens.get((location, version))

    def clear(self) -> None:
        with self._lock:
            self._docs.clear()
            self._tokens.clear()


_SERVICE: CatalogService = FileCatalogService()


def get_service() -> CatalogService:
    return _SERVICE


def set_service(service: CatalogService) -> CatalogService:
    """Swap the active control-plane backend; returns the previous one
    (so tests and embedders can restore it)."""
    global _SERVICE
    prev = _SERVICE
    _SERVICE = service
    return prev
