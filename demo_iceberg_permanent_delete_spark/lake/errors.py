"""Lake-layer exceptions.

The reference relies on errors as part of its contract: reading an expired
snapshot must raise (notebooks/iceberg_pii_deletion_demo.py:300-305,530-533),
and orphan cleanup with a far-future cutoff must be refused by the SQL
procedure path (:343-358) while the Action path bypasses the check
(notebooks/utils/cleanup_utils.py:49-67).
"""


class LakeError(Exception):
    pass


class NoSuchTableError(LakeError):
    pass


class NamespaceError(LakeError):
    pass


class SnapshotNotFoundError(LakeError):
    """Time travel to a snapshot that no longer exists (expired or unknown)."""


class UnsafeOperationError(LakeError):
    """Safety-window refusal, e.g. orphan cleanup with a future cutoff."""


class MergeCardinalityError(LakeError):
    """MERGE matched one target row to multiple source rows (the ANSI/Iceberg
    cardinality violation — the update would be nondeterministic)."""


class CommitConflictError(LakeError):
    """Another writer committed the metadata version this commit targeted
    (optimistic-concurrency CAS failure). Appends rebase and retry
    automatically; read-modify-write operations surface this so the caller
    can refresh and re-validate — Iceberg's conflict model."""
