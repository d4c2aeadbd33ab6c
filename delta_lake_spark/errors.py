"""Exception types for the delta_lake_spark table format layer.

Mirrors the failure modes the reference exercises as expected-failure
probes (SURVEY.md §5.1(4)):
  - schema-mismatch append must raise
    (reference: delta_lake_rapid_start.py:544-563)
  - low-retention vacuum must raise until safety flag disabled
    (reference: 05_compliance.py:295-304)
  - post-vacuum time travel must raise
    (reference: 05_compliance.py:346-354)
"""

from __future__ import annotations


class DeltaError(Exception):
    """Base class for all delta_lake_spark errors."""


class ConcurrentModificationError(DeltaError):
    """Another writer committed the same version first (optimistic
    concurrency conflict at the atomic create-if-absent commit)."""


class SchemaMismatchError(DeltaError):
    """Incoming write schema is incompatible with the table schema and
    mergeSchema was not enabled (schema enforcement, reference M10)."""


class VersionNotFoundError(DeltaError):
    """Requested time-travel version does not exist in the log."""


class DataFileLostError(DeltaError):
    """A data file referenced by the requested snapshot no longer exists
    (typically: time travel to a version whose files were VACUUMed)."""


class RetentionSafetyError(DeltaError):
    """vacuum() called with retention below the safety threshold while
    the retentionDurationCheck flag is enabled."""


class TableNotFoundError(DeltaError):
    """Path has no _delta_log directory (not a delta_lake_spark table)."""


class MergeAmbiguityError(DeltaError):
    """A target row matched multiple source rows under an update clause
    (Delta MERGE multiple-match semantics)."""


class ConstraintViolationError(DeltaError):
    """Incoming rows violate a table CHECK constraint (enforced at
    commit time, like Delta's delta.constraints.* table properties)."""


class AppendOnlyTableError(DeltaError):
    """Mutation attempted on a table with ``delta.appendOnly = true``:
    rows may only be added, never removed or changed (Delta's
    appendOnly writer feature). Layout-only operations (OPTIMIZE,
    PURGE) remain allowed — they move rows without changing content."""


class UnsupportedProtocolError(DeltaError):
    """The table's protocol action requires reader/writer versions or
    table features this engine does not implement (forward-compatibility
    gate: refuse loudly instead of corrupting or misreading)."""
