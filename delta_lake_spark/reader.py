"""Versioned table read path.

Covers (SURVEY.md §2.1): S4 delta scan by path, S5 via catalog, S6
time-travel scan (reference delta_lake_rapid_start.py:256-260). The
snapshot's explicit file list goes straight to Spark's vectorized
parquet reader with the table schema, so Catalyst still gets predicate
pushdown / column pruning / row-group skipping for free; the log only
decides WHICH files exist at the requested version.

Scale note: the plan carries an explicit file list, which is O(#files)
driver-side — the same cost profile as Delta's own snapshot resolution.
Row-group min/max skipping happens executor-side inside the parquet
reader; additionally ``partition_filter`` prunes whole files from the
log's partitionValues before Spark ever sees them (partition pruning,
SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .errors import DataFileLostError
from .log import DeltaLog, Snapshot
from .writer import schema_of


def live_files(table_path: str, snapshot: Snapshot) -> list[str]:
    return [os.path.join(table_path, p) for p in snapshot.files]


def _to_millis(ts: str | int) -> int:
    """Accept epoch millis or an ISO-ish timestamp string (local-naive
    treated as UTC, like our commit timestamps)."""
    if isinstance(ts, int):
        return ts
    from datetime import datetime, timezone

    s = str(ts).strip().replace("T", " ")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return int(
                datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).timestamp() * 1000
            )
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp {ts!r}")


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: str | int | None = None,
    partition_filter: dict[str, object] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Read a versioned table as a DataFrame.

    ``version`` pins a time-travel snapshot (``versionAsOf``); the file
    existence check makes post-VACUUM time travel fail loudly, matching
    the reference's expected-failure probe (05_compliance.py:346-354).
    ``partition_filter`` maps partition column -> exact value; files of
    other partitions are pruned from the scan entirely. ``predicate``
    (a conjunctive SQL string) additionally prunes files whose log
    min/max stats prove no row can match — data skipping; the caller
    still applies the real filter to the returned DataFrame.
    """
    from .skipping import prune_adds

    path = os.path.abspath(path)
    log = DeltaLog(path)
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = log.version_at_timestamp(_to_millis(timestamp))
    snap = log.snapshot(version)
    schema = schema_of(snap)

    adds = list(snap.files.values())
    if partition_filter:
        wanted = {k: (None if v is None else str(v)) for k, v in partition_filter.items()}
        adds = [
            a
            for a in adds
            if all(a.partitionValues.get(k) == v for k, v in wanted.items())
        ]
    adds, _skipped = prune_adds(adds, predicate)

    files = [os.path.join(path, a.path) for a in adds]
    if version is not None:
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise DataFileLostError(
                f"version {version} of {path} references {len(missing)} data "
                f"file(s) that no longer exist (vacuumed?): {missing[:3]}"
            )
    if not files:
        return spark.createDataFrame([], schema)

    reader = spark.read.schema(schema)
    if snap.metadata.configuration.get("layout") == "hive":
        # converted table: partition columns live in directory names only
        reader = reader.option("basePath", path)
    return reader.parquet(*files)
