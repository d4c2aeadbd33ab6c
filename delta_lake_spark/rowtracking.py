"""Row tracking: stable per-row identifiers surfaced as ``_row_id`` /
``_row_commit_version`` metadata columns (Delta's rowTracking writer
feature, expressed with the same protocol state).

Protocol state (all in the transaction log — data files are untouched
by the common case):

  - every ``add`` carries ``baseRowId``: the fresh row id of row *i* of
    the file is ``baseRowId + i`` (*i* = parquet row position, which
    Spark exposes as ``_metadata.row_index`` — zero reader cost);
  - the table-wide id allocator is the ``rowIdHighWaterMark`` in the
    ``delta.rowTracking`` domain-metadata action; each commit that adds
    files advances it by the number of staged rows, so ranges are
    disjoint across commits and ids are never reused;
  - rewrites (OPTIMIZE / DELETE / UPDATE / MERGE / PURGE) preserve ids
    by MATERIALIZING them into hidden long columns ``__dls_row_id`` /
    ``__dls_rcv`` of the rewritten files; readers take
    ``coalesce(materialized, baseRowId + row_index)``, so a file is
    only ever read one way regardless of its history.

Scale notes: id assignment is log-only arithmetic on the driver
(O(#files staged), no data pass); the read path adds one broadcast
join against an O(#files) two-column map — no shuffle of the data
side. Deletion-vector deletes keep files byte-identical, so row ids
survive them with zero extra work. Rows deleted then VACUUMed never
donate their ids to new rows (the high-water mark only grows), which
is what makes ``_row_id`` a safe incremental-consumer cursor.

Reference parity: the reference's CDC/SCD notebooks key change capture
on business keys (delta_batch_etl includes/main/python/operations.py);
row tracking gives the same "which physical row is this" capability
without requiring a business key, matching Delta's own feature the
reference inherits via delta-spark.
"""

from __future__ import annotations

import json
from typing import Any

from .log import AddFile, DomainMetadata, Snapshot

# table property that turns the feature on (Delta's name)
ROW_TRACKING_CONF = "delta.enableRowTracking"
# domain-metadata domain holding {"rowIdHighWaterMark": N}
ROW_TRACKING_DOMAIN = "delta.rowTracking"
# hidden physical columns carrying materialized ids through rewrites
MAT_ROW_ID = "__dls_row_id"
MAT_ROW_COMMIT = "__dls_rcv"
# public metadata-column names
ROW_ID = "_row_id"
ROW_COMMIT = "_row_commit_version"

ROW_TRACKING_FEATURES = ("rowTracking", "domainMetadata")


def enabled(snapshot_or_conf: Snapshot | dict[str, str]) -> bool:
    conf = (
        snapshot_or_conf.metadata.configuration
        if isinstance(snapshot_or_conf, Snapshot)
        else snapshot_or_conf
    )
    return str(conf.get(ROW_TRACKING_CONF, "")).lower() == "true"


def high_water_mark(snapshot: Snapshot | None) -> int:
    """Highest row id ever assigned (-1 for a fresh table)."""
    if snapshot is None:
        return -1
    raw = snapshot.domains.get(ROW_TRACKING_DOMAIN)
    if not raw:
        return -1
    try:
        return int(json.loads(raw).get("rowIdHighWaterMark", -1))
    except (ValueError, TypeError):
        return -1


def materialize(df):
    """Rename the public ``_row_id``/``_row_commit_version`` columns to
    the hidden physical names ahead of a rewrite's stage_files call, so
    the rewritten parquet files carry the ids of the rows they keep."""
    return df.withColumnRenamed(ROW_ID, MAT_ROW_ID).withColumnRenamed(
        ROW_COMMIT, MAT_ROW_COMMIT
    )


def assign_fresh_ids(
    adds: list[AddFile], hwm: int, commit_version: int
) -> tuple[list[dict[str, Any]], int]:
    """Assign disjoint ``baseRowId`` ranges (in place) to staged adds and
    return ([domainMetadata action advancing the high-water mark], new
    hwm). Caller must re-run this per commit attempt: a lost commit race
    means the winner may have consumed the range."""
    cursor = hwm + 1
    for a in adds:
        a.baseRowId = cursor
        a.defaultRowCommitVersion = commit_version
        cursor += int(a.numRecords or 0)
    new_hwm = cursor - 1
    action = DomainMetadata(
        domain=ROW_TRACKING_DOMAIN,
        configuration=json.dumps(
            {"rowIdHighWaterMark": new_hwm}, separators=(",", ":")
        ),
    ).to_action()
    return [action], new_hwm
