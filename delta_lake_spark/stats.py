"""Per-file statistics from parquet footers (data-skipping support).

Reads row counts and column min/max from parquet metadata so ``add``
actions carry Delta-style file stats (VLDB 2020 paper §3 data skipping;
SURVEY.md §4 "data skipping / file stats"). Footer reads are O(#files)
metadata-only operations — no data pages are read. On a real cluster
you would collect these executor-side at write time; for the local-FS
deployment a driver-side footer sweep after staging is equivalent and
keeps the writer simple.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import pyarrow.parquet as pq


def _jsonable(v: Any) -> Any:
    """Convert a parquet stat value to something JSON-serializable, or
    None if the type isn't worth tracking (bytes, nested, etc.)."""
    if isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return None


def file_stats(path: str) -> tuple[int, dict[str, Any]]:
    """Return (num_records, stats_dict) for one parquet file.

    stats_dict = {"minValues": {col: v}, "maxValues": {col: v},
    "nullCount": {col: n}} covering top-level primitive columns that have
    footer statistics.
    """
    md = pq.ParquetFile(path).metadata
    num_rows = md.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested — skip
                continue
            try:
                st = col.statistics
                if st is None:
                    continue
                if st.has_null_count:
                    nulls[name] = nulls.get(name, 0) + st.null_count
                if not st.has_min_max:
                    continue
                mn, mx = _jsonable(st.min), _jsonable(st.max)
            except Exception:
                # pyarrow cannot materialize stats for some physical
                # types (e.g. fixed-len decimals) — skip, never fail:
                # missing stats only disable skipping for that column
                continue
            if mn is None or mx is None:
                continue
            if name not in mins or mn < mins[name]:
                mins[name] = mn
            if name not in maxs or mx > maxs[name]:
                maxs[name] = mx
    return num_rows, {"minValues": mins, "maxValues": maxs, "nullCount": nulls}
