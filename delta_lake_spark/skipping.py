"""File-level data skipping from transaction-log statistics.

Every ``add`` action carries per-column min/max/nullCount harvested from
the parquet footer at write time (stats.py). For a conjunctive
predicate over simple comparisons, whole files whose [min, max] range
cannot satisfy the predicate are dropped from the scan BEFORE Spark
sees them (Delta Lake VLDB 2020 §3 data skipping; SURVEY.md §4). At
100 TB this is the difference between listing 10^6 files and scanning
the 10^2 whose ranges overlap the predicate — row-group stats inside
the parquet reader only help after a task was already scheduled.

Only a safe subset is interpreted: ``col op literal`` conjuncts joined
by AND, ops = < <= > >= = == IN. Anything unparseable keeps all files
(skipping is an optimization, never a correctness filter — the full
predicate still runs in Spark).
"""

from __future__ import annotations

import re
from typing import Any

from .log import AddFile

_CMP_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][\w]*)\s*(?P<op>==|=|<=|>=|<|>)\s*(?P<val>.+?)\s*$"
)
_IN_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][\w]*)\s+IN\s*\((?P<vals>[^)]+)\)\s*$", re.IGNORECASE
)
_NULL_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][\w]*)\s+IS\s+(?P<not>NOT\s+)?NULL\s*$", re.IGNORECASE
)


def _parse_literal(text: str) -> Any | None:
    text = text.strip()
    if (text.startswith("'") and text.endswith("'")) or (
        text.startswith('"') and text.endswith('"')
    ):
        return text[1:-1]
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        return None


def parse_conjuncts(predicate: str) -> list[tuple[str, str, Any]] | None:
    """Parse 'a = 1 AND b < 2.5 AND c IN (...)' into (col, op, value)
    triples; None if any conjunct is outside the safe subset."""
    out: list[tuple[str, str, Any]] = []
    for part in re.split(r"\s+AND\s+", predicate.strip(), flags=re.IGNORECASE):
        m = _NULL_RE.match(part)
        if m:
            out.append(
                (m.group("col"), "IS NOT NULL" if m.group("not") else "IS NULL", None)
            )
            continue
        m = _IN_RE.match(part)
        if m:
            vals = [_parse_literal(v) for v in m.group("vals").split(",")]
            if any(v is None for v in vals):
                return None
            out.append((m.group("col"), "IN", vals))
            continue
        m = _CMP_RE.match(part)
        if not m:
            return None
        val = _parse_literal(m.group("val"))
        if val is None:
            return None
        op = "=" if m.group("op") == "==" else m.group("op")
        out.append((m.group("col"), op, val))
    return out or None


def _comparable(stat_val: Any, literal: Any):
    """Align types so min/max from JSON stats compare against the
    literal; returns None when incomparable (=> cannot skip)."""
    if isinstance(literal, (int, float)) and isinstance(stat_val, (int, float)):
        return float(stat_val), float(literal)
    if isinstance(literal, str) and isinstance(stat_val, str):
        return stat_val, literal
    return None


def _pv_equals(literal: Any, pv: str) -> bool | None:
    """Whether a stored partition value (always a string — partitionValues
    are cast-to-string at write time) equals the predicate literal.
    Numeric literals compare NUMERICALLY: a double partition column
    stores "1.0" while the predicate `p = 1` has str(lit) == "1", so raw
    string equality would wrongly prune live files. None = unparseable
    partition value -> fail open (no pruning on this conjunct)."""
    if isinstance(literal, (int, float)):
        try:
            return float(pv) == float(literal)
        except ValueError:
            return None
    return str(literal) == pv


def file_may_match(add: AddFile, conjuncts: list[tuple[str, str, Any]]) -> bool:
    """False only when the file's stats PROVE no row can satisfy the
    predicate."""
    for col, op, lit in conjuncts:
        # exact partition-value match beats stats
        if col in add.partitionValues:
            pv = add.partitionValues[col]
            # a partition column has ONE value for every row in the file
            if op == "IS NULL" and pv is not None:
                return False
            if op == "IS NOT NULL" and pv is None:
                return False
            if op == "=" and pv is not None and _pv_equals(lit, pv) is False:
                return False
            if (
                op == "IN"
                and pv is not None
                and all(_pv_equals(v, pv) is False for v in lit)
            ):
                return False
        stats = add.stats or {}
        if op in ("IS NULL", "IS NOT NULL"):
            nc = (stats.get("nullCount") or {}).get(col)
            if nc is None:
                continue  # no null stats -> cannot skip
            if op == "IS NULL" and nc == 0:
                return False  # proven: no null rows in this file
            if (
                op == "IS NOT NULL"
                and add.numRecords is not None
                and nc == add.numRecords
            ):
                return False  # proven: every row is null
            continue
        mins = stats.get("minValues", {})
        maxs = stats.get("maxValues", {})
        if col not in mins or col not in maxs:
            continue
        if op == "IN":
            if all(
                (c := _comparable(mins[col], v)) is not None
                and (d := _comparable(maxs[col], v)) is not None
                and (c[1] < c[0] or d[1] > d[0])
                for v in lit
            ):
                return False
            continue
        cmp_min = _comparable(mins[col], lit)
        cmp_max = _comparable(maxs[col], lit)
        if cmp_min is None or cmp_max is None:
            continue
        mn, lit_v = cmp_min
        mx, _ = cmp_max
        if op == "=" and (lit_v < mn or lit_v > mx):
            return False
        if op in ("<", "<=") and (mn > lit_v or (op == "<" and mn == lit_v)):
            return False
        if op in (">", ">=") and (mx < lit_v or (op == ">" and mx == lit_v)):
            return False
    return True


def prune_adds(
    adds: list[AddFile],
    predicate: str | None,
    colmap: dict[str, str] | None = None,
) -> tuple[list[AddFile], int]:
    """Return (surviving adds, number skipped). Unparseable predicates
    skip nothing. ``colmap`` (logical -> physical, column mapping)
    translates predicate columns to the names file stats are keyed by."""
    if not predicate:
        return adds, 0
    conjuncts = parse_conjuncts(predicate)
    if conjuncts is None:
        return adds, 0
    if colmap:
        conjuncts = [(colmap.get(c, c), op, v) for c, op, v in conjuncts]
    kept = [a for a in adds if file_may_match(a, conjuncts)]
    return kept, len(adds) - len(kept)
