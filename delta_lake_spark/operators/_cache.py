"""Session-scoped bounded registry for operator-persisted summary
relations (BM25 per-doc summaries, token-budget narrow projections).

Operators persist a NARROW summary of the corpus because several plan
branches consume it and Catalyst's per-branch column pruning defeats
exchange reuse for such subtrees. The registry bounds how many of those
summaries stay cached per (session, group): entries beyond ``capacity``
are unpersisted OLDEST-FIRST. Evict-on-next-call (the previous scheme)
was wrong for lazy consumers — building two retrieval plans before
collecting either dropped the first plan's cache, so its consumer
branches silently re-scanned the corpus. A bounded LRU keeps the last
few summaries alive instead; callers that interleave more than
``capacity`` un-materialized plans should collect between calls.

Keyed by SparkSession through a WeakKeyDictionary so a stopped session
releases its entries; a lock makes concurrent registration on one
session safe.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame

_REGISTRY: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_LOCK = threading.Lock()


def register_persisted(
    df: DataFrame, group: str, capacity: int = 4
) -> DataFrame:
    """Track a persisted summary; unpersist the oldest entries beyond
    ``capacity`` live ones in this (session, group). Returns ``df``."""
    session = df.sparkSession
    with _LOCK:
        groups = _REGISTRY.setdefault(session, {})
        entries = groups.setdefault(group, [])
        entries.append(df)
        evicted = entries[: max(0, len(entries) - capacity)]
        del entries[: len(evicted)]
    for old in evicted:
        try:
            old.unpersist()
        except Exception:
            pass  # cache belonged to a since-stopped SparkSession
    return df
