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

A WeakKeyDictionary keyed by SparkSession can never reclaim anything
here: the stored DataFrames strongly reference their session
(``df.sparkSession``), so the weak key stays strongly reachable through
its own values. Instead the registry keys by ``id(session)`` holding
the session strongly, and SWEEPS stopped sessions on every register
call — a stopped session's entries are unpersisted (best-effort) and
dropped, releasing both the DataFrames and the session object. A lock
makes concurrent registration safe.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# id(session) -> {"session": SparkSession, "groups": {group: [df, ...]}}
_REGISTRY: dict[int, dict] = {}
_LOCK = threading.Lock()


def _is_stopped(session) -> bool:
    try:
        return session._sc is None or session._sc._jsc is None
    except Exception:
        return True


def _sweep_stopped_locked() -> list[DataFrame]:
    """Drop registry entries whose session is stopped; caller holds the
    lock. Returns the dropped DataFrames for best-effort unpersist
    outside the lock (their JVM-side cache died with the session, so
    the unpersist is just hygiene against half-stopped states)."""
    dropped: list[DataFrame] = []
    for key in [k for k, v in _REGISTRY.items() if _is_stopped(v["session"])]:
        for entries in _REGISTRY.pop(key)["groups"].values():
            dropped.extend(entries)
    return dropped


def clear_session_caches(session=None) -> None:
    """Unpersist and drop every registered summary (one session's, or
    all sessions'). bench.py calls this between timed runs: Spark's
    CacheManager matches cached plans by logical-plan equality, so a
    repeat invocation of the same query would otherwise silently serve
    the previous run's persisted summaries and under-report the work."""
    with _LOCK:
        keys = [id(session)] if session is not None else list(_REGISTRY)
        slots = [_REGISTRY.pop(k) for k in keys if k in _REGISTRY]
    for slot in slots:
        for entries in slot["groups"].values():
            for df in entries:
                try:
                    df.unpersist()
                except Exception:
                    pass  # cache belonged to a since-stopped session


def register_persisted(
    df: DataFrame, group: str, capacity: int = 4
) -> DataFrame:
    """Track a persisted summary; unpersist the oldest entries beyond
    ``capacity`` live ones in this (session, group). Returns ``df``."""
    session = df.sparkSession
    with _LOCK:
        stale = _sweep_stopped_locked()
        slot = _REGISTRY.setdefault(
            id(session), {"session": session, "groups": {}}
        )
        entries = slot["groups"].setdefault(group, [])
        entries.append(df)
        evicted = entries[: max(0, len(entries) - capacity)]
        del entries[: len(evicted)]
    for old in stale + evicted:
        try:
            old.unpersist()
        except Exception:
            pass  # cache belonged to a since-stopped SparkSession
    return df
