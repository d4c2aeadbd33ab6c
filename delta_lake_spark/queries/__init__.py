"""Query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable with (where SQL-expressible) a
DuckDB oracle. Assembled from the relational surface, delta-mutation
round-trips, and the LLM-pipeline operators.

The submodule imports are deliberately HARD: an ImportError in any
registry module must fail this package loudly, not silently shrink
``QUERIES`` from ~164 entries to the relational ~28 (the driver's
correctness gate samples from whatever dict it gets — a smaller pool
would read as "all green" while most of the engine went dark)."""

from .delta_ops import ORACLE_SQL as _DELTA_ORACLE
from .delta_ops import QUERIES as _DELTA_QUERIES
from .llm import ORACLE_SQL as _LLM_ORACLE
from .llm import QUERIES as _LLM_QUERIES
from .relational import ORACLE_SQL as _REL_ORACLE
from .relational import QUERIES as _REL_QUERIES

QUERIES = {**_REL_QUERIES, **_LLM_QUERIES, **_DELTA_QUERIES}
ORACLE_SQL = {**_REL_ORACLE, **_LLM_ORACLE, **_DELTA_ORACLE}

# Backstop against a registry module losing entries without anyone
# noticing: the count only ever grows round-over-round.
_MIN_QUERIES = 218
if len(QUERIES) < _MIN_QUERIES:  # pragma: no cover - tripwire
    raise RuntimeError(
        f"query registry shrank: {len(QUERIES)} < {_MIN_QUERIES} — "
        "a registry submodule lost entries"
    )

__all__ = ["QUERIES", "ORACLE_SQL"]
