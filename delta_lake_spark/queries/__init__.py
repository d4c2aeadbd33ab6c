"""Query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable with (where SQL-expressible) a
DuckDB oracle. Assembled from the relational surface, delta-mutation
round-trips, and the LLM-pipeline operators."""

from .relational import ORACLE_SQL as _REL_ORACLE
from .relational import QUERIES as _REL_QUERIES

QUERIES = {**_REL_QUERIES}
ORACLE_SQL = {**_REL_ORACLE}

try:  # assembled incrementally as modules land
    from .llm import ORACLE_SQL as _LLM_ORACLE
    from .llm import QUERIES as _LLM_QUERIES

    QUERIES.update(_LLM_QUERIES)
    ORACLE_SQL.update(_LLM_ORACLE)
except ImportError:
    pass

try:
    from .delta_ops import ORACLE_SQL as _DELTA_ORACLE
    from .delta_ops import QUERIES as _DELTA_QUERIES

    QUERIES.update(_DELTA_QUERIES)
    ORACLE_SQL.update(_DELTA_ORACLE)
except ImportError:
    pass

__all__ = ["QUERIES", "ORACLE_SQL"]
