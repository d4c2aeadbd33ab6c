"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (events -> versioned delta
table -> gold aggregate) at sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the
LLM-pipeline operators, checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from delta_lake_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest events into a versioned delta table, read it
    back, and compute the gold aggregate (the reference's
    delta_lake_rapid_start.py:185-198 pattern on our own table format)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from delta_lake_spark import read_delta, write_delta
    from delta_lake_spark.queries.relational import _events

    sf_dir = "/root/testdata/sf0.001"
    events = _events(spark, sf_dir)
    table = os.path.join(tempfile.gettempdir(), "dls_entry_gold")
    shutil.rmtree(table, ignore_errors=True)
    write_delta(events, table, mode="overwrite")
    gold = (
        read_delta(spark, table)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.max("value").alias("max_value"),
        )
    )
    return gold


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
