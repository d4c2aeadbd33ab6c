"""Name -> path catalog with temp-view projection into Spark SQL.

Re-creates the reference's metastore usage (D1/D2/D5/D7, SURVEY.md
§2.2): ``CREATE TABLE ... USING DELTA LOCATION ...`` maps a name to a
table directory; queries against the name go through a temp view over
the CURRENT snapshot. Views are refreshed before each SQL dispatch so
reads always see the latest committed version (the reference's views
re-evaluate lazily through Delta's DataSourceV2; our snapshot
resolution happens at refresh time instead).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .errors import TableNotFoundError
from .reader import read_delta


class Catalog:
    """Session-scoped table registry; optionally persisted to a JSON file
    so the name->path mapping survives across sessions."""

    def __init__(self, spark: SparkSession, store_path: str | None = None):
        self.spark = spark
        self.store_path = store_path
        self._tables: dict[str, str] = {}
        if store_path and os.path.exists(store_path):
            with open(store_path, "r", encoding="utf-8") as fh:
                self._tables = json.load(fh)

    def _persist(self) -> None:
        if self.store_path:
            with open(self.store_path, "w", encoding="utf-8") as fh:
                json.dump(self._tables, fh, indent=2)

    def register(self, name: str, path: str) -> None:
        """CREATE TABLE name USING DELTA LOCATION path (reference D2)."""
        from .log import DeltaLog

        if not DeltaLog(path).exists():
            raise TableNotFoundError(f"{path} is not a delta_lake_spark table")
        self._tables[name] = os.path.abspath(path)
        self._persist()
        self.refresh(name)

    def unregister(self, name: str) -> None:
        """DROP TABLE IF EXISTS (reference D5)."""
        self._tables.pop(name, None)
        self.spark.catalog.dropTempView(name)
        self._persist()

    def path_of(self, name: str) -> str:
        if name not in self._tables:
            raise TableNotFoundError(f"table {name!r} is not registered")
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def refresh(self, name: str, version: int | None = None) -> DataFrame:
        """(Re)project the current — or a pinned — snapshot as a temp
        view named ``name``."""
        df = read_delta(self.spark, self.path_of(name), version=version)
        df.createOrReplaceTempView(name)
        return df

    def refresh_all(self) -> None:
        for name in self._tables:
            self.refresh(name)
