"""Scale-join strategies: the join shapes a 100 TB pipeline needs that
plain ``df.join`` doesn't give automatically.

  - ``salted_join``: skew-resistant large-x-small equi-join. AQE's skew
    handling only splits SORT-MERGE partitions after the fact; salting
    pre-splits a pathologically hot key across ``salt`` subpartitions so
    no single task ever owns the whole hot key. The small side is
    replicated ``salt`` times (it must be broadcast-scale).
  - ``write_bucketed`` / ``bucketed_join``: co-located joins via Spark
    bucketing — both tables hash-bucketed into the same number of
    buckets on the join key join WITHOUT a shuffle on either side
    (verified by plan test: no Exchange above the scans). This is the
    pre-partitioning strategy for repeated fact-to-fact joins at scale:
    pay the shuffle once at write time, never at query time.

Pure composition over public Spark APIs; no data passes through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key``, salting the big side.

    big rows get a random-but-deterministic salt in [0, salt); the small
    side is exploded once per salt value, so each (key, salt) bucket
    joins independently — a key holding 50% of the data becomes
    ``salt`` tasks instead of one straggler. Output columns = big's
    columns + small's non-key columns (same as a plain join on key).
    """
    big_salted = big.withColumn(
        "__salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salt).cast("int")
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join WITHOUT a nested-loop plan.

    A plain ``points.join(intervals, point BETWEEN start AND end)`` has
    no equi-key, so Spark plans BroadcastNestedLoopJoin — O(|P| x |I|)
    work and a broadcast of a whole side; at 100 TB that's the plan that
    never finishes. Bucketing restores an equi-key: each interval is
    exploded to the ``ceil(len/width) + 1`` buckets it overlaps, each
    point hashes to exactly one bucket, and the join runs as a standard
    shuffled hash/sort-merge equi-join on the bucket id with the range
    predicate as a cheap post-filter (the Databricks range-join-hint
    strategy, built from public primitives). A point matches an interval
    in exactly one bucket (its own), so no dedup pass is needed.

    Columns must be numeric (cast dates via ``F.datediff`` first); pick
    ``bucket_width`` ~ the typical interval length, so intervals explode
    to ~2 rows each.
    """
    p_b = F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    s_b = F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long")
    e_b = F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long")
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(s_b, e_b)))
    pt = points.withColumn("__bucket", p_b)
    out = pt.join(iv, "__bucket", how).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return out.drop("__bucket")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist df hash-bucketed on ``key`` as a managed table. The one
    shuffle (repartition to the bucket count) happens HERE; every later
    bucketed_join on the same key/bucket-count is shuffle-free."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale managed-table directory (e.g. from a previous session whose
    # in-memory catalog is gone) blocks saveAsTable; clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(
        __import__("os").path.join(warehouse, table_name.lower()), ignore_errors=True
    )

    writer = (
        df.repartition(num_buckets, key)
        .write.mode("overwrite")
        .bucketBy(num_buckets, key)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    spark.sql.sources.bucketing.enabled (default true) Catalyst sees the
    matching output partitioning and plans SortMergeJoin with NO
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
