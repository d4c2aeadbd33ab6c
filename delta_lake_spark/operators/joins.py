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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the single
    LATEST right row with right_ts <= left_ts within the same key — the
    time-series primitive (trades->quotes, events->latest state).

    A naive ``left.join(right, keys & (r.ts <= l.ts))`` is a theta join
    (BroadcastNestedLoopJoin at best) followed by a dedup — O(|L|x|R|)
    per key and two shuffles. This instead UNIONS the two sides tagged,
    sorts each key's timeline once (one shuffle on the key), and carries
    the last-seen right payload forward with a running
    last(..., ignorenulls) window. Right rows sort BEFORE left rows at
    equal timestamps, so the match is inclusive (right_ts == left_ts
    matches). Exactly |L| output rows — never a fanout, never a BNLJ.

    Returns left's columns plus [c + suffix for c in right_cols]
    (right_cols defaults to right's non-key, non-ts columns) plus
    right_ts + suffix (the matched timestamp; null when no match).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_cols],
    )
    payload_type = right.select(payload.alias("__r")).schema["__r"].dataType
    left_cols = [c for c in left.columns if c not in keys]
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__is_l"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        payload.alias("__r"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__evt_ts").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tagged_l.unionByName(tagged_r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_l") == 1)
    )
    return matched.select(
        *keys,
        *left_cols,
        *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
        F.col("__m.__ts").alias(right_ts + suffix),
    )


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
