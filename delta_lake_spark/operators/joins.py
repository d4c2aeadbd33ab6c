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
    chunk: float | None = None,
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

    Skew guard (``chunk``): the default single window puts one KEY's
    whole timeline in one task — fatal when a hot key (one instrument,
    one tenant) holds a corpus-scale timeline. ``chunk`` = a time
    width in the timestamp's units (seconds for timestamp columns)
    switches to the built-in two-level device the curation operators
    standardized: (1) the running window partitions on (key,
    floor(ts/chunk)) so no task ever holds more than one chunk of one
    key; (2) per-(key, chunk) LAST-right summaries — one row per
    chunk, never per event — get each chunk's carry-in payload from a
    window over that tiny summary relation; (3) a join back on (key,
    chunk) coalesces the local match with the carry. Same-timestamp
    inclusivity is preserved exactly (equal ts land in the same
    chunk). Pick ``chunk`` ~ timeline-span / desired-tasks-per-key.
    Duplicate right timestamps within one (key, ts): the chunked
    summary elects the max-payload row (max_by on the payload struct),
    so give the right side unique (key, ts) rows — the same contract
    the single-window path's tie order implies.

    Returns left's columns plus [c + suffix for c in right_cols]
    (right_cols defaults to right's non-key, non-ts columns) plus
    right_ts + suffix (the matched timestamp; null when no match).
    """
    if chunk is not None and not chunk > 0:
        raise ValueError(
            f"asof_join chunk must be > 0, got {chunk!r}: a non-positive "
            "chunk makes floor(ts/chunk) non-monotonic in time, so the "
            "carry window would pull right payloads from FUTURE chunks"
        )
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

    out_cols = [
        *keys,
        *left_cols,
        *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
        F.col("__m.__ts").alias(right_ts + suffix),
    ]
    if chunk is None:
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
        return matched.select(*out_cols)

    # two-level skew-guarded path: (key, chunk)-bounded local window +
    # per-chunk carry from the summary relation
    chunk_col = F.floor(
        F.col("__evt_ts").cast("double") / F.lit(float(chunk))
    ).cast("long")
    staged = (
        tagged_l.unionByName(tagged_r).withColumn("__chunk", chunk_col)
    )
    w_local = (
        Window.partitionBy(*keys, "__chunk")
        .orderBy(F.col("__evt_ts").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn(
        "__m_local", F.last("__r", ignorenulls=True).over(w_local)
    ).filter(F.col("__is_l") == 1)
    # one summary row per (key, chunk) — EVERY populated chunk, not
    # just right-bearing ones (a left-only chunk still needs its
    # carry-in): its LAST right payload, elected by max_by whose
    # ordering is NULL for left rows (null orderings are ignored, so a
    # left-only chunk yields a null __last_r the carry window skips)
    summaries = staged.groupBy(*keys, "__chunk").agg(
        F.max_by(
            F.col("__r"),
            F.when(
                F.col("__is_l") == 0,
                F.struct(F.col("__evt_ts"), F.col("__r")),
            ),
        ).alias("__last_r")
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = summaries.withColumn(
        "__carry", F.last("__last_r", ignorenulls=True).over(w_carry)
    ).select(*keys, "__chunk", "__carry")
    matched = (
        local.join(carries, [*keys, "__chunk"], "left")
        .withColumn("__m", F.coalesce(F.col("__m_local"), F.col("__carry")))
    )
    return matched.select(*out_cols)


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
