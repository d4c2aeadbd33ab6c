"""Corpus-statistics operators: distribution summaries a curation
pipeline uses to shape batches (length histograms, per-bucket counts).

Map-only bucketing + one hash aggregation — the shuffle carries
|buckets| rows per partition after map-side partials, so cost is
independent of corpus size beyond the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi): bucket i
    covers [lo + i*w, lo + (i+1)*w). Values below lo clamp into bucket
    0, at-or-above hi into bucket n_buckets-1 (standard edge handling
    so the histogram always accounts for every non-null row).

    Returns: bucket (long), lo (double), hi (double), n (long) — only
    non-empty buckets.
    """
    if n_buckets <= 0 or not hi > lo:
        raise ValueError("need n_buckets > 0 and hi > lo")
    w = (hi - lo) / n_buckets
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w))
    bucket = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)
    ).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("hi"),
            "n",
        )
    )


def length_bucket_stats(
    df: DataFrame,
    text_col: str,
    bucket_sizes: tuple[int, ...] = (64, 128, 256, 512, 1024),
) -> DataFrame:
    """Sequence-length bucketing for training-batch planning: assign
    each document to the SMALLEST bucket holding its whitespace token
    count (overflow docs land in a sentinel -1 bucket for truncation
    or splitting), and report per-bucket volume and padding waste —
    the numbers that decide a padded-batch schedule's efficiency.

    Map-only bucketing (one CASE over sorted bucket edges) + a single
    aggregation: nothing here shuffles more than |buckets| result rows
    after the map-side partial agg, so it runs at any corpus size.

    Returns per bucket: bucket (int, -1 = overflow), n_docs,
    total_tokens, padded_tokens (n_docs * bucket for real buckets),
    pad_waste_pct (double, rounded 4)."""
    sizes = sorted(bucket_sizes)
    tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bucket = F.lit(-1)
    for b in reversed(sizes):
        bucket = F.when(tokens <= b, F.lit(b)).otherwise(bucket)
    agg = (
        df.select(bucket.alias("bucket"), tokens.alias("__t"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__t").alias("total_tokens"),
        )
    )
    padded = F.when(
        F.col("bucket") > 0, F.col("bucket") * F.col("n_docs")
    ).otherwise(F.col("total_tokens"))
    return agg.select(
        "bucket",
        "n_docs",
        "total_tokens",
        padded.cast("long").alias("padded_tokens"),
        F.round(
            (1.0 - F.col("total_tokens") / padded) * 100.0, 4
        ).alias("pad_waste_pct"),
    )
