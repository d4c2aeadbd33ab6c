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
