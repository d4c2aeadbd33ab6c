"""Event-sequence analytics: funnel conversion over a typed event
stream.

Scale shape: a funnel is a CASCADE of per-key aggregations, not a
window over the corpus — step k's frame is (user, first-ts) pairs
(one row per surviving user), joined back to the (pruned, filtered)
event scan for step k+1. Each stage is one shuffle on the user key;
the surviving-user relation shrinks monotonically down the funnel, so
later stages get cheaper, and no stage materializes per-user event
timelines (the classic window-over-everything funnel kills on power
users with millions of events)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Users surviving each step of an ordered funnel: a user reaches
    step k if they have a ``steps[k]`` event at-or-after their FIRST
    qualifying event of step k-1 (first-touch attribution, the standard
    product-analytics funnel).

    Returns: step_idx (1-based long), step, n_users (long).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frames: list[DataFrame] = []
    prev = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    frames.append(
        prev.select(
            F.lit(1).cast("long").alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.col(user_col),
        )
    )
    for i, s in enumerate(steps[1:], start=2):
        e = events.filter(F.col(type_col) == s).select(
            F.col(user_col), F.col(ts_col).alias("__ets")
        )
        prev = (
            e.join(prev.select(user_col, "__t"), user_col)
            .filter(F.col("__ets") >= F.col("__t"))
            .groupBy(user_col)
            .agg(F.min("__ets").alias("__t"))
        )
        frames.append(
            prev.select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(user_col),
            )
        )
    all_steps = reduce(DataFrame.unionByName, frames)
    return (
        all_steps.groupBy("step_idx", "step")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
