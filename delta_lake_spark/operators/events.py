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


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (cohort), counted in each later period they were active.

    Two aggregations: first-activity per user (one shuffle on the user
    key), then a (cohort, period) count over the user-period pairs —
    the matrix is |cohorts| x |periods|, tiny regardless of corpus
    size. No corpus-wide window.

    Returns: cohort (date), period_n (long, 0 = cohort period),
    n_active (long).
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("__cohort")
    )
    active = events.select(
        F.col(user_col), F.date_trunc(granularity, F.col(ts_col)).alias("__p")
    ).distinct()
    unit = {"week": 7, "day": 1}[granularity] if granularity in ("week", "day") else None
    joined = active.join(first, user_col)
    if unit is not None:
        period_n = (
            F.datediff(F.col("__p"), F.col("__cohort")) / F.lit(unit)
        ).cast("long")
    else:  # month granularity: calendar difference
        period_n = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        ).cast("long")
    return (
        joined.groupBy(
            F.to_date("__cohort").alias("cohort"), period_n.alias("period_n")
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )


def hourly_rate_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Event-rate anomaly flags: hourly counts per type z-scored
    against that type's own distribution (population moments from
    exact integer count sums — mean/var/z are then identical in any
    IEEE engine), flagging hours with |z| >= ``z_threshold`` — the
    ingestion-observability check that catches a collapsed producer
    or a replay storm before it poisons training data.

    The per-type hourly relation is DENSIFIED over the corpus's
    observed [min, max] hour window before z-scoring: an hour with
    zero events gets an explicit n=0 row per type, so a producer that
    stops emitting entirely still flags (without the spine, empty
    hours are simply absent from both the moments and the flags, and
    a fully-collapsed producer could never appear — only
    low-but-nonzero hours could).

    Scale shape: one (type, hour) count aggregation; the spine is
    |types| x window-hours rows built from a 1-row broadcast span (two
    scalar aggregates), metadata-sized next to the event scan; one
    type-keyed moment aggregate (|types| rows, broadcast back); a
    map-only flag.

    Returns: (event_type, hour timestamp, n long, z double 9 dp) for
    flagged hours only. Types with zero variance never flag (their
    every hour is the mean).
    """
    if z_threshold <= 0:
        raise ValueError(f"z_threshold must be > 0, got {z_threshold}")
    hourly = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count("*").alias("n"))
    span = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("__h1"),
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("__h0", "__h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    dense = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
    stats = dense.groupBy("event_type").agg(
        F.count("*").cast("double").alias("__k"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
    )
    mean = F.col("__s") / F.col("__k")
    var = F.col("__ss") / F.col("__k") - mean * mean
    enriched = dense.join(
        F.broadcast(
            stats.select(
                F.col("event_type").alias("__t"), mean.alias("__m"),
                var.alias("__v"),
            )
        ),
        F.col("event_type") == F.col("__t"),
    )
    z = (F.col("n") - F.col("__m")) / F.sqrt(F.col("__v"))
    return (
        enriched.filter(F.col("__v") > 0)
        .select(
            "event_type", "hour", F.col("n").cast("long").alias("n"),
            F.round(z, 9).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= z_threshold)
    )


def decayed_event_rates(
    df: DataFrame,
    type_col: str,
    ts_col: str,
    half_life_days: int = 7,
    horizon_halflives: int = 40,
) -> DataFrame:
    """Per-type exponentially decayed event score with FIXED-POINT
    arithmetic — the freshness-weighted activity report (recent events
    count fully, events one half-life old count half, ...) that a
    float EWMA cannot oracle-pin because float summation is
    partition-order-dependent.

    The trick: decay steps are powers of two. An event ``a``
    half-lives old (integer: age_days div half_life_days, relative to
    the corpus max timestamp) contributes 2^(horizon - a) — an exact
    LONG — and the per-type sum of longs is order-free, so the scaled
    score is bit-exact under any partitioning and the reported score
    is ONE IEEE division by 2^horizon. Events older than
    ``horizon_halflives`` contribute 0 (they would be below 1 unit of
    the fixed point anyway). Long capacity: n_events * 2^horizon must
    stay under 2^63 — at the default horizon 40 that is ~8M events
    per type; the per-type sum is therefore aggregated as
    decimal(38,0) (order-free exact, no wrap) and the cast back to
    the long ``score_fixed`` is GUARDED: exceeding 2^63-1 raises
    loudly instead of producing a plausible-looking wrapped score.
    Lower the horizon for larger corpora.

    Scale shape: one 1-row max-timestamp broadcast, one map-side-
    combined per-type aggregation. Returns (type_col, n_events,
    score_fixed, score) with score = score_fixed / 2^horizon, 9 dp.
    """
    if half_life_days < 1:
        raise ValueError(
            f"half_life_days must be >= 1, got {half_life_days}"
        )
    if not 1 <= horizon_halflives <= 62:
        raise ValueError(
            f"horizon_halflives must be in [1, 62], got {horizon_halflives}"
        )
    ref = df.agg(F.max(F.to_date(ts_col)).alias("__ref"))
    aged = df.crossJoin(F.broadcast(ref)).select(
        F.col(type_col),
        F.expr(
            f"datediff(__ref, to_date({ts_col})) div {int(half_life_days)}"
        ).alias("__a"),
    )
    h = int(horizon_halflives)
    w = F.when(
        (F.col("__a") >= 0) & (F.col("__a") <= h),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {h} - __a)"),
    ).otherwise(F.lit(0).cast("long"))
    # Sum in decimal(38,0): exact and order-free like long, but cannot
    # wrap. The guard below runs on the one-row-per-type aggregate, so
    # the raise_error branch costs nothing in the hot path.
    guarded = F.when(
        F.col("__sf_dec") > F.lit(2 ** 63 - 1).cast("decimal(38,0)"),
        F.raise_error(
            F.concat(
                F.lit(
                    "decayed_event_rates: fixed-point sum exceeds 2^63-1 "
                    "at horizon_halflives="
                    + str(h)
                    + " — lower the horizon; overflowing sum="
                ),
                F.col("__sf_dec").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("__sf_dec").cast("long"))
    return (
        aged.select(type_col, w.alias("__w"))
        .groupBy(type_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("__w").cast("decimal(38,0)")).alias("__sf_dec"),
        )
        .select(
            type_col,
            "n_events",
            guarded.alias("score_fixed"),
            F.round(
                F.col("__sf_dec").cast("double") / F.lit(float(2 ** h)),
                9,
            ).alias("score"),
        )
    )
