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


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC (the Mann-Whitney U statistic with the standard
    tie correction: tied scores contribute half) of ``score_col``
    ranking the boolean ``label_col`` — the filter-evaluation metric a
    curation pipeline reports before trusting a quality model:

        AUC = [ sum over distinct scores s (descending) of
                pos_above(s) * neg(s) + pos(s) * neg(s) / 2 ] / (P * N)

    computed as an all-integer numerator (doubled to stay integral)
    over one GROUP BY score — never a per-row global rank. The ordered
    cumulative sum runs on the score-DISTINCT relation, whose size is
    bounded by the score's value granularity (e.g. a rounded or
    integer-milli score), not the corpus; at 100 TB that window is
    thousands of rows while a row-level rank would be a corpus-wide
    single-partition sort.

    Returns one row: (auc double 9 dp, n_pos long, n_neg long).
    Raises neither on empty classes: AUC is null when P or N is 0.
    """
    from pyspark.sql import Window

    pos = F.when(F.col(label_col), 1).otherwise(0)
    g = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(pos).alias("__p"),
        F.sum(1 - pos).alias("__n"),
    )
    w = (
        Window.orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        "__p",
        "__n",
        F.coalesce(F.sum("__p").over(w), F.lit(0)).alias("__cp"),
    )
    num = c.agg(
        F.sum(
            2 * F.col("__cp") * F.col("__n") + F.col("__p") * F.col("__n")
        ).alias("__num2x"),
        F.sum("__p").alias("__P"),
        F.sum("__n").alias("__N"),
    )
    # ANSI mode makes the 0-denominator case an error, not Inf — the
    # single-class AUC is undefined, so report null explicitly
    defined = (F.col("__P") > 0) & (F.col("__N") > 0)
    return num.select(
        F.when(
            defined,
            F.round(
                F.col("__num2x") / (2.0 * F.col("__P") * F.col("__N")), 9
            ),
        ).alias("auc"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Reliability-diagram bins (the calibration report read alongside
    AUC): probabilities bucketed into ``n_bins`` fixed-width bins over
    [0, 1] (prob 1.0 clamps into the last bin), each reporting its
    observed positive rate against its mean predicted probability,
    plus the bin's contribution weight — the inputs to expected
    calibration error. Positive-rate is an exact integer ratio, and
    the mean probability is computed from INTEGER nano-prob sums
    (round(p * 1e9) per row) rather than a float mean — a float AVG
    of 9-dp probabilities lands on half-ulp boundaries where two
    engines' summation orders round differently (observed at sf0.1).

    One map-side-combined aggregation of <= n_bins rows; corpus-size
    independent beyond the scan.

    Returns: (bin int, n long, n_pos long, pos_rate double 9 dp,
    mean_prob double 9 dp), only non-empty bins, ordered by bin.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    b = F.least(
        F.lit(n_bins - 1),
        F.floor(F.col(prob_col) * n_bins).cast("int"),
    )
    pos = F.when(F.col(label_col), 1).otherwise(0)
    nano = F.round(F.col(prob_col) * 1e9).cast("long")
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(pos).cast("long").alias("n_pos"),
            F.round(F.sum(pos) / F.count("*"), 9).alias("pos_rate"),
            F.round(
                F.sum(nano) / (F.count("*") * 1e9), 9
            ).alias("mean_prob"),
        )
        .orderBy("bin")
    )


def threshold_sweep(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    thresholds: tuple[float, ...] = (0.3, 0.45, 0.5, 0.55, 0.7),
) -> DataFrame:
    """Operating-point sweep for a binary filter: confusion counts and
    precision / recall / F1 at each candidate keep-threshold (predict
    positive iff prob >= t) — the table a curation pipeline reads to
    pick its cut. All counts are exact integers; the derived ratios
    are single divisions of those integers (identical in any IEEE
    engine); zero-denominator points report null (ANSI-safe).

    One pass: the |thresholds|-row relation is broadcast-crossed with
    the scored corpus and reduced by ONE map-side-combined
    aggregation of <= |thresholds| rows.

    Returns: (threshold double, tp, fp, fn, tn long, precision,
    recall, f1 double 9 dp), ordered by threshold.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    spark = df.sparkSession
    th = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    pred = F.col(prob_col) >= F.col("threshold")
    pos = F.col(label_col)
    agg = (
        df.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(pred & pos, 1).otherwise(0)).alias("tp"),
            F.sum(F.when(pred & ~pos, 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred & pos, 1).otherwise(0)).alias("fn"),
            F.sum(F.when(~pred & ~pos, 1).otherwise(0)).alias("tn"),
        )
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    )
    return agg.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.round(precision, 9).alias("precision"),
        F.round(recall, 9).alias("recall"),
        F.round(f1, 9).alias("f1"),
    ).orderBy("threshold")


def auc_by_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group exact AUC (same tie-corrected Mann-Whitney arithmetic
    as :func:`auc_score`, partitioned by ``group_col``) — the
    per-domain / per-language fairness report that catches a quality
    filter scoring one slice of the corpus well and another at coin
    flip. Groups with a single class report null AUC but real counts.

    The cumulative window partitions by group, so each group's ordered
    scan is independent and bounded by ITS score granularity; the rest
    is two grouped aggregations.

    Returns: (group_col, auc double 9 dp, n_pos long, n_neg long),
    one row per group.
    """
    from pyspark.sql import Window

    pos = F.when(F.col(label_col), 1).otherwise(0)
    g = df.groupBy(
        F.col(group_col).alias("__g"), F.col(score_col).alias("__s")
    ).agg(
        F.sum(pos).alias("__p"),
        F.sum(1 - pos).alias("__n"),
    )
    w = (
        Window.partitionBy("__g")
        .orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        "__g",
        "__p",
        "__n",
        F.coalesce(F.sum("__p").over(w), F.lit(0)).alias("__cp"),
    )
    num = c.groupBy("__g").agg(
        F.sum(
            2 * F.col("__cp") * F.col("__n") + F.col("__p") * F.col("__n")
        ).alias("__num2x"),
        F.sum("__p").alias("__P"),
        F.sum("__n").alias("__N"),
    )
    defined = (F.col("__P") > 0) & (F.col("__N") > 0)
    return num.select(
        F.col("__g").alias(group_col),
        F.when(
            defined,
            F.round(
                F.col("__num2x") / (2.0 * F.col("__P") * F.col("__N")), 9
            ),
        ).alias("auc"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Exact Cohen's kappa between two binary raters — the
    inter-labeler agreement check a pipeline runs before trusting a
    pair of quality classifiers to vote. One map-side-combined
    aggregation produces the four confusion cells as exact longs;
    kappa = (n*(n11+n00) - (r1*c1 + r0*c0)) / (n^2 - (r1*c1 + r0*c0))
    is then a SINGLE double division of two exact integers, so any
    IEEE engine reproduces it bit-for-bit (9 dp reported). Raters that
    are both constant (chance agreement 1) report NULL kappa.

    Returns one row: (n, n11, n10, n01, n00, kappa).
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    cells = df.agg(
        F.count("*").alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("long").alias("n00"),
    )
    r1 = F.col("n11") + F.col("n10")
    r0 = F.col("n01") + F.col("n00")
    c1 = F.col("n11") + F.col("n01")
    c0 = F.col("n10") + F.col("n00")
    chance = r1 * c1 + r0 * c0
    num = F.col("n") * (F.col("n11") + F.col("n00")) - chance
    den = F.col("n") * F.col("n") - chance
    return cells.select(
        F.col("n").cast("long").alias("n"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double"), 9),
        ).alias("kappa"),
    )


def robust_group_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Exact per-group robust statistics — median, MAD (median
    absolute deviation), and the |v - median| > k * MAD outlier count
    — the distribution-free quality-control pass a pipeline runs on
    per-source document lengths or scores, where one spam burst would
    drag a mean/stddev fence but not a median/MAD one.

    EXACT medians, not percentile_approx: each median is the average
    of the (n+1)//2-th and (n+2)//2-th order statistics, selected by
    a row_number window — for integer inputs every median is a .0/.5
    value and every MAD a .0/.25 binary fraction, so the arithmetic
    is engine-exact with no sketch tolerance. Scale shape: two
    group-keyed sort windows (value pass, deviation pass) plus
    group-sized joins; the heavy sort parallelizes across groups (a
    single monster group serializes its own sort — the inherent cost
    of an exact median, use the sketch family when approximation is
    acceptable).

    Returns (group_col, n long, median double, mad double,
    n_outliers long).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        g.alias(group_col),
        v.alias("__v"),
        F.row_number().over(Window.partitionBy(group_col).orderBy(v)).alias(
            "__rn"
        ),
        F.count("*").over(wn).alias("__n"),
    )
    med = (
        ranked.filter(
            (F.col("__rn") == F.expr("(__n + 1) div 2"))
            | (F.col("__rn") == F.expr("(__n + 2) div 2"))
        )
        .groupBy(group_col)
        .agg(F.avg("__v").alias("__med"), F.max("__n").alias("__cnt"))
    )
    dev = df.select(g.alias(group_col), v.alias("__v")).join(
        med, group_col
    ).select(
        g.alias(group_col),
        "__v",
        "__med",
        F.abs(F.col("__v") - F.col("__med")).alias("__d"),
    )
    ranked_d = dev.select(
        g.alias(group_col),
        "__d",
        F.row_number()
        .over(Window.partitionBy(group_col).orderBy(F.col("__d")))
        .alias("__rn"),
        F.count("*").over(wn).alias("__n"),
    )
    mad = (
        ranked_d.filter(
            (F.col("__rn") == F.expr("(__n + 1) div 2"))
            | (F.col("__rn") == F.expr("(__n + 2) div 2"))
        )
        .groupBy(group_col)
        .agg(F.avg("__d").alias("__mad"))
    )
    flags = dev.join(mad, group_col).groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.max("__med").alias("median"),
        F.max("__mad").alias("mad"),
        F.sum(
            F.when(
                F.col("__d") > F.lit(float(k)) * F.col("__mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )
    return flags.select(group_col, "n", "median", "mad", "n_outliers")


def ols_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares diagnostics of integer-valued
    ``y`` on integer-valued ``x`` — the regr_slope / regr_intercept /
    regr_r2 / corr sheet a pipeline reads to sanity-check a cheap
    feature against an expensive one (does token count predict byte
    length per source? is a quality score drifting linearly with
    document age?).

    EXACT moments, not float accumulation: the five sums (Σx, Σy,
    Σx², Σy², Σxy) aggregate as longs, which are order-free under any
    partitioning, so every reported statistic is a fixed IEEE
    expression of exact integers — bit-reproducible cross-engine
    (float-summed regr_* aggregates are partition-order-dependent and
    cannot be oracle-pinned). Numerators/denominators stay inside
    long range while n·Σxy < 2^63 — petabyte-scale for typical
    bounded features; past that, lift the moments to decimal (the
    formulas are unchanged).

    slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²); intercept from the means;
    r² = cov² / (varx · vary) computed in doubles AFTER the exact
    integer factors (their squares may exceed long range);
    corr = cov / sqrt(varx · vary) — IEEE sqrt is correctly rounded,
    so it is engine-exact too. Constant-x groups report NULL slope /
    intercept / r2 / corr; constant-y groups report NULL r2 / corr
    (zero variance to explain).

    Scale shape: ONE map-side-combined aggregation keyed on the group
    — no window, no second pass; the result relation is group-sized.

    Returns (group_col, n, slope, intercept, r2, corr), doubles
    rounded to 9 dp.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    m = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    cov = F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = F.col("n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov_d, varx_d, vary_d = (
        cov.cast("double"),
        varx.cast("double"),
        vary.cast("double"),
    )
    slope = F.when(varx != 0, cov_d / varx_d)
    intercept = (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")) / F.col("n").cast("double")
    r2 = F.when((varx != 0) & (vary != 0), (cov_d * cov_d) / (varx_d * vary_d))
    corr = F.when(
        (varx != 0) & (vary != 0), cov_d / F.sqrt(varx_d * vary_d)
    )
    return m.select(
        group_col,
        "n",
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 9).alias("intercept"),
        F.round(r2, 9).alias("r2"),
        F.round(corr, 9).alias("corr"),
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_milli: int = 100,
) -> DataFrame:
    """Per-group trimmed mean of an integer-valued column: drop the
    lowest and highest floor(n * trim_milli / 1000) values, average
    the rest — the outlier-resistant mean between the raw mean and
    robust_group_stats' median (a 10% trim shrugs off spam bursts
    while keeping the estimator efficient on clean groups).

    Exactness: the trim count is integer arithmetic
    ((n * trim_milli) div 1000), the kept multiset is selected by a
    row_number rank (tie order irrelevant — equal values contribute
    equally to the sum), and the mean is ONE IEEE division of an
    exact long sum by an exact count. Bit-reproducible cross-engine.

    Scale shape: one group-keyed sort window (parallel across groups;
    a single monster group serializes its own sort — robust_group_
    stats' documented inherent cost) + one group aggregation.

    Returns (group_col, n, n_trim_each, mean_trimmed, mean_all),
    means rounded to 9 dp; a group whose trim would drop everything
    (trim_milli >= 500) reports NULL mean_trimmed.
    """
    if not 0 <= trim_milli < 1000:
        raise ValueError(
            f"trim_milli must be in [0, 1000), got {trim_milli}"
        )
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    ranked = df.select(F.col(group_col), v.alias("__v")).select(
        group_col,
        "__v",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col("__v").asc())
        ).alias("__rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    t = F.expr(f"(__n * {int(trim_milli)}) div 1000")
    agg = ranked.groupBy(group_col).agg(
        F.max("__n").cast("long").alias("n"),
        F.max(t).cast("long").alias("n_trim_each"),
        F.sum(
            F.when(
                (F.col("__rn") > t) & (F.col("__rn") <= F.col("__n") - t),
                F.col("__v"),
            )
        ).alias("__kept_sum"),
        F.sum(
            F.when(
                (F.col("__rn") > t) & (F.col("__rn") <= F.col("__n") - t),
                1,
            ).otherwise(0)
        ).cast("long").alias("__kept_n"),
        F.sum("__v").alias("__all_sum"),
    )
    return agg.select(
        group_col,
        "n",
        "n_trim_each",
        F.round(
            F.when(
                F.col("__kept_n") > 0,
                F.col("__kept_sum").cast("double")
                / F.col("__kept_n").cast("double"),
            ),
            9,
        ).alias("mean_trimmed"),
        F.round(
            F.col("__all_sum").cast("double") / F.col("n").cast("double"), 9
        ).alias("mean_all"),
    )


def fleiss_kappa(
    df: DataFrame,
    subject_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa over long-format ratings (one row per rating,
    ``subject_col`` the rated item, ``category_col`` the assigned
    category) — the multi-rater generalization of cohen_kappa, read
    before trusting an ENSEMBLE of quality classifiers to vote. Every
    subject must carry the same number of ratings (the statistic is
    undefined otherwise — unbalanced input raises).

    Exactness: with A = sum of squared per-(subject, category) counts,
    E = sum of squared category marginals, N subjects and r raters,
    kappa = ((A - N*r) * (N*r)^2 - E * N*r*(r-1))
            / (N*r*(r-1) * ((N*r)^2 - E))
    — every factor an exact long, combined in double with a fixed
    expression tree ((N*r)^2 and E exceed long range at extreme
    scale, and IEEE multiply is engine-exact either way), ONE
    division at the end. Chance agreement 1 (every rating in one
    category) reports NULL kappa.

    Scale shape: one (subject, category) aggregation (THE shuffle),
    one subject-sized rollup, one category-sized rollup (bounded by
    the label set), two 1-row reductions. No window.

    Returns one row: (n_subjects, n_raters, kappa 9 dp).
    """
    cells = (
        df.select(
            F.col(subject_col).alias("__s"),
            F.col(category_col).cast("string").alias("__c"),
        )
        .groupBy("__s", "__c")
        .agg(F.count("*").cast("long").alias("__n"))
    )
    per_subj = cells.groupBy("__s").agg(
        F.sum("__n").cast("long").alias("__r"),
        F.sum(F.col("__n") * F.col("__n")).cast("long").alias("__sq"),
    )
    balance = per_subj.agg(
        F.min("__r").alias("__rmin"),
        F.max("__r").alias("__rmax"),
        F.count("*").cast("long").alias("__N"),
        F.sum("__sq").cast("long").alias("__A"),
    ).collect()[0]
    if balance["__N"] == 0:
        raise ValueError("fleiss_kappa requires at least one rating")
    if balance["__rmin"] != balance["__rmax"]:
        raise ValueError(
            "fleiss_kappa requires the same rating count per subject; "
            f"saw {balance['__rmin']}..{balance['__rmax']}"
        )
    marg = cells.groupBy("__c").agg(F.sum("__n").cast("long").alias("__m"))
    e = marg.agg(
        F.sum(F.col("__m") * F.col("__m")).cast("long").alias("__E")
    )
    spark = df.sparkSession
    nr = spark.createDataFrame(
        [(int(balance["__N"]), int(balance["__rmax"]), int(balance["__A"]))],
        "n_subjects long, n_raters long, __A long",
    )
    j = nr.crossJoin(F.broadcast(e))
    n_d = F.col("n_subjects").cast("double")
    r_d = F.col("n_raters").cast("double")
    a_d = F.col("__A").cast("double")
    e_d = F.col("__E").cast("double")
    nr_d = n_d * r_d
    b_d = nr_d * (r_d - F.lit(1.0))
    num = (a_d - nr_d) * (nr_d * nr_d) - e_d * b_d
    den = b_d * (nr_d * nr_d - e_d)
    return j.select(
        "n_subjects",
        "n_raters",
        F.round(F.when(den != 0, num / den), 9).alias("kappa"),
    )


def key_skew_audit(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew report for a prospective join/aggregation key —
    the diagnostic read BEFORE choosing a shuffle strategy at scale
    (a top-key share near 1e6 micro means one task would receive the
    whole relation; the cure is salting, AQE skew splits, or a
    broadcast — joins.py salted_join).

    Exact integers only: n_rows, n_keys, the heaviest key (count
    tiebreak by key), and top-1/top-10 row shares as 1e6-scaled
    integral divs. Scale shape: one key-count aggregation, a
    TakeOrdered(10) over the key-frequency relation (never a global
    sort), two 1-row reductions.

    Returns (n_rows, n_keys, top_key, top1_share_micro,
    top10_share_micro).
    """
    freq = (
        df.select(F.col(key_col).cast("string").alias("__k"))
        .groupBy("__k")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    totals = freq.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max(F.struct("__c", "__k")).alias("__top"),
    )
    top10 = (
        freq.orderBy(F.col("__c").desc(), "__k")
        .limit(10)
        .agg(F.sum("__c").cast("long").alias("__t10"))
    )
    return (
        totals.crossJoin(F.broadcast(top10))
        .select(
            "n_rows",
            "n_keys",
            F.col("__top.__k").alias("top_key"),
            F.expr("(1000000 * __top.__c) div n_rows").alias(
                "top1_share_micro"
            ),
            F.expr("(1000000 * __t10) div n_rows").alias(
                "top10_share_micro"
            ),
        )
    )


def _perceptron_features(
    df: DataFrame, text_col: str, label_col: str, dim: int
) -> tuple:
    """Shared feature/label extraction for the batch perceptron:
    (features(doc, bin, cnt long), labels(doc, y in {+1,-1})). Bins
    are md5-hashed lowercased whitespace words modulo ``dim`` — the
    same engine-portable hash device as the sampling/dedup oracles."""
    words = (
        f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x != '')"
    )
    feats = (
        df.select(
            F.col("__doc"),
            F.explode(F.expr(words.replace(text_col, "__txt"))).alias("w"),
        )
        .select(
            "__doc",
            F.pmod(
                F.expr("CAST(conv(substr(md5(w), 1, 6), 16, 10) AS BIGINT)"),
                F.lit(dim),
            ).cast("int").alias("bin"),
        )
        .groupBy("__doc", "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    labels = df.select("__doc", F.col("__y").alias("y"))
    return feats, labels


def perceptron_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    dim: int = 64,
    epochs: int = 3,
) -> DataFrame:
    """BATCH perceptron training over hashed word-bin counts — linear
    text classification learned IN the engine with nothing but exact
    integer arithmetic (the reason it can be trained here at all:
    logistic regression's sigmoid gradients are float sums whose
    partition order no oracle can replay; the batch perceptron's
    update is the plain integer sum of misclassified feature vectors,
    order-free under any partitioning).

    Per epoch: margins = one broadcast join of the <= ``dim``-row
    weight relation onto the (doc, bin, cnt) features + one doc-keyed
    aggregation; misclassified docs (y * margin <= 0, zero-feature
    docs count as misclassified at margin 0) contribute
    delta(bin) = SUM(y * cnt); the new weight vector collects as
    <= dim rows (bounded, model-sized — the k-means/kcenter
    convention). Features hash by md5 modulo ``dim`` so an external
    SQL engine replays training bit-for-bit.

    Returns the final (dim int, weight long) relation — only bins
    with nonzero weight appear.
    """
    if dim < 1 or epochs < 1:
        raise ValueError(f"dim and epochs must be >= 1, got {dim}, {epochs}")
    staged = df.select(
        F.col(id_col).alias("__doc"),
        F.col(text_col).alias("__txt"),
        F.when(F.col(label_col).cast("boolean"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__y"),
    )
    feats, labels = _perceptron_features(staged, "__txt", "__y", dim)
    feats = feats.join(labels, "__doc").localCheckpoint(eager=True)
    spark = df.sparkSession
    w: dict[int, int] = {}
    for _ in range(epochs):
        if w:
            w_df = spark.createDataFrame(
                list(w.items()), "bin int, weight long"
            )
            margins = (
                feats.join(F.broadcast(w_df), "bin", "left")
                .groupBy("__doc", "y")
                .agg(
                    F.sum(
                        F.coalesce(F.col("weight"), F.lit(0)) * F.col("cnt")
                    ).alias("__m")
                )
            )
        else:
            margins = feats.groupBy("__doc", "y").agg(
                F.lit(0).cast("long").alias("__m")
            )
        mis = margins.filter(F.col("y") * F.col("__m") <= 0).select("__doc")
        delta = (
            feats.join(mis, "__doc", "left_semi")
            .groupBy("bin")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("d"))
            .collect()  # bounded: <= dim rows (the model)
        )
        if not delta:
            break
        for r in delta:
            w[r.bin] = w.get(r.bin, 0) + int(r.d)
    rows = sorted((b, wt) for b, wt in w.items() if wt != 0)
    return spark.createDataFrame(rows, "dim int, weight long")


def perceptron_eval(
    df: DataFrame,
    weights: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    dim: int = 64,
) -> DataFrame:
    """Confusion counts of a trained perceptron over a corpus:
    prediction = sign of the integer margin (zero margin predicts -1,
    the tie-negative convention; zero-feature docs score 0). One
    broadcast weight join + one doc-keyed aggregation + one 4-cell
    rollup. Returns (y long, pred long, n long, share_micro long) with
    share_micro = 1e6 * n div total."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    staged = df.select(
        F.col(id_col).alias("__doc"),
        F.col(text_col).alias("__txt"),
        F.when(F.col(label_col).cast("boolean"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__y"),
    )
    feats, labels = _perceptron_features(staged, "__txt", "__y", dim)
    w_df = weights.select(
        F.col("dim").alias("bin"), F.col("weight")
    )
    margins = (
        feats.join(F.broadcast(w_df), "bin", "left")
        .groupBy("__doc")
        .agg(
            F.sum(
                F.coalesce(F.col("weight"), F.lit(0)) * F.col("cnt")
            ).alias("__m")
        )
    )
    scored = labels.join(margins, "__doc", "left").select(
        F.col("y"),
        F.when(F.coalesce(F.col("__m"), F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pred"),
    )
    cells = scored.groupBy("y", "pred").agg(
        F.count("*").cast("long").alias("n")
    )
    total = cells.agg(F.sum("n").alias("__t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "y",
        "pred",
        "n",
        F.expr("CAST((1000000 * n) DIV __t AS BIGINT)").alias("share_micro"),
    )


def bradley_terry_strengths(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Bradley-Terry strength estimation from pairwise preference
    outcomes — the model-ranking / preference-data-QA fit (Hunter
    2004's MM algorithm): per iteration

        s_i <- W_i / sum_j n_ij / (s_i + s_j)

    with W_i = wins of item i and n_ij = comparisons between i and j,
    then strengths normalize to sum 1 (the fixed point is defined up
    to scale). Standard applicability contract (documented, not
    silently patched): every item needs at least one win and the
    comparison graph should be connected, else the MM fixed point
    degenerates — a zero-win item states strength 0 and, via the
    nullif guard, a 0+0 denominator term states NULL instead of
    raising under ANSI.

    Scale shape: the corpus-sized pair relation aggregates ONCE into
    (wins per item, comparisons per unordered pair) — both
    item-bounded, i.e. model-sized by contract like a codebook — and
    every MM iteration then runs on those relations alone (two joins
    + one aggregation per round over O(items^2) rows, never the raw
    pairs again). Returns (item, strength) with strength summing to 1.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = F.col(winner_col)
    l_ = F.col(loser_col)
    # ONE corpus-sized aggregation: directed win counts per ordered
    # pair. Everything below (items, per-item wins, symmetric
    # comparison counts) derives from this item-bounded relation —
    # the raw pairs are never scanned again.
    dw = (
        df.groupBy(w.alias("__w"), l_.alias("__l"))
        .agg(F.count("*").cast("double").alias("__n"))
        .localCheckpoint(eager=True)
    )
    items = (
        dw.select(F.col("__w").alias("item"))
        .unionByName(dw.select(F.col("__l").alias("item")))
        .distinct()
    )
    wins = dw.groupBy(F.col("__w").alias("item")).agg(
        F.sum("__n").alias("__wn")
    )
    wins = items.join(wins, "item", "left").select(
        "item", F.coalesce("__wn", F.lit(0.0)).alias("__w")
    )
    half = dw.select(
        F.least("__w", "__l").alias("i"),
        F.greatest("__w", "__l").alias("j"),
        "__n",
    ).groupBy("i", "j").agg(F.sum("__n").alias("n"))
    edges = half.unionByName(
        half.select(
            F.col("j").alias("i"), F.col("i").alias("j"), "n"
        )
    )
    # item-bounded relations from here on: materialize once
    edges = edges.localCheckpoint(eager=True)
    wins = wins.localCheckpoint(eager=True)
    s = wins.select("item", F.lit(1.0).alias("s"))
    for _ in range(iterations):
        si = s.select(F.col("item").alias("i"), F.col("s").alias("si"))
        sj = s.select(F.col("item").alias("j"), F.col("s").alias("sj"))
        denom = (
            edges.join(F.broadcast(si), "i")
            .join(F.broadcast(sj), "j")
            .groupBy(F.col("i").alias("item"))
            .agg(
                F.sum(
                    F.col("n")
                    / F.nullif(F.col("si") + F.col("sj"), F.lit(0.0))
                ).alias("__d")
            )
        )
        s = wins.join(denom, "item", "left").select(
            "item",
            (F.col("__w") / F.col("__d")).alias("s"),
        )
        total = s.agg(F.sum("s").alias("__t"))
        s = s.crossJoin(F.broadcast(total)).select(
            "item", (F.col("s") / F.col("__t")).alias("s")
        )
    return s.select("item", F.col("s").alias("strength"))


def pass_at_k(
    df: DataFrame,
    problem_col: str,
    passed_col: str,
    ks: tuple = (1, 10),
) -> DataFrame:
    """Unbiased pass@k estimation (Chen et al. 2021, eq. 1) from
    per-sample eval outcomes — the headline metric of every
    code/LLM eval pipeline:

        pass@k = 1 - C(n-c, k) / C(n, k)
               = 1 - prod_{i=0}^{k-1} (n-c-i) / (n-i)

    with n samples and c passes per problem. Stated as the exact
    product form both engines evaluate in the same IEEE order (one
    per-term division, then a left-fold multiply — so the oracle is
    bit-equal, not approximately equal). Edge semantics: c = 0 states
    0.0; n - c < k (including n < k with at least one pass) states
    1.0. One aggregation on the problem key; the k-products are
    per-row folds over a k-element sequence — map-side, zero Python.
    Returns (problem_col, n_samples, n_passed, pass_at_{k} ... )."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    agg = df.groupBy(problem_col).agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum(F.when(F.col(passed_col), 1).otherwise(0))
        .cast("long")
        .alias("n_passed"),
    )
    cols = [F.col(problem_col), F.col("n_samples"), F.col("n_passed")]
    for k in ks:
        prod = F.expr(
            f"aggregate(sequence(0, {k - 1}), CAST(1.0 AS DOUBLE),"
            " (acc, i) -> acc * (CAST(n_samples - n_passed - i AS DOUBLE)"
            " / CAST(n_samples - i AS DOUBLE)))"
        )
        cols.append(
            F.when(F.col("n_passed") == 0, F.lit(0.0))
            .when(F.col("n_samples") - F.col("n_passed") < k, F.lit(1.0))
            .otherwise(F.lit(1.0) - prod)
            .alias(f"pass_at_{k}")
        )
    return agg.select(*cols)


def wilson_interval(
    df: DataFrame,
    group_col: str,
    passed_col: str,
    z_centi: int = 196,
) -> DataFrame:
    """Wilson score confidence interval for per-group pass rates —
    the error bar an eval report puts next to pass@1 (the normal
    approximation misbehaves at small n / extreme p; Wilson is the
    standard fix). ``z_centi`` is the z-score in centi-units
    (196 = 1.96 = 95%) so the quantile stays an exact integer ratio
    both engines derive identically — no statistical tables, no RNG.
    The formula is stated as ONE shared expression tree (each IEEE op
    correctly rounded), so the oracle is value-exact, not
    approximately equal. One aggregation on the group key. Returns
    (group_col, n_samples, n_passed, rate, ci_lo, ci_hi) with the
    interval clamped to [0, 1]."""
    if z_centi < 1:
        raise ValueError(f"z_centi must be >= 1, got {z_centi}")
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum(F.when(F.col(passed_col), 1).otherwise(0))
        .cast("long")
        .alias("n_passed"),
    )
    n = F.col("n_samples").cast("double")
    p = F.col("n_passed").cast("double") / n
    z = F.lit(float(z_centi)) / F.lit(100.0)
    z2 = z * z
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (z / denom) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * (n * n))
    )
    return agg.select(
        group_col,
        "n_samples",
        "n_passed",
        p.alias("rate"),
        F.greatest(center - half, F.lit(0.0)).alias("ci_lo"),
        F.least(center + half, F.lit(1.0)).alias("ci_hi"),
    )
