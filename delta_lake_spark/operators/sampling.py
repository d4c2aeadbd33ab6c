"""Deterministic sampling/splitting for training-data pipelines.

``randomSplit`` is nondeterministic across partitionings and reruns —
useless for reproducible train/test splits at 100 TB where lineage
matters. These operators derive the assignment from a content hash
(md5 of the key), so the split is:
  - stable across runs, cluster sizes, and partition layouts,
  - portable across engines (md5 is identical everywhere, so the
    DuckDB oracle value-checks the split exactly),
  - join-free and shuffle-free (a projection).

The hex-threshold trick: the first 8 hex chars of md5 are uniform over
16^8; comparing them LEXICOGRAPHICALLY against the hex literal at
``frac`` of the keyspace selects a frac-sized deterministic subset
(hex strings of equal length order identically to their values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8
_SPACE = 16 ** _HEX_WIDTH


def _hex_threshold(frac: float) -> str:
    """Hex literal h such that P(md5_prefix < h) == round(frac * 16^8) / 16^8.

    frac >= 1 returns 'g': lexicographically above every 8-char hex
    string, so every row passes (16^8 itself would be 9 chars and
    compare BELOW most hex strings)."""
    if frac >= 1:
        return "g"
    return format(max(0, round(frac * _SPACE)), f"0{_HEX_WIDTH}x")


def _bucket(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, _HEX_WIDTH)


_MAX_DOMAINS = 100_000


def _bounded_domain_collect(per_domain: DataFrame, op: str, max_domains: int):
    """Collect a per-domain summary relation with a cardinality
    contract: the mixture operators pull one row per distinct domain to
    the driver (quotas/thresholds), which is fine for language/source
    domains but unbounded if a caller passes a URL-host-grained column.
    The ``limit(max+1)`` bounds driver memory even when the contract is
    violated — we see at most one extra row, then raise with a pointer
    to the operators built for high-cardinality domain columns."""
    rows = per_domain.limit(max_domains + 1).collect()
    if len(rows) > max_domains:
        raise ValueError(
            f"{op}: more than {max_domains} distinct domains — the "
            "per-domain quota collect is only bounded for coarse "
            "domains (language, source, bucket). For host/URL-grained "
            "columns use cap_per_domain (windowed, fully distributed) "
            "or pre-bucket the domain column, or raise max_domains "
            "explicitly if the driver can hold the quota table"
        )
    return rows


def deterministic_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    seed: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` = 'train' | 'test' from a content hash of
    ``key_col``. Same key -> same split, forever, everywhere."""
    train = _bucket(F.col(key_col), seed) < F.lit(_hex_threshold(train_frac))
    return df.withColumn(
        split_col, F.when(train, F.lit("train")).otherwise(F.lit("test"))
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    frac: float,
    seed: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ~frac of rows by content hash of key_col
    (a filter projection: no shuffle, no RNG state)."""
    return df.filter(_bucket(F.col(key_col), seed) < F.lit(_hex_threshold(frac)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    seed: str = "strata-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction (e.g. downsample boilerplate web text, keep all books).
    Implemented as one CASE over hex thresholds — still a pure
    projection, no shuffle, no driver-side state."""
    bucket = _bucket(F.col(key_col), seed)
    expr = None
    for value, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(value)) & (
            bucket < F.lit(_hex_threshold(frac))
        )
        expr = cond if expr is None else expr | cond
    if default_frac > 0:
        known = F.col(strata_col).isin(list(fractions.keys()))
        expr = expr | (~known & (bucket < F.lit(_hex_threshold(default_frac))))
    return df.filter(expr)


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: str = "mix-v1",
    max_domains: int = _MAX_DOMAINS,
) -> DataFrame:
    """Downsample to a target DOMAIN MIXTURE: keep the largest corpus
    whose per-stratum shares match ``weights`` (relative weights, e.g.
    {"books": 4, "web": 1}) without upsampling any stratum.

    With n_s rows in stratum s and weight w_s, the binding stratum sets
    the total: T = min_s(n_s / w_s); each stratum keeps
    rate_s = w_s * T / n_s of its rows (the argmin stratum keeps 100%).
    The rate computation is a stratum-count aggregation (tiny), the
    application is a broadcast join + the md5-threshold filter — the
    corpus never shuffles, and the same key always gets the same
    decision. Per-stratum thresholds are built at runtime with
    format_string('%08x', round(rate * 16^8)), which DuckDB's printf
    reproduces exactly, so the sample is value-checkable cross-engine.
    """
    w_expr = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        w_expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(wt))
        ).otherwise(w_expr)
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").cast("double").alias("__n"))
        .withColumn("__w", w_expr)
    )
    total = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    rate = F.col("__w") * F.col("__t") / F.col("__n")
    thresholds = counts.crossJoin(F.broadcast(total)).select(
        strata_col,
        F.when(rate >= 1, F.lit("g"))
        .otherwise(
            F.format_string(
                "%08x", F.round(rate * F.lit(float(_SPACE))).cast("long")
            )
        )
        .alias("__thr"),
    )
    # bounded materialization: the threshold relation is one row per
    # distinct stratum — collect it under the domain-cardinality
    # contract and re-create it as a local relation, so the broadcast
    # is driver-bounded instead of an unguarded corpus-derived plan
    thr_rows = _bounded_domain_collect(thresholds, "mixture_sample", max_domains)
    spark = df.sparkSession
    thr_local = spark.createDataFrame(thr_rows, thresholds.schema)
    return (
        df.join(F.broadcast(thr_local), strata_col)
        .filter(_bucket(F.col(key_col), seed) < F.col("__thr"))
        .drop("__thr")
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain — the standard anti-bias
    guard for web corpora where a handful of domains contribute an
    outsized share. Deterministic: survivors are the ``cap`` smallest
    ``id_col`` values within each domain.

    Scale shape: a single ``Window.partitionBy(domain)`` funnels a
    mega-domain (at 100 TB, one domain can be billions of rows) through
    ONE task. Instead, two bounded passes:

      1. salt each row by ``hash(id) % n_salts`` and take the per-
         (domain, salt) top-``cap`` — parallelism n_salts per domain,
         each sub-window bounded;
      2. re-rank the <= n_salts * cap survivors per domain and keep
         ``cap``.

    Pass 2's per-domain input is capped at n_salts * cap rows whatever
    the domain's true size, so no task ever sees more than that.
    """
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(domain_col), salt).orderBy(F.col(id_col))
    stage1 = (
        df.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
        .drop("__r1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(id_col)
    return (
        stage1.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= cap)
        .drop("__r2")
    )


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    temperature: float = 0.7,
    target_rows: int = 100_000,
    seed: str = "mix-v1",
    n_salts: int = 32,
    max_domains: int = _MAX_DOMAINS,
) -> DataFrame:
    """Temperature-resampled domain mixture — the standard recipe for
    rebalancing a training corpus across sources/languages: domain d
    with n_d rows receives a quota m_d = floor(target_rows * n_d^t /
    sum_i n_i^t). Temperature t < 1 flattens the mixture (rare domains
    oversampled relative to their share, dominant domains capped),
    t = 1 preserves proportions, t = 0 equalizes.

    Selection within a domain is the m_d rows with the SMALLEST content
    hash (md5 of seed||id) — deterministic across runs, partitionings,
    and engines (the DuckDB oracle replays it exactly), and unbiased by
    id ordering. Quotas are computed from one tiny per-domain count
    (|domains| rows to the driver — same contract as
    ``stratified_sample``'s fractions dict) and broadcast back.

    Scale shape: like ``cap_per_domain``, selection is two bounded
    window passes (salted top-m_d then re-rank), so a mega-domain never
    funnels through one task; quota lookup is a broadcast join.
    """
    from pyspark.sql import Window

    counts = {
        r[0]: r[1]
        for r in _bounded_domain_collect(
            df.groupBy(domain_col).agg(F.count("*").alias("n")),
            "mixture_resample",
            max_domains,
        )
    }
    if not counts:  # empty input: nothing to resample (and an empty
        return df   # quota frame would trip schema inference)
    z = sum(n**temperature for n in counts.values())
    # floor with a 1e-6 nudge: a UNIFORM corpus puts every quota exactly
    # on an integer boundary, where 1-ulp pow()/sum-order differences
    # between engines (or runs) would flip floor() — the nudge makes the
    # boundary decision stable for both this code and the SQL oracle
    quotas = [
        (d, int(target_rows * (n**temperature) / z + 1e-6))
        for d, n in counts.items()
    ]
    spark = df.sparkSession
    qdf = spark.createDataFrame(quotas, [domain_col, "__m"])  # type-inferred

    bucket = _bucket(F.col(id_col), seed)
    with_quota = df.join(F.broadcast(qdf), domain_col)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(domain_col), salt).orderBy(
        bucket, F.col(id_col)
    )
    stage1 = (
        with_quota.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__m"))
        .drop("__r1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(bucket, F.col(id_col))
    return (
        stage1.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= F.col("__m"))
        .select(*df.columns)  # restore input column order (the quota
    )  # join moved domain_col first); matches the empty-input path


def score_percentiles(
    df: DataFrame,
    score_col: str,
    n_bins: int = 1000,
    out_col: str = "score_pct",
) -> DataFrame:
    """Empirical-CDF score calibration: attach to every row the
    fraction of the corpus scoring in a STRICTLY lower bin
    (bin = floor(score * n_bins)) — the normalization step before
    comparing or mixing quality scores across sources whose raw scales
    differ. Bin-level granularity (ties within a bin share a
    percentile) is what makes the computation distributable AND exactly
    engine-portable: the value is a ratio of two integers, 9dp-rounded.

    Scale shape: one aggregation to <= n_bins + 1 rows, a window over
    that tiny bins relation (post-aggregate metadata, never the
    corpus), and a broadcast join back — the corpus itself is touched
    by one validation probe (score column only — the "<= n_bins + 1
    rows" bound holds ONLY for scores in [0, 1]; a raw-scale column
    would make the bins relation corpus-cardinality and its broadcast
    fatal, so out-of-range scores raise instead), then exactly one
    scan + one map-side join. Rows with a NULL/NaN score are excluded
    (they have no place in the CDF).

    Returns: the input columns plus ``out_col`` (double in [0, 1),
    9dp).
    """
    from pyspark.sql import Window

    sc = F.col(score_col).cast("double")
    rng = df.filter(sc.isNotNull() & ~F.isnan(sc)).agg(
        F.min(sc).alias("lo"), F.max(sc).alias("hi")
    ).first()
    if rng["lo"] is not None and (rng["lo"] < 0.0 or rng["hi"] > 1.0):
        raise ValueError(
            f"score_percentiles: scores must lie in [0, 1] (observed "
            f"[{rng['lo']}, {rng['hi']}]) — the <= n_bins + 1 bins "
            "contract (and its broadcast) is only bounded on that "
            "range; min-max rescale raw scores first"
        )
    s = df.filter(sc.isNotNull() & ~F.isnan(sc)).withColumn(
        "__b", F.floor(F.col(score_col) * F.lit(n_bins)).cast("int")
    )
    bins = s.groupBy("__b").agg(F.count("*").alias("__c"))
    w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = bins.select(
        "__b",
        F.round(
            F.coalesce(F.sum("__c").over(w), F.lit(0))
            / F.sum("__c").over(wt),
            9,
        ).alias(out_col),
    )
    return s.join(F.broadcast(cdf), "__b").select(*df.columns, out_col)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    seed: str = "wsample-v1",
    n_salts: int = 32,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: draw ``k`` rows with
    inclusion probability proportional to ``weight_col`` (e.g. sample a
    fine-tuning subset quality-weighted) via the Efraimidis-Spirakis
    A-Res scheme — priority = u^(1/w) with u uniform in (0, 1], keep
    the k largest priorities. Instead of RNG state, u derives from the
    md5 content hash (``(hex8 + 1) / 2^32``), so the draw is stable
    across runs, partitionings, and engines; priorities are 9dp-rounded
    with id tie-breaks, so the DuckDB oracle replays the EXACT sample.

    Rows with a NULL, NaN, or non-positive weight are excluded (they
    have no defined priority — and NaN would otherwise sort ABOVE every
    real priority, evicting legitimate rows from the sample).

    Weight-scale invariance: weights are normalized to max 1.0 before
    the u^(1/w) priority. The E-S ordering is invariant under scaling
    (x -> x^c is monotone on (0,1]), but the 9dp ROUNDING the oracle
    contract needs is not — raw weights ~1e8+ (token counts, say) push
    every priority to 1.000000000 and the id tie-break, not the
    weights, would decide the sample. Normalized, the HEAVIEST rows
    have exponents >= 1 and well-spread priorities; rounding collapse
    moves to the lightest rows, which lose the top-k anyway. Costs one
    extra max-aggregate pass over the weight column (a metadata-sized
    1-row broadcast).

    Scale shape: the priority is a map-side projection; selection is
    the ``cap_per_domain`` two-level device without the domain — a
    salted per-partition top-k (each sub-window bounded) followed by a
    TakeOrdered over <= n_salts * k survivors. No global sort, no
    full-corpus window.

    Returns: the input columns plus ``priority`` (double, 9dp).
    """
    from pyspark.sql import Window

    u = (
        F.conv(_bucket(F.col(id_col), seed), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**_HEX_WIDTH))
    w = F.col(weight_col).cast("double")
    s0 = df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
    mx = s0.agg(F.max(w).alias("__maxw"))
    pri = F.round(F.pow(u, F.col("__maxw") / w), 9)
    s = (
        s0.crossJoin(F.broadcast(mx))
        .withColumn("priority", pri)
        .drop("__maxw")
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(salt).orderBy(
        F.col("priority").desc(), F.col(id_col)
    )
    stage1 = (
        s.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    return stage1.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k)


def shard_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shard-v1",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the step that
    turns a curated corpus into training shards. Sequential ids (crawl
    order, source order) carry topical/temporal runs that would make
    consecutive training batches correlated; assigning each row to
    ``shard_id = md5(seed||id) % n_shards`` and ordering within the
    shard by the same hash yields a content-keyed permutation that is
    stable across runs, cluster sizes, and partition layouts (the same
    md5 device as ``deterministic_split``, so the DuckDB oracle replays
    both the assignment and the within-shard order exactly; ties on the
    8-hex prefix break on the id).

    Scale shape: ONE hash exchange on ``shard_id`` — the exact shuffle
    a sharded write needs anyway (follow with
    ``.write.partitionBy(shard_col)`` and the exchange is reused) — then
    a per-shard ``row_number`` window. Each window partition holds one
    output shard, so choose ``n_shards`` for your target shard file
    size (100 TB at ~250 MB/shard -> ~400k shards) and no task ever
    materializes more than ~|corpus|/n_shards rows. No driver-side
    state, no RNG.

    Returns: the input columns plus ``shard_id`` (int) and ``pos``
    (1-based position within the shard's serving order).
    """
    from pyspark.sql import Window

    h = _bucket(F.col(id_col), seed)
    staged = df.withColumn("__h", h).withColumn(
        "shard_id",
        F.pmod(F.conv(F.col("__h"), 16, 10).cast("long"), F.lit(n_shards))
        .cast("int"),
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("__h"), F.col(id_col))
    return (
        staged.withColumn("pos", F.row_number().over(w))
        .select(*df.columns, "shard_id", "pos")
    )


def shard_manifest(
    sharded: DataFrame,
    id_col: str,
    shard_col: str = "shard_id",
    tokens_col: str | None = None,
    seed: str = "manifest-v1",
) -> DataFrame:
    """Per-shard integrity manifest for a sharded corpus (the relation
    ``shard_shuffle`` returns): row count, optional token sum, and an
    ORDER-INDEPENDENT content checksum — what a training job verifies
    after shards are copied between stores, without re-reading them in
    any particular order.

    checksum = sum over rows of (md5(seed||id) hex8 as int) % 1e9+7 —
    commutative, so any partitioning/arrival order yields the same
    value, and engine-portable (the DuckDB oracle replays it exactly;
    per-term values < 1e9 keep the int64 sum exact for shards up to
    ~9e9 rows, far above the ~1e6-row shards a 250 MB target implies).

    Scale shape: one hash aggregation on the shard key with map-side
    partial sums — |shards| output rows.

    Returns: shard_col, n_docs (long), checksum (long), and n_tokens
    (long) when ``tokens_col`` is given.
    """
    term = F.pmod(
        F.conv(_bucket(F.col(id_col), seed), 16, 10).cast("long"),
        F.lit(1_000_000_007),
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(term).alias("checksum"),
    ]
    if tokens_col is not None:
        aggs.append(F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"))
    return sharded.groupBy(shard_col).agg(*aggs)


def select_by_token_budget(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
    n_bins: int = 1000,
    seed: str = "budget-v1",
) -> DataFrame:
    """Best-first corpus selection under a token budget: keep documents
    in descending-quality order until the budget is spent — "train on
    the best B tokens" , the standard data-constrained curation step.

    The selection order is ``(score bin DESC, md5(seed||id), id)`` with
    bin = floor(score * n_bins): within a bin (score window < 1/n_bins)
    documents are hash-ordered, which avoids id-order bias and — unlike
    ordering on the raw score — makes the order coarse enough to
    DISTRIBUTE. A document is kept iff its inclusive running token sum
    in that order is <= budget (token counts are positive, so the
    running sum is monotone and the kept set is a prefix).

    Scale shape — the naive form is a GLOBAL ordered window (one task
    sees the corpus), which is exactly what this implementation avoids:

      1. per-bin token totals: one aggregation to <= n_bins+1 rows
         (driver-bounded metadata, same contract as
         ``mixture_resample``'s quota collect); the driver walks bins
         best-first to find the boundary bin and its remaining budget —
         bins above it are FULLY in (a map-only filter), bins below are
         out;
      2. only the boundary bin needs ordered accumulation, and that is
         a two-level distributed prefix sum: rows range-partition on
         their first two hash hex chars (256 contiguous ranges of the
         hash order), per-range token sums (<= 256 rows) give each
         range a driver-computed offset, and the running sum inside
         each range is a bounded window + its range's offset.

    No task ever windows more than ~|boundary bin|/256 rows, and the
    boundary bin itself is ~|corpus|/n_bins under any non-degenerate
    score distribution (a single-score corpus degenerates every row
    into one bin — inherent to cutting inside one score class — but
    still splits across the 256 hash ranges).

    Rows with a NULL/NaN score or a NULL/non-positive token count are
    excluded up front — they cannot be ordered or budgeted (a NaN
    score would silently bin as 0, and a non-positive count would
    break the running sum's monotonicity that the prefix semantics
    rely on). Scores must lie in [0, 1] (validated with a cheap
    min/max probe on the summary): the "<= n_bins rows on the driver"
    contract holds ONLY on that range — a raw-scale score column
    would otherwise yield up to one bin per distinct value and a
    corpus-cardinality collect.

    Corpus IO — exactly TWO scans of the source. Scan 1 builds a
    PERSISTED narrow summary (id, bin, tokens, hash) — a sliver of the
    rows it summarizes, the ``bm25_topk`` narrow-summary device — and
    every metadata pass (validation probe, bin totals, boundary-range
    sums, the kept-id relation) runs on that cache; the bin column is
    derived (floor(score*n_bins)), so no filter on it could reach
    parquet row-group stats anyway, which is why the old
    4-full-scan shape was pure waste. Scan 2 produces the result: a
    map-side bin prune (only surviving bins pass) followed by a semi
    join against the cache-derived kept-id relation — the shuffle
    carries ~output-sized relations on both sides, never the corpus.

    Returns: the input columns, boundary-prefix-selected; deterministic
    and engine-portable (the oracle replays the flat running-sum form).
    """
    from pyspark.sql import Window

    from ._cache import register_persisted

    spark = df.sparkSession
    sc = F.col(score_col).cast("double")
    valid = (
        sc.isNotNull()
        & ~F.isnan(sc)
        & F.col(tokens_col).isNotNull()
        & (F.col(tokens_col) > 0)
    )
    bin_col = F.floor(F.col(score_col) * F.lit(n_bins)).cast("int")
    s = register_persisted(
        df.filter(valid)
        .select(
            F.col(id_col),
            bin_col.alias("__b"),
            F.col(tokens_col).cast("long").alias("__t"),
            _bucket(F.col(id_col), seed).alias("__h"),
        )
        .persist(),
        "token_budget",
    )
    probe = s.agg(F.min("__b").alias("lo"), F.max("__b").alias("hi")).first()
    if probe["lo"] is not None and (probe["lo"] < 0 or probe["hi"] > n_bins):
        raise ValueError(
            f"select_by_token_budget: scores must lie in [0, 1] "
            f"(observed bins [{probe['lo']}, {probe['hi']}] with "
            f"n_bins={n_bins}) — the driver-side bin collect is only "
            "bounded on that range; rescale raw scores first (e.g. "
            "score_percentiles)"
        )
    bin_rows = sorted(
        s.groupBy("__b").agg(F.sum("__t").alias("t")).collect(),
        key=lambda r: -r["__b"],
    )
    acc = 0
    boundary = None
    remaining = 0
    for r in bin_rows:
        if acc + r["t"] <= budget:
            acc += r["t"]
        else:
            boundary = r["__b"]
            remaining = budget - acc
            break
    if boundary is None:  # everything (budgetable) fits
        return df.filter(valid).select(*df.columns)
    if remaining <= 0:
        # bins strictly above the boundary fit in full (empty when even
        # the best bin overflowed); bins below are out by monotonicity —
        # a pure map-side prune, no join needed
        return df.filter(valid & (bin_col > F.lit(boundary))).select(
            *df.columns
        )

    bb = s.filter(F.col("__b") == F.lit(boundary)).withColumn(
        "__s", F.substring(F.col("__h"), 1, 2)
    )
    range_rows = sorted(
        bb.groupBy("__s").agg(F.sum("__t").alias("t")).collect(),
        key=lambda r: r["__s"],
    )
    offsets, off = [], 0
    for r in range_rows:
        offsets.append((r["__s"], off))
        off += r["t"]
    odf = spark.createDataFrame(offsets, ["__s", "__off"])
    w = Window.partitionBy("__s").orderBy("__h", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    picked = (
        bb.join(F.broadcast(odf), "__s")
        .withColumn("__run", F.sum("__t").over(w) + F.col("__off"))
        .filter(F.col("__run") <= F.lit(remaining))
        .select(id_col)
    )
    kept = s.filter(F.col("__b") > F.lit(boundary)).select(id_col).unionByName(
        picked
    )
    return (
        df.filter(valid & (bin_col >= F.lit(boundary)))
        .join(kept, id_col, "left_semi")
        .select(*df.columns)
    )


def hamilton_allocation(
    df: DataFrame,
    group_col: str,
    target: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) quota allocation: split ``target``
    slots across groups proportionally to row counts, floors first,
    then one extra slot to the groups with the LARGEST integer
    remainder (ties to the lexically smallest group) until the total
    is exact — the allocation q130's plain floors can't give you when
    the budget must be hit to the row (sum(quota) == target always,
    the classic apportionment guarantee). Everything is integer
    arithmetic: floor = (target*n) div N, remainder = (target*n) mod N
    — no float fraction anywhere, so the oracle matches bit-for-bit.

    One per-group count (|groups| rows), a 1-row total folded by
    broadcast cross join, and one row_number window over the GROUPS
    relation. Corpus cost is the single count scan.

    Returns: (group_col, n_rows long, quota long), sum(quota)==target.
    """
    from pyspark.sql import Window

    if target < 0:
        raise ValueError(f"target must be >= 0, got {target}")
    counts = df.groupBy(F.col(group_col)).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__N"))
    # `div` is Spark's INTEGRAL division over longs — exact at any
    # magnitude, matching the oracle's // (the earlier form divided
    # the pmod-adjusted numerator with `/`, which is IEEE double
    # division and can truncate wrong past 2^53 in target*n_rows,
    # breaking the sum(quota)==target contract at extreme counts)
    based = counts.crossJoin(F.broadcast(total)).select(
        F.col(group_col),
        "n_rows",
        F.expr(f"(CAST({int(target)} AS BIGINT) * n_rows) div __N").alias(
            "__floor"
        ),
        F.pmod(F.lit(target) * F.col("n_rows"), F.col("__N")).alias("__rem"),
    )
    leftover = based.agg(
        (F.lit(target) - F.sum("__floor")).alias("__left")
    )
    w = Window.orderBy(F.col("__rem").desc(), F.col(group_col).asc())
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            F.col(group_col),
            "n_rows",
            (
                F.col("__floor")
                + F.when(F.col("__rk") <= F.col("__left"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    weight_col_or_map,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Training-mixture planning: given per-source integer-MILLI
    mixture weights and a total token ``budget``, report for every
    source its available tokens, its target token allocation
    (budget * w / 1000, integral div), the sampling rate it implies in
    integer MICRO units ((target * 1e6) div available — >1e6 means the
    source must repeat), and the epoch count that sustains it
    (ceil(target / available) by integer arithmetic) — the
    planning-sheet query a data-mixing run starts from (cf. Hoffmann
    et al. 2022's mixture accounting). Everything stays in long
    arithmetic, so the oracle matches bit-for-bit.

    ``weight_col_or_map``: a column name holding milli-weights, or a
    {group: milli_weight} dict applied via a broadcast literal map.
    Sources with zero available tokens report NULL rate/epochs.

    One corpus aggregation (token sums per source); the plan itself is
    |sources|-sized.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if isinstance(weight_col_or_map, dict):
        agg = df.groupBy(group_col).agg(
            F.sum(F.col(token_col)).cast("long").alias("available_tokens")
        )
        pairs = []
        for k, v in sorted(weight_col_or_map.items()):
            pairs += [F.lit(k), F.lit(int(v))]
        w = F.element_at(F.create_map(*pairs), F.col(group_col))
    else:
        # the weight column is functionally dependent on the group —
        # carry it through the aggregation as max()
        agg = df.groupBy(group_col).agg(
            F.sum(F.col(token_col)).cast("long").alias("available_tokens"),
            F.max(F.col(weight_col_or_map)).cast("long").alias("__w"),
        )
        w = F.col("__w")
    planned = agg.select(
        F.col(group_col),
        "available_tokens",
        w.cast("long").alias("milli_weight"),
    ).select(
        F.col(group_col),
        "available_tokens",
        "milli_weight",
        F.expr(
            f"(CAST({int(budget)} AS BIGINT) * milli_weight) div 1000"
        ).alias("target_tokens"),
    )
    rate = F.expr(
        "CASE WHEN available_tokens > 0 "
        "THEN (target_tokens * 1000000) div available_tokens END"
    )
    epochs = F.expr(
        "CASE WHEN available_tokens > 0 "
        "THEN (target_tokens + available_tokens - 1) div available_tokens END"
    )
    return planned.select(
        F.col(group_col),
        "available_tokens",
        "milli_weight",
        "target_tokens",
        rate.cast("long").alias("sample_rate_micro"),
        epochs.cast("long").alias("epochs"),
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    n_folds: int = 5,
    seed: str = "fold-v1",
    fold_col: str = "fold",
) -> DataFrame:
    """Add ``fold_col`` = 0..n_folds-1 from a content hash of
    ``key_col`` — the cross-validation / sharded-eval assignment that
    is stable across runs, partitionings, and engines (same md5 device
    as deterministic_split: fold = first 60 hash bits mod n_folds, so
    the DuckDB oracle replays it bit-for-bit). A pure projection: no
    shuffle, no RNG state; folds are balanced to within the hash's
    uniformity like any hash partitioner."""
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn(fold_col, F.pmod(h60, F.lit(int(n_folds))))


def hash_ring_negatives(
    df: DataFrame,
    id_col: str,
    n_neg: int = 2,
    seed: str = "neg-v1",
    bucket_hex: int = 3,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs
    via consistent hashing: every row sits on an md5 ring, and anchor
    ``a``'s j-th negative is the ring SUCCESSOR of probe hash
    md5(seed|a|j) — uniform over the corpus, stable across runs,
    partitionings, and engines, with no RNG state and no corpus-wide
    sort.

    Scale shape: successor search is bucketed, never global. Probes
    and candidates land in 16^``bucket_hex`` hash-prefix buckets; the
    in-bucket successor is ONE bucket-keyed sort window over the
    union (parallel across buckets). Probes whose bucket has no
    successor EQUI-join the bucket-successor relation (every bucket
    mapped to the next non-empty bucket's minimum candidate — a
    16^bucket_hex-row bounded-metadata relation, broadcast; its fill
    window sorts those 16^bucket_hex rows on one partition, which is
    why ``bucket_hex`` is capped at 5), and finally the 1-row global
    minimum (ring wrap). No driver-side data, no data-sized
    single-partition window, no non-equi join.

    Determinism details: probes sort before equal-hash candidates, so
    a candidate AT the probe coordinate counts as its successor; md5
    ties break on the candidate id. A probe whose successor is the
    anchor itself is dropped (that anchor gets n_neg - 1 negatives) —
    replacing it would need a second-successor pass for a
    ~1/n_rows-probability event.

    Returns (anchor id_col, neg_idx 1..n_neg, neg id_col suffixed
    '_neg').
    """
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    if not 1 <= bucket_hex <= 5:
        raise ValueError(f"bucket_hex must be in [1, 5], got {bucket_hex}")
    from pyspark.sql import Window

    neg_col = f"{id_col}_neg"
    cand = df.select(
        F.col(id_col).alias("__cid"),
        F.md5(
            F.concat(F.lit("ring-"), F.lit(seed), F.col(id_col).cast("string"))
        ).alias("__h"),
    )
    probes = df.select(
        F.col(id_col).alias("__aid"),
        F.explode(F.expr(f"sequence(1, {int(n_neg)})")).alias("__j"),
    ).select(
        "__aid",
        "__j",
        F.md5(
            F.concat(
                F.lit(seed),
                F.lit("|"),
                F.col("__aid").cast("string"),
                F.lit("|"),
                F.col("__j").cast("string"),
            )
        ).alias("__h"),
    )
    bkt = F.substring(F.col("__h"), 1, bucket_hex)
    u = cand.select(
        bkt.alias("__bkt"),
        "__h",
        F.lit(1).alias("__side"),
        F.col("__cid"),
        F.lit(None).cast("long").alias("__j"),
        F.lit(None).cast(cand.schema["__cid"].dataType).alias("__aid"),
    ).unionByName(
        probes.select(
            bkt.alias("__bkt"),
            "__h",
            F.lit(0).alias("__side"),
            F.lit(None).cast(cand.schema["__cid"].dataType).alias("__cid"),
            "__j",
            "__aid",
        )
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__h", "__side", F.col("__cid").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    with_succ = u.withColumn(
        "__succ", F.first("__cid", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 0)
    hits = with_succ.filter(F.col("__succ").isNotNull()).select(
        "__aid", "__j", F.col("__succ").alias(neg_col)
    )
    # bucket minima: bounded by min(16^bucket_hex, n_rows) rows
    bmins = cand.groupBy(F.substring("__h", 1, bucket_hex).alias("__cb")).agg(
        F.min(F.struct("__h", "__cid")).alias("__m")
    )
    # every possible bucket -> the next non-empty bucket's minimum
    # candidate (STRICTLY later bucket: an in-bucket miss means no
    # same-bucket candidate at or above the probe). The fill window
    # runs on the 16^bucket_hex-row relation — bounded metadata.
    spark = df.sparkSession
    all_bkts = spark.range(16 ** bucket_hex).select(
        F.lpad(F.lower(F.hex(F.col("id"))), bucket_hex, "0").alias("__cb")
    )
    wnext = Window.orderBy("__cb").rowsBetween(
        1, Window.unboundedFollowing
    )
    succ_map = all_bkts.join(F.broadcast(bmins), "__cb", "left").select(
        "__cb", F.first("__m", ignorenulls=True).over(wnext).alias("__nm")
    )
    misses = with_succ.filter(F.col("__succ").isNull()).select(
        "__aid", "__j", "__bkt"
    )
    resolved = misses.join(
        F.broadcast(succ_map), F.col("__bkt") == F.col("__cb")
    )
    later = resolved.filter(F.col("__nm").isNotNull()).select(
        "__aid", "__j", F.col("__nm.__cid").alias(neg_col)
    )
    wrap_min = cand.agg(F.min(F.struct("__h", "__cid")).alias("__g"))
    wrapped = (
        resolved.filter(F.col("__nm").isNull())
        .crossJoin(F.broadcast(wrap_min))
        .select("__aid", "__j", F.col("__g.__cid").alias(neg_col))
    )
    out = hits.unionByName(later).unionByName(wrapped)
    return (
        out.filter(F.col(neg_col) != F.col("__aid"))
        .select(
            F.col("__aid").alias(id_col),
            F.col("__j").cast("long").alias("neg_idx"),
            neg_col,
        )
    )


def percentile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "pct_micro",
) -> DataFrame:
    """Per-group percentile-rank normalization of an integer-valued
    score as a MICRO-integer: pct = 1e6 * (rank - 1) div (n - 1)
    (min-rank over value ties, 0 for singleton groups) — the
    cross-domain calibration step before a GLOBAL threshold (CCNet
    practice: a raw quality score is not comparable across languages;
    its within-language percentile is). Equal values get equal
    percentiles (RANK, not row_number), so the output is a pure
    function of (group, value) and engine-exact.

    Scale shape: one group-keyed sort window + the group-count
    window on the same partitioning (one exchange total); a single
    monster group serializes its own sort — the inherent cost, cured
    upstream by splitting the group.

    Returns df's columns plus ``out_col``.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    w = Window.partitionBy(group_col).orderBy(v.asc())
    wg = Window.partitionBy(group_col)
    return (
        df.withColumn("__rk", F.rank().over(w))
        .withColumn("__n", F.count("*").over(wg))
        .withColumn(
            out_col,
            F.expr("CASE WHEN __n > 1 THEN (1000000 * (__rk - 1)) div (__n - 1) ELSE 0 END"),
        )
        .drop("__rk", "__n")
    )
