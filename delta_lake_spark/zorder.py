"""Z-order (Morton) clustering: multi-dimensional data layout so
file-level min/max skipping prunes on ANY of the clustered columns.

Range clustering (``optimize(cluster_by=[a, b])``) sorts
lexicographically — files get tight ranges on ``a`` but arbitrary
ranges on ``b``, so predicates on ``b`` alone prune nothing. Z-order
interleaves the bit-codes of all clustered columns into one sort key,
giving every column locality proportional to its bit share: with 2
columns at 6 bits each, a point predicate on either column prunes
~(1 - 1/2^6) of the files (Delta Lake's OPTIMIZE ZORDER BY; the
classic Morton-curve layout).

Spark-first design: bucket ids come from **approximate quantiles**
(one distributed ``approxQuantile`` pass, driver holds B-1 boundaries
per column), so skewed columns still spread across all buckets —
uniform-width buckets would collapse under skew. The Z-value itself is
a pure column expression (array aggregate over the boundary literals +
bit shifts), fully codegen'd; the rewrite is
``repartitionByRange(z).sortWithinPartitions(z)`` — one shuffle, no
driver data movement, scales to any table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampType,
    TimestampNTZType,
)

_NUMERIC = (
    ByteType,
    ShortType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    DecimalType,
)


def _as_double(df: DataFrame, col: str) -> Column:
    """Project a column onto a double axis for quantile bucketing.
    Ordered types keep their order; other types (string, binary) go
    through a hash — equal values still co-locate, range locality is
    meaningless for them anyway."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, _NUMERIC):
        return c.cast("double")
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return c.cast("double")
    if isinstance(dt, DateType):
        return c.cast("timestamp").cast("double")
    return F.xxhash64(c).cast("double")


def zvalue_expr(stats_df: DataFrame, cols: list[str], bits: int = 6) -> Column:
    """Build the Z-value expression for ``cols``.

    ``stats_df`` supplies the quantile boundaries (read it once over the
    data being clustered); the returned Column can then be applied to
    any DataFrame with the same columns. ``bits`` per column: 6 bits =
    64 buckets per dimension; total key width = bits * len(cols) <= 63.
    """
    if not cols:
        raise ValueError("zorder requires at least one column")
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63-bit key")
    buckets = 1 << bits
    probs = [i / buckets for i in range(1, buckets)]

    proj = stats_df.select(
        *[_as_double(stats_df, c).alias(f"__z{i}") for i, c in enumerate(cols)]
    )
    # one pass, all columns at once (Greenwald-Khanna sketch per column)
    boundaries = proj.stat.approxQuantile(
        [f"__z{i}" for i in range(n)], probs, 1.0 / (4 * buckets)
    )

    z: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = _as_double(stats_df, c)
        # bucket = #boundaries <= value (duplicate boundaries from skew
        # just merge buckets); nulls sort into bucket 0
        arr = F.array(*[F.lit(b) for b in boundaries[j]])
        bucket = F.coalesce(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, x: acc + F.when(v >= x, 1).otherwise(0),
            ),
            F.lit(0),
        )
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, i * n + j)
    return z


def hilbert_index_expr(x_col, y_col, bits: int = 6) -> Column:
    """Hilbert-curve index of two PRE-BUCKETED integer coordinates in
    [0, 2^bits) — the locality-preserving alternative to the Morton
    interleave (Z-order's jump discontinuities leave some file ranges
    straddling the space; the Hilbert curve is continuous, so file
    min/max boxes are tighter — the layout Databricks' liquid
    clustering moved to). Pure integer column arithmetic: the
    standard xy2d walk unrolled as one fold over the bit levels
    (flip + swap rotation per level), XOR expressed arithmetically
    (3rx + ry - 2*rx*ry*... = 3rx ^ ry for bits) so any engine
    replays it bit-for-bit.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    n = 1 << bits
    levels = ", ".join(str(1 << i) for i in range(bits - 1, -1, -1))
    x = f"CAST({x_col} AS BIGINT)" if isinstance(x_col, str) else None
    y = f"CAST({y_col} AS BIGINT)" if isinstance(y_col, str) else None
    if x is None or y is None:
        raise ValueError("hilbert_index_expr takes column NAMES")
    return F.expr(
        f"""aggregate(
  array({levels}),
  named_struct('x', {x}, 'y', {y}, 'd', CAST(0 AS BIGINT)),
  (st, s) -> named_struct(
    'x', IF((st.y div s) % 2 = 0,
            IF((st.x div s) % 2 = 1, {n} - 1 - st.y, st.y), st.x),
    'y', IF((st.y div s) % 2 = 0,
            IF((st.x div s) % 2 = 1, {n} - 1 - st.x, st.x), st.y),
    'd', st.d + CAST(s AS BIGINT) * s *
         (3 * ((st.x div s) % 2) + ((st.y div s) % 2)
          - 2 * ((st.x div s) % 2) * ((st.y div s) % 2))),
  st -> st.d)"""
    )


def hilbert_layout(df: DataFrame, cols: list[str], bits: int = 6) -> DataFrame:
    """Rewrite-ready Hilbert clustering over two columns: quantile
    buckets per column (the zvalue_expr device, so skew still spreads)
    feed :func:`hilbert_index_expr`; the caller repartitions by range
    on the returned ``__hilbert`` column and sorts within partitions —
    one shuffle, identical write discipline to Z-order."""
    if len(cols) != 2:
        raise ValueError("hilbert_layout clusters exactly 2 columns")
    buckets = 1 << bits
    probs = [i / buckets for i in range(1, buckets)]
    proj = df.select(
        *[_as_double(df, c).alias(f"__z{i}") for i, c in enumerate(cols)]
    )
    boundaries = proj.stat.approxQuantile(
        [f"__z{i}" for i in range(2)], probs, 1.0 / (4 * buckets)
    )
    out = df
    for j, c in enumerate(cols):
        v = _as_double(df, c)
        arr = F.array(*[F.lit(b) for b in boundaries[j]])
        out = out.withColumn(
            f"__hb{j}",
            F.coalesce(
                F.aggregate(
                    arr,
                    F.lit(0),
                    lambda acc, x: acc + F.when(v >= x, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
    return out.withColumn(
        "__hilbert", hilbert_index_expr("__hb0", "__hb1", bits)
    ).drop("__hb0", "__hb1")
