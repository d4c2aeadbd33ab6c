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
