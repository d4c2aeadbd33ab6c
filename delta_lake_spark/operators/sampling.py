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
