"""Corpus-curation scale microbench: substantiates the SCALING.md
claims that ``shard_shuffle`` and ``select_by_token_budget`` stay
LINEAR in corpus size with bounded per-task state.

``shard_shuffle`` is one hash exchange + per-shard row_number windows;
its cost should track rows/shard, not corpus size, per task.
``select_by_token_budget`` must never globally sort: its driver state
is <= n_bins + 256 aggregate rows whatever the corpus size, and only
the boundary score-bin (~corpus/n_bins rows) flows through the
prefix-sum windows. A superlinear jump between scales would mean one
of those bounds broke.

Synthetic corpus: ``n`` rows with a deterministic score in [0, 1)
(xxhash64-derived, so uniform across the 1000 bins) and token counts
10..59. Budget is set to half the total token mass, forcing a real
boundary cut at every scale.

Measured per scale (one JSON line each):
  - shard_shuffle_s:  full assignment + in-shard ordering wall time
    (n/100k shards, so shard size is constant across scales);
  - budget_select_s:  full best-first selection wall time and the
    selected-row count;
  - boundary_rows:    rows in the boundary bin (the only ordered part
    — the linearity claim is that this stays ~n/n_bins).

Usage:  python tools/curation_bench.py [n_rows ...]   (default 1e5 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.operators.sampling import (
    select_by_token_budget,
    shard_shuffle,
)


def synthetic(spark: SparkSession, n: int):
    """(id, score, tok) with uniform deterministic scores and bounded
    token counts — built from codegen'd expressions, no driver data."""
    return spark.range(n).select(
        F.col("id"),
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1_000_000))
            / F.lit(1_000_000.0)
        ).alias("score"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(50)) + F.lit(10))
        .cast("long")
        .alias("tok"),
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for n in sizes:
        corpus = synthetic(spark, n).persist()
        total = corpus.agg(F.sum("tok")).collect()[0][0]
        budget = total // 2

        t0 = time.monotonic()
        shards = max(1, n // 100_000)
        shard_shuffle(corpus, "id", n_shards=shards).agg(
            F.max("pos")
        ).collect()
        t_shard = time.monotonic() - t0

        t0 = time.monotonic()
        picked = select_by_token_budget(
            corpus, "score", "tok", "id", budget=budget
        ).count()
        t_budget = time.monotonic() - t0

        boundary = (
            corpus.groupBy(F.floor(F.col("score") * 1000).alias("b"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        print(
            json.dumps(
                {
                    "n": n,
                    "shard_shuffle_s": round(t_shard, 2),
                    "n_shards": shards,
                    "budget_select_s": round(t_budget, 2),
                    "selected": picked,
                    "budget": budget,
                    "boundary_rows_max_bin": boundary,
                }
            )
        )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
