"""SemDeDup scale microbench: substantiates the SCALING.md claim that
cluster-confined semantic dedup stays tractable when the corpus grows —
the quadratic cosine step is bounded per cell (n_cells derives as
n/2000, so mean cell size stays ~2000 regardless of corpus size) and
the whole pass is one cell-keyed self-join plus, for the paper's
centroid_far keep rule, one per-cell centroid aggregation.

Synthetic clustered vectors (what embedded near-dup corpora look like):
each id draws a center from ``id % n_topics`` plus small deterministic
noise, with n_topics scaling as n/2000 so topic mass stays ~2000 per
center at every scale (a corpus whose topic count did NOT grow with its
size would defeat ANY cluster-confined dedup — the cells themselves
would grow unboundedly).

Measured per scale (one JSON line each):
  - builtin_s: semantic_dedup keep='centroid_far' engine='builtin'
               (codegen'd cell-keyed self-join) end to end;
  - arrow_s:   same semantics, engine='arrow' (one GEMM per cell);
  - n_cells:   derived cell count (the quadratic bound);
  - kept_frac: surviving fraction (sanity: clustered noise dedups
               aggressively; both engines must agree on it).

The builtin leg is skipped above 200k vectors (pair count makes it the
known-slow baseline; the arrow leg is the scale path), and above 200k
the arrow leg also uses assign='arrow' — the codegen'd crossJoin
assignment is |corpus| x n_cells cosine folds and was the measured
>30-minute wall at 1M x 500 before the GEMM assignment existed.

Usage:  python tools/semdedup_bench.py [n_vectors ...]  (default 1e5 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 64


def synthetic_clustered(spark: SparkSession, n: int, n_clusters: int | None = None):
    if n_clusters is None:
        n_clusters = max(64, n // 2000)
    cluster = F.pmod(F.col("id"), F.lit(n_clusters))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (
                F.pmod(F.xxhash64(cluster, i, F.lit(7)), F.lit(2001))
                - F.lit(1000)
            )
            / F.lit(1000.0)
            + F.lit(0.05)
            * (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - F.lit(1000)
            )
            / F.lit(1000.0),
        ).alias("embedding"),
    )


def main() -> None:
    from delta_lake_spark.operators.similarity import semantic_dedup

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "100g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("semdedup_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        vecs = synthetic_clustered(spark, n).persist()
        vecs.count()
        n_cells = max(8, -(-n // 2000))
        builtin_s = None
        if n <= 200_000:
            t0 = time.time()
            semantic_dedup(
                vecs, n_cells=n_cells, threshold=0.9, iterations=2,
                dim=DIM, keep="centroid_far",
            ).filter("kept").count()
            builtin_s = round(time.time() - t0, 3)
        t0 = time.time()
        kept = (
            semantic_dedup(
                vecs, n_cells=n_cells, threshold=0.9, iterations=2,
                dim=DIM, keep="centroid_far", engine="arrow",
                assign="arrow" if n > 200_000 else "builtin",
            )
            .filter("kept")
            .count()
        )
        arrow_s = round(time.time() - t0, 3)
        vecs.unpersist()
        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "n_cells": n_cells,
                    "builtin_s": builtin_s,
                    "arrow_s": arrow_s,
                    "kept_frac": round(kept / n, 4),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
