"""Sketch scale microbench: substantiates the SCALING.md claims that
hll_distinct / countmin_counts replace corpus-cardinality shuffles
with fixed sketch state, at matching accuracy.

Synthetic tokens: n rows, vocabulary of ~n/10 distinct values spread
over 5 groups (deterministic xxhash64 arithmetic, no driver data).

Per scale, one JSON line:
  - hll_s / exact_distinct_s: per-group distinct-count wall time,
    sketch vs exact COUNT(DISTINCT);
  - hll_max_rel_err: worst per-group |est - exact| / exact;
  - cm_s / exact_counts_s: frequency estimates for a 100-term probe
    set, sketch vs exact per-term counts;
  - cm_overcount_max: worst probe overcount (CM never undercounts).

Usage: python tools/sketch_bench.py [n_rows ...]  (default 1e6 1e7)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synthetic_tokens(spark: SparkSession, n: int):
    vocab = max(1000, n // 10)
    return spark.range(n).select(
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(5))).alias("g"),
        F.concat(
            F.lit("tok-"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(vocab)),
        ).alias("v"),
    )


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.sketches import (
        countmin_counts,
        hll_distinct,
    )

    toks = synthetic_tokens(spark, n)
    out: dict = {"n_rows": n}

    t0 = time.perf_counter()
    est = {r.g: r.est_distinct for r in hll_distinct(toks, "v", ["g"]).collect()}
    out["hll_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    exact = {
        r.g: r.d
        for r in toks.groupBy("g")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    out["exact_distinct_s"] = round(time.perf_counter() - t0, 2)
    out["hll_max_rel_err"] = round(
        max(abs(est[g] - exact[g]) / exact[g] for g in exact), 4
    )

    probes = (
        spark.range(100)
        .select(F.concat(F.lit("tok-"), F.col("id")).alias("v"))
    )
    t0 = time.perf_counter()
    cm = {r.v: r.est_count for r in countmin_counts(toks, "v", probes).collect()}
    out["cm_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ex = {
        r.v: r.c
        for r in toks.join(F.broadcast(probes), "v")
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    out["exact_counts_s"] = round(time.perf_counter() - t0, 2)
    assert all(cm[v] >= ex.get(v, 0) for v in cm), "CM undercounted"
    out["cm_overcount_max"] = max(cm[v] - ex.get(v, 0) for v in cm)
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sketch-scale-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in scales:
        print(json.dumps(bench_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
