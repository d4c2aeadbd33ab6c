"""Eval-metrics scale microbench: substantiates the SCALING.md claims
that auc_score's cost is one score-distinct group-by (bounded by score
granularity, not corpus rows) and that calibration_bins /
threshold_sweep are single map-side-combined aggregations.

Corpus: spark.range-derived synthetic scores — score = (id * 2654435761
% 100001) / 100000.0 (so there are at most 100001 DISTINCT score values
at ANY corpus size: the AUC window stays fixed-width while the scan
grows), label = hash-derived with probability increasing in score (so
AUC is informative, ~0.6+).

Measured per scale (one JSON line each): wall seconds for each of the
three operators plus the AUC value (scale-invariant by construction —
a drifting value would flag a correctness bug, not a perf one).

Usage:  python tools/metrics_bench.py [n_rows ...] (default 1e6 1e7 1e8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.operators.stats import (
    auc_score,
    calibration_bins,
    threshold_sweep,
)


def synthetic_scored(spark, n: int):
    i = F.col("id")
    score = (F.pmod(i * F.lit(2654435761), F.lit(100001))) / F.lit(100000.0)
    # label: positive with probability ~score (deterministic hash coin)
    coin = F.pmod(i * F.lit(40503) + F.lit(7), F.lit(100000)) / F.lit(100000.0)
    return spark.range(n).select(
        score.alias("prob"), (F.col("prob") > coin).alias("pos")
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        1_000_000, 10_000_000, 100_000_000,
    ]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("metrics-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        df = synthetic_scored(spark, n)
        t0 = time.time()
        auc = auc_score(df, "prob", "pos").collect()[0]
        t_auc = time.time() - t0
        t0 = time.time()
        n_bins = calibration_bins(df, "prob", "pos").count()
        t_cal = time.time() - t0
        t0 = time.time()
        n_th = threshold_sweep(df, "prob", "pos").count()
        t_sweep = time.time() - t0
        print(
            json.dumps(
                {
                    "n_rows": n,
                    "t_auc_s": round(t_auc, 2),
                    "t_calibration_s": round(t_cal, 2),
                    "t_sweep_s": round(t_sweep, 2),
                    "auc": auc.auc,
                    "bins": n_bins,
                    "thresholds": n_th,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
