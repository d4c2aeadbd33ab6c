"""PageRank scale microbench: substantiates the SCALING.md claim that
the distributed path is per-iteration linear in edges (one rank join +
one dst aggregate over the persisted weighted relation), and that the
driver strategy is the right call under the 1M-edge bound.

Graph: a deterministic Barabasi-flavoured multigraph over n_nodes —
edge i connects src = i % n_nodes to dst = (i * 2654435761) %
(i % 17 + 1 == 1 ? hub_count : n_nodes) so a 17th of the mass funnels
into a small hub set (the skew a web graph has), built entirely from
spark.range (no driver materialization).

Measured per scale (one JSON line each):
  - n_edges / n_nodes
  - t_driver_s (only when edges <= bound): auto-strategy path
  - t_dist_s: strategy='distributed', 5 iterations, eager checkpoints
  - top1 agreement between the two strategies when both run

Usage:  python tools/graph_bench.py [n_edges ...]  (default 1e5 1e6 1e7)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.operators._cache import clear_session_caches
from delta_lake_spark.operators.graph import _DRIVER_EDGE_BOUND, pagerank

HUBS = 64


def synthetic_edges(spark, n_edges: int):
    n_nodes = max(n_edges // 10, 100)
    i = F.col("id")
    mix = (i * F.lit(2654435761)).cast("long")
    hubby = F.pmod(i, F.lit(17)) == 0
    dst = F.when(hubby, F.pmod(mix, F.lit(HUBS))).otherwise(
        F.pmod(mix, F.lit(n_nodes))
    )
    return (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("n"), F.pmod(i, F.lit(n_nodes))).alias("src"),
            F.concat(F.lit("n"), dst).alias("dst"),
        )
    ), n_nodes


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("graph-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n_edges in sizes:
        edges, n_nodes = synthetic_edges(spark, n_edges)
        edges = edges.localCheckpoint(eager=True)  # isolate build cost

        t0 = time.time()
        dist = (
            pagerank(edges, iterations=5, strategy="distributed")
            .orderBy(F.col("rank").desc(), "node")
            .limit(5)
            .collect()
        )
        t_dist = time.time() - t0
        clear_session_caches()

        t_driver = None
        agree = None
        if n_edges <= _DRIVER_EDGE_BOUND:
            t0 = time.time()
            drv = (
                pagerank(edges, iterations=5, strategy="driver")
                .orderBy(F.col("rank").desc(), "node")
                .limit(5)
                .collect()
            )
            t_driver = round(time.time() - t0, 2)
            agree = [r.node for r in drv] == [r.node for r in dist] and all(
                abs(a.rank - b.rank) < 1e-9 for a, b in zip(drv, dist)
            )
            clear_session_caches()

        print(
            json.dumps(
                {
                    "n_edges": n_edges,
                    "n_nodes": n_nodes,
                    "t_dist_s": round(t_dist, 2),
                    "t_driver_s": t_driver,
                    "top5_agree": agree,
                    "top1": dist[0].node,
                    "top1_rank": round(dist[0].rank, 9),
                }
            ),
            flush=True,
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
