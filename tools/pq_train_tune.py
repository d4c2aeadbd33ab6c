"""One-off experiment: what bounds trained-PQ recall at 1M clustered
vectors — routing (true neighbors in unprobed cells) or code
resolution (m/k_codes). Builds trained variants, reports recall@10 at
(nprobe, rerank) combinations plus the ROUTING CEILING (fraction of
true neighbors whose cell is among the query's nprobe nearest cells —
the recall any code budget could reach at that nprobe). Feeds the
SCALING.md numbers; not part of the test suite.

Usage: python tools/pq_train_tune.py [n]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.ann_bench import DIM, _exact_l2_truth, synthetic_clustered


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pq-train-tune")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from delta_lake_spark import read_delta
    from delta_lake_spark.operators import similarity as sim

    cvecs = synthetic_clustered(spark, n)
    cqueries = cvecs.filter(F.col("vec_id") < 10)
    truth = _exact_l2_truth(cvecs, cqueries, k=10)

    def crecall(index_path: str, nprobe: int, rerank: int) -> float:
        got: dict[int, set] = {}
        for r in sim.query_pq_index(
            cqueries, cvecs, index_path, k=10, nprobe=nprobe, rerank=rerank
        ).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return round(
            sum(len(got.get(q, set()) & nn) for q, nn in truth.items())
            / (10 * len(truth)),
            3,
        )

    def routing_ceiling(index_path: str, nprobe: int) -> float:
        """Max possible recall at this nprobe: share of true neighbors
        whose stored cell is among the query's nprobe nearest cells."""
        cells = {
            r.cell: np.array(r.cv)
            for r in read_delta(spark, f"{index_path}/cells").collect()
        }
        cell_ids = sorted(cells)
        C = np.array([cells[c] for c in cell_ids])
        q_rows = cqueries.collect()
        want = set()
        for q in q_rows:
            d = ((C - np.array(q.embedding)) ** 2).sum(axis=1)
            probed = {cell_ids[i] for i in np.argsort(d)[:nprobe]}
            want.update((q.vec_id, c) for c in probed)
        neighbor_ids = sorted({i for nn in truth.values() for i in nn})
        assign = {
            r.vec_id: r.cell_id
            for r in read_delta(spark, f"{index_path}/codes")
            .filter(F.col("vec_id").isin(neighbor_ids))
            .collect()
        }
        hit = sum(
            1
            for q, nn in truth.items()
            for i in nn
            if (q, assign[i]) in want
        )
        return round(hit / (10 * len(truth)), 3)

    variants = [
        ("m8", 8, 10),
        ("m16", 16, 10),
    ]
    tmp = tempfile.mkdtemp(prefix="pq_tune_")
    try:
        for name, m, iters in variants:
            p = os.path.join(tmp, name)
            t0 = time.perf_counter()
            sim.build_pq_index(
                cvecs, p, n_cells=128, m=m, k_codes=256, dim=DIM,
                residual=True, train_iters=iters,
            )
            build_s = round(time.perf_counter() - t0, 2)
            out = {"variant": name, "build_s": build_s}
            for nprobe in (4, 8):
                out[f"ceiling_np{nprobe}"] = routing_ceiling(p, nprobe)
                for rerank in (16,):
                    out[f"recall_np{nprobe}_rr{rerank}"] = crecall(
                        p, nprobe, rerank
                    )
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
