"""ANN scale microbench: substantiates the SCALING.md claims that the
persistent IVFPQ index amortizes corpus encoding (build once, every
query batch touches only stored m-byte codes + probed cells) and that
ad-hoc ivfpq_topk re-encodes the corpus per call.

Synthetic vectors: dim-64 arrays derived from xxhash64(id, position),
scaled to [-1, 1] — deterministic, shard-order-independent, built
entirely from codegen'd expressions (no driver-side data).

Measured per scale (one JSON line each):
  - adhoc_s:        ivfpq_topk end to end (codebook training + corpus
                    encode + routed ADC + rerank) for a 10-query batch;
  - index_build_s:  build_pq_index over the corpus (once per corpus);
  - index_query_s:  query_pq_index for the same 10-query batch against
                    the stored codes — the steady-state per-batch cost;
  - n_rows:         result rows (sanity: 10 queries x k).

Usage:  python tools/ann_bench.py [n_vectors ...]   (default 1e5 1e6)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64


def synthetic_vectors(spark: SparkSession, n: int) -> DataFrame:
    """(vec_id, embedding array<double>) — deterministic pseudo-random
    dim-64 vectors in [-1, 1]. UNIFORM noise: the adversarial case for
    any clustering-based ANN (no structure to exploit)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - F.lit(1000)
            )
            / F.lit(1000.0),
        ).alias("embedding"),
    )


def synthetic_clustered(spark: SparkSession, n: int, n_clusters: int = 64) -> DataFrame:
    """Clustered vectors (what real embeddings look like): each id
    draws a cluster center from ``id % n_clusters`` plus small
    deterministic noise — residual encoding should pay here."""
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
            + F.lit(0.15)
            * (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - F.lit(1000)
            )
            / F.lit(1000.0),
        ).alias("embedding"),
    )


def _exact_l2_truth(
    vecs: DataFrame, queries: DataFrame, k: int
) -> dict[int, set]:
    """Exact L2 top-k ground truth via one vectorized numpy pass
    (mapInPandas local top-k per Arrow batch, tiny global reduce)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    q_rows = queries.select("vec_id", "embedding").collect()  # 10 rows
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            # squared L2 via the expanded form (vectorized)
            d = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ q_mat.T)
                + (q_mat * q_mat).sum(axis=1)[None, :]
            )
            out_q, out_n, out_d = [], [], []
            for j in range(d.shape[1]):
                mask = ids != q_ids[j]
                cand = np.nonzero(mask)[0]
                order = np.lexsort((ids[cand], d[cand, j]))[:k]
                sel = cand[order]
                out_q.extend([q_ids[j]] * len(sel))
                out_n.extend(ids[sel])
                out_d.extend(d[sel, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "d": out_d}
            )

    from pyspark.sql import Window

    local = vecs.select("vec_id", "embedding").mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, d double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc()
    )
    truth: dict[int, set] = {}
    for r in (
        local.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .collect()
    ):
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    return truth


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.similarity import (
        build_pq_index,
        ivfpq_topk,
        query_pq_index,
    )

    # cells sized so each holds ~4k vectors (the IVF contract at scale)
    n_cells = max(16, n // 4096)
    vecs = synthetic_vectors(spark, n)
    queries = vecs.filter(F.col("vec_id") < 10)
    out: dict = {"n_vectors": n, "n_cells": n_cells}

    # measured index-first, ad-hoc LAST: the expression-path ad-hoc run
    # allocates millions of interpreted-HOF structs whose GC pressure
    # bleeds into whatever runs next in the same JVM
    tmp = tempfile.mkdtemp(prefix="ann_bench_idx_")
    try:
        idx = os.path.join(tmp, "idx")
        t0 = time.perf_counter()
        build_pq_index(vecs, idx, n_cells=n_cells, m=4, k_codes=16, dim=DIM)
        out["index_build_s"] = round(time.perf_counter() - t0, 2)

        best = None
        for _ in range(2):  # best-of-2: steady-state per-batch cost
            t0 = time.perf_counter()
            n_served = query_pq_index(
                queries, vecs, idx, k=10, nprobe=4
            ).count()
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
        out["index_query_s"] = round(best, 2)
        out["n_rows"] = n_served

        # recall@10 of the routed/quantized search vs exact L2 — the
        # quality half of the speed claim (numpy exact pass per batch)
        truth = _exact_l2_truth(vecs, queries, k=10)

        def recall(index_path: str) -> float:
            got: dict[int, set] = {}
            for r in query_pq_index(
                queries, vecs, index_path, k=10, nprobe=4
            ).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            return round(
                sum(len(got.get(q, set()) & nn) for q, nn in truth.items())
                / (10 * len(truth)),
                3,
            )

        out["recall_at_10"] = recall(idx)

        # residual-encoded twin (IVFADC proper): same routing, codebook
        # trained on residuals; measured at identical nprobe so any
        # difference is attributable to the encoding. NOTE: on UNIFORM
        # noise residual encoding is expected to LOSE — the deterministic
        # member-vector "centroids" are arbitrary points there, so the
        # residual carries ~2x the variance of the vector itself; the
        # clustered corpus below is where the recipe pays (real
        # embeddings cluster).
        ridx = os.path.join(tmp, "ridx")
        t0 = time.perf_counter()
        build_pq_index(
            vecs, ridx, n_cells=n_cells, m=4, k_codes=16, dim=DIM,
            residual=True,
        )
        out["residual_build_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        out["recall_at_10_residual"] = recall(ridx)
        out["residual_query_s"] = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # clustered corpus (embedding-shaped, 64 latent clusters): recall
    # of raw vs residual codes at the same nprobe — the structured half
    # of the recall story. n_cells=128 >= cluster count so the coarse
    # quantizer can capture the structure (the residual recipe's
    # precondition: with fewer cells than clusters the residual carries
    # inter-cluster offsets and loses its advantage). Reported at the
    # default rerank=4 and at rerank=16 (the production shortlist
    # depth that lets code-level discrimination show).
    cvecs = synthetic_clustered(spark, n)
    cqueries = cvecs.filter(F.col("vec_id") < 10)
    tmp = tempfile.mkdtemp(prefix="ann_bench_cidx_")
    try:
        ctruth = _exact_l2_truth(cvecs, cqueries, k=10)

        def crecall(index_path: str, rerank: int) -> float:
            got: dict[int, set] = {}
            for r in query_pq_index(
                cqueries, cvecs, index_path, k=10, nprobe=4, rerank=rerank
            ).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            return round(
                sum(len(got.get(q, set()) & nn) for q, nn in ctruth.items())
                / (10 * len(ctruth)),
                3,
            )

        for key, res in (
            ("recall_clustered", False),
            ("recall_clustered_residual", True),
        ):
            p = os.path.join(tmp, key)
            t0 = time.perf_counter()
            build_pq_index(
                cvecs, p, n_cells=128, m=4, k_codes=16, dim=DIM,
                residual=res,
            )
            out[key + "_build_s"] = round(time.perf_counter() - t0, 2)
            out[key] = crecall(p, rerank=4)
            out[key + "_rerank16"] = crecall(p, rerank=16)

        # PRODUCTION code budgets: k-means-trained quantizers with
        # 8-bit codebooks (k_codes=256, the standard IVFADC recipe) —
        # the toy member-vector codebooks above show the pipeline
        # works; THESE rows show the recall a production deployment
        # gets at the same nprobe/rerank. The routing ceiling is 1.0
        # at nprobe=4 on this corpus (tools/pq_train_tune.py), so any
        # recall left on the table here is CODE RESOLUTION — which is
        # why m=16 closes it and m=8 does not.
        for key, m_budget, res in (
            ("recall_trained_m8k256", 8, False),
            ("recall_trained_m8k256_residual", 8, True),
            ("recall_trained_m16k256_residual", 16, True),
        ):
            p = os.path.join(tmp, key)
            t0 = time.perf_counter()
            build_pq_index(
                cvecs, p, n_cells=128, m=m_budget, k_codes=256, dim=DIM,
                residual=res, train_iters=10,
            )
            out[key + "_build_s"] = round(time.perf_counter() - t0, 2)
            out[key] = crecall(p, rerank=4)
            out[key + "_rerank16"] = crecall(p, rerank=16)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    if n <= 100_000:
        t0 = time.perf_counter()
        adhoc = ivfpq_topk(
            vecs, queries, k=10, n_cells=n_cells, nprobe=4, dim=DIM
        )
        n_adhoc = adhoc.count()
        out["adhoc_s"] = round(time.perf_counter() - t0, 2)
        assert n_adhoc == out["n_rows"], (n_adhoc, out["n_rows"])
    else:
        # the interpreted-expression encode is exactly what does NOT
        # scale (the reason build/update default to the arrow path);
        # measuring it beyond 100k would take tens of minutes to prove
        # a point the 100k row already makes
        out["adhoc_s"] = None
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ann-scale-bench")
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
