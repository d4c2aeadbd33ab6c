"""Dedup/ANN scale microbench: substantiates the SCALING.md claims
that MinHash-LSH candidate generation stays LINEAR in corpus size
(banded equi-join + stop-shingle guard + bucket cap — never A x B) and
that probing the persistent signature index costs O(batch), not
O(corpus), per batch.

Synthetic corpus: ``n`` documents of 30 words drawn deterministically
from a 50k-word vocabulary (xxhash64-seeded, so runs are reproducible
and shard-order-independent); every 97th document is a near-duplicate
of its neighbor (same 30 words plus one extra), planting ~1% true
near-dup pairs whose jaccard (30/31 shared shingle overlap) clears the
0.6 default threshold.

Measured per scale (one JSON line each):
  - minhash_pairs_s: full minhash_lsh_pairs wall time (shingle ->
    k=64 signatures -> 16-band buckets -> exact verify) and the pair /
    candidate counts backing the linearity claim;
  - index_build_s:   build_signature_index over the corpus (the
    amortized once-per-corpus cost);
  - index_probe_s:   near_dups_against_index for a 1% batch against
    the stored index — the steady-state daily cost.

Usage:  python tools/dedup_bench.py [n_docs ...]   (default 1e5 1e6)
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

DOC_WORDS = 30
VOCAB = 50_000
NEAR_DUP_EVERY = 97


def synthetic_corpus(spark: SparkSession, n: int, offset: int = 0) -> DataFrame:
    """(doc_id, text) relation of ``n`` synthetic documents (see module
    docstring). ``offset`` shifts the id range (probe batches). Built
    entirely from codegen'd expressions — no driver-side text."""
    base = spark.range(offset, offset + n).select(F.col("id").alias("doc_id"))
    # every NEAR_DUP_EVERY-th doc copies its predecessor's words
    content_id = F.when(
        (F.pmod(F.col("doc_id"), F.lit(NEAR_DUP_EVERY)) == 0)
        & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_WORDS)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("__cid"), i), F.lit(VOCAB))
        ),
    )
    extra = F.when(
        (F.pmod(F.col("doc_id"), F.lit(NEAR_DUP_EVERY)) == 0)
        & (F.col("doc_id") > 0),
        F.concat(F.lit(" x"), F.col("doc_id")),
    ).otherwise(F.lit(""))
    return base.withColumn("__cid", content_id).select(
        "doc_id",
        F.concat(F.concat_ws(" ", words), extra).alias("text"),
    )


def probe_batch(
    spark: SparkSession, corpus_n: int, batch_n: int
) -> DataFrame:
    """A ``batch_n``-doc probe batch in which every doc is a true
    near-duplicate of one corpus document (its 30 words plus one fresh
    word: 28 of 29 trigram shingles shared, jaccard ~0.97), so the
    index-probe measurement exercises the full candidate + exact-verify
    path, not just empty bucket lookups."""
    base = spark.range(batch_n).select(
        (F.col("id") + 10 * corpus_n).alias("doc_id"),
        F.pmod(F.col("id") * 101, F.lit(corpus_n)).alias("__cid"),
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_WORDS)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("__cid"), i), F.lit(VOCAB))
        ),
    )
    return base.select(
        "doc_id",
        F.concat(
            F.concat_ws(" ", words), F.lit(" p"), F.col("doc_id")
        ).alias("text"),
    )


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.dedup import (
        build_signature_index,
        minhash_lsh_candidates,
        minhash_lsh_pairs,
        near_dups_against_index,
        word_shingles,
    )

    corpus = synthetic_corpus(spark, n)
    out: dict = {"n_docs": n}

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id").count()
    out["minhash_pairs_s"] = round(time.perf_counter() - t0, 2)
    out["n_pairs"] = pairs

    # candidate count (pre-verification) — the linearity witness
    t0 = time.perf_counter()
    sh = word_shingles(corpus, "text", "doc_id")
    out["n_candidates"] = minhash_lsh_candidates(
        sh, "doc_id", n_docs=n
    ).count()
    out["candidates_s"] = round(time.perf_counter() - t0, 2)

    tmp = tempfile.mkdtemp(prefix="dedup_bench_idx_")
    try:
        idx = os.path.join(tmp, "idx")
        t0 = time.perf_counter()
        build_signature_index(corpus, "text", "doc_id", idx)
        out["index_build_s"] = round(time.perf_counter() - t0, 2)

        batch = probe_batch(spark, n, max(n // 100, 100))
        t0 = time.perf_counter()
        out["n_probe_hits"] = near_dups_against_index(
            batch, corpus, "text", "doc_id", idx
        ).count()
        out["index_probe_s"] = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dedup-scale-bench")
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
