"""Pretraining-funnel scale microbench: substantiates the SCALING.md
claim that the q137/q170-family funnel's per-stage costs stay
NEAR-LINEAR in corpus size at the production (MinHash-LSH) tier — the
shape that matters at 100 TB, where every stage must be one hash
shuffle or map-only and the report one corpus pass.

Synthetic corpus (codegen'd expressions, no driver-side text): ``n``
documents of ~54 words from a 50k-word vocabulary (xxhash64-seeded,
reproducible, shard-order-independent), salted with two Gopher
stopwords so the quality stage keys on real rules. Planted structure:
  - every 19th-ish doc is 10 words long       -> fails quality (~5%)
  - every 53rd doc copies its predecessor     -> exact duplicate
  - every 97th doc copies predecessor + extra -> near duplicate
  - every 101st doc copies an eval doc        -> contaminated
The first 100 ids are the eval split (mirrors _funnel_core's shape).

Measured per scale (one JSON line each): wall time of each funnel
stage — quality, exact dedup, MinHash-LSH near-dedup (banded buckets,
never all-pairs), n-gram decontamination — plus the one-pass survival
report, with surviving-doc counts as the correctness witness.

Usage:  python tools/funnel_bench.py [n_docs ...]   (default 1e5 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_WORDS = 52
VOCAB = 50_000
EVAL_DOCS = 100
SHORT_EVERY, EXACT_EVERY, NEAR_EVERY, CONTAM_EVERY = 19, 53, 97, 101


def synthetic_docs(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text) with the planted structure above. Precedence:
    exact-dup > near-dup > contaminated > short, so each planted class
    is disjoint and the stage counts are predictable."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    is_exact = (F.pmod(d, F.lit(EXACT_EVERY)) == 0) & (d > EVAL_DOCS)
    is_near = (
        (F.pmod(d, F.lit(NEAR_EVERY)) == 0) & (d > EVAL_DOCS) & ~is_exact
    )
    is_contam = (
        (F.pmod(d, F.lit(CONTAM_EVERY)) == 0)
        & (d > EVAL_DOCS)
        & ~is_exact
        & ~is_near
    )
    is_short = (
        (F.pmod(d, F.lit(SHORT_EVERY)) == 7)
        & ~is_exact
        & ~is_near
        & ~is_contam
    )
    content_id = (
        F.when(is_exact | is_near, d - 1)
        .when(is_contam, F.pmod(d, F.lit(EVAL_DOCS)))
        .otherwise(d)
    )
    n_words = F.when(is_short, F.lit(10)).otherwise(F.lit(DOC_WORDS))
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("__cid"), i), F.lit(VOCAB))
        ),
    )
    extra = F.when(is_near, F.concat(F.lit(" x"), d)).otherwise(F.lit(""))
    return (
        base.withColumn("__cid", content_id)
        .select(
            "doc_id",
            F.concat(
                F.lit("the and "), F.concat_ws(" ", words), extra
            ).alias("text"),
        )
    )


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        resolve_duplicate_clusters,
    )
    from delta_lake_spark.operators.text import (
        decontaminate,
        gopher_quality_filter,
    )
    from delta_lake_spark.queries.llm import _funnel_report

    all_docs = synthetic_docs(spark, n)
    eval_df = all_docs.filter(F.col("doc_id") < EVAL_DOCS)
    raw = all_docs.filter(F.col("doc_id") >= EVAL_DOCS)
    out: dict = {"n_docs": n}

    t0 = time.perf_counter()
    passes = (
        gopher_quality_filter(raw, "text", "doc_id", min_stopwords=1)
        .filter("passes")
        .select("doc_id")
    ).persist()
    out["n_quality"] = passes.count()
    out["quality_s"] = round(time.perf_counter() - t0, 2)
    s1 = raw.join(passes, "doc_id", "left_semi")

    t0 = time.perf_counter()
    keepers = exact_dedup(s1, "text", "doc_id").select("doc_id").persist()
    out["n_exact"] = keepers.count()
    out["exact_s"] = round(time.perf_counter() - t0, 2)
    s2 = s1.join(keepers, "doc_id", "left_semi")

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(s2, "text", "doc_id", n=3, threshold=0.6)
    canon = (
        resolve_duplicate_clusters(pairs, s2.select("doc_id"), "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    ).persist()
    out["n_near"] = canon.count()
    out["near_dup_s"] = round(time.perf_counter() - t0, 2)
    s3 = s2.join(canon, "doc_id", "left_semi")

    t0 = time.perf_counter()
    hits = (
        decontaminate(s3, eval_df, "text", "doc_id", n=5).select("doc_id")
    ).persist()
    out["n_contaminated"] = hits.count()
    out["decontam_s"] = round(time.perf_counter() - t0, 2)

    stages = [
        ("raw", None, "semi"),
        ("quality", passes, "semi"),
        ("exact_dedup", keepers, "semi"),
        ("near_dedup", canon, "semi"),
        ("decontaminated", hits, "anti"),
    ]
    t0 = time.perf_counter()
    report = _funnel_report(raw, stages).collect()
    out["report_s"] = round(time.perf_counter() - t0, 2)
    out["n_final"] = next(
        r.n_docs for r in report if r.stage == "decontaminated"
    )
    out["total_s"] = round(
        out["quality_s"]
        + out["exact_s"]
        + out["near_dup_s"]
        + out["decontam_s"]
        + out["report_s"],
        2,
    )
    for df in (passes, keepers, canon, hits):
        df.unpersist()
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("funnel-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in scales:
        print(json.dumps(bench_scale(spark, n)))
    spark.stop()


if __name__ == "__main__":
    main()
