"""Round-13 optimization profiling: break the heavy secondary bench
rows (funnel family, pagerank) into per-stage wall times at sf0.1
with bench.py's exact session shape, so the optimization targets the
stage that actually costs (guide §1: measure first).

Usage: python tools/r13_profile.py [funnel|pagerank|ivfpq] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def session() -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r13-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    return spark


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.rows = []

    def lap(self, name):
        t = time.perf_counter()
        self.rows.append((name, t - self.t0))
        self.t0 = t

    def report(self, title):
        total = sum(s for _, s in self.rows)
        print(f"== {title} (total {total:.2f}s)", file=sys.stderr)
        for name, s in self.rows:
            print(f"   {name:42s} {s:7.3f}s", file=sys.stderr)


def profile_funnel(spark, variant="q147"):
    from delta_lake_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        resolve_duplicate_clusters,
    )
    from delta_lake_spark.operators.text import (
        decontaminate,
        gopher_quality_filter,
        unigram_lm_score,
    )
    from delta_lake_spark.queries.llm import (
        _corpus_size_hint,
        _docs,
        _funnel_report,
        _semantic_dirty_async,
        clear_funnel_memo,
    )

    clear_funnel_memo(spark)
    t = T()
    all_docs = _docs(spark, SF_DIR).select("doc_id", "text")
    eval_df = all_docs.filter(F.col("doc_id") < 25)
    raw = all_docs.filter(F.col("doc_id") >= 25)
    passes = (
        gopher_quality_filter(raw, "text", "doc_id", min_stopwords=1)
        .filter("passes")
        .select("doc_id")
    ).persist()
    s1 = raw.join(passes, "doc_id", "left_semi")
    keepers = exact_dedup(s1, "text", "doc_id").select("doc_id").persist()
    keepers.count()
    t.lap("base: quality+exact_dedup (count barrier)")
    s1 = raw.join(passes, "doc_id", "left_semi")
    s2 = s1.join(keepers, "doc_id", "left_semi")
    if variant == "q170":
        pairs = minhash_lsh_pairs(s2, "text", "doc_id", n=3, threshold=0.6)
    else:
        pairs = ngram_jaccard_pairs(
            s2, "text", "doc_id", n=3, threshold=0.6,
            prefix_filter=_corpus_size_hint(SF_DIR),
        )
    t.lap("pairs: plan construction")
    canon = (
        resolve_duplicate_clusters(pairs, s2.select("doc_id"), "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    ).persist()
    t.lap("near-dup: resolve_duplicate_clusters (probe)")
    s3 = s2.join(canon, "doc_id", "left_semi")
    hits = (
        decontaminate(s3, eval_df, "text", "doc_id", n=5).select("doc_id")
    ).persist()
    hits.count()
    t.lap("decontam: hits.count barrier (fills canon too)")
    s4 = s3.join(hits, "doc_id", "left_anti")
    stages = [
        ("raw", None, "semi"),
        ("quality", passes, "semi"),
        ("exact_dedup", keepers, "semi"),
        ("near_dedup", canon, "semi"),
        ("decontaminated", hits, "anti"),
    ]
    caches = [passes, keepers, canon, hits]
    if variant == "q147":
        sem_join = _semantic_dirty_async(spark, SF_DIR)
        s4ids = s4.select("doc_id").persist()
        s4r = raw.join(s4ids, "doc_id", "left_semi")
        keep = (
            unigram_lm_score(s4r, "text", "doc_id")
            .filter(F.col("avg_logprob") >= F.lit(-3.41))
            .select("doc_id")
        ).persist()
        keep.count()
        t.lap("LM stage: keep.count barrier")
        sdirty = sem_join()
        t.lap("semantic stage: join thread")
        stages = stages + [
            ("lm_filter", keep, "semi"),
            ("semantic_decontaminated", sdirty, "anti"),
        ]
        caches += [s4ids, keep, sdirty]
        out = _funnel_report(raw, stages)
    elif variant == "q170":
        out = _funnel_report(raw, stages, vocab=True)
    else:
        out = _funnel_report(raw, stages)
    t.lap("report: plan construction")
    out.write.format("noop").mode("overwrite").save()
    t.lap("report: noop materialize")
    t.report(f"funnel {variant} @ {SF_DIR}")
    for c in caches:
        try:
            c.unpersist()
        except Exception:
            pass
    clear_funnel_memo(spark)


def profile_pagerank(spark):
    from delta_lake_spark.queries.llm import _trade_edges, _PR_ITERATIONS
    from delta_lake_spark.operators.graph import pagerank

    t = T()
    edges = _trade_edges(spark, SF_DIR)
    t.lap("edges: plan construction")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ranks = pagerank(edges, iterations=_PR_ITERATIONS, damping=0.85)
        t.lap("pagerank() construction (incl. persists+probes)")
        out = (
            ranks.select("node", F.round("rank", 9).alias("rank"))
            .orderBy(F.col("rank").desc(), "node")
            .limit(20)
        )
        out = out.localCheckpoint(eager=True)
        t.lap("iterations execute + top-20 localCheckpoint")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out.write.format("noop").mode("overwrite").save()
    t.lap("noop save")
    t.report(f"q199 pagerank @ {SF_DIR}")


def profile_pagerank_detail(spark):
    """Inside pagerank: per-persist and per-iteration barriers."""
    from delta_lake_spark.queries.llm import _trade_edges

    t = T()
    edges = _trade_edges(spark, SF_DIR)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        e = edges.select(
            F.col("src").alias("src"), F.col("dst").alias("dst")
        ).persist()
        m = e.count()
        t.lap(f"edges persist+count ({m} edges)")
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()
        t.lap(f"nodes persist+count ({n} nodes)")
        nodes = nodes.select("node", F.lit(1.0 / n).alias("__t"))
        outdeg = e.groupBy("src").agg(
            F.count("*").cast("double").alias("deg")
        ).persist()
        weighted = e.join(outdeg, "src").select("src", "dst", "deg").persist()
        has_dangling = (
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
            .limit(1).count() > 0
        )
        t.lap(f"outdeg+weighted persist, dangling probe ({has_dangling})")
        ranks = nodes.select("node", F.col("__t").alias("rank"))
        for k in range(5):
            contrib = (
                weighted.join(ranks, weighted["src"] == ranks["node"])
                .select("dst", (F.col("rank") / F.col("deg")).alias("__w"))
                .groupBy("dst")
                .agg(F.sum("__w").alias("__contrib"))
            )
            next_ranks = nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            )
            ranks = next_ranks.select(
                "node",
                (
                    F.lit(0.15) * F.col("__t")
                    + F.lit(0.85) * F.coalesce(F.col("__contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            if (k + 1) % 2 == 0 and k + 1 < 5:
                ranks = ranks.localCheckpoint(eager=True)
                t.lap(f"iter {k+1}: eager localCheckpoint")
        out = (
            ranks.select("node", F.round("rank", 9).alias("rank"))
            .orderBy(F.col("rank").desc(), "node")
            .limit(20)
        )
        out = out.localCheckpoint(eager=True)
        t.lap("tail iterations + top-20 checkpoint")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    t.report(f"q199 pagerank DETAIL @ {SF_DIR}")


def profile_ivfpq(spark):
    from delta_lake_spark.operators.similarity import ivfpq_topk, pq_topk
    from delta_lake_spark.queries.llm import _emb

    for residual in (False, True):
        t = T()
        emb = _emb(spark, SF_DIR)
        queries = emb.filter(F.col("vec_id") < 5)
        out = ivfpq_topk(
            emb, queries, k=10, n_cells=16, nprobe=4, m=4, k_codes=16,
            dim=64, residual=residual,
        )
        out = out.select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("dist", 6).alias("dist"),
        )
        t.lap("plan construction")
        out.write.format("noop").mode("overwrite").save()
        t.lap("noop materialize")
        t.report(f"{'q145 residual' if residual else 'q139'} ivfpq @ {SF_DIR}")


def main():
    spark = session()
    which = sys.argv[1:] or ["funnel"]
    for w in which:
        if w == "funnel":
            for variant in ("q137", "q147", "q170"):
                profile_funnel(spark, variant)
        elif w == "pagerank":
            profile_pagerank(spark)
            profile_pagerank_detail(spark)
        elif w == "ivfpq":
            profile_ivfpq(spark)
    spark.stop()


if __name__ == "__main__":
    main()
