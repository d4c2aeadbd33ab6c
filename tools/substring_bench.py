"""Exact-substring dedup scale microbench (operators/dedup.py
exact_substring_spans / exact_substring_scrub): substantiates the
SCALING.md claim that the Lee-et-al-equivalent span detection is one
gram-count shuffle + one semi join + doc-keyed windows — no suffix
sort, no all-pairs — so cost scales with corpus token count.

Corpus: bpe_bench's synthetic docs (40 words each, bounded vocabulary)
with a 12-word boilerplate run spliced into every 10th document, so
~10% of docs carry a guaranteed >= k duplicated span and the gram-count
skew resembles real boilerplate.

Usage:  python tools/substring_bench.py [n_docs ...]  (default 1e5 1e6)
        python tools/substring_bench.py --stages [n_docs ...]
          also times the span pipeline's stages separately: the
          gram-count shuffle alone (duplicated-gram relation count)
          vs the full spans pass (semi join + island windows) — the
          split that locates which stage breaks first as the corpus
          grows a decade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.bpe_bench import synthetic_docs

K = 8
BOILER = "terms of service apply to all content on this site here"


def main() -> None:
    from delta_lake_spark.operators.dedup import (
        exact_substring_scrub,
        exact_substring_spans,
    )

    args = sys.argv[1:]
    stages = "--stages" in args
    args = [a for a in args if a != "--stages"]
    sizes = [int(float(a)) for a in args] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.range(10_000_000).groupBy(F.pmod("id", F.lit(7))).count().collect()
    for n in sizes:
        docs = (
            synthetic_docs(spark, n)
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.concat(F.lit(BOILER + " "), F.col("text")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .persist()
        )
        n_docs = docs.count()  # materialize: timings exclude synthesis

        t_grams = n_dup_grams = None
        if stages:
            # stage 1 alone: the corpus-sized gram-count shuffle
            from delta_lake_spark.operators.dedup import _position_grams

            t0 = time.monotonic()
            n_dup_grams = (
                _position_grams(docs, "text", "doc_id", K)
                .groupBy("__g")
                .agg(F.count("*").alias("__c"))
                .filter(F.col("__c") >= 2)
                .count()
            )
            t_grams = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        spans = exact_substring_spans(docs, "text", "doc_id", k=K)
        n_spans, tok_covered = spans.agg(
            F.count("*"), F.sum("n_tokens")
        ).collect()[0]
        t_spans = time.monotonic() - t0

        t0 = time.monotonic()
        scrub = exact_substring_scrub(docs, "text", "doc_id", k=K)
        n_rows, removed = scrub.agg(
            F.count("*"), F.sum("n_removed")
        ).collect()[0]
        t_scrub = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "k": K,
                    **(
                        {"t_gramcount_s": t_grams, "n_dup_grams": n_dup_grams}
                        if stages
                        else {}
                    ),
                    "t_spans_s": round(t_spans, 2),
                    "n_spans": int(n_spans),
                    "tokens_covered": int(tok_covered or 0),
                    "t_scrub_s": round(t_scrub, 2),
                    "rows_out": int(n_rows),
                    "tokens_removed": int(removed or 0),
                }
            ),
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
