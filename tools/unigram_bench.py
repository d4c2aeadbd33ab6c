"""Unigram-LM tokenizer scale microbench: substantiates the SCALING.md
claims for operators/tokenizer.py train_unigram/unigram_encode —
training cost is governed by the DISTINCT-WORD histogram (each
Viterbi-EM round is a broadcast-model map-only DP over the word
relation plus one piece aggregation, never a corpus pass), the auto
driver path and the distributed rounds learn IDENTICAL vocabularies
(logarithm-free product scores, so the DPs are bit-equal), and
encoding is a map-only pass whose throughput scales with executors.

Reuses bpe_bench's synthetic corpus (bounded ~14k-word vocabulary at
any corpus size — the shape of natural language).

Measured per scale (one JSON line each):
  - t_train_auto / t_train_dist + vocab_equal (correctness witness)
  - t_encode + tokens_per_sec over the full corpus with the learned
    model, total token count as witness

Usage:  python tools/unigram_bench.py [n_docs ...]  (default 1e5 1e6)
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

VOCAB = 512
SEED = 2048
ITERS = 2


def main() -> None:
    from delta_lake_spark.operators.tokenizer import (
        train_unigram,
        unigram_encode,
    )

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
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
        docs = synthetic_docs(spark, n).persist()
        n_docs = docs.count()  # materialize: timings exclude synthesis

        t0 = time.monotonic()
        auto = train_unigram(
            docs, "text", vocab_size=VOCAB, n_iters=ITERS, seed_size=SEED
        )
        auto_rows = sorted(tuple(r) for r in auto.collect())
        t_auto = time.monotonic() - t0

        t0 = time.monotonic()
        dist = train_unigram(
            docs,
            "text",
            vocab_size=VOCAB,
            n_iters=ITERS,
            seed_size=SEED,
            strategy="distributed",
        )
        dist_rows = sorted(tuple(r) for r in dist.collect())
        t_dist = time.monotonic() - t0

        t0 = time.monotonic()
        enc = unigram_encode(
            docs, "text", "doc_id", [(p, c) for p, c, _ in auto_rows]
        )
        total_tokens = enc.agg(F.sum("n_tokens")).collect()[0][0]
        t_enc = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "vocab_size": len(auto_rows),
                    "t_train_auto_s": round(t_auto, 2),
                    "t_train_dist_s": round(t_dist, 2),
                    "vocab_equal": auto_rows == dist_rows,
                    "t_encode_s": round(t_enc, 2),
                    "total_tokens": int(total_tokens),
                    "tokens_per_sec": int(total_tokens / t_enc),
                }
            ),
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
