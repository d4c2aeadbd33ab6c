"""BPE tokenizer scale microbench: substantiates the SCALING.md claims
for operators/tokenizer.py — training cost is governed by the DISTINCT-
WORD histogram (not corpus size), the auto driver path and the
distributed rounds learn IDENTICAL merges, and encoding is a map-only
pass whose throughput scales with executor count.

Synthetic corpus (codegen'd expressions, no driver-side text): ``n``
documents of 40 words; each word is 2-3 syllables drawn xxhash64-seeded
from a 24-syllable inventory, so the distinct-word vocabulary is
bounded (~14k types at any corpus size — the shape of natural language)
and the learned merges are linguistically meaningful (syllables emerge
as the top pairs).

Measured per scale (one JSON line each):
  - t_train_auto:  histogram -> bounded collect -> driver greedy loop
  - t_train_dist:  the distributed per-round path (same corpus)
  - merges_equal:  driver merges == distributed merges (correctness
                   witness; both orders of the n_merges rows compared)
  - t_encode + tokens_per_sec: map-only encode of the full corpus with
    the learned 16-merge chain, total token count as witness

Usage:  python tools/bpe_bench.py [n_docs ...]   (default 1e5 1e6)

``--merges M`` adds the REALISTIC-vocab tier (r13 optimization round):
train M merges (byte-level + gpt2 pre-tokenization, the production
default), then encode the corpus with strategy="vocab" (cost bounded
by word TYPES x merges) and — on a 1/32 corpus slice, extrapolated —
strategy="inline" (cost scales with corpus TOKENS x merges), printing
both throughputs. This is the evidence row for the per-DISTINCT-word
encode strategy: at production merge counts the per-type path's
advantage is the type/token ratio (~20x on this corpus, growing with
corpus size at fixed vocabulary).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_WORDS = 40
N_MERGES = 16
SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu",
    "za", "the", "ing", "er",
]


def synthetic_docs(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text): DOC_WORDS words of 2-3 xxhash64-picked
    syllables — fully codegen'd, reproducible, shard-order-free."""
    syl = "array({})".format(
        ", ".join(f"'{s}'" for s in SYLLABLES)
    )
    def pick(j: int) -> str:
        return (
            f"element_at({syl}, cast(pmod(xxhash64(id, i, {j}),"
            f" {len(SYLLABLES)}) + 1 as int))"
        )

    # single lambda level (a nested transform-in-transform trips the
    # analyzer's resolution fixed point): 2 syllables always, a third
    # on odd word-hashes
    word = (
        f"concat({pick(1)}, {pick(2)},"
        f" IF(pmod(xxhash64(id, i, 0), 2) = 1, {pick(3)}, ''))"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_WORDS}), i -> {word}))"
        ).alias("text"),
    )


def main() -> None:
    from delta_lake_spark.operators.tokenizer import (
        bpe_encode,
        train_bpe_merges,
    )

    args = sys.argv[1:]
    hi_merges = None
    if "--merges" in args:
        i = args.index("--merges")
        hi_merges = int(args[i + 1])
        del args[i : i + 2]
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
        docs = synthetic_docs(spark, n).persist()
        n_docs = docs.count()  # materialize: train timings exclude synthesis

        t0 = time.monotonic()
        auto = train_bpe_merges(docs, "text", n_merges=N_MERGES)
        auto_rows = [tuple(r) for r in auto.collect()]
        t_auto = time.monotonic() - t0

        t0 = time.monotonic()
        dist = train_bpe_merges(
            docs, "text", n_merges=N_MERGES, strategy="distributed"
        )
        dist_rows = [tuple(r) for r in dist.collect()]
        t_dist = time.monotonic() - t0

        t0 = time.monotonic()
        enc = bpe_encode(docs, "text", "doc_id", auto)
        total_tokens = enc.agg(F.sum("n_tokens")).collect()[0][0]
        t_enc = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "n_merges": N_MERGES,
                    "t_train_auto_s": round(t_auto, 2),
                    "t_train_dist_s": round(t_dist, 2),
                    "merges_equal": auto_rows == dist_rows,
                    "top_merge": list(auto_rows[0][:4]) if auto_rows else None,
                    "t_encode_s": round(t_enc, 2),
                    "total_tokens": int(total_tokens),
                    "tokens_per_sec": int(total_tokens / t_enc),
                }
            ),
            flush=True,
        )
        if hi_merges:
            # realistic-vocab tier: byte-level + gpt2 pre-tokenization
            # (the production default), M merges, BOTH encode strategies
            t0 = time.monotonic()
            big = train_bpe_merges(
                docs, "text", n_merges=hi_merges, alphabet="byte",
                pretokenize="gpt2",
            )
            big_rows = [(r.lhs, r.rhs) for r in big.orderBy("rank").collect()]
            t_train = time.monotonic() - t0

            t0 = time.monotonic()
            enc_v = bpe_encode(
                docs, "text", "doc_id", big_rows, alphabet="byte",
                pretokenize="gpt2", strategy="vocab",
            )
            tok_v = enc_v.agg(F.sum("n_tokens")).collect()[0][0]
            t_vocab = time.monotonic() - t0

            # inline strategy on a 1/32 slice (its cost scales with
            # corpus tokens x merges — the full corpus would take ~32x
            # this reading; reported per-token so the two strategies
            # compare directly)
            slice_docs = docs.filter(F.pmod("doc_id", F.lit(32)) == 0)
            t0 = time.monotonic()
            enc_i = bpe_encode(
                slice_docs, "text", "doc_id", big_rows, alphabet="byte",
                pretokenize="gpt2", strategy="inline",
            )
            tok_i = enc_i.agg(F.sum("n_tokens")).collect()[0][0]
            t_inline = time.monotonic() - t0

            print(
                json.dumps(
                    {
                        "n_docs": n_docs,
                        "tier": "realistic_vocab",
                        "n_merges": len(big_rows),
                        "t_train_s": round(t_train, 2),
                        "t_encode_vocab_s": round(t_vocab, 2),
                        "vocab_tokens_per_sec": int(tok_v / t_vocab),
                        "inline_slice_docs": int(n_docs // 32) + 1,
                        "t_encode_inline_slice_s": round(t_inline, 2),
                        "inline_tokens_per_sec": int(tok_i / t_inline),
                    }
                ),
                flush=True,
            )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
