"""Chat/SFT-tier scale microbench: substantiates the SCALING.md rows
for the post-training operators — the audit, mask, and packing stages
are map-only (packing adds exactly one per-source window), so wall
time should scale ~linearly in transcript count with no shuffle
cliffs; conversation dedup adds the LSH signature shuffle with
linear pair output on the grouped corpus.

Synthetic corpus: n transcripts of the q305 grouped shape (identical
twins / prefix-extended near-dup / unique member per 4-group, 8-17
messages each), built with pure Spark expressions — no driver data,
no testdata dependency — and pushed through the REAL operators:

  - stats_s:    conversation_stats (counts, volumes, alternation /
                system / final-assistant invariants); count() sink.
  - masks_s:    chat_token_loss_masks with 8 byte-BPE merges trained
                once on a 20k sample (training excluded from the
                stage timing — the model is a reusable broadcast
                artifact); count() sink.
  - pack_s:     sft_pack_with_masks (budget 256, 20 sources) — the
                masks plus the one packing window; count() sink.
  - pref_s:     preference_pair_audit over (prompt, chosen,
                rejected) triples; count() sink.
  - convdup_s:  conversation_near_dup_pairs (role-aware serialize +
                MinHash/LSH + exact verify); count() sink.

Per scale, one JSON line with the stage seconds and rows/s.

Usage: python tools/chat_bench.py [n_docs ...]  (default 20000 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# the q305 grouped-transcript synthesis (groups of four: two identical,
# one ~0.9 near-dup, one unique), keyed off a doc_id column
from delta_lake_spark.queries.llm import _Q305_JSON_SPARK


def synthetic_convos(spark: SparkSession, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
            "source"
        ),
        F.expr(_Q305_JSON_SPARK).alias("convo"),
    )


def bench_scale(spark: SparkSession, n: int, merges) -> dict:
    from delta_lake_spark.operators.chat import (
        chat_token_loss_masks,
        conversation_near_dup_pairs,
        conversation_stats,
        preference_pair_audit,
        sft_pack_with_masks,
    )

    convos = synthetic_convos(spark, n).localCheckpoint(eager=True)
    out: dict = {"n_docs": n}

    t0 = time.perf_counter()
    out["stats_rows"] = conversation_stats(
        convos, "convo", "doc_id"
    ).count()
    out["stats_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["mask_rows"] = chat_token_loss_masks(
        convos, "convo", "doc_id", merges
    ).count()
    out["masks_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["pack_rows"] = sft_pack_with_masks(
        convos, "convo", "doc_id", "source", merges, budget=256
    ).count()
    out["pack_s"] = round(time.perf_counter() - t0, 2)

    prefs = convos.select(
        "doc_id",
        F.concat(F.lit("prompt "), (F.col("doc_id") % 5001).cast("string"))
        .alias("prompt"),
        F.concat(F.lit("chosen answer "), F.col("doc_id").cast("string"),
                 F.lit(" with detail")).alias("chosen"),
        F.concat(F.lit("short "), F.col("doc_id").cast("string")).alias(
            "rejected"
        ),
    )
    t0 = time.perf_counter()
    out["pref_rows"] = preference_pair_audit(
        prefs, "prompt", "chosen", "rejected", "doc_id"
    ).count()
    out["pref_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["convdup_pairs"] = conversation_near_dup_pairs(
        convos, "convo", "doc_id"
    ).count()
    out["convdup_s"] = round(time.perf_counter() - t0, 2)

    out["masks_docs_per_s"] = int(n / max(out["masks_s"], 0.01))
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [20_000, 100_000]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from delta_lake_spark.operators.tokenizer import train_bpe_merges

    sample = synthetic_convos(spark, 20_000)
    merges = [
        (r.lhs, r.rhs)
        for r in train_bpe_merges(
            sample, "convo", n_merges=8, alphabet="byte"
        ).collect()
    ]
    for n in scales:
        print(json.dumps(bench_scale(spark, n, merges)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
