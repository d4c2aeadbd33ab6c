"""Winnowing scale microbench: substantiates the SCALING.md claim that
winnow_dup_pairs runs the q31 pair-join shape on a ~2/(w+1)-density
sketch — measured fingerprint-vs-gram row counts, wall time against the
full inverted-index join, and recall of the planted near-duplicates.

Corpus: tools/funnel_bench.synthetic_docs — every 53rd doc is an exact
copy of its predecessor and every 97th a near copy (predecessor + one
extra token), so both methods have a known set of heavy-overlap pairs
to find. Exact copies share EVERY fingerprint; near copies share all
but the tail window's — both must surface at threshold 0.5.

Measured per scale (one JSON line each):
  - gram_rows / fp_rows and the density ratio (expect ~0.4 at w=4)
  - t_full_s:   ngram_jaccard_pairs (exact inverted index / prefix
                filter auto strategy) at threshold 0.5
  - t_winnow_s: winnow_dup_pairs at the same threshold
  - planted recall of each (pairs (d-1, d) for the planted classes)

Usage:  python tools/winnow_bench.py [n_docs ...]   (default 1e5 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.funnel_bench import EXACT_EVERY, EVAL_DOCS, NEAR_EVERY, synthetic_docs


def planted_pairs(spark, n: int):
    """The (a, b) pairs the corpus plants: copy docs next to their
    predecessors."""
    d = F.col("id")
    return (
        spark.range(n)
        .filter(
            (d > EVAL_DOCS)
            & (
                (F.pmod(d, F.lit(EXACT_EVERY)) == 0)
                | (F.pmod(d, F.lit(NEAR_EVERY)) == 0)
            )
        )
        .select((d - 1).alias("a"), d.alias("b"))
    )


def main() -> None:
    from delta_lake_spark.operators.dedup import (
        ngram_jaccard_pairs,
        winnow_dup_pairs,
        winnow_fingerprints,
        word_shingles,
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
        docs.count()
        plant = planted_pairs(spark, n).persist()
        n_plant = plant.count()

        gram_rows = word_shingles(docs, "text", "doc_id", n=5).count()
        fp_rows = winnow_fingerprints(docs, "text", "doc_id", k=5, w=4).count()

        t0 = time.perf_counter()
        full = ngram_jaccard_pairs(
            docs, "text", "doc_id", n=5, threshold=0.5
        ).select(
            F.col("id_1").alias("a"), F.col("id_2").alias("b")
        ).persist()
        n_full = full.count()
        t_full = time.perf_counter() - t0

        t0 = time.perf_counter()
        win = winnow_dup_pairs(
            docs, "text", "doc_id", k=5, w=4, threshold=0.5
        ).select("a", "b").persist()
        n_win = win.count()
        t_win = time.perf_counter() - t0

        rec_full = plant.join(full, ["a", "b"], "left_semi").count() / n_plant
        rec_win = plant.join(win, ["a", "b"], "left_semi").count() / n_plant

        print(
            json.dumps(
                {
                    "n_docs": n,
                    "gram_rows": gram_rows,
                    "fp_rows": fp_rows,
                    "density": round(fp_rows / gram_rows, 3),
                    "t_full_s": round(t_full, 2),
                    "n_full_pairs": n_full,
                    "t_winnow_s": round(t_win, 2),
                    "n_winnow_pairs": n_win,
                    "planted": n_plant,
                    "recall_full": round(rec_full, 4),
                    "recall_winnow": round(rec_win, 4),
                }
            ),
            flush=True,
        )
        for df in (docs, plant, full, win):
            df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
