"""Round-9 operator scale microbench: substantiates the SCALING.md
trend rows for the frequent-items sketch, the WordPiece encoder, the
Levenshtein-verified dedup, triangle counting, and ring negative
sampling — all over deterministic spark.range-derived synthetics so
the numbers are reproducible without testdata.

Measured per scale (one JSON line each): wall seconds per operator and
a small result invariant (row counts / top value) so a silent
correctness drift shows up as a value change, not just a timing blip.

Usage:  python tools/r9_bench.py [scale ...]   (default 1 10)
        scale 1 ~= 100k-row relations; scale 10 ~= 1M.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synthetic_docs(spark, n_docs: int):
    """12-word documents deterministic in a BASE id: every 100th doc
    repeats its predecessor's text (a 1% exact-dup tail, so the dedup
    stages have real work but buckets stay cluster-sized). Positions
    0-1 draw from a 10-token head (so Misra-Gries has true heavy
    hitters); positions 2-11 are base-specific from a 10k vocabulary
    (so texts are otherwise unique)."""
    base = "(id - CASE WHEN id % 100 = 99 THEN 1 ELSE 0 END)"
    head = "concat('h', pmod({b} * {a}, 10))"
    # 999983-token tail space: texts stay base-unique at 10M docs
    # (a 10k space made every 10k-th base a FULL duplicate)
    tail = "concat('t', pmod({b} * {a} + {c}, 999983))"
    words = ", ".join(
        [head.format(b=base, a=7), head.format(b=base, a=13)]
        + [
            tail.format(b=base, a=2654435761 + i * 977, c=i * 31)
            for i in range(10)
        ]
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', {words})").alias("text"),
    )


def timed(name, fn):
    t0 = time.time()
    out = fn()
    return name, round(time.time() - t0, 2), out


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("r9-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from delta_lake_spark.operators.dedup import edit_distance_pairs
    from delta_lake_spark.operators.graph import triangle_count
    from delta_lake_spark.operators.sampling import hash_ring_negatives
    from delta_lake_spark.operators.sketches import misra_gries_heavy_hitters
    from delta_lake_spark.operators.tokenizer import wordpiece_encode

    for s in scales:
        n_docs = 100_000 * s
        docs = synthetic_docs(spark, n_docs).localCheckpoint()
        row = {"scale": s, "n_docs": n_docs}

        name, secs, out = timed(
            "misra_gries",
            lambda: misra_gries_heavy_hitters(docs, "text", k=200).count(),
        )
        row[name], row["mg_hitters"] = secs, out

        # char-granular vocab: every synthetic word segments without
        # [UNK], and the distinct-word relation carries the real cost
        vocab = ["t", "h"] + ["##" + str(d) for d in range(10)] + [
            f"##{d}{e}" for d in range(10) for e in range(10)
        ]
        name, secs, out = timed(
            "wordpiece_encode",
            lambda: wordpiece_encode(docs, "text", "doc_id", vocab)
            .agg(F.sum("n_tokens")).collect()[0][0],
        )
        row[name], row["wp_tokens"] = secs, out

        name, secs, out = timed(
            "edit_distance_pairs",
            lambda: edit_distance_pairs(
                docs, "text", "doc_id", k=5, min_sim_milli=500
            ).count(),
        )
        row[name], row["edp_pairs"] = secs, out

        name, secs, out = timed(
            "ring_negatives",
            lambda: hash_ring_negatives(docs, "doc_id", n_neg=2).count(),
        )
        row[name], row["ring_pairs"] = secs, out

        n_edges = 100_000 * s
        # md5-derived endpoints (genuinely uniform — arithmetic mixes
        # collapse to degenerate cycles) over a node set that scales
        # with the edges, holding average degree ~100 so the triangle
        # population grows linearly instead of going dense
        n_nodes = max(2003, n_edges // 50)
        h = "md5(cast(id as string))"
        edges = (
            spark.range(n_edges)
            .select(
                F.expr(
                    f"pmod(cast(conv(substr({h}, 1, 8), 16, 10) as bigint),"
                    f" {n_nodes})"
                ).alias("src"),
                F.expr(
                    f"pmod(cast(conv(substr({h}, 9, 8), 16, 10) as bigint),"
                    f" {n_nodes})"
                ).alias("dst"),
            )
            .localCheckpoint()
        )
        name, secs, out = timed(
            "triangle_count",
            lambda: triangle_count(edges)
            .agg(F.sum("triangles")).collect()[0][0],
        )
        row[name], row["tri_total"] = secs, int(out or 0) // 3
        row["n_edges"] = n_edges

        from delta_lake_spark.operators.similarity import kcenter_exemplars
        from delta_lake_spark.zorder import hilbert_index_expr
        from delta_lake_spark.operators.multimodal import (
            decode_tar_members,
            synthesize_tar_corpus,
        )

        n_vecs = 100_000 * s
        vecs = spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 16), j -> "
                "CAST(pmod(id * (48271 + j * 977) + j, 1009) AS DOUBLE))"
            ).alias("embedding"),
        ).localCheckpoint()
        name, secs, out = timed(
            "kcenter", lambda: kcenter_exemplars(vecs, k=6).count()
        )
        row[name], row["kc_rows"] = secs, out

        name, secs, out = timed(
            "hilbert_index",
            lambda: spark.range(n_vecs)
            .select(
                F.expr("CAST(pmod(id * 7, 64) AS INT)").alias("x"),
                F.expr("CAST(pmod(id * 13, 64) AS INT)").alias("y"),
            )
            .withColumn("h", hilbert_index_expr("x", "y", 6))
            .agg(F.sum("h")).collect()[0][0],
        )
        row[name] = secs

        n_tars = 10_000 * s
        ids = spark.range(n_tars).select(F.col("id").alias("doc_id"))
        name, secs, out = timed(
            "tar_walk",
            lambda: decode_tar_members(synthesize_tar_corpus(ids)).count(),
        )
        row[name], row["tar_members"] = secs, out
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
