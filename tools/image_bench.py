"""Image-tier scale microbench: substantiates the SCALING.md rows for
the perceptual-dedup path — synthesis and hashing are both map-only
mapInPandas, so wall time should scale ~linearly in image count; the
numpy-vectorized raster step (luma collapse, nearest resample, bit
pack) replaced the per-pixel Python list comprehensions this round,
and this tool measures the resulting docs/s.

Stages per scale (REAL decode, count() sinks):

  - dhash_png_s:   synthesize_png_corpus (real PNGs, cycling
                   scanline filters) + image_dhash.
  - dhash_mixed_s: synthesize_mixed_image_corpus (PNG evens, baseline
                   JPEG odds) + image_dhash with format sniffing.
  - dedup_s:       the q301 shape — dhash + min-id keeper window.

Usage: python tools/image_bench.py [n_images ...]  (default 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.multimodal import (
        image_dhash,
        synthesize_mixed_image_corpus,
        synthesize_png_corpus,
    )

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    ids = ids.repartition(32).localCheckpoint(eager=True)
    out: dict = {"n_images": n}

    t0 = time.perf_counter()
    out["dhash_png_rows"] = image_dhash(synthesize_png_corpus(ids)).count()
    out["dhash_png_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["dhash_mixed_rows"] = image_dhash(
        synthesize_mixed_image_corpus(ids)
    ).count()
    out["dhash_mixed_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hashes = image_dhash(synthesize_mixed_image_corpus(ids))
    w = Window.partitionBy("dhash")
    out["dedup_kept"] = (
        hashes.select(
            "media_id",
            (F.col("media_id") == F.min("media_id").over(w)).alias("kept"),
        )
        .filter("kept")
        .count()
    )
    out["dedup_s"] = round(time.perf_counter() - t0, 2)

    out["dhash_png_docs_per_s"] = int(n / max(out["dhash_png_s"], 0.01))
    out["dhash_mixed_docs_per_s"] = int(n / max(out["dhash_mixed_s"], 0.01))
    return out


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [100_000]
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
    for n in scales:
        print(json.dumps(bench_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
