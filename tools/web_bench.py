"""Web-tier scale microbench: substantiates the SCALING.md rows for
the crawl-ingestion operators — every stage is map-only (or one hash
aggregation), so wall time should scale ~linearly in document count
with no shuffle cliffs.

Synthetic corpus: n documents of deterministic word-salad text (no
driver data, no testdata dependency), pushed through the REAL
operators:

  - warc_gz_s:     synthesize .warc.gz (member-per-record, HTTP
                   envelopes, the q280 five-variant corpus) + full
                   decode_warc_http_responses(compression='gzip') walk
                   with charset selection; count() sink.
  - boiler_s:      boilerplate_blocks over the q282 page wrapper
                   (block split + link/stopword/length rules);
                   count() sink.
  - outlinks_s:    extract_outlinks + registered-domain rollup of the
                   q287 six-link page; count() sink.
  - url_dedup_s:   normalize_urls + min-id URL dedup over messy URL
                   variants; count() sink.

Per scale, one JSON line with the stage seconds and rows/s.

Usage: python tools/web_bench.py [n_docs ...]   (default 20000 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synthetic_docs(spark: SparkSession, n: int):
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * 40 + i), F.lit(997)),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick "), F.array_join(words, " "),
            F.lit(" and it was good"),
        ).alias("text"),
    )


def bench_scale(spark: SparkSession, n: int) -> dict:
    from delta_lake_spark.operators.multimodal import (
        decode_warc_http_responses,
        synthesize_http_warc_corpus,
    )
    from delta_lake_spark.operators.web import (
        boilerplate_blocks,
        extract_outlinks,
        url_dedup,
        with_registered_domain,
    )

    docs = synthetic_docs(spark, n).localCheckpoint(eager=True)
    out: dict = {"n_docs": n}

    t0 = time.perf_counter()
    recs = decode_warc_http_responses(
        synthesize_http_warc_corpus(docs, gzip_records=True),
        compression="gzip",
    )
    out["warc_gz_rows"] = recs.count()
    out["warc_gz_s"] = round(time.perf_counter() - t0, 2)

    page = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>Doc</title></head><body>'
                '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                "<p>"
            ),
            F.col("text"),
            F.lit(
                "</p><p>ok</p>"
                "<footer>copyright 2024 acme corp all rights reserved"
                "</footer></body></html>"
            ),
        ).alias("html"),
    )
    t0 = time.perf_counter()
    out["boiler_rows"] = boilerplate_blocks(page, "html", "doc_id").count()
    out["boiler_s"] = round(time.perf_counter() - t0, 2)

    linked = docs.select(
        "doc_id",
        F.concat(
            F.lit('<a href="http://site-'),
            (F.col("doc_id") % 23 + 1).cast("string"),
            F.lit('.com/x">n</a> <a href="/local">s</a>'
                  ' <a href="relative">r</a>'),
        ).alias("html"),
        F.concat(
            F.lit("http://site-"),
            (F.col("doc_id") % 23).cast("string"),
            F.lit(".com/p"),
        ).alias("base_url"),
    )
    t0 = time.perf_counter()
    links = extract_outlinks(linked, "html", "doc_id", "base_url").filter(
        F.col("url").isNotNull()
    )
    links = links.withColumn(
        "host",
        F.expr(
            "substring_index(substring_index("
            "  substring(url, instr(url, '://') + 3), '/', 1), '?', 1)"
        ),
    )
    edges = (
        with_registered_domain(links, "host")
        .groupBy("registered_domain")
        .count()
    )
    out["outlink_domains"] = edges.count()
    out["outlinks_s"] = round(time.perf_counter() - t0, 2)

    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Site-"),
            (F.col("doc_id") % 5000).cast("string"),
            F.lit(".COM:80/a/?b=2&a=1&utm_source=x#f"),
        ).alias("url"),
    )
    t0 = time.perf_counter()
    out["url_dedup_kept"] = (
        url_dedup(urls, "url", "doc_id").filter("kept").count()
    )
    out["url_dedup_s"] = round(time.perf_counter() - t0, 2)

    out["warc_gz_docs_per_s"] = int(n / max(out["warc_gz_s"], 0.01))
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
    for n in scales:
        print(json.dumps(bench_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
