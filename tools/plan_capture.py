"""Capture .explain("formatted") for the headline + secondary bench
queries into plans/r13/<query>_<tag>.txt — the before/after plan
evidence for the optimization rounds.

Usage: python tools/plan_capture.py <tag> [query ...]
(tag = "before" / "after"; default query set = bench.py HEADLINE +
SECONDARY). Construction runs with the same session shape bench.py
uses so the captured plan is the benched plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SECONDARY  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from delta_lake_spark.queries import QUERIES

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + SECONDARY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("delta_lake_spark-plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure, keep going
            text = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        n_py = sum(
            text.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "FlatMapGroupsInPandas", "MapInArrow")
        )
        joins = [
            t for t in ("BroadcastHashJoin", "SortMergeJoin",
                        "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                        "CartesianProduct")
            if t in text
        ]
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} "
              f"joins={joins} -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
