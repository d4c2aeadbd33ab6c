"""Steady-state per-query gate timing: one session, a warmup query
first (pays JIT/codegen), then each named query timed Spark-side only
(collect) and oracle-side only (DuckDB execute), separately. Used to
attribute gate cost before leaning fixtures.

  python tools/gate_profile.py <sf_dir> <name> [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from oracle_harness import duckdb_con

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb_con(sf_dir)
    # warmup: pay session/codegen startup on a cheap query
    queries["q01_pricing_summary"](spark, sf_dir).collect()
    for name in names:
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        rows = df.collect()
        t1 = time.monotonic()
        if name in oracles:
            con.execute(oracles[name]).fetchall()
        t2 = time.monotonic()
        print(
            f"{name:40s} spark={t1 - t0:6.2f}s oracle={t2 - t1:6.2f}s "
            f"rows={len(rows)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
