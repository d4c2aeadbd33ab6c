"""Round-start validation: run FIRST each round, before building.

The driver may regenerate /root/testdata between rounds. Two classes of
query are sensitive to that:

  1. every query, if a column is added/renamed/retyped (schema drift);
  2. the LSH-accelerated dedup queries (q31/q32/q124/q129), whose
     oracles demand FULL candidate recall — guaranteed for the
     engineered near-1.0-jaccard duplicate pairs, probabilistic if a
     regenerated corpus contains incidental pairs near the 0.6
     threshold (16x4 banding misses those with up to ~10%).

Usage:  python tools/round_start_check.py  [sf_dir ...]
Exit 0 = safe to build; non-zero = investigate before trusting oracles.
"""

from __future__ import annotations

import os
import subprocess
import sys

EXPECTED = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}

RECALL_SENSITIVE = [
    "q31_dedup_ngram_jaccard",
    "q32_dedup_minhash_lsh",
    "q124_cross_corpus_near_dups",
    "q129_incremental_lsh_index",
]


def check_schemas(sf_dir: str) -> list[str]:
    import pyarrow.parquet as pq

    problems = []
    for table, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{sf_dir}: {table}.parquet MISSING")
            continue
        got = {f.name for f in pq.read_schema(path)}
        if got != cols:
            problems.append(
                f"{sf_dir}/{table}: columns drifted "
                f"(+{sorted(got - cols)} -{sorted(cols - got)})"
            )
    return problems


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    problems: list[str] = []
    for sf in sf_dirs:
        problems += check_schemas(sf)
    for p in problems:
        print(f"SCHEMA DRIFT: {p}")

    # LSH==exact recall validation on the gate's scale factor: prefer
    # the CLI-provided sf0.01-like dir so regenerated data in a new
    # location is what actually gets validated
    gate_sf = next((d for d in sf_dirs if "0.01" in d), sf_dirs[-1])
    print(f"-- running recall-sensitive oracles at {gate_sf} --", flush=True)
    try:
        r = subprocess.run(
            [sys.executable, "tests/oracle_harness.py", gate_sf, *RECALL_SENSITIVE],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=560,
        )
    except subprocess.TimeoutExpired:
        problems.append("recall-sensitive oracle run timed out (560s)")
        r = None
    if r is not None:
        tail = r.stdout.strip().splitlines()[-8:]
        print("\n".join(tail))
        if r.returncode != 0 or "0 failures" not in r.stdout:
            err_tail = r.stderr.strip().splitlines()[-10:]
            if err_tail:
                print("-- stderr tail --")
                print("\n".join(err_tail))
            problems.append("recall-sensitive oracle run failed")

    if problems:
        print(f"\n{len(problems)} problem(s) — investigate before building.")
        return 1
    print("\nround-start check clean: schemas stable, LSH recall intact.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
