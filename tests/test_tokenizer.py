"""BPE tokenizer training/encoding (operators/tokenizer.py): driver and
distributed strategies must agree exactly, encoding must match a pure-
Python greedy replay, and the encode plan must stay map-only."""

import random

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.operators.tokenizer import (
    MERGE_SCHEMA,
    _train_driver,
    apply_merge_expr,
    bpe_encode,
    train_bpe_merges,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_encode(word, pairs):
    """Reference greedy encoder (the classic scan; equals replace-all
    because every learned pair has lhs != rhs)."""
    s = list(word)
    for a, b in pairs:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def test_hand_computed_merges(spark):
    docs = _docs_df(spark, ["ab ab abc b a", "abc abc cab"])
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.weight)
        for r in train_bpe_merges(docs, "text", n_merges=3).collect()
    ]
    # histogram: ab:2 abc:3 b:1 a:1 cab:1
    # r1: (a,b) = 2+3+1 = 6; r2: (ab,c) = 3; r3: (c,ab) = 1
    assert got == [
        (1, "a", "b", "ab", 6),
        (2, "ab", "c", "abc", 3),
        (3, "c", "ab", "cab", 1),
    ]


def test_driver_and_distributed_strategies_agree(spark):
    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        )
        for _ in range(20)
    ]
    docs = _docs_df(spark, texts)
    fast = train_bpe_merges(docs, "text", n_merges=5).collect()
    dist = train_bpe_merges(
        docs, "text", n_merges=5, strategy="distributed"
    ).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in dist]
    # forced-overflow auto: bound smaller than the vocab falls back to
    # the distributed rounds and still agrees
    tiny_bound = train_bpe_merges(
        docs, "text", n_merges=5, driver_max_vocab=2
    ).collect()
    assert [tuple(r) for r in tiny_bound] == [tuple(r) for r in fast]


def test_identical_symbol_pairs_never_merge(spark):
    docs = _docs_df(spark, ["aaaa aa bb"])
    got = train_bpe_merges(docs, "text", n_merges=4).collect()
    assert got == []  # only (a,a)/(b,b) adjacencies exist
    # mixed corpus: merges appear but none with lhs == rhs
    docs2 = _docs_df(spark, ["aab aab bba"])
    for r in train_bpe_merges(docs2, "text", n_merges=4).collect():
        assert r.lhs != r.rhs


def test_encode_matches_python_replay(spark):
    rng = random.Random(13)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
            for _ in range(25)
        )
        for _ in range(10)
    ]
    docs = _docs_df(spark, texts)
    merges = train_bpe_merges(docs, "text", n_merges=6)
    pairs = [(r.lhs, r.rhs) for r in merges.orderBy("rank").collect()]
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode(docs, "text", "doc_id", merges).collect()
    }
    for i, t in enumerate(texts):
        expect = [
            tok for w in t.split() for tok in _py_encode(w, pairs)
        ]
        assert got[i] == expect, f"doc {i}"


def test_encode_plan_is_map_only(spark):
    docs = _docs_df(spark, ["ab ab abc"])
    enc = bpe_encode(docs, "text", "doc_id", [("a", "b"), ("ab", "c")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles at any corpus size
    assert "EvalPython" not in plan  # no Python UDFs, HOFs only


def test_contract_errors(spark):
    docs = _docs_df(spark, ["ab"])
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges(docs, "text", n_merges=0)
    with pytest.raises(ValueError, match="strategy"):
        train_bpe_merges(docs, "text", strategy="magic")
    with pytest.raises(ValueError, match="lhs != rhs"):
        apply_merge_expr("s", "a", "a")


def test_early_stop_and_quote_safety(spark):
    # vocabulary exhausts after one merge; quote-bearing symbols must
    # escape cleanly into the generated expressions
    docs = _docs_df(spark, ["a'b a'b"])
    merges = train_bpe_merges(docs, "text", n_merges=5)
    rows = merges.collect()
    # round 1 ties (a,')=2 vs (',b)=2 break lexicographically: ' < a
    assert [(r.lhs, r.rhs) for r in rows] == [("'", "b"), ("a", "'b")]
    enc = bpe_encode(
        docs, "text", "doc_id", [(r.lhs, r.rhs) for r in rows]
    ).collect()
    assert enc[0].tokens == ["a'b", "a'b"]


def test_driver_reference_is_pure(spark):
    # _train_driver over an explicit histogram equals the DataFrame path
    hist = [("ab", 2), ("abc", 3), ("b", 1), ("a", 1), ("cab", 1)]
    got = _train_driver(hist, 3)
    assert got == [
        (1, "a", "b", "ab", 6),
        (2, "ab", "c", "abc", 3),
        (3, "c", "ab", "cab", 1),
    ]
    assert MERGE_SCHEMA.fieldNames() == [
        "rank", "lhs", "rhs", "merged", "weight",
    ]


def test_bpe_memo_lifecycle(spark):
    """The learned-merge memo must key on this session, serve repeat
    callers without retraining, and clear with the funnel memo."""
    from delta_lake_spark.queries import llm

    sf = "/root/testdata/sf0.001"
    llm.clear_funnel_memo(spark)
    first = llm._bpe_merges(spark, sf)
    assert (id(spark), sf) in llm._BPE_MEMO
    assert llm._bpe_merges(spark, sf) is first  # served from the memo
    llm.clear_funnel_memo(spark)
    assert (id(spark), sf) not in llm._BPE_MEMO
