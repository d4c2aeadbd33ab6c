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
