"""Property-based invariant for the token-budget selector: for
ARBITRARY score/token distributions and budgets, the binned two-level
implementation must equal the flat running-sum prefix in
(bin DESC, md5(seed||id), id) order — the exact semantics the DuckDB
oracle replays. Randomized inputs probe bin-boundary and tie shapes the
fixture corpus never hits (duplicate scores, tiny bins, budget landing
exactly on a document edge)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_operators import _flat_budget_select as _flat


corpora = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpora, budget_frac=st.floats(min_value=0.0, max_value=1.2))
def test_token_budget_select_matches_flat_prefix(spark, rows, budget_frac):
    from delta_lake_spark.operators.sampling import select_by_token_budget

    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    budget = int(budget_frac * sum(t for _, _, t in data))
    df = spark.createDataFrame(data, "id long, score double, tok long")
    got = {
        r.id
        for r in select_by_token_budget(
            df, "score", "tok", "id", budget=budget
        ).collect()
    }
    assert got == _flat(data, budget)


def test_weighted_sample_huge_weights_not_id_biased(spark):
    """Weight-scale contract: raw-scale weights (token counts, say,
    up to 1e12) must not collapse the 9dp-rounded priorities onto the
    id tie-break. Pre-normalization, u^(1/1e12) rounded to 1.000000000
    for EVERY row and the "sample" was just ids 1..k; with weights
    normalized to max 1.0 the draw follows the content hash, and in a
    mixed corpus the heavy rows — not the small ids — win."""
    from delta_lake_spark.operators.sampling import weighted_sample

    n, k = 500, 50
    heavy = spark.createDataFrame(
        [(i, 1e12) for i in range(1, n + 1)], "id long, w double"
    )
    out = weighted_sample(heavy, "w", "id", k=k).collect()
    got = sorted(r.id for r in out)
    assert len(got) == k
    assert got != list(range(1, k + 1))  # not the id-order collapse
    assert len({r.priority for r in out}) == k  # hash-spread priorities

    mixed = spark.createDataFrame(
        [(i, 1e12 if i % 5 == 0 else 1.0) for i in range(1, n + 1)],
        "id long, w double",
    )
    picked = [r.id for r in weighted_sample(mixed, "w", "id", k=k).collect()]
    assert len(picked) == k
    # normalized, light rows' priorities underflow toward 0 while every
    # heavy row keeps a spread u^1 priority: the heavy 20% fills the top-k
    assert all(i % 5 == 0 for i in picked)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    n_neg=st.integers(min_value=1, max_value=3),
    bucket_hex=st.integers(min_value=1, max_value=3),
)
def test_ring_negatives_bucket_invariance(spark, ids, n_neg, bucket_hex):
    """bucket_hex is an EXECUTION parameter: the ring successor of a
    probe is a pure function of the hashes, so any bucket granularity
    (and any partitioning) must produce the identical assignment —
    checked against the direct python ring walk."""
    import hashlib

    from delta_lake_spark.operators.sampling import hash_ring_negatives

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        (r.doc_id, r.neg_idx): r.doc_id_neg
        for r in hash_ring_negatives(
            df.repartition(3), "doc_id", n_neg=n_neg,
            seed="p", bucket_hex=bucket_hex,
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    ring = sorted((md5(f"ring-p{i}"), i) for i in ids)

    def succ(p):
        for h, i in ring:
            if h >= p:
                return i
        return ring[0][1]

    expect = {}
    for a in ids:
        for j in range(1, n_neg + 1):
            n = succ(md5(f"p|{a}|{j}"))
            if n != a:
                expect[(a, j)] = n
    assert got == expect
