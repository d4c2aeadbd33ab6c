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
