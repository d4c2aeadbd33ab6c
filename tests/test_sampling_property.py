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
