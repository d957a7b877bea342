"""Hypothesis property tests for the pure streaming folds: CUSUM and
Misra-Gries obey their invariants on arbitrary inputs, and batch
splitting never changes the result (the stream==batch property at the
fold level, with no Spark in the loop)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from csv_loader_spark.streaming.cusum_monitor import cusum_fold
from csv_loader_spark.streaming.heavy_hitters import mg_update

xs_strategy = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False), max_size=60
)


@settings(max_examples=200, deadline=None)
@given(xs=xs_strategy, mu0=st.floats(-10, 10), slack=st.floats(0, 2), h=st.floats(0.5, 20))
def test_cusum_statistics_nonnegative_and_alarm_iff_crossing(xs, mu0, slack, h):
    out = cusum_fold(xs, mu0, slack, h)
    for s_pos, s_neg, alarm in out:
        assert s_pos >= 0.0 and s_neg >= 0.0
        assert alarm == (s_pos > h or s_neg > h)


@settings(max_examples=200, deadline=None)
@given(xs=xs_strategy, mu0=st.floats(-10, 10), slack=st.floats(0, 2), h=st.floats(0.5, 20))
def test_cusum_fold_is_split_invariant(xs, mu0, slack, h):
    """Folding [a + b] equals folding a, carrying the post-reset tail
    state, then folding b — the property the streaming operator's
    state resume depends on."""
    whole = cusum_fold(xs, mu0, slack, h)
    for cut in (0, len(xs) // 2, len(xs)):
        a, b = xs[:cut], xs[cut:]
        fa = cusum_fold(a, mu0, slack, h)
        if fa:
            s_pos, s_neg, _ = fa[-1]
            if s_pos > h:
                s_pos = 0.0
            if s_neg > h:
                s_neg = 0.0
        else:
            s_pos = s_neg = 0.0
        fb = cusum_fold(b, mu0, slack, h, s_pos, s_neg)
        assert fa + fb == whole


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(st.sampled_from("abcdefgh"), max_size=400),
    k=st.integers(2, 8),
)
def test_misra_gries_superset_and_undercount_bounds(words, k):
    ctr: dict[str, int] = {}
    for w in words:
        mg_update(ctr, w, k)
    true: dict[str, int] = {}
    for w in words:
        true[w] = true.get(w, 0) + 1
    n = len(words)
    assert len(ctr) <= k
    for w, c in true.items():
        if c * k > n:
            assert w in ctr, (w, c, n, k)
    for w, c in ctr.items():
        assert 0 < c <= true[w]
        assert true[w] - c <= n / k
