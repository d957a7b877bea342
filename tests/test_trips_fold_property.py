"""Property test for the trip-segmentation fold (streaming/trips.py):
folding an event sequence incrementally — under ANY partitioning into
micro-batches — must produce exactly the trips the whole-sequence fold
produces. This is the invariant that makes the batch query (q84), the
applyInPandasWithState stream, and the transformWithStateInPandas
processor interchangeable. Pure Python (no Spark session), so hypothesis
can run hundreds of cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from csv_loader_spark.streaming.trips import _cents, _fold

GAP_US = 60 * 1_000_000  # 1-minute gap keeps generated sequences interesting


def _run_folds(ts_list, values, split_points):
    """Fold the sequence in one go AND split into chunks; return both."""
    whole_closed, whole_open = _fold(None, ts_list, values, GAP_US)

    chunks_closed, cur = [], None
    bounds = [0] + sorted(split_points) + [len(ts_list)]
    for lo, hi in zip(bounds, bounds[1:]):
        closed, cur = _fold(cur, ts_list[lo:hi], values[lo:hi], GAP_US)
        chunks_closed.extend(closed)
    return (whole_closed, whole_open), (chunks_closed, cur)


@settings(max_examples=300, deadline=None)
@given(
    deltas=st.lists(
        st.integers(min_value=0, max_value=3 * GAP_US), min_size=1, max_size=40
    ),
    values=st.data(),
)
def test_fold_is_invariant_under_micro_batch_splits(deltas, values):
    # build a sorted event-time sequence from non-negative deltas
    ts = []
    t = 1_577_836_800_000_000  # 2020-01-01 in epoch µs
    for d in deltas:
        t += d
        ts.append(t)
    vals = values.draw(
        st.lists(
            st.floats(min_value=-999.99, max_value=999.99, allow_nan=False),
            min_size=len(ts),
            max_size=len(ts),
        )
    )
    splits = values.draw(
        st.lists(
            st.integers(min_value=0, max_value=len(ts)), max_size=6
        )
    )
    (wc, wo), (cc, co) = _run_folds(ts, vals, splits)
    assert cc == wc, "closed trips differ under micro-batch splitting"
    assert co == wo, "open-trip state differs under micro-batch splitting"


@given(v=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_cents_is_sql_half_away_rounding(v):
    got = _cents(v)
    # SQL round(x*100) semantics: half away from zero, exact at integers
    from decimal import Decimal, ROUND_HALF_UP

    want = int(
        Decimal(repr(v)).scaleb(2).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )
    # repr() round-trips the double; fp products within half-ulp of a
    # boundary can legitimately differ by 1 cent between the two
    # formulations — only exact halves and clear cases must agree
    assert abs(got - want) <= 1
    if v >= 0:
        assert got >= 0 or v == 0
    else:
        assert got <= 0
