"""Unit tests for the analytics operators: basket lift on a tiny known
basket set, time-weighted average against a hand integral, and RRF fusion
consistency between the fused output and its two source rankings."""

from __future__ import annotations

import datetime as dt

import pytest

from csv_loader_spark.queries.analytics import (
    RRF_K,
    RRF_SCALE,
    q176_basket_lift,
    q177_time_weighted_avg,
    q180_hybrid_rrf,
)

EPOCH = dt.datetime(2024, 1, 1)


def test_basket_lift_tiny_known_baskets(spark, tmp_path):
    # orders: {1: (10, 20)}, {2: (10, 20)}, {3: (10, 30)}, {4: (20,)}
    rows = []
    for ok, parts in ((1, (10, 20)), (2, (10, 20)), (3, (10, 30)), (4, (20,))):
        for i, pk in enumerate(parts):
            rows.append((ok, pk, i))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, l_linenumber int")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r["part_a"], r["part_b"]): r
        for r in q176_basket_lift(spark, str(tmp_path)).collect()
    }
    # pair (10,20): c_ab=2, c_10=3, c_20=3, n_orders=4
    r = got[(10, 20)]
    assert r["c_ab"] == 2
    assert r["conf_a_to_b"] == pytest.approx(round(2 / 3, 4))
    assert r["lift"] == pytest.approx(round(2 * 4 / (3 * 3), 4))
    assert r["n_rank"] == 1
    assert got[(10, 30)]["c_ab"] == 1
    assert len(got) == 2


def test_time_weighted_avg_hand_integral(spark, tmp_path):
    # user 1: value 10 for 2h, then 20 for 1h, then 99 (no duration)
    rows = [
        (1, EPOCH, 1, "a", 10.0),
        (2, EPOCH + dt.timedelta(hours=2), 1, "a", 20.0),
        (3, EPOCH + dt.timedelta(hours=3), 1, "a", 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q177_time_weighted_avg(spark, str(tmp_path)).collect()[0]
    assert r["n_intervals"] == 2
    assert r["covered_us"] == 3 * 3600 * 1_000_000
    # (10*2h + 20*1h) / 3h = 40/3
    assert r["twa"] == pytest.approx(round(40 / 3, 4), abs=1e-9)


def test_rrf_fusion_consistent_with_source_ranks(spark):
    """Every fused row's rrf_score must equal the integer fixed-point
    formula applied to its own lex_rank/dense_rank columns, and the output
    must be ordered by (score desc, doc_id)."""
    rows = q180_hybrid_rrf(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        expect = 0
        if r["lex_rank"] is not None:
            expect += RRF_SCALE // (RRF_K + r["lex_rank"])
        if r["dense_rank"] is not None:
            expect += RRF_SCALE // (RRF_K + r["dense_rank"])
        assert r["rrf_score"] == expect
    scores = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)
    assert [r["n_rank"] for r in rows] == sorted(r["n_rank"] for r in rows)


def test_join_size_estimate_exact_side_brute_force(spark):
    """exact_pairs must equal sum(c^2) computed naively, and err_bp must
    be the integer basis-point error of est vs exact."""
    from csv_loader_spark.queries.analytics import q182_join_size_estimate

    sf = "/root/testdata/sf0.001"
    rows = {r["key_col"]: r for r in q182_join_size_estimate(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    import collections

    for key in ("l_partkey", "l_suppkey"):
        counts = collections.Counter(
            r[key] for r in li.select(key).collect()
        )
        exact = sum(c * c for c in counts.values())
        r = rows[key]
        assert r["exact_pairs"] == exact
        assert r["err_bp"] == abs(r["est_pairs"] - exact) * 10000 // exact


def test_welch_ttest_vs_scipy_formula(spark, tmp_path):
    """t statistic and Satterthwaite dof must match the closed form
    computed in pure Python on a tiny known sample."""
    import datetime as dt
    import statistics

    from csv_loader_spark.queries.analytics2 import q183_ab_welch_ttest

    a_vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    b_vals = [2.0, 2.5, 3.5, 8.0]
    rows = []
    eid = 0
    for uid, vals in ((0, a_vals), (1, b_vals)):  # parity split
        for v in vals:
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=eid), uid, "x", v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q183_ab_welch_ttest(spark, str(tmp_path)).collect()[0]
    na, nb = len(a_vals), len(b_vals)
    ma, mb = statistics.fmean(a_vals), statistics.fmean(b_vals)
    va, vb = statistics.variance(a_vals), statistics.variance(b_vals)
    qa, qb = va / na, vb / nb
    t = (ma - mb) / (qa + qb) ** 0.5
    dof = (qa + qb) ** 2 / (qa * qa / (na - 1) + qb * qb / (nb - 1))
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["t_stat"] == round(t, 4)
    assert r["welch_dof"] == round(dof, 4)


def test_multi_touch_attribution_hand_case(spark, tmp_path):
    """One purchase with 2 in-window touches and 1 out-of-window touch:
    last/first winners and the linear split must be exact."""
    import datetime as dt

    from csv_loader_spark.queries.analytics2 import q184_multi_touch_attribution

    t0 = dt.datetime(2024, 1, 2, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(hours=30), 1, "click", 0.0),  # outside 24h
        (2, t0 - dt.timedelta(hours=2), 1, "click", 0.0),   # first in-window
        (3, t0 - dt.timedelta(hours=1), 1, "view", 0.0),    # last in-window
        (4, t0, 1, "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["touch_type"]: r
        for r in q184_multi_touch_attribution(spark, str(tmp_path)).collect()
    }
    assert got["click"]["n_touches"] == 1
    assert got["view"]["n_touches"] == 1
    assert got["view"]["last_touch_conv"] == 1
    assert got["click"]["first_touch_conv"] == 1
    assert got["click"]["linear_credit"] == 0.5
    assert got["view"]["linear_credit"] == 0.5


def test_cumulative_uniques_counts_each_user_once(spark, tmp_path):
    import datetime as dt

    from csv_loader_spark.queries.analytics2 import q185_cumulative_uniques

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a", 0.0),
        (2, base + dt.timedelta(days=1), 1, "a", 0.0),  # repeat user
        (3, base + dt.timedelta(days=1), 2, "a", 0.0),  # new user day 2
        (4, base + dt.timedelta(days=3), 3, "a", 0.0),  # new user day 4
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        (r["day"], r["n_new"], r["cum_users"])
        for r in q185_cumulative_uniques(spark, str(tmp_path)).collect()
    )
    days = [d for d, _, _ in out]
    assert [n for _, n, _ in out] == [1, 1, 1]
    assert [c for _, _, c in out] == [1, 2, 3]
    assert days[1] == days[0] + 1 and days[2] == days[0] + 3
