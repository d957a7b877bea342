"""Hand-computed fixture tests for the analytics5 statistical batch
(q239 Kaplan-Meier hazard, q240 CUPED, q243 seasonal MAD anomalies):
the sf0.01 oracle gate covers cross-engine exactness; these pin the
DEFINITIONS (risk-set censoring, the pooled-theta adjustment, the
integer twice-median MAD) on 10-ish-row series a reviewer can check by
hand — the q246-q249 convention from test_analytics6.py."""

from __future__ import annotations

import datetime as dt

import pytest

from csv_loader_spark.queries.analytics5 import (
    q239_churn_hazard,
    q240_cuped_ab,
    q243_seasonal_anomaly_days,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)
_D0 = dt.datetime(2024, 1, 1)


def _ev(eid, day, uid, value=0.0):
    return (eid, _D0 + dt.timedelta(days=day), uid, "click", float(value))


def test_q239_km_risk_table_hand(spark, tmp_path):
    # lifetimes (first->last event day): u1 0..2 (t=2), u2 0..1 (t=1),
    # u3 1..3 (t=2), u4 3..3 (t=0); horizon = day 3, so u3/u4 are
    # CENSORED (still active at the horizon), u1/u2 churned.
    rows = [
        _ev(1, 0, 1), _ev(2, 2, 1),
        _ev(3, 0, 2), _ev(4, 1, 2),
        _ev(5, 1, 3), _ev(6, 3, 3),
        _ev(7, 3, 4),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["lifetime_days"]: r
        for r in q239_churn_hazard(spark, str(tmp_path)).collect()
    }
    # times: t=0 (d=0,c=1) dropped by d>0; t=1 (d=1,c=0); t=2 (d=1,c=1)
    # n_risk = reverse cumsum of d+c: t=2 -> 2, t=1 -> 3, t=0 -> 4
    assert set(got) == {1, 2}
    assert (got[1]["n_risk"], got[1]["n_churned"], got[1]["censored"]) == (
        3, 1, 0,
    )
    assert got[1]["hazard"] == pytest.approx(round(1 / 3, 4))
    assert (got[2]["n_risk"], got[2]["n_churned"], got[2]["censored"]) == (
        2, 1, 1,
    )
    assert got[2]["hazard"] == pytest.approx(0.5)


def test_q240_cuped_theta_hand(spark, tmp_path):
    # per-user (pre x, post y) cents: u0 (100,200), u2 (300,400) in
    # variant 0; u1 (200,100), u3 (400,300) in variant 1. Pooled:
    # n=4, sx=sy=1000, sxy=280000, sxx=300000 ->
    # theta = (4*280000-1e6)/(4*300000-1e6) = 120000/200000 = 0.6
    # x_bar = 250. Variant 0: vy/n=300, vx/n=200 ->
    #   cuped = (300 - 0.6*(200-250))/100 = 3.30 (raw 3.00)
    # Variant 1: vy/n=200, vx/n=300 ->
    #   cuped = (200 - 0.6*(300-250))/100 = 1.70 (raw 2.00)
    rows = [
        _ev(1, 0, 0, 1.00), _ev(2, 20, 0, 2.00),
        _ev(3, 1, 2, 3.00), _ev(4, 20, 2, 4.00),
        _ev(5, 0, 1, 2.00), _ev(6, 21, 1, 1.00),
        _ev(7, 2, 3, 4.00), _ev(8, 22, 3, 3.00),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["variant"]: r for r in q240_cuped_ab(spark, str(tmp_path)).collect()
    }
    assert got[0]["n_users"] == 2 and got[1]["n_users"] == 2
    assert got[0]["mean_post"] == pytest.approx(3.0)
    assert got[1]["mean_post"] == pytest.approx(2.0)
    # CUPED shrinks both arms toward each other by the SAME 0.30 (the
    # pre-period imbalance is symmetric), preserving the pooled mean
    assert got[0]["mean_cuped"] == pytest.approx(3.3)
    assert got[1]["mean_cuped"] == pytest.approx(1.7)


def test_q243_seasonal_mad_hand(spark, tmp_path):
    # two weeks of daily revenue; dow slot 0 gets (100, 900) cents ->
    # season 500, residuals -+400; slots 1-6 get (100, 200) -> season
    # 150, residuals -+50. Sorted |r|: 50 x12, 400 x2; n=14 even ->
    # tmad = 50 + 50 = 100; z = 2|r|/tmad: 8.0 for the slot-0 days,
    # 1.0 for the rest.
    rows = []
    for i in range(14):
        if i == 0:
            cents = 100
        elif i == 7:
            cents = 900
        elif i < 7:
            cents = 100
        else:
            cents = 200
        rows.append(
            (dt.date(2024, 1, 1) + dt.timedelta(days=i), cents / 100.0)
        )
    df = spark.createDataFrame(
        rows, "l_shipdate date, l_extendedprice double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = q243_seasonal_anomaly_days(spark, str(tmp_path)).collect()
    assert len(out) == 14  # top-15 over 14 days = all of them
    assert [r["day"] for r in out[:2]] == ["2024-01-01", "2024-01-08"]
    assert [r["z_mad"] for r in out[:2]] == [8.0, 8.0]
    assert (out[0]["resid"], out[1]["resid"]) == (-400, 400)
    assert (out[0]["cents"], out[1]["cents"]) == (100, 900)
    assert all(r["z_mad"] == 1.0 for r in out[2:])
    # the 1.0 tail is ordered by day
    assert [r["day"] for r in out[2:5]] == [
        "2024-01-02", "2024-01-03", "2024-01-04",
    ]