"""Hand-computed fixture tests for the r15 statistical batch (q250
Kendall tau-b, q251 Cramér's V) — the analytics6/analytics5_stats
convention: tiny series a reviewer checks by hand, pinning the
DEFINITIONS independently of the sf0.01 oracle gate."""

from __future__ import annotations

import datetime as dt

import pytest

from csv_loader_spark.queries.analytics7 import (
    q250_kendall_tau,
    q251_cramers_v,
)


def test_q250_tau_b_hand(spark, tmp_path):
    # one flag, (x, y-cents) rows: (1,1), (2,2), (3,1), (3,3).
    # 6 pairs: C = {(1,1)-(2,2), (1,1)-(3,3), (2,2)-(3,3)} = 3,
    # D = {(2,2)-(3,1)} = 1; x-tie (3,1)-(3,3) and y-tie (1,1)-(3,1)
    # count in neither. m0 = n(n-1) = 12, m1 = sum tx(tx-1) = 2,
    # m2 = 2 -> tau = 2(3-1)/sqrt(10*10) = 0.4.
    rows = [
        ("A", 1.0, 0.01),
        ("A", 2.0, 0.02),
        ("A", 3.0, 0.01),
        ("A", 3.0, 0.03),
    ]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_discount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = q250_kendall_tau(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["flag"], r["n"]) == ("A", 4)
    assert (r["concordant"], r["discordant"]) == (3, 1)
    assert r["tau_b"] == pytest.approx(0.4)


def test_q250_tau_b_degenerate_all_ties(spark, tmp_path):
    # every x identical: m0 - m1 = 0 -> tau_b NULL, not a crash
    rows = [("A", 5.0, 0.01), ("A", 5.0, 0.02), ("A", 5.0, 0.03)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_discount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = q250_kendall_tau(spark, str(tmp_path)).collect()
    # no a.x < b.x cell pairs exist, so the cd join is empty and the
    # flag drops out entirely (inner join) — the oracle does the same
    assert out == []


def test_q251_cramers_v_hand(spark, tmp_path):
    # 2 types x 2 weekdays, counts [[3,1],[1,3]]: all margins 4, n=8,
    # every expected count 2 -> chi2 = 4 * (1)^2/2 = 2.0,
    # V = sqrt(2 / (8 * 1)) = 0.5
    d1 = dt.datetime(2024, 1, 1, 12)
    d2 = dt.datetime(2024, 1, 2, 12)
    rows = []
    eid = 0
    for et, day, cnt in (
        ("a", d1, 3), ("a", d2, 1), ("b", d1, 1), ("b", d2, 3),
    ):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, day, 1, et, 0.0))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q251_cramers_v(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_cells"], r["n_events"]) == (4, 8)
    assert r["chi2"] == pytest.approx(2.0)
    assert r["cramers_v"] == pytest.approx(0.5)


def test_q251_structural_zero_cells_counted(spark, tmp_path):
    # type b never occurs on day2: the margin-cross grid still charges
    # the (b, day2) cell its expected-count term. Counts [[2,2],[2,0]]:
    # margins rt=(4,2), ct=(4,2), n=6; e = [[8/3,4/3],[4/3,2/3]];
    # chi2 = (2-8/3)^2/(8/3) + (2-4/3)^2/(4/3) + (2-4/3)^2/(4/3)
    #      + (0-2/3)^2/(2/3) = 1/6 + 1/3 + 1/3 + 2/3 = 1.5
    d1 = dt.datetime(2024, 1, 1, 12)
    d2 = dt.datetime(2024, 1, 2, 12)
    rows = []
    eid = 0
    for et, day, cnt in (
        ("a", d1, 2), ("a", d2, 2), ("b", d1, 2),
    ):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, day, 1, et, 0.0))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q251_cramers_v(spark, str(tmp_path)).collect()[0]
    assert (r["n_cells"], r["n_events"]) == (4, 6)
    assert r["chi2"] == pytest.approx(1.5)
    assert r["cramers_v"] == pytest.approx(round((1.5 / 6) ** 0.5, 4))
