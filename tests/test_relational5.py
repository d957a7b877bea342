"""Unit tests for the relational5 time-series analytics: gap-fill
interpolation on a hand-built sparse series, the truncated-EWMA FIR filter
against a pure-Python reference, MAD outliers vs numpy, OLS on an exact
line, and Markov transitions on a tiny known clickstream.

Each test writes a synthetic events.parquet into tmp_path and runs the
registered query through the same load_table path the driver uses.
"""

from __future__ import annotations

import datetime as dt

import pytest

from csv_loader_spark.queries.relational5 import (
    EWMA_TAPS,
    q171_gap_fill,
    q172_exp_smooth,
    q173_mad_outliers,
    q175_markov_transitions,
)

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, hour_offset, user_id, event_type, value)."""
    data = [
        (eid, EPOCH + dt.timedelta(hours=h, minutes=eid % 50), uid, et, v)
        for (eid, h, uid, et, v) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gap_fill_interpolates_between_bracketing_hours(spark, tmp_path):
    # hours 0 (cnt 2), 1 (cnt 4), 4 (cnt 1): gaps at 2 and 3.
    rows = []
    eid = 0
    for h, n in ((0, 2), (1, 4), (4, 1)):
        for _ in range(n):
            rows.append((eid, h, 1, "a", 10.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r["hr"]: r for r in q171_gap_fill(spark, sf).collect()}
    base = min(got)
    by_off = {hr - base: r for hr, r in got.items()}
    assert sorted(by_off) == [0, 1, 2, 3, 4]
    assert [by_off[o]["is_gap"] for o in range(5)] == [0, 0, 1, 1, 0]
    # ffill carries hour-1's count across the gap
    assert by_off[2]["cnt_ffill"] == 4 and by_off[3]["cnt_ffill"] == 4
    # linear interp between (1, cnt 4) and (4, cnt 1): 4 - 1*k
    assert by_off[2]["cnt_interp"] == pytest.approx(3.0)
    assert by_off[3]["cnt_interp"] == pytest.approx(2.0)
    # observed hours pass through untouched
    assert by_off[0]["cnt_interp"] == 2.0 and by_off[4]["cnt_interp"] == 1.0
    # sum ffill: hour 1 had 4 events of 10.0
    assert by_off[3]["sum_ffill"] == 40.0


def test_exp_smooth_matches_python_fir(spark, tmp_path):
    # 30 consecutive hours with a known count pattern; only hr%24==0 rows
    # (offsets 0 and 24 here) are emitted.
    counts = [((h * 7) % 5) + 1 for h in range(30)]
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, h, 1, "a", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)

    def fir(i):
        num = den = 0.0
        for d in range(EWMA_TAPS):
            if i - d >= 0:
                num += counts[i - d] * 0.5**d
                den += 0.5**d
        return round(num / den, 4)

    # the series starts on a day boundary, so offsets 0 and 24 are emitted
    got = sorted(r["smoothed"] for r in q172_exp_smooth(spark, sf).collect())
    assert got == sorted([fir(0), fir(24)])


def test_mad_outliers_vs_numpy(spark, tmp_path):
    import numpy as np

    vals = [1.0, 2.0, 2.0, 3.0, 4.0, 100.0, 2.5, 1.5, 3.5, 2.0, 98.0]
    rows = [(i, i % 5, 1, "a", v) for i, v in enumerate(vals)]
    sf = _write_events(spark, tmp_path, rows)
    r = q173_mad_outliers(spark, sf).collect()[0]
    med = float(np.median(vals))
    mad = float(np.median(np.abs(np.array(vals) - med)))
    n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
    assert r["med"] == pytest.approx(med, abs=1e-4)
    assert r["mad"] == pytest.approx(mad, abs=1e-4)
    assert r["n_outliers"] == n_out
    assert r["outlier_rate"] == pytest.approx(round(n_out / len(vals), 4), abs=1e-9)


def test_group_ols_exact_line(spark, tmp_path):
    from csv_loader_spark.queries.relational5 import q174_group_ols

    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 1, corr 1
    rows = [("A", float(x), 2.0 * x + 1.0) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_quantity double, l_extendedprice double")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = q174_group_ols(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 20
    assert r["slope"] == pytest.approx(2.0, abs=1e-9)
    assert r["intercept"] == pytest.approx(1.0, abs=1e-9)
    assert r["r2"] == pytest.approx(1.0, abs=1e-9)
    assert r["corr_xy"] == pytest.approx(1.0, abs=1e-9)


def test_markov_transitions_tiny_clickstream(spark, tmp_path):
    # user 1: a -> b -> a ; user 2: a -> b  (hour offsets give strict order)
    rows = [
        (1, 0, 1, "a", 0.0),
        (2, 1, 1, "b", 0.0),
        (3, 2, 1, "a", 0.0),
        (4, 0, 2, "a", 0.0),
        (5, 1, 2, "b", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {(r["src"], r["dst"]): r for r in q175_markov_transitions(spark, sf).collect()}
    assert got[("a", "b")]["cnt"] == 2 and got[("a", "b")]["p"] == 1.0
    assert got[("b", "a")]["cnt"] == 1 and got[("b", "a")]["p"] == 1.0
    assert got[("a", "b")]["rnk"] == 1 and got[("b", "a")]["rnk"] == 1
    assert len(got) == 2
