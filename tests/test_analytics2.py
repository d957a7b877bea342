"""Unit tests for the monitoring/quality analytics: CUSUM finds a planted
changepoint, PSI is ~0 on an unshifted distribution, the FD audit flags a
planted violation, and the lift curve is maximal for a perfectly
separating score."""

from __future__ import annotations

import datetime as dt

import pytest

EPOCH = dt.datetime(2024, 1, 1)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, hour_offset, user_id, event_type, value)."""
    data = [
        (eid, EPOCH + dt.timedelta(hours=h, minutes=eid % 45), uid, et, v)
        for (eid, h, uid, et, v) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    from csv_loader_spark.queries.relational5 import q187_cusum_changepoint

    # 20 hours at 2 events/hour, then 20 hours at 8 events/hour:
    # |CUSUM| peaks exactly at the last pre-shift hour (offset 19).
    rows = []
    eid = 0
    for h in range(40):
        n = 2 if h < 20 else 8
        for _ in range(n):
            rows.append((eid, h, 1, "a", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = q187_cusum_changepoint(spark, sf).collect()[0]
    base_hr = EPOCH.timestamp() // 3600
    assert r["cp_hr"] - base_hr == 19
    # pre-shift mean is below the global mean -> negative cumulative sum
    assert r["direction"] == -1
    # exact value: n*prefix - t*S with n=40, prefix(19)=40, t=20, S=200
    assert r["cusum_scaled"] == 40 * 40 - 20 * 200


def test_psi_zero_when_windows_identical(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q190_psi_drift

    # same value histogram in week 1 (days 0-6) and week 4 (days 21-27)
    rows = []
    eid = 0
    for day in (1, 22):
        for v in (10.0, 60.0, 110.0, 110.0, 260.0):
            rows.append((eid, day * 24, 1, "a", v))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = q190_psi_drift(spark, sf).collect()[0]
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)


def test_psi_large_when_distribution_shifts(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q190_psi_drift

    rows = []
    eid = 0
    for _ in range(30):
        rows.append((eid, 24, 1, "a", 10.0))  # week 1: all in bucket 0
        eid += 1
    for _ in range(30):
        rows.append((eid, 22 * 24, 1, "a", 460.0))  # week 4: all in bucket 9
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = q190_psi_drift(spark, sf).collect()[0]
    assert r["psi"] > 0.25  # "shifted" by the standard convention


def test_fd_audit_planted_violation(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q189_fd_audit

    rows = [
        # l_orderkey -> l_returnflag holds; l_partkey -> l_suppkey violated
        (1, 10, 100, "A", "O"),
        (1, 11, 101, "A", "O"),
        (2, 10, 999, "B", "F"),  # part 10 maps to two suppliers
        (2, 12, 102, "B", "F"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, l_linestatus string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {(r["lhs"], r["rhs"]): r for r in q189_fd_audit(spark, str(tmp_path)).collect()}
    ok = got[("l_orderkey", "l_returnflag")]
    assert ok["holds"] == 1 and ok["n_violating"] == 0
    bad = got[("l_partkey", "l_suppkey")]
    assert bad["holds"] == 0
    assert bad["n_violating"] == 1 and bad["max_rhs_per_lhs"] == 2


def test_lift_curve_perfect_separation(spark, tmp_path):
    """Scores that perfectly order positives first: top deciles get lift
    1/base_rate, bottom deciles 0, cumulative capture hits 1.0 exactly
    when the positives are exhausted."""
    from csv_loader_spark.queries.analytics2 import (
        LIFT_POS_LABELS,
        q192_lift_curve,
    )

    n = 100
    docs, embs = [], []
    for i in range(n):
        pos = i < 20  # top-20 by score are the positives
        docs.append((i, f"t{i}", "en", "s", 1000 - i))  # n_chars descending
        embs.append((i, [0.0], LIFT_POS_LABELS[0] if pos else 9))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["decile"]: r for r in q192_lift_curve(spark, str(tmp_path)).collect()}
    assert out[1]["lift"] == pytest.approx(5.0)  # 1 / base_rate(0.2)
    assert out[2]["lift"] == pytest.approx(5.0)
    assert out[3]["lift"] == 0.0
    assert out[2]["cum_capture"] == pytest.approx(1.0)
    assert out[10]["cum_capture"] == pytest.approx(1.0)
