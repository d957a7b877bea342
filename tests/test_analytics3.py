"""Unit tests for q194-q200: Benford digits on planted amounts, ABC
classes on a known revenue skew, Theil-Sen on a perfect linear trend,
islands/gaps on a punctured id sequence, drawdown on a planted dip,
the epsilon-join duplicate screen, and capstone==legs consistency."""

from __future__ import annotations

import datetime as dt

import pytest

EPOCH = dt.datetime(2024, 1, 1)


def _write_events(spark, tmp_path, rows):
    data = [
        (eid, EPOCH + dt.timedelta(hours=h, minutes=eid % 40), uid, et, v)
        for (eid, h, uid, et, v) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_benford_digit_census(spark, tmp_path):
    from csv_loader_spark.queries.relational5 import q194_benford_audit

    rows = [
        (1, 1, "O", 123.45, EPOCH),   # digit 1
        (2, 1, "O", 19.99, EPOCH),    # digit 1
        (3, 1, "O", 999.99, EPOCH),   # digit 9 (floor -> 999, NOT 1000)
        (4, 1, "O", 45.0, EPOCH),     # digit 4
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r["digit"]: r for r in q194_benford_audit(spark, str(tmp_path)).collect()}
    assert got[1]["observed"] == 2
    assert got[9]["observed"] == 1  # the floor-vs-round cast trap, pinned
    assert got[4]["observed"] == 1
    assert got[1]["p_obs"] == 0.5
    import math

    assert got[1]["p_benford"] == round(math.log10(2), 4)


def test_abc_pareto_classes(spark, tmp_path):
    from csv_loader_spark.queries.relational5 import q195_abc_pareto

    # revenues 80, 15, 3, 2 (no discount): A={80}, B={15}, C={3,2}
    rows = []
    for i, rev in enumerate((80.0, 15.0, 3.0, 2.0)):
        rows.append((i, i + 1, 1, 1, 1.0, rev, 0.0, 0.0, "N", "O", EPOCH))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {r["abc"]: r for r in q195_abc_pareto(spark, str(tmp_path)).collect()}
    assert got["A"]["n_parts"] == 1 and got["A"]["class_rev_cents"] == 8000
    assert got["B"]["n_parts"] == 1 and got["B"]["class_rev_cents"] == 1500
    assert got["C"]["n_parts"] == 2 and got["C"]["class_rev_cents"] == 500


def test_theil_sen_exact_on_linear_trend(spark, tmp_path):
    from csv_loader_spark.queries.relational5 import q196_theil_sen

    # counts 1,2,3,...,8 per hour: every pairwise slope is exactly 1.0
    rows = []
    eid = 0
    for h in range(8):
        for _ in range(h + 1):
            rows.append((eid, h, 1, "a", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = q196_theil_sen(spark, sf).collect()[0]
    assert r["n_pairs"] == 8 * 7 // 2
    assert r["theil_sen_slope"] == 1.0


def test_id_gaps_islands(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q197_id_gaps

    # ids 1-3, 7-8, 12 -> islands (1,3),(7,8),(12,12); gaps 3 and 3
    rows = [(i, 0, 1, "a", 1.0) for i in (1, 2, 3, 7, 8, 12)]
    sf = _write_events(spark, tmp_path, rows)
    got = sorted(
        (r["island_lo"], r["island_hi"], r["island_len"], r["gap_after"])
        for r in q197_id_gaps(spark, sf).collect()
    )
    assert got == [(1, 3, 3, 3), (7, 8, 2, 3), (12, 12, 1, None)]


def test_activity_drawdown_planted_dip(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q198_activity_drawdown

    # hourly counts 5, 8, 2, 6: peak runs 5,8,8,8; max drawdown 6; one
    # hour (cnt 2) sits below half the then-peak (8 div 2 = 4)
    rows = []
    eid = 0
    for h, n in enumerate((5, 8, 2, 6)):
        for _ in range(n):
            rows.append((eid, h, 1, "a", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = q198_activity_drawdown(spark, sf).collect()[0]
    assert r["peak_rate"] == 8
    assert r["max_drawdown"] == 6
    assert r["n_hours_below_half_peak"] == 1


def test_dup_payments_planted_pair(spark, tmp_path):
    from csv_loader_spark.queries.analytics2 import q199_dup_payments

    rows = [
        (1, 0, 1, "purchase", 100.00),
        (2, 0, 1, "purchase", 104.00),   # within $10 and 1h -> pair
        (3, 0, 1, "purchase", 250.00),   # amount too far
        (4, 30, 1, "purchase", 101.00),  # 30h later -> outside window
        (5, 0, 2, "purchase", 100.00),   # other user, no partner
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = q199_dup_payments(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["n_sus_pairs"] == 1
    assert r["min_d_cents"] == 400


def test_dup_payments_cross_band_pair_found(spark, tmp_path):
    """Amounts straddling a band boundary (9.99 vs 10.01 with $10 bands)
    must still pair — the ±1 band probe exists exactly for this."""
    from csv_loader_spark.queries.analytics2 import q199_dup_payments

    rows = [
        (1, 0, 1, "purchase", 9.99),
        (2, 0, 1, "purchase", 10.01),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = q199_dup_payments(spark, sf).collect()
    assert len(got) == 1 and got[0]["n_sus_pairs"] == 1


def test_capstone_matches_legs(spark):
    """q200 must equal the registered legs' own outputs — ALL five legs
    (r16: the shared-hourly restructure computes sm/cp/dd from one
    checkpointed census and the gaps leg arithmetically, so this is the
    equivalence pin for that rewrite, alongside the nested oracle)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from csv_loader_spark.queries.analytics2 import q200_monitoring_capstone
    from csv_loader_spark.queries.registry import get

    sf = "/root/testdata/sf0.001"
    cap = {r["event_type"]: r for r in q200_monitoring_capstone(spark, sf).collect()}
    psi = {r["event_type"]: r["psi"] for r in get("q190_psi_drift").fn(spark, sf).collect()}
    cp = {
        r["event_type"]: (r["cp_hr"], r["direction"])
        for r in get("q187_cusum_changepoint").fn(spark, sf).collect()
    }
    gaps = {
        r["event_type"]: r["n_gap_hours"]
        for r in get("q171_gap_fill")
        .fn(spark, sf)
        .groupBy("event_type")
        .agg(F.sum("is_gap").cast("long").alias("n_gap_hours"))
        .collect()
    }
    w = W.partitionBy("event_type").orderBy(F.col("hr").desc())
    sm_last = {
        r["event_type"]: r["smoothed"]
        for r in get("q172_exp_smooth")
        .fn(spark, sf)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .collect()
    }
    dd = {
        r["event_type"]: (r["peak_rate"], r["max_drawdown"])
        for r in get("q198_activity_drawdown").fn(spark, sf).collect()
    }
    assert set(cap) == set(psi)
    for et, r in cap.items():
        assert r["psi"] == psi[et]
        assert (r["cp_hr"], r["direction"]) == cp[et]
        assert r["n_gap_hours"] == gaps[et]
        assert r["last_smoothed"] == sm_last[et]
        assert (r["peak_rate"], r["max_drawdown"]) == dd[et]


def test_hard_negatives_labels_differ_and_sims_ordered(spark):
    from csv_loader_spark.queries.llm14 import q201_hard_negatives

    sf = "/root/testdata/sf0.001"
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    rows = q201_hard_negatives(spark, sf).collect()
    assert rows
    for r in rows:
        q = r["query_id"]
        assert labels[r["hard_pos_id"]] == labels[q]
        assert labels[r["hard_neg_id"]] != labels[q]
        assert r["hard_pos_id"] != q and r["hard_neg_id"] != q


def test_span_corruption_deterministic_and_bounded(spark):
    from csv_loader_spark.queries.llm14 import q203_span_corruption

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"]: r for r in q203_span_corruption(spark, sf).collect()}
    b = {r["doc_id"]: r for r in q203_span_corruption(spark, sf).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["masked_tokens"] == b[k]["masked_tokens"]
        assert 0 < a[k]["masked_tokens"] <= a[k]["n_tok"]
        assert 0 < a[k]["mask_ratio"] <= 1.0


def test_skyline_equal_qty_cheaper_dominator(spark, tmp_path):
    """Pinned bug: among equal-qty priors the fold must keep the CHEAPEST
    price — A(qty 5, unit 1) dominates p(qty 5, unit 2) even when B(qty
    5, unit 2) sits between them in sort order; coordinate duplicates
    both survive."""
    from csv_loader_spark.queries.relational5 import q207_skyline

    # one lineitem row per part: unit_price = price/qty, max_qty = qty
    rows = [
        (1, 101, 1, 1, 5.0, 5.0, 0.0, 0.0, "N", "O", EPOCH),    # A: unit 1, qty 5
        (2, 102, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", EPOCH),   # B: unit 2, qty 5
        (3, 103, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", EPOCH),   # p: duplicate of B
        (4, 104, 1, 1, 9.0, 4.5, 0.0, 0.0, "N", "O", EPOCH),    # C: unit 0.5, qty 9
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = sorted(r["l_partkey"] for r in q207_skyline(spark, str(tmp_path)).collect())
    # C dominates everything except A? C: unit 0.5 < 1, qty 9 > 5 -> yes,
    # C dominates A, B and the duplicate. Only C survives.
    assert got == [104]
    # now without C: A dominates B and its duplicate (equal qty, cheaper)
    df2 = spark.createDataFrame(
        rows[:3],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df2.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got2 = sorted(r["l_partkey"] for r in q207_skyline(spark, str(tmp_path)).collect())
    assert got2 == [101]
    # coordinate duplicates both survive when nothing dominates them
    df3 = spark.createDataFrame(
        rows[1:3],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df3.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got3 = sorted(r["l_partkey"] for r in q207_skyline(spark, str(tmp_path)).collect())
    assert got3 == [102, 103]


def test_max_concurrency_back_to_back_intervals(spark, tmp_path):
    """An interval ending exactly when another starts must not
    double-count (ends sort before coincident starts)."""
    from csv_loader_spark.queries.relational5 import (
        CONC_HOLD_US,
        q208_max_concurrency,
    )
    import datetime as dt

    hold_s = CONC_HOLD_US // 1_000_000
    rows = [
        (1, EPOCH, 1, "a", 0.0),
        (2, EPOCH + dt.timedelta(seconds=hold_s), 1, "a", 0.0),  # starts at 1's end
        (3, EPOCH + dt.timedelta(seconds=hold_s // 2), 1, "b", 0.0),
        (4, EPOCH + dt.timedelta(seconds=hold_s // 2 + 1), 1, "b", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r["event_type"]: r["max_concurrent"] for r in q208_max_concurrency(spark, str(tmp_path)).collect()}
    assert got["a"] == 1  # back-to-back never overlaps
    assert got["b"] == 2


def test_largest_remainder_sums_to_budget_and_is_fair(spark):
    from csv_loader_spark.queries.analytics2 import (
        ALLOC_SLOTS,
        q209_largest_remainder,
    )

    rows = q209_largest_remainder(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["seats"] for r in rows) == ALLOC_SLOTS
    total = sum(r["n"] for r in rows)
    for r in rows:
        exact = ALLOC_SLOTS * r["n"] / total
        # Hamilton never deviates more than 1 seat from the exact quota
        assert abs(r["seats"] - exact) < 1.0


def test_weighted_median_hand_case(spark, tmp_path):
    """value 10 held for 3h then 50 for 1h: half the time (2h) is
    reached while still at 10 -> weighted median 10."""
    import datetime as dt

    from csv_loader_spark.queries.analytics2 import q210_weighted_median

    rows = [
        (1, EPOCH, 1, "a", 10.0),
        (2, EPOCH + dt.timedelta(hours=3), 1, "a", 50.0),
        (3, EPOCH + dt.timedelta(hours=4), 1, "a", 99.0),  # no duration
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q210_weighted_median(spark, str(tmp_path)).collect()[0]
    assert r["weighted_median"] == 10.0
