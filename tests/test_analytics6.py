"""r14 rank-statistics operators (q246-q249): semantic unit tests on
hand-built parquet fixtures with hand-computed expected statistics (the
sf0.01 oracle gate covers cross-engine exactness; these pin the
DEFINITIONS — tie-aware midranks, tie-corrected U variance, the ANOVA
decomposition, ceil-rank winsorization)."""

from __future__ import annotations

import datetime

from csv_loader_spark.queries.analytics6 import (
    q246_spearman_brand,
    q247_mann_whitney,
    q248_anova_priority,
    q249_winsorized_mean,
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def _li_row(pk, qty, price, flag="N", day="1995-06-01"):
    return (
        pk,
        float(qty),
        float(price),
        flag,
        datetime.date.fromisoformat(day),
    )


_LI_SCHEMA = (
    "l_partkey long, l_quantity double, l_extendedprice double, "
    "l_returnflag string, l_shipdate date"
)


def test_spearman_monotone_reversed_and_tied(spark, tmp_path):
    """Brand M: rev rank == qty rank -> rho 1.0. Brand R: reversed ->
    -1.0. Brand T: qty (10,10,20) vs rev (1,2,3) cents -> doubled
    midranks x=(3,3,6), y=(2,4,6) -> Pearson 6/sqrt(6*8) = 0.8660."""
    li = [
        # brand M parts 1-3: qty 1,2,3 / rev 10,20,30 cents
        _li_row(1, 1, 0.10),
        _li_row(2, 2, 0.20),
        _li_row(3, 3, 0.30),
        # brand R parts 4-6: qty 1,2,3 / rev 30,20,10 cents
        _li_row(4, 1, 0.30),
        _li_row(5, 2, 0.20),
        _li_row(6, 3, 0.10),
        # brand T parts 7-9: qty 10,10,20 / rev 1,2,3 cents
        _li_row(7, 10, 0.01),
        _li_row(8, 10, 0.02),
        _li_row(9, 20, 0.03),
    ]
    part = [(i, b) for i, b in zip(range(1, 10), "MMMRRRTTT")]
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    _write(spark, tmp_path, "part", part, "p_partkey long, p_brand string")
    out = {
        r["brand"]: (r["n"], r["rho"])
        for r in q246_spearman_brand(spark, str(tmp_path)).collect()
    }
    assert out == {"M": (3, 1.0), "R": (3, -1.0), "T": (3, 0.866)}


def test_mann_whitney_hand_values(spark, tmp_path):
    """Year 1995 (tie-free): R cents {1,2} all below N {3,4} -> U_R = 0,
    u2 = 0, z = -2/sqrt(5/3) = -1.5492. Year 1996 (one cross-group tie
    at cents 2): R {1,2}, N {2,3} -> U_R = 0.5 (u2 = 1), T = 6,
    Var = (4/12)*(5 - 6/12) = 1.5 -> z = -1.5/sqrt(1.5) = -1.2247."""
    li = [
        _li_row(1, 1, 0.01, "R", "1995-01-01"),
        _li_row(1, 1, 0.02, "R", "1995-01-01"),
        _li_row(1, 1, 0.03, "N", "1995-01-01"),
        _li_row(1, 1, 0.04, "N", "1995-01-01"),
        _li_row(1, 1, 0.01, "R", "1996-01-01"),
        _li_row(1, 1, 0.02, "R", "1996-01-01"),
        _li_row(1, 1, 0.02, "N", "1996-01-01"),
        _li_row(1, 1, 0.03, "N", "1996-01-01"),
        # an 'A' row that must be filtered out entirely
        _li_row(1, 1, 9.99, "A", "1995-01-01"),
    ]
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    rows = q247_mann_whitney(spark, str(tmp_path)).collect()
    got = {r["ship_year"]: (r["n1"], r["n2"], r["u2"], r["z"]) for r in rows}
    assert got == {
        1995: (2, 2, 0, -1.5492),
        1996: (2, 2, 1, -1.2247),
    }


def test_anova_two_groups_hand_decomposition(spark, tmp_path):
    """Groups {1,2,3} vs {4,5,6} dollars: P = 87, G = 73.5, Q = 91 ->
    SSB 13.5, SSW 4, F = 13.5/(4/4) = 13.5, eta2 = 13.5/17.5 = 0.7714."""
    orders = [("1-URGENT", float(x)) for x in (1, 2, 3)] + [
        ("2-HIGH", float(x)) for x in (4, 5, 6)
    ]
    _write(
        spark,
        tmp_path,
        "orders",
        orders,
        "o_orderpriority string, o_totalprice double",
    )
    row = q248_anova_priority(spark, str(tmp_path)).collect()[0]
    assert (row["k"], row["n"]) == (2, 6)
    assert row["f_stat"] == 13.5
    assert row["eta_sq"] == 0.7714


def test_winsorized_mean_ceil_rank_bounds(spark, tmp_path):
    """20 values 1..20 cents: lo_rank = ceil(0.05*20) = 1 -> lo = 1;
    hi_rank = ceil(0.95*20) = 19 -> hi = 19; the 20-cent tail clamps to
    19 -> wsum = 190 + 19 = 209, wmean = 209/20/100 = 0.1045."""
    li = [_li_row(1, 1, c / 100.0, "N") for c in range(1, 21)]
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    row = q249_winsorized_mean(spark, str(tmp_path)).collect()[0]
    assert (row["flag"], row["n"], row["lo"], row["hi"]) == ("N", 20, 1, 19)
    assert row["wsum"] == 209
    assert row["wmean_dollars"] == 0.1045
