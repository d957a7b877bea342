"""The r15 double-explode basket pair generators produce EXACTLY the
pair multiset of the self-join form they replaced (q166/q181 co-order
edges; q238 customer-basket dots) — pinned on a hand fixture so the
equivalence survives independent of the DuckDB oracles."""

from pyspark.sql import functions as F

from csv_loader_spark.queries.retrieval import _co_order_part_pairs


def test_co_order_pairs_match_self_join(spark):
    # orders: 10 has parts {1,2,3} (part 2 twice — distinct must dedup),
    # 11 has {2,3}, 12 has {5} (no pair), 13 has {1,3}
    rows = [
        (10, 1), (10, 2), (10, 2), (10, 3),
        (11, 2), (11, 3),
        (12, 5),
        (13, 1), (13, 3),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = _co_order_part_pairs(li)

    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    other = items.select("ok", F.col("pk").alias("pk_b"))
    ref = (
        items.join(other, "ok")
        .filter(F.col("pk") < F.col("pk_b"))
        .select(F.col("pk").alias("a"), F.col("pk_b").alias("b"))
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    # hand expectation: per-order C(k,2) over DISTINCT parts
    pairs = sorted((r["a"], r["b"]) for r in got.collect())
    assert pairs == [(1, 2), (1, 3), (1, 3), (2, 3), (2, 3)]


def test_support_counts_are_order_counts(spark):
    # (2,3) co-occurs in orders 10 and 11 -> s=2; every other pair s=1
    rows = [
        (10, 1), (10, 2), (10, 2), (10, 3),
        (11, 2), (11, 3),
        (13, 1), (13, 3),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sup = {
        (r["a"], r["b"]): r["s"]
        for r in _co_order_part_pairs(li)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s"))
        .collect()
    }
    assert sup == {(1, 2): 1, (1, 3): 2, (2, 3): 2}
