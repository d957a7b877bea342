"""Connected-components fixpoint on known graphs."""

from csv_loader_spark.ops.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, "a", "b").collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_past_one_hop(spark):
    # a 6-node path: label 1 must propagate the full diameter
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert set(got.values()) == {1}


def test_cycle_and_isolated_edge(spark):
    got = _cc(spark, [(7, 8), (8, 9), (9, 7), (100, 200)])
    assert got[7] == got[8] == got[9] == 7
    assert got[100] == got[200] == 100
