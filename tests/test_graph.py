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


def test_nonconvergence_raises_loudly_on_path_graph(spark):
    """A path graph's diameter ≈ n: min-label propagation moves one hop
    per round, so a tight iteration cap must FAIL, not silently return
    merge-undercounted components (r7 guard)."""
    import pytest

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="still changing after 6"):
        connected_components(path, "src", "dst", max_iterations=5)
    # with room to converge the same graph is one component rooted at 0
    ok = connected_components(path, "src", "dst", max_iterations=40)
    assert ok.agg({"component": "max"}).collect()[0][0] == 0


def test_exact_bound_convergence_does_not_raise(spark):
    """A graph converging in exactly max_iterations propagation rounds
    must succeed: the sum-equality check needs one confirming round, which
    must not count against the bound (r7 review fix)."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    ok = connected_components(path, "src", "dst", max_iterations=10)
    assert ok.agg({"component": "max"}).collect()[0][0] == 0
