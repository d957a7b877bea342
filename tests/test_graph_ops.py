"""root_depths (pointer doubling) equals the naive Python parent chase on
random forests, plus the deep-chain failure mode."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from csv_loader_spark.ops.graph import root_depths


def _chase(parent: dict[int, int]) -> dict[int, int]:
    depth = {1: 0}
    for p in parent:
        chain = []
        q = p
        while q not in depth:
            chain.append(q)
            q = parent[q]
        d = depth[q]
        for n in reversed(chain):
            d += 1
            depth[n] = d
    return {n: d for n, d in depth.items() if n != 1}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
    )
)
def test_root_depths_matches_python_chase(spark, seeds):
    # build a random forest over nodes 2..n+1: parent(p) uniform in
    # [1, p-1] keyed by the drawn seed — acyclic by construction
    parent = {
        i + 2: 1 + (s % (i + 1)) for i, s in enumerate(seeds)
    }
    df = spark.createDataFrame(
        list(parent.items()), "node long, parent long"
    )
    got = {r["node"]: r["depth"] for r in root_depths(df).collect()}
    assert got == _chase(parent)


def test_root_depths_deep_chain_raises(spark):
    # a pure path 2->3->...->66 has depth 65 > 2^max_rounds for
    # max_rounds=5 (32); the loop must fail loudly, not return partials
    parent = [(i, i - 1) for i in range(3, 67)] + [(2, 1)]
    df = spark.createDataFrame(parent, "node long, parent long")
    with pytest.raises(RuntimeError, match="doubling rounds"):
        root_depths(df, max_rounds=5)


def test_root_depths_dangling_parent_raises(spark):
    # node 3 points at 99, which has no pointer row and is not the root:
    # the splice join would leave a NULL anc that silently passes the
    # pending filter — must raise, not return NULL depths
    df = spark.createDataFrame(
        [(2, 1), (3, 99)], "node long, parent long"
    )
    with pytest.raises(RuntimeError, match="dangling"):
        root_depths(df)


def test_root_depths_converges_at_exact_power(spark):
    # depth-8 path closes in exactly 3 doublings (2^3 = 8)
    parent = [(i, i - 1) for i in range(2, 10)]
    df = spark.createDataFrame(parent, "node long, parent long")
    got = {r["node"]: r["depth"] for r in root_depths(df, max_rounds=3).collect()}
    assert got == {i: i - 1 for i in range(2, 10)}
