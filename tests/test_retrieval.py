"""Tests for the retrieval/graph operators (queries/retrieval.py).

- PageRank: the distributed integer recurrence must match a from-scratch
  Python reference on a hand-built graph (hub topology, rank conservation
  direction), and dangling handling must follow the documented rule.
- BM25: the rare query term must dominate ranking (idf property); every
  returned doc must contain at least one query term.
- Phrase search: per-doc counts must equal naive Python substring-token
  counting, including overlapping occurrences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_loader_spark.ops.graph import pagerank_fixed_point
from csv_loader_spark.queries.retrieval import (
    BM25_TERMS,
    PHRASES,
    q159_bm25_topk,
    q161_phrase_search,
)

SF_DIR = "/root/testdata/sf0.001"


def _pagerank_reference(edges, iterations, scale=1_000_000):
    """From-scratch Python mirror of the integer recurrence."""
    nodes = sorted({n for e in edges for n in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: scale for n in nodes}
    base = scale * 15 // 100
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += pr[u] // deg[u]
        pr = {n: base + (85 * s[n]) // 100 for n in nodes}
    return pr


def test_pagerank_matches_reference_on_star_graph(spark):
    # star: hub 1 connected to 2..6, symmetrized; hub must out-rank leaves
    leaves = [2, 3, 4, 5, 6]
    edges = [(1, leaf) for leaf in leaves] + [(leaf, 1) for leaf in leaves]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["node"]: r["pr"]
        for r in pagerank_fixed_point(df, "src", "dst", iterations=4).collect()
    }
    want = _pagerank_reference(edges, iterations=4)
    assert got == want
    assert got[1] > max(got[leaf] for leaf in leaves)


def test_pagerank_dangling_node_contributes_nothing(spark):
    # 1 -> 2 only: node 2 has no out-edges; its rank must keep resetting to
    # the base + node 1's share, and node 1 receives only the base.
    df = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    got = {
        r["node"]: r["pr"]
        for r in pagerank_fixed_point(df, "src", "dst", iterations=2).collect()
    }
    want = _pagerank_reference([(1, 2)], iterations=2)
    assert got == want
    scale = 1_000_000
    base = scale * 15 // 100
    assert got[1] == base  # no in-edges: damped base only


def test_bm25_rare_term_dominates(spark):
    rows = q159_bm25_topk(spark, SF_DIR).collect()
    assert rows, "top-k must be non-empty"
    assert rows == sorted(rows, key=lambda r: r["n_rank"])
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    # every hit contains a query term; the top hit contains the rare term
    for r in rows:
        toks = docs[r["doc_id"]].lower().split()
        assert any(t in toks for t in BM25_TERMS)
    top_toks = docs[rows[0]["doc_id"]].lower().split()
    rare = BM25_TERMS[0]
    has_rare = any(
        rare in docs[d].lower().split() for d in docs
    )
    if has_rare:
        assert rare in top_toks


def test_phrase_counts_match_python(spark):
    got = {
        (r["phrase"], r["doc_id"]): r["n_hits"]
        for r in q161_phrase_search(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    want = {}
    for row in docs:
        toks = row["text"].strip().lower().split()
        for words in PHRASES:
            n = sum(
                1
                for i in range(len(toks) - len(words) + 1)
                if tuple(toks[i : i + len(words)]) == words
            )
            if n:
                want[(" ".join(words), row["doc_id"])] = n
    assert got == want


def test_phrase_counts_overlapping(spark):
    # "a a a" contains the bigram "a a" twice (overlap) — positional join
    # must count both
    df = spark.createDataFrame([(0, "a a a b")], "doc_id LONG, text STRING")
    pos = df.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos0", "term"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("p0"), "term")
    first = pos.filter(F.col("term") == "a").select("doc_id", "p0")
    second = pos.filter(F.col("term") == "a").select(
        "doc_id", (F.col("p0") - 1).alias("p0")
    )
    n = first.join(second, ["doc_id", "p0"]).count()
    assert n == 2


def test_triangle_counts_on_known_graph(spark):
    from csv_loader_spark.queries.retrieval import triangle_nodes

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant edge
    # (4,5: no triangles) + a separate triangle {6,7,8} (each node in 1)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (6, 7), (6, 8), (7, 8)]
    df = spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r["node"]: r["n_tri"] for r in triangle_nodes(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_total_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from csv_loader_spark.queries.retrieval import triangle_nodes

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    other = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    edges = (
        li.join(
            other,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("p2")),
        )
        .select(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # each triangle contributes 3 node participations
    part_sum = (
        triangle_nodes(edges).agg(F.sum("n_tri")).collect()[0][0] or 0
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x2"), F.col("b").alias("z2"))
    brute = (
        e1.join(e2, "y")
        .join(e3, (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2")))
        .count()
    )
    assert brute > 0
    assert part_sum == 3 * brute
