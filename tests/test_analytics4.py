"""r14 analytics operators: contamination meter, assortativity, vocab
overlap — semantic unit tests on hand-built frames (the sf0.01 oracle gate
covers cross-engine exactness; these pin the DEFINITIONS)."""

from pyspark.sql import functions as F

from csv_loader_spark.queries.analytics4 import (
    _gram_fps,
    q226_degree_assortativity,
    q227_source_vocab_overlap,
)


def test_gram_fps_positions_and_membership(spark):
    """K-gram fingerprints: positions are 1-based, count = n_tok - k + 1,
    and identical grams (however produced) collide on the fp while
    different grams do not."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "x y a b c"),  # shares the 'a b c' 3-gram with doc 1
            (3, "p q"),  # too short for k=3 -> no grams
        ],
        "doc_id long, text string",
    )
    rows = _gram_fps(docs, 3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 3
    assert 3 not in by_doc
    assert sorted(r["pos"] for r in by_doc[1]) == [1, 2, 3]
    fp_abc_doc1 = {r["pos"]: r["fp"] for r in by_doc[1]}[1]  # 'a b c' at 1
    fp_abc_doc2 = {r["pos"]: r["fp"] for r in by_doc[2]}[3]  # 'a b c' at 3
    assert fp_abc_doc1 == fp_abc_doc2
    assert len({r["fp"] for r in by_doc[1]}) == 3  # distinct grams differ


def test_contamination_counts_hand_graph(spark, tmp_path):
    """A fully-duplicated eval doc reads hit_rate 1.0; a fresh one 0.0."""
    from csv_loader_spark.queries.analytics4 import q225_split_contamination

    docs = spark.createDataFrame(
        [
            (2, "the quick brown fox jumps over the lazy dog end", "s"),
            # odd doc 3 repeats train doc 2's text -> every gram hits
            (3, "the quick brown fox jumps over the lazy dog end", "s"),
            # odd doc 5 is novel -> zero hits
            (5, "completely novel words never seen anywhere at all ok", "s"),
        ],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    res = {
        r["doc_id"]: r
        for r in q225_split_contamination(spark, str(tmp_path)).collect()
    }
    assert res[3]["hit_rate"] == 1.0 and res[3]["n_hit"] == res[3]["n_grams"]
    assert res[5]["hit_rate"] == 0.0 and res[5]["n_hit"] == 0


def test_assortativity_star_is_negative(spark, tmp_path):
    """A pure star graph is maximally disassortative: every edge pairs the
    hub (deg n) with a leaf (deg 1), so r = -1 exactly."""
    # orders: customer c joins each of 4 suppliers via its own order
    orders = spark.createDataFrame(
        [(i, 100) for i in range(1, 5)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(i, i) for i in range(1, 5)], "l_orderkey long, l_suppkey long"
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    row = q226_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert row["n_directed_edges"] == 8
    assert row["assortativity"] == -1.0


def test_vocab_overlap_hand_counts(spark, tmp_path):
    """Jaccard over per-source DISTINCT unigrams, pairs ordered a < b."""
    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "b c d d", "s2"),  # dup tokens don't inflate the vocab
            (4, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in q227_source_vocab_overlap(spark, str(tmp_path)).collect()
    }
    r12 = rows[("s1", "s2")]
    assert (r12["n_common"], r12["n_union"]) == (2, 4)  # {b,c} / {a,b,c,d}
    assert r12["jaccard"] == 0.5
    # disjoint vocabularies produce NO row (inner join on the term — the
    # oracle has the same shape): the matrix lists overlapping pairs only
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows
