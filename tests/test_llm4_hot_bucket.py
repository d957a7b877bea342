"""Hot-bucket guard for the LSH-routed embedding dedup (q97): a degenerate
corpus that collapses into one bucket must produce a BOUNDED candidate set,
not M^2 pairs."""

from pyspark.sql import functions as F

from csv_loader_spark.functions import vectors as VEC
from csv_loader_spark.queries.llm4 import _HOT_BUCKET_CAP, _candidates_from


def _normalized(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    return df.withColumn("nrm", VEC.norm("v"))


def test_degenerate_corpus_candidates_are_bounded(spark):
    """300 identical vectors all share every table's bucket: uncapped that
    is C(300,2)=44850 candidate pairs; with cap=10 each bucket contributes
    only its first 10 members -> exactly C(10,2)=45 distinct pairs."""
    m = 300
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(m)]
    # a few distinct vectors that should be unaffected by the guard
    rows += [(1000, [5.0, -1.0, 0.5, 2.0]), (1001, [-3.0, 7.0, 1.0, -2.0])]
    n = _normalized(spark, rows)

    capped = _candidates_from(n, cap=10)
    got = {(r["vec_a"], r["vec_b"]) for r in capped.collect()}
    dup_pairs = {p for p in got if p[0] < m and p[1] < m}
    assert len(dup_pairs) == 45  # C(10,2): bounded, not 44850
    # deterministic prefix: only the first 10 vec_ids survive the cap
    assert all(a < 10 and b < 10 for a, b in dup_pairs)


def test_cap_is_inert_on_small_buckets(spark):
    """Below the cap the guard must not change the candidate set at all
    (the sf0.01 gate + q98 recall rely on this)."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)]
    rows += [(100, [5.0, -1.0, 0.5, 2.0])]
    n = _normalized(spark, rows)
    uncapped = _candidates_from(n, cap=10**9)
    capped = _candidates_from(n, cap=_HOT_BUCKET_CAP)
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, capped.collect())
    )
    # the 20 identical vectors always pair; the distinct one may or may not
    # collide in some table (LSH geometry), so only lower-bound the count
    assert uncapped.count() >= 20 * 19 // 2


def test_candidate_count_scales_linearly_not_quadratically(spark):
    """x2 the duplicated corpus must NOT x4 the candidates once the cap is
    binding: candidate count stays flat at C(cap,2)."""
    small = _normalized(spark, [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(100)])
    big = _normalized(spark, [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(200)])
    n_small = _candidates_from(small, cap=16).count()
    n_big = _candidates_from(big, cap=16).count()
    assert n_small == n_big == 16 * 15 // 2
