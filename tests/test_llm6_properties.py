"""Properties of the r8 operators (llm6.py) beyond the oracle gate:
determinism and structural invariants the gate's value-hash can't state."""

from pyspark.sql import functions as F

from csv_loader_spark.functions.text import word_ngrams
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"


def test_word_ngrams_keeps_duplicates_in_order(spark):
    """The occurrence-counting form: every adjacent pair, duplicates kept,
    document order preserved (word_shingles dedups on top of this)."""
    df = spark.createDataFrame(
        [("a b a b a",), ("x",), ("",)], "text string"
    ).select(word_ngrams("text", 2).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b", "b a", "a b", "b a"]  # dups preserved
    assert got[1] == [] and got[2] == []


def test_q113_pair_total_matches_token_arithmetic(spark):
    """Σ pair occurrences over the whole corpus == Σ max(0, n_tok - 1):
    the identity that proves no pair is dropped or double-counted."""
    d = load_table(spark, SF_DIR, "documents")
    total_pairs = (
        d.select(F.explode(word_ngrams("text", 2)).alias("p"))
        .agg(F.count(F.lit(1)))
        .collect()[0][0]
    )
    from csv_loader_spark.functions.text import tokens

    expected = (
        d.select(
            F.greatest(F.size(tokens("text")) - 1, F.lit(0)).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_pairs == expected > 0


def test_q111_smallest_source_survives_whole_and_rates_are_monotone(spark):
    """rate = sqrt(n_min/n_s): the smallest source keeps every document
    (thr = 65536 > any 16-bit bucket) and larger sources get strictly
    lower thresholds; the sample is bit-deterministic across runs."""
    d = load_table(spark, SF_DIR, "documents")
    counts = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    smallest = min(counts, key=lambda s: (counts[s], s))
    fn = all_specs()["q111_mix_sample"].fn
    out1 = {(r["doc_id"], r["source"]) for r in fn(spark, SF_DIR).collect()}
    out2 = {(r["doc_id"], r["source"]) for r in fn(spark, SF_DIR).collect()}
    assert out1 == out2  # deterministic, no rand()
    kept = {}
    for _doc, src in out1:
        kept[src] = kept.get(src, 0) + 1
    assert kept[smallest] == counts[smallest]  # smallest source intact
    # acceptance fraction is (weakly) monotone decreasing in source size
    by_size = sorted(counts, key=lambda s: counts[s])
    fracs = [kept.get(s, 0) / counts[s] for s in by_size]
    for a, b in zip(fracs, fracs[1:]):
        assert a >= b - 0.15  # hash noise tolerance on small sources


def test_q114_pairs_are_exactly_q34s_with_bounded_estimates(spark):
    """Calibration covers exactly the verified pair set and the estimator
    stays in [0, 1] (n_agree/6 by construction)."""
    specs = all_specs()
    cal = specs["q114_minhash_calibration"].fn(spark, SF_DIR).collect()
    pairs34 = {
        (r["doc_a"], r["doc_b"])
        for r in specs["q34_minhash_lsh"].fn(spark, SF_DIR).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in cal} == pairs34 and pairs34
    for r in cal:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["exact_jaccard"]), 4)) < 1e-9
