"""Properties of the r12 selection/dedup operators (llm9.py) beyond the
oracle gate: estimator identities and keep-rule invariants the gate's
value-hash can't state."""

from pyspark.sql import functions as F

from csv_loader_spark.functions.text import tokens
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.llm9 import DSIR_TOP_K, dsir_scores
from csv_loader_spark.queries.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"


def _split(spark):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    return d.filter(F.col("doc_id") % 10 == 0), d.filter(F.col("doc_id") % 10 != 0)


def test_dsir_identity_when_target_equals_raw(spark):
    """DSIR identity: scoring a corpus against ITSELF gives every doc a
    zero importance weight — with target == raw, per-bucket counts and
    totals coincide, so each feature's add-1-smoothed log-likelihood
    ratio is exactly ln(x) - ln(x) = 0 before any rounding (Xie et al.
    2023 §2.2: the weight estimates target-vs-raw divergence)."""
    _, raw = _split(spark)
    out = dsir_scores(raw, raw).collect()
    assert len(out) > 0
    assert all(r["dsir_score"] == 0.0 for r in out)


def test_dsir_feature_counts_match_token_arithmetic(spark):
    """Every raw-side feature occurrence survives into the scored sum:
    the ratio table is built from the raw bucket counts themselves, so
    the scoring join drops nothing and n_feat == n_tok + (n_tok - 1)
    unigram+bigram occurrences (n_tok >= 1)."""
    target, raw = _split(spark)
    got = {r["doc_id"]: r["n_feat"] for r in dsir_scores(target, raw).collect()}
    exp = {
        r["doc_id"]: r["n"] + max(r["n"] - 1, 0)
        for r in raw.select("doc_id", F.size(tokens("text")).alias("n")).collect()
        if r["n"] >= 1
    }
    assert got == exp


def test_q148_topk_is_a_subset_of_candidates(spark):
    """The selection returns exactly DSIR_TOP_K rows, all drawn from the
    candidate (doc_id % 10 != 0) split, in strictly non-increasing score
    order with the doc_id tiebreak."""
    rows = all_specs()["q148_dsir_importance"].fn(spark, SF_DIR).collect()
    assert len(rows) == DSIR_TOP_K
    assert all(r["doc_id"] % 10 != 0 for r in rows)
    keys = [(-r["dsir_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_q149_partition_and_keep_rule(spark):
    """SemDeDup invariants: every embedding is assigned exactly once,
    and each cluster's most-preferred member (the outlier — lowest
    centroid similarity, vec_id tiebreak) has no earlier-in-preference
    cluster-mate, so it can never be flagged as a duplicate."""
    rows = all_specs()["q149_semdedup"].fn(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r["vec_id"] for r in rows}) == n_vecs
    by_cluster = {}
    for r in rows:
        k = (r["centroid_sim"], r["vec_id"])
        cur = by_cluster.get(r["cluster_id"])
        if cur is None or k < cur[0]:
            by_cluster[r["cluster_id"]] = (k, r["is_dup"])
    assert all(dup == 0 for _, dup in by_cluster.values())
    assert all(r["is_dup"] in (0, 1) for r in rows)


def test_q152_water_filling_invariants(spark):
    """UniMax water-filling identities: (a) no source exceeds its
    capacity, (b) unsaturated sources share one common waterline that is
    at least every saturated capacity, (c) the allocation exhausts the
    budget exactly: Σ alloc == floor(9/10 · total_tokens) up to the 4dp
    rounding of the waterline shares."""
    rows = all_specs()["q152_unimax_mixture"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    total = sum(r["n_tokens"] for r in rows)
    budget = (9 * total) // 10
    assert all(r["alloc_tokens"] <= r["n_tokens"] + 1e-6 for r in rows)
    levels = {r["alloc_tokens"] for r in rows if r["saturated"] == 0}
    sat_caps = [r["n_tokens"] for r in rows if r["saturated"] == 1]
    assert len(levels) <= 1
    if levels and sat_caps:
        assert max(sat_caps) <= next(iter(levels)) + 1e-6
    got = sum(r["alloc_tokens"] for r in rows)
    assert abs(got - budget) <= 0.0001 * max(len(rows), 1)


def test_q153_buckets_are_balanced_and_ordered(spark):
    """CCNet bucketing invariants per language: the three buckets are
    equal thirds (sizes differ by at most 1) and are ORDERED — every
    head doc sorts strictly before every middle doc, every middle
    before every tail, under the (avg_nll, doc_id) key."""
    rows = all_specs()["q153_ccnet_buckets"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["ppl_bucket"], []).append(
            (r["avg_nll"], r["doc_id"])
        )
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for lo, hi in (("head", "middle"), ("middle", "tail")):
            if buckets.get(lo) and buckets.get(hi):
                assert max(buckets[lo]) < min(buckets[hi]), lang


def test_q154_capstone_counts_nest_and_conserve_budget(spark):
    """Capstone invariants: per source n_kept <= n_rules_pass <= n_docs;
    the rules-survivor total equals the independently recomputed
    q137-AND-q151 intersection over candidates; and the allocation
    conserves the 9/10 budget over kept tokens."""
    rows = all_specs()["q154_curation_capstone"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_rules_pass"] <= r["n_docs"]
    gop = {
        r["doc_id"]
        for r in all_specs()["q137_gopher_rules"].fn(spark, SF_DIR).collect()
        if r["ok_all"] and r["doc_id"] % 10 != 0
    }
    rep = {
        r["doc_id"]
        for r in all_specs()["q151_repetition_rules"].fn(spark, SF_DIR).collect()
        if r["ok_rep"] == 1 and r["doc_id"] % 10 != 0
    }
    assert sum(r["n_rules_pass"] for r in rows) == len(gop & rep)
    total_kept = sum(r["n_tokens_kept"] for r in rows)
    budget = (9 * total_kept) // 10
    got = sum(r["alloc_tokens"] for r in rows)
    assert abs(got - budget) <= 0.0001 * max(len(rows), 1)
