"""Property tests for the round-12b dedup operators (llm10.py).

- q155: the Ed-Join prefix filter must be LOSSLESS — the verified pair
  set equals a brute-force levenshtein cross join on the same rows.
- q156: gaps-and-islands span merging on a crafted corpus with known
  duplicated spans (overlap merge, adjacency merge, gap split,
  intra-document repetition).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_loader_spark.queries.llm10 import (
    ED_D,
    ED_MINLEN,
    SPAN_K,
    _edit_candidate_pairs,
    dup_spans,
)

SF_DIR = "/root/testdata/sf0.001"


def test_editdist_prefix_filter_lossless(spark):
    """Every pair within edit distance D survives the q-gram prefix
    filter (Ed-Join Lemma: shared rare gram + length band)."""
    parts = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s"))
        .filter(F.length("s") >= ED_MINLEN)
    )
    a = parts.select(F.col("k").alias("ka"), F.col("s").alias("sa"))
    b = parts.select(F.col("k").alias("kb"), F.col("s").alias("sb"))
    brute = (
        a.join(b, F.col("ka") < F.col("kb"))
        .withColumn("d", F.levenshtein("sa", "sb"))
        .filter(F.col("d") <= ED_D)
        .select("ka", "kb")
    )
    filtered = (
        _edit_candidate_pairs(spark, SF_DIR)
        .withColumn("d", F.levenshtein("sa", "sb"))
        .filter(F.col("d") <= ED_D)
        .select("ka", "kb")
    )
    brute_set = {(r.ka, r.kb) for r in brute.collect()}
    filt_set = {(r.ka, r.kb) for r in filtered.collect()}
    assert brute_set, "fixture must contain near pairs"
    # lossless: nothing missed; verify step means nothing extra either
    assert filt_set == brute_set


def _doc(doc_id: int, words: list[str]):
    return (doc_id, " ".join(words))


@pytest.fixture()
def span_corpus(spark):
    """K=3 corpus with engineered duplication shapes.

    shared = w1 w2 w3 w4  -> two duplicated 3-grams at positions 1,2 of
    each carrier, overlapping -> ONE maximal span of 4 tokens.
    """
    w = [f"w{i}" for i in range(40)]
    shared = w[1:5]
    docs = [
        # doc 1: shared block at start, then unique tail
        _doc(1, shared + w[10:16]),
        # doc 2: unique head, shared block, unique tail -> same one span
        _doc(2, w[20:23] + shared + w[30:34]),
        # doc 3: TWO copies of the shared block separated by a 4-token
        # gap -> two spans (gap > adjacency) + intra-doc duplication
        # alone would already qualify
        _doc(3, shared + w[16:20] + shared),
        # doc 4: no duplication at all
        _doc(4, w[24:30]),
    ]
    return spark.createDataFrame(docs, ["doc_id", "text"])


def test_dup_spans_merge_and_gap(spark, span_corpus):
    out = {
        r.doc_id: r for r in dup_spans(span_corpus, k=3).collect()
    }
    assert set(out) == {1, 2, 3}, "doc 4 has no duplicated span"
    # docs 1 and 2: one maximal 4-token span from two overlapping grams
    assert (out[1].n_spans, out[1].dup_tokens) == (1, 4)
    assert (out[2].n_spans, out[2].dup_tokens) == (2 - 1, 4)
    assert out[2].n_tokens == 11
    assert out[2].dup_ratio == pytest.approx(round(4 / 11, 4))
    # doc 3: two separated copies -> two spans, 8 duplicated tokens
    assert (out[3].n_spans, out[3].dup_tokens) == (2, 8)


def test_dup_spans_adjacent_grams_merge(spark):
    """Two duplicated grams whose spans touch end-to-end (pos gap == k)
    merge through the +1 adjacency rule only when they actually share or
    abut tokens: [pos, pos+k-1] and [pos+k, ...] are token-adjacent."""
    w = [f"a{i}" for i in range(30)]
    blockA = w[0:3]
    blockB = w[3:6]
    docs = [
        _doc(1, blockA + blockB),        # A at 1, B at 4 (k=3): abut
        _doc(2, blockA + w[10:14] + blockB),  # carriers making both dup
        _doc(3, blockB + w[20:24] + blockA),
    ]
    out = {
        r.doc_id: r
        for r in dup_spans(
            spark.createDataFrame(docs, ["doc_id", "text"]), k=3
        ).collect()
    }
    # doc 1 has grams at pos 1 (A) and pos 4 (B): span1 end = 3, span2
    # start = 4 -> adjacent -> ONE 6-token span. (Positions 2,3 grams
    # straddle A|B and are unique, so only the two block grams repeat.)
    assert (out[1].n_spans, out[1].dup_tokens) == (1, 6)
    assert SPAN_K == 8  # query-level constant unchanged
