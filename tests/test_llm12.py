"""Tests for the corpus-statistics operators (llm12.py).

- q168: the sum-vector identity must equal the brute-force all-pairs
  mean cosine per label (this is the proof that the O(n) plan computes
  the O(n²) quantity).
- q167: PMI values recomputed from scratch in Python for every returned
  row; monotone rank order.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from csv_loader_spark.queries.llm12 import (
    PMI_MIN_COUNT,
    embedding_diversity,
    q167_pmi_collocations,
)

SF_DIR = "/root/testdata/sf0.001"


def test_diversity_identity_matches_brute_force(spark):
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    groups = {}
    for r in vecs:
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        groups.setdefault(r["label"], []).append([x / nrm for x in v])
    want = {}
    for label, us in groups.items():
        if len(us) < 2:
            continue
        tot = 0.0
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                tot += sum(a * b for a, b in zip(us[i], us[j]))
        want[label] = tot / (len(us) * (len(us) - 1) / 2)
    got = {
        r["grp"]: (r["n_vecs"], r["avg_cos"])
        for r in embedding_diversity(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), "label"
        ).collect()
    }
    assert set(got) == set(want)
    for label, mean_cos in want.items():
        n, avg = got[label]
        assert n == len(groups[label])
        assert avg == pytest.approx(mean_cos, abs=2e-4)


def test_pmi_values_match_python(spark):
    rows = q167_pmi_collocations(spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in docs:
        toks = r["text"].strip().lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nu = sum(uni.values())
    nb = sum(bi.values())
    for r in rows:
        c12 = bi[(r["w1"], r["w2"])]
        assert c12 == r["c12"] and c12 >= PMI_MIN_COUNT
        want = math.log(c12 * nu * nu / (nb * uni[r["w1"]] * uni[r["w2"]]))
        assert r["pmi"] == pytest.approx(want, abs=1e-3)
    ranks = [r["n_rank"] for r in rows]
    assert ranks == sorted(ranks)
    pmis = [r["pmi"] for r in sorted(rows, key=lambda r: r["n_rank"])]
    assert all(a >= b for a, b in zip(pmis, pmis[1:]))
