"""q169/q170 sketch-then-verify property tests: the Misra-Gries superset
guarantee and exact-quantile-equals-brute-force on synthetic data."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from csv_loader_spark.queries.llm13 import exact_group_quantiles, mg_candidates_fn


def test_mg_candidates_superset_of_heavy_hitters(spark):
    """Pigeonhole guarantee: with k counters per partition, every token
    with GLOBAL count > N/k appears in the union of partition summaries —
    even with k tiny (4) and an adversarial tail of singletons."""
    rng = random.Random(7)
    words = (
        ["alpha"] * 400
        + ["beta"] * 250
        + ["gamma"] * 120
        + [f"tail{i}" for i in range(600)]
    )
    rng.shuffle(words)
    # 10 docs of ~137 words each, spread over 3 partitions
    docs = [
        (" ".join(words[i::10]),) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "text string").repartition(3)
    k = 4
    cand = set(
        r["w"]
        for r in df.mapInPandas(mg_candidates_fn(k), schema="w string").collect()
    )
    n = len(words)
    true_counts = {}
    for w in words:
        true_counts[w] = true_counts.get(w, 0) + 1
    heavy = {w for w, c in true_counts.items() if c * k > n}
    assert heavy  # fixture sanity: alpha/beta at least
    assert heavy <= cand, heavy - cand


def test_exact_group_quantiles_matches_brute_force(spark):
    """Random data with duplicates: the sketch-band + rank-refine result
    equals rank-ceil(p*n) selection done naively, for every group/pct."""
    rng = random.Random(42)
    rows = []
    for g, size in (("a", 400), ("b", 150), ("c", 3007)):
        for _ in range(size):
            # integer-ish values force ties; mix in decimals
            rows.append((g, float(rng.randint(0, 80)) + rng.choice([0.0, 0.25, 0.5])))
    df = spark.createDataFrame(rows, "g string, x double").repartition(4)
    pcts = [0.25, 0.5, 0.75, 0.95]
    got = {
        (r["g"], r["pct"]): r["q_exact"]
        for r in exact_group_quantiles(df, "g", "x", pcts).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, x in rows:
        by_g.setdefault(g, []).append(x)
    import math

    for g, xs in by_g.items():
        xs.sort()
        for p in pcts:
            want = xs[math.ceil(p * len(xs)) - 1]
            assert got[(g, p)] == want, (g, p, got[(g, p)], want)
    assert len(got) == 12


def test_exact_group_quantiles_rejects_only_when_band_misses(spark):
    """Every (group, pct) emits exactly one row for group sizes >= the
    documented 1/(delta - 1/acc) bound — no silent duplicates/drops."""
    rows = [("g", float(i)) for i in range(120)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = exact_group_quantiles(df, "g", "x", [0.5]).collect()
    assert len(out) == 1
    assert out[0]["q_exact"] == 59.0  # rank ceil(0.5*120)=60 → value 59 of 0..119
