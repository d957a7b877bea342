"""Round-12e bounded-memory sketch-then-verify operators: the two
classic "approximate pass finds a small candidate set, exact pass
verifies it" shapes that make global statistics affordable at 100 TB.

Public-literature basis:
- q169: Misra & Gries 1982, "Finding repeated elements" (the k-counter
  frequent-items summary; see also Metwally et al. 2005 SpaceSaving).
  Guarantee used here (pigeonhole over partitions): any token with
  global count > N/k exceeds n_p/k in at least one partition, so it
  survives that partition's k-counter summary — the union of
  per-partition summaries is a SUPERSET of every global heavy hitter.
- q170: Greenwald & Khanna 2001 quantile sketch (Spark's
  ``percentile_approx``) as the banding pass of the standard
  two-round exact-quantile scheme: the sketch's rank-error bound
  brackets the target rank inside a narrow value band, a second pass
  counts strictly-below rows and rank-selects INSIDE the band only —
  exact answers, never a full per-group sort.

The reference (CsvLoader.java, 274 lines) has no statistics surface;
these belong to the beyond-reference training-data operators mandated
by the build brief (corpus vocabulary reports and distribution
profiling both run over every token/row of the corpus).

Scale notes (100 TB):
- q169: the naive exact top-k (q91) shuffles one partial count per
  DISTINCT token per partition — for web-scale token/URL/n-gram vocabs
  the map-side hash table is unbounded and falls back to sort-spill.
  The k-counter summary caps executor memory at O(k) and the shuffle
  at k rows per partition, then the exact recount touches only
  |candidates| ≤ k·P tokens via a broadcast semi-join (map-side
  combinable count). The result is UNCONDITIONALLY exact because both
  sides rank only tokens above the provable N/k support threshold.
- q170: exact per-group quantiles via full sort (q40's percentile)
  cost a total sort of every group; the sketch pass is one mergeable
  aggregation (O(accuracy·log n) state), and the refine pass sorts
  only the ~4·N/accuracy rows inside the band. Both phase-2 scans are
  plain filters — predicate-pushdown-friendly and linear.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q169: heavy hitters (Misra-Gries candidates + exact recount) -----------

#: counters per partition summary. Soundness threshold: every token with
#: global count > N/HH_K is guaranteed into the candidate set.
HH_K = 4096
HH_TOPK = 25


def _hh_oracle() -> str:
    return rf"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
    hh AS (SELECT w, c FROM c, n WHERE c * {HH_K} > n.n)
    SELECT w, c, n_rank FROM (
      SELECT w, c,
             CAST(row_number() OVER (ORDER BY c DESC, w) AS INTEGER) AS n_rank
      FROM hh
    ) WHERE n_rank <= {HH_TOPK}
    """


def mg_candidates_fn(k: int):
    """Misra-Gries k-counter summary per PARTITION (the mapInPandas
    generator sees every Arrow batch of its partition): increment on
    hit, insert while below k counters, else decrement-all-and-evict-
    zeros. Emits candidate tokens only — counts are re-derived exactly
    by the verify pass, so a tokenizer mismatch here can only fail
    LOUDLY (missing heavy hitter → row mismatch), never silently skew
    a count. Superset property tested in tests/test_llm13.py."""

    def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                if text is None:
                    continue
                for w in re.split(r"\s+", text.strip().lower()):
                    if w in counters:
                        counters[w] += 1
                    elif len(counters) < k:
                        counters[w] = 1
                    else:
                        dead = [t for t in counters if counters[t] == 1]
                        for t in counters:
                            counters[t] -= 1
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame({"w": list(counters.keys())})

    return _mg_candidates


@query(
    "q169_heavy_hitters",
    oracle=_hh_oracle(),
    tags=("text", "sketch", "llm", "r12"),
)
def q169_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HH_TOPK} corpus tokens among those with support > N/{HH_K},
    found with bounded memory: per-partition Misra-Gries candidate
    summaries (Arrow-batched mapInPandas, O(HH_K) state), then an exact
    broadcast-semi-join recount of candidates only. The N/HH_K support
    filter is applied on BOTH sides, making the answer unconditionally
    exact: the MG superset guarantee covers every token that can pass
    the oracle's threshold."""
    d = load_table(spark, sf_dir, "documents")
    cand = (
        d.select("text")
        .mapInPandas(mg_candidates_fn(HH_K), schema="w string")
        .distinct()
    )
    toks = d.select(F.explode(TXT.tokens("text")).alias("w"))
    counts = (
        toks.join(F.broadcast(cand), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    hh = counts.crossJoin(F.broadcast(total)).filter(
        F.col("c") * HH_K > F.col("n")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("w"))
    return (
        hh.withColumn("n_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("n_rank") <= HH_TOPK)
        .select("w", "c", "n_rank")
    )


# --- q170: exact quantiles via sketch band + rank refine --------------------

Q_PCTS = [0.25, 0.5, 0.75, 0.95]
#: rank half-width of the candidate band. Must exceed the sketch's rank
#: error 1/Q_ACC (0.02 > 0.01), so the band provably brackets the target
#: rank for groups with n >= 1/(Q_DELTA - 1/Q_ACC) = 100 rows.
Q_DELTA = 0.02
Q_ACC = 100


def _quantile_oracle() -> str:
    pcts = ", ".join(str(p) for p in Q_PCTS)
    return f"""
    WITH v AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, x,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    ),
    p AS (SELECT unnest([{pcts}]) AS pct)
    SELECT l_returnflag, pct, x AS q_exact
    FROM r JOIN p ON r.rn = CAST(ceiling(p.pct * r.n) AS BIGINT)
    """


def exact_group_quantiles(
    df: DataFrame,
    group: str,
    value: str,
    pcts: list[float] = Q_PCTS,
    delta: float = Q_DELTA,
    acc: int = Q_ACC,
) -> DataFrame:
    """Sketch-band + rank-refine exact quantiles; see q170's docstring.
    Requires delta > 1/acc (band half-width beyond the sketch's rank
    error) and group sizes n >= 1/(delta - 1/acc) so the band provably
    brackets rank ceil(p*n). Columns: (group, pct, q_exact)."""
    v = df.select(F.col(group), F.col(value).cast("double").alias("x"))
    probe = [max(p - delta, 0.0) for p in pcts] + [min(p + delta, 1.0) for p in pcts]
    stats = v.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            "x", F.array(*[F.lit(p) for p in probe]), F.lit(acc)
        ).alias("qs"),
    )
    bands = stats.select(
        group,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("pct"),
                        F.col("qs")[i].alias("lo"),
                        F.col("qs")[i + len(pcts)].alias("hi"),
                        F.ceil(F.lit(p) * F.col("n")).cast("long").alias("target"),
                    )
                    for i, p in enumerate(pcts)
                ]
            )
        ).alias("b"),
    ).select(group, "b.pct", "b.lo", "b.hi", "b.target")
    j = v.join(F.broadcast(bands), group)
    below = (
        j.filter(F.col("x") < F.col("lo"))
        .groupBy(group, "pct")
        .agg(F.count(F.lit(1)).alias("c_lt"))
    )
    band_rows = j.filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    w = Window.partitionBy(group, "pct").orderBy("x")
    return (
        band_rows.join(F.broadcast(below), [group, "pct"], "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") + F.coalesce(F.col("c_lt"), F.lit(0)) == F.col("target"))
        .select(group, "pct", F.col("x").alias("q_exact"))
    )


@query(
    "q170_exact_quantile",
    oracle=_quantile_oracle(),
    tags=("agg", "sketch", "percentile", "r12"),
)
def q170_exact_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quantiles (rank ceil(p*n), the discrete lower
    quantile) without ever sorting a full group: phase 1 brackets each
    target rank with a Greenwald-Khanna sketch (``percentile_approx`` at
    accuracy {Q_ACC} probing p±{Q_DELTA}), phase 2 counts rows strictly
    below the band and rank-selects inside the ~4n/{Q_ACC}-row band.
    The sketch is nondeterministic under re-partitioning but its rank
    bound is not, so the SELECTED value is deterministic — oracle-exact
    against the full-sort window formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return exact_group_quantiles(li, "l_returnflag", "l_extendedprice")
