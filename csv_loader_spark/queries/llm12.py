"""Round-12d corpus-statistics operators: PMI collocation mining and
O(n) per-group embedding diversity.

Public-literature basis:
- q167: Church & Hanks 1990, "Word Association Norms, Mutual
  Information, and Lexicography" — pointwise mutual information over
  adjacent word pairs; the phrase-detection signal of word2vec's
  phrase pass (Mikolov et al. 2013 §4). In a training-data pipeline PMI
  collocations drive tokenizer-vocabulary candidates and boilerplate
  phrase discovery.
- q168: the sum-vector identity for mean pairwise cosine: with unit
  vectors u_i, sum_{i<j} cos(u_i, u_j) = (||Σu||² − n) / 2, so the
  per-group mean pairwise similarity — the standard corpus-diversity /
  mode-collapse meter — costs ONE linear aggregation instead of the
  naive n²/2 pairwise pass. (Elementary algebra, textbook; the point is
  the plan shape.) The identity itself is proven against the brute-force
  pairwise computation in tests/test_llm12.py.

The reference (CsvLoader.java, 274 lines) has no corpus-statistics
surface; these belong to the beyond-reference training-data operators
mandated by the build brief.

Scale notes (100 TB):
- q167: two count shuffles (unigrams, bigrams) + two joins against the
  |vocab|-row unigram table (broadcast) + two 1-row corpus-total
  broadcasts; PMI is a map-side expression and the top-k a
  TakeOrderedAndProject. Nothing scales worse than the gram counts.
- q168 is the load-bearing one: the naive diversity meter is a per-group
  all-pairs join (n²·d work — exactly the SemDeDup-style quadratic this
  repo guards against everywhere); the identity collapses it to one
  (group, dim)-keyed sum + one group-keyed sum — linear in rows,
  map-side combinable, no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_loader_spark.functions import vectors as VEC
from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q167: PMI collocations -------------------------------------------------

PMI_MIN_COUNT = 20
PMI_TOPK = 25


def _pmi_oracle() -> str:
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    uni AS (
      SELECT u.w AS w, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(t) AS u(w) GROUP BY u.w
    ),
    nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
    bi AS (
      SELECT t[CAST(i AS INTEGER)] AS w1, t[CAST(i AS INTEGER) + 1] AS w2,
             CAST(count(*) AS BIGINT) AS c12
      FROM toks, unnest(range(1, len(t))) AS x(i)
      GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM bi),
    scored AS (
      SELECT w1, w2, c12,
             round(ln((c12 * nu.nu * nu.nu)
                      / (CAST(nb.nb AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
      FROM bi JOIN uni u1 ON bi.w1 = u1.w
              JOIN uni u2 ON bi.w2 = u2.w
              CROSS JOIN nu CROSS JOIN nb
      WHERE c12 >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, c12, pmi, n_rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER)
                  AS n_rank
      FROM scored
    ) WHERE n_rank <= {PMI_TOPK}
    """


@query(
    "q167_pmi_collocations",
    oracle=_pmi_oracle(),
    tags=("text", "llm", "r12"),
)
def q167_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOPK} adjacent word pairs by pointwise mutual information
    (support >= {PMI_MIN_COUNT}): PMI = ln(c12·Nu² / (Nb·c1·c2)), the
    numerator/denominator kept in exact integer arithmetic with ONE
    double division under the ln."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.sum("c").alias("nu"))
    bi = (
        d.select(F.explode(TXT.word_ngrams("text", 2)).alias("g"))
        .select(
            F.split(F.col("g"), " ")[0].alias("w1"),
            F.split(F.col("g"), " ")[1].alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    nb_src = d.select(F.explode(TXT.word_ngrams("text", 2)).alias("g"))
    nb = nb_src.agg(F.count(F.lit(1)).alias("nb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") * F.col("nu") * F.col("nu"))
                    / (F.col("nb").cast("double") * F.col("c1") * F.col("c2"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    topk = scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(PMI_TOPK)
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
    return topk.withColumn("n_rank", F.row_number().over(w).cast("int")).select(
        "w1", "w2", "c12", "pmi", "n_rank"
    )


# --- q168: per-label embedding diversity in O(n) ----------------------------


def embedding_diversity(vecs: DataFrame, group_col: str) -> DataFrame:
    """Mean pairwise cosine similarity per group over unit-normalized
    vectors, via the sum-vector identity — ONE linear aggregation chain:

        mean_{i<j} cos(u_i, u_j) = (||Σ_i u_i||² − n) / (n(n−1))

    (Σ||u_i||² = n for unit vectors, and ||Σu||² expands to the full
    pairwise dot sum.) Plan: explode to (group, dim, component/norm),
    sum by (group, dim), then sum of squares by group — map-side
    combinable, NO pairwise join; the naive meter is n²·d per group.
    Input column ``embedding``; returns (group, n_vecs, avg_cos)."""
    e = vecs.select(
        F.col(group_col).alias("grp"),
        VEC.as_double("embedding").alias("v"),
    ).withColumn("nrm", VEC.norm("v"))
    comp = e.select(
        "grp", F.posexplode("v").alias("dim", "val"), (F.col("val") / F.col("nrm")).alias("u")
    )
    s = comp.groupBy("grp", "dim").agg(F.sum("u").alias("s"))
    s2 = s.groupBy("grp").agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    n = e.groupBy("grp").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        n.join(s2, "grp")
        .filter(F.col("n_vecs") >= 2)
        .select(
            "grp",
            "n_vecs",
            F.round(
                (F.col("s2") - F.col("n_vecs"))
                / (F.col("n_vecs") * (F.col("n_vecs") - F.lit(1))),
                4,
            ).alias("avg_cos"),
        )
    )


@query(
    "q168_embedding_diversity",
    oracle="""
    WITH e AS (
      SELECT label, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    comp AS (
      SELECT label, i AS dim,
             CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) / nrm AS u
      FROM e, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    s AS (SELECT label, dim, sum(u) AS s FROM comp GROUP BY label, dim),
    s2 AS (SELECT label, sum(s * s) AS s2 FROM s GROUP BY label),
    n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM e GROUP BY label)
    SELECT n.label AS grp, n.n_vecs,
           round((s2.s2 - n.n_vecs) / (n.n_vecs * (n.n_vecs - 1)), 4) AS avg_cos
    FROM n JOIN s2 ON n.label = s2.label
    WHERE n.n_vecs >= 2
    """,
    tags=("embedding", "llm", "r12"),
)
def q168_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus-diversity meter: mean pairwise cosine of the
    label's unit-normalized embeddings, computed in O(n·d) by the
    sum-vector identity (no pairwise stage; identity proven against
    brute force in tests/test_llm12.py)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return embedding_diversity(vecs, "label").select(
        F.col("grp"), "n_vecs", "avg_cos"
    )
