"""Round-12 LLM-pipeline operators: data selection via importance
resampling (DSIR) — choosing pretraining candidates that LOOK LIKE a
small high-quality target domain.

Public-literature basis: Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" (DSIR) — hashed unigram+bigram bag
features, an importance weight per document equal to the log-likelihood
ratio of its features under the target vs raw feature distributions, and
selection of the highest-weight candidates. This file implements the
deterministic top-k form (the oracle-able variant: Gumbel noise would
make the draw engine-dependent); the weights are exactly DSIR's hashed
n-gram estimator.

The reference (CsvLoader.java, 274 lines) has no selection surface; this
is part of the beyond-reference training-data pipeline mandated by the
build brief. Everything here derives from the public paper + the Spark /
DuckDB public APIs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.functions import vectors as VEC
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.llm2 import _hash16_spark_sql, _hash16_sql
from csv_loader_spark.queries.registry import query

#: hashed feature space: unigrams + bigrams folded into 2^16 buckets by
#: the portable md5-prefix hash (llm2's construction, so the Spark plan
#: and the DuckDB oracle bucket identically). DSIR's paper uses 10^4; a
#: 16-bit space keeps the log-ratio table broadcast-trivial (<= 65536
#: rows) while giving the estimator more resolution.
DSIR_BUCKETS = 1 << 16

#: deterministic selection size of the top-k form.
DSIR_TOP_K = 25


def _dsir_oracle() -> str:
    h = _hash16_sql("feat")
    return rf"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    uni AS (SELECT doc_id, source, unnest(t) AS feat FROM toks),
    big AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS feat
      FROM toks WHERE len(t) >= 2
    ),
    feats AS (
      SELECT doc_id, source, {h} AS b
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
    ),
    tgt AS (SELECT * FROM feats WHERE doc_id % 10 = 0),
    raw AS (SELECT * FROM feats WHERE doc_id % 10 <> 0),
    ct AS (SELECT b, count(*) AS c FROM tgt GROUP BY b),
    cr AS (SELECT b, count(*) AS c FROM raw GROUP BY b),
    tot AS (
      SELECT (SELECT count(*) FROM tgt) AS nt,
             (SELECT count(*) FROM raw) AS nr
    ),
    ratio AS (
      SELECT cr.b,
             round(ln((coalesce(ct.c, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}.0))
                   - ln((cr.c + 1.0) / (tot.nr + {DSIR_BUCKETS}.0)), 9) AS lr
      FROM cr LEFT JOIN ct ON ct.b = cr.b CROSS JOIN tot
    ),
    scored AS (
      SELECT r.doc_id, r.source,
             count(*) AS n_feat,
             round(sum(t.lr), 4) AS dsir_score
      FROM raw r JOIN ratio t ON t.b = r.b
      GROUP BY 1, 2
    )
    SELECT doc_id, source, CAST(n_feat AS BIGINT) AS n_feat, dsir_score
    FROM scored
    ORDER BY dsir_score DESC, doc_id
    LIMIT {DSIR_TOP_K}
    """


def dsir_scores(target: DataFrame, raw: DataFrame) -> DataFrame:
    """DSIR importance weights over the ``raw`` candidates against the
    ``target`` domain sample: per doc, the sum over its unigram+bigram
    OCCURRENCES of the add-1-smoothed log-likelihood ratio of the
    feature's hash bucket under the target vs raw distributions
    (Xie et al. 2023 §2.2, hashed n-gram estimator). Both inputs are
    (doc_id, source, text); output (doc_id, source, n_feat, dsir_score),
    score rounded to 4dp after per-bucket 9dp rounding (the cross-engine
    float-sum discipline — see registry.py's determinism rules).

    Scale: the whole estimator is two hashed-count aggregations that
    map-side combine into <= DSIR_BUCKETS rows each, one broadcast of
    the <= 65536-row log-ratio table, and one per-doc sum — a groupBy on
    doc_id over the candidate token stream. Nothing is pairwise, no
    feature ever rides a shuffle wider than its 16-bit bucket id, and
    the target sample (small by construction in DSIR) is never joined
    row-to-row against the candidates: at 100 TB the candidate scan
    dominates and everything else is fixed-size. The per-doc feature
    arrays come from the zip-of-shifted-slices grams (functions/text.py:
    the HOF-lambda-trap-safe shape)."""
    def _feats(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id",
            "source",
            F.explode(
                F.concat(TXT.tokens("text"), TXT.word_ngrams("text", 2))
            ).alias("feat"),
        ).withColumn("b", F.expr(_hash16_spark_sql("feat"))).drop("feat")

    tgt, raw_f = _feats(target), _feats(raw)
    ct = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    cr = raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = tgt.agg(F.count(F.lit(1)).alias("nt")).crossJoin(
        raw_f.agg(F.count(F.lit(1)).alias("nr"))
    )
    ratio = (
        cr.join(ct, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("nt") + float(DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("cr") + 1.0) / (F.col("nr") + float(DSIR_BUCKETS))
                ),
                9,
            ).alias("lr"),
        )
    )
    return (
        raw_f.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.round(F.sum("lr"), 4).alias("dsir_score"),
        )
    )


@query(
    "q148_dsir_importance",
    oracle=_dsir_oracle(),
    tags=("selection", "quality", "llm"),
)
def q148_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: score every candidate document (doc_id % 10
    != 0) by how much more likely its hashed unigram+bigram features are
    under the TARGET domain sample's distribution (doc_id % 10 == 0, the
    held-out-split convention q132 established) than under the raw
    candidate distribution, and keep the deterministic top
    {DSIR_TOP_K} — the candidates that look most like the target domain.
    This is the selection operator a pretraining pipeline runs after
    dedup/decontamination to tilt a web-scale corpus toward a curated
    domain (Xie et al. 2023); the Gumbel-resampling variant differs only
    in adding noise before the top-k.

    Scale: see :func:`dsir_scores` — two bounded hashed aggregations, a
    broadcast log-ratio table, one candidate-side groupBy, and a
    TakeOrdered top-k; linear in the candidate corpus."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    target = d.filter(F.col("doc_id") % 10 == 0)
    raw = d.filter(F.col("doc_id") % 10 != 0)
    return (
        dsir_scores(target, raw)
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(DSIR_TOP_K)
    )


# ---------------------------------------------------------------------------
# q149: SemDeDup — cluster-bounded semantic deduplication over embeddings
# ---------------------------------------------------------------------------

#: semantic-duplicate threshold, matched to q54/q97's corpus-tuned value
#: (the synthetic embeddings' max pair sim is ~0.51).
SEMDEDUP_TAU = 0.40


def _semdedup_oracle() -> str:
    from csv_loader_spark.queries.llm2 import _ivf_cent_values_sql

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e
    ),
    centv(cid, cv0) AS (VALUES
      {_ivf_cent_values_sql()}
    ),
    centd AS (
      SELECT cid, list_transform(cv0, x -> CAST(x AS DOUBLE)) AS cv FROM centv
    ),
    cent AS (
      SELECT cid, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
      FROM centd
    ),
    ranked AS (
      SELECT n.vec_id, c.cid,
             list_sum(list_transform(range(1, len(n.v) + 1),
                                     i -> n.v[i] * c.cv[i]))
               / (n.nrm * c.cn) AS csim,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY list_sum(list_transform(range(1, len(n.v) + 1),
                                                i -> n.v[i] * c.cv[i]))
                        / (n.nrm * c.cn) DESC, c.cid) AS rk
      FROM n CROSS JOIN cent c
    ),
    assign AS (SELECT vec_id, cid, csim FROM ranked WHERE rk = 1),
    pairs AS (
      SELECT u.vec_id AS u_id, w.vec_id AS w_id
      FROM assign u JOIN assign w ON u.cid = w.cid
      WHERE u.csim < w.csim
         OR (u.csim = w.csim AND u.vec_id < w.vec_id)
    ),
    dups AS (
      SELECT DISTINCT p.w_id
      FROM pairs p
      JOIN n a ON a.vec_id = p.u_id
      JOIN n b ON b.vec_id = p.w_id
      WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                                    i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm) >= {SEMDEDUP_TAU}
    )
    SELECT a.vec_id, a.cid AS cluster_id,
           round(a.csim, 4) AS centroid_sim,
           CAST(CASE WHEN a.vec_id IN (SELECT w_id FROM dups)
                     THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM assign a
    """


@query(
    "q149_semdedup",
    oracle=_semdedup_oracle(),
    tags=("dedup", "similarity", "embedding", "llm"),
)
def q149_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication with the
    pairwise search BOUNDED by a coarse k-means partition — assign every
    embedding to its nearest trained centroid (the frozen
    ivf_centroids artifact, so both engines cluster bit-identically),
    compare pairs only WITHIN a cluster, and flag a vector as a
    semantic duplicate when a kept cluster-mate lies within cosine
    >= {SEMDEDUP_TAU}. Keep-preference follows the paper: the member
    FARTHEST from its centroid (lowest centroid sim) is kept first —
    SemDeDup's 'keep the outlier' rule — with vec_id as the
    deterministic tie-break; a vector is flagged iff some
    earlier-in-preference cluster-mate is within tau (the single-pass
    exists-dominator form of the paper's greedy, the q28/q53 keep-first
    convention — it can flag strictly more than the iterative greedy
    when dup chains exceed pairs, a conservative bias for a dedup).

    Scale: this is the published answer to 'pairwise cosine doesn't
    scale' — assignment is one broadcast-centroid scan, and the
    quadratic term is Sum |cluster|^2, controlled by k: at 10^10 docs
    one sizes k ~ N/10^4 so each cluster's pair block fits an executor
    (the paper runs exactly this shape at LAION scale). Pair candidates
    carry ONLY ids + the precedence scalar; vectors re-attach by id
    equi-join before the one dot-product filter (q55's
    wide-arrays-never-ride-the-shuffle discipline)."""
    from pyspark.sql import Window as W

    from csv_loader_spark.functions.ivf_centroids import CENTROIDS

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VEC.as_double("embedding").alias("v")
    )
    n = e.withColumn("nrm", VEC.norm("v"))
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CENTROIDS)], "cid INT, cv ARRAY<DOUBLE>"
    ).withColumn("cn", VEC.norm("cv"))
    csim = VEC.dot("v", "cv") / (F.col("nrm") * F.col("cn"))
    w_assign = W.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid"))
    assign = (
        n.crossJoin(F.broadcast(cent))
        .withColumn("csim", csim)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid", "csim")
        .localCheckpoint(eager=False)
    )
    u = assign.select(
        F.col("vec_id").alias("u_id"), "cid", F.col("csim").alias("u_csim")
    )
    w_side = assign.select(
        F.col("vec_id").alias("w_id"), "cid", F.col("csim").alias("w_csim")
    )
    pairs = (
        u.join(w_side, "cid")
        .filter(
            (F.col("u_csim") < F.col("w_csim"))
            | ((F.col("u_csim") == F.col("w_csim")) & (F.col("u_id") < F.col("w_id")))
        )
        .select("u_id", "w_id")
    )
    av = n.select(F.col("vec_id").alias("u_id"), F.col("v").alias("uv"), F.col("nrm").alias("un"))
    bv = n.select(F.col("vec_id").alias("w_id"), F.col("v").alias("wv"), F.col("nrm").alias("wn"))
    sim = VEC.dot("uv", "wv") / (F.col("un") * F.col("wn"))
    dups = (
        pairs.join(av, "u_id")
        .join(bv, "w_id")
        .filter(sim >= SEMDEDUP_TAU)
        .select("w_id")
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        assign.join(dups, assign["vec_id"] == dups["w_id"], "left")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.round("csim", 4).alias("centroid_sim"),
            F.coalesce(F.col("_dup"), F.lit(0)).cast("int").alias("is_dup"),
        )
    )
