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
