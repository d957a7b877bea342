"""Round-9 operators: closing the ingest loop on NEAR-duplicates.

- q131: INGEST-TIME NEAR-DUP VERDICTS — the batch twin of the closed
  incremental-ingest loop's r9 extension (streaming/ingest_dedup.py):
  even doc_ids play the accepted corpus, reduced to its TWO indexes
  (exact content fingerprints + MinHash LSH band signatures, q34's
  sketch); odd doc_ids play the arriving batch. Every arrival gets an
  admission verdict in precedence order: exact dup of the corpus, exact
  dup of an earlier arrival, NEAR dup of the corpus (any band-key
  collision with the index — CCNet/RefinedWeb's
  deduplicate-against-snapshot rule: rejection on LSH bucket
  membership), near dup of an earlier surviving arrival (keep the
  bucket-minimum doc_id — a WINDOW MIN per band bucket, linear, no
  candidate self-join), or accepted. The streaming path runs the SAME
  ``ingest_verdicts`` inside foreachBatch and appends the accepted docs'
  band keys back to the index store, so batch N+1 rejects near-dups of
  batch N's admissions (tests/test_stream_static_dedup.py asserts
  stream == this batch answer and replay idempotence).

Scale notes ride each docstring; the common shape: every probe is a
semi/anti equi-join on a derived key (fp, (band, bkey), doc_id) — the
index frames are narrow id tables, never the corpus, and the
within-batch rule is a window min, so a degenerate all-near-identical
batch costs one narrow shuffle instead of C(n, 2) candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.llm import _SHINGLE_CTE, _minhash_oracle_band_ctes
from csv_loader_spark.queries.llm2 import _hash16_spark_sql, _hash16_sql
from csv_loader_spark.queries.registry import query

# ---------------------------------------------------------------------------
# q131: ingest-time near-dup admission verdicts (batch twin of the r9 loop)
# ---------------------------------------------------------------------------

_FP_SQL = r"md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' '))"


@query(
    "q131_ingest_neardup",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_minhash_oracle_band_ctes()},
    fps AS (
      SELECT doc_id, source, {_FP_SQL} AS fp FROM documents
    ),
    idx_fp AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
    idx_band AS (
      SELECT DISTINCT band, bkey FROM bands WHERE doc_id % 2 = 0
    ),
    arr AS (SELECT doc_id, source, fp FROM fps WHERE doc_id % 2 = 1),
    exc AS (
      SELECT doc_id FROM arr WHERE fp IN (SELECT fp FROM idx_fp)
    ),
    r1 AS (
      SELECT * FROM arr WHERE doc_id NOT IN (SELECT doc_id FROM exc)
    ),
    eb AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM r1
      ) WHERE rn > 1
    ),
    r2 AS (
      SELECT * FROM r1 WHERE doc_id NOT IN (SELECT doc_id FROM eb)
    ),
    nc AS (
      SELECT DISTINCT b.doc_id
      FROM bands b
      WHERE b.doc_id IN (SELECT doc_id FROM r2)
        AND EXISTS (SELECT 1 FROM idx_band i
                    WHERE i.band = b.band AND i.bkey = b.bkey)
    ),
    r3 AS (
      SELECT * FROM r2 WHERE doc_id NOT IN (SELECT doc_id FROM nc)
    ),
    nb AS (
      SELECT DISTINCT doc_id FROM (
        SELECT b.doc_id,
               min(b.doc_id) OVER (PARTITION BY b.band, b.bkey) AS m
        FROM bands b
        WHERE b.doc_id IN (SELECT doc_id FROM r3)
      ) WHERE doc_id <> m
    )
    SELECT a.doc_id, a.source,
           CASE WHEN a.doc_id IN (SELECT doc_id FROM exc) THEN 'exact_corpus'
                WHEN a.doc_id IN (SELECT doc_id FROM eb) THEN 'exact_batch'
                WHEN a.doc_id IN (SELECT doc_id FROM nc) THEN 'near_corpus'
                WHEN a.doc_id IN (SELECT doc_id FROM nb) THEN 'near_batch'
                ELSE 'accepted' END AS verdict
    FROM arr a
    """,
    tags=("dedup", "incremental", "lsh", "llm"),
)
def q131_ingest_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time NEAR-dup admission: arrivals (odd doc_ids) probed
    against the accepted corpus's (even doc_ids) fingerprint index AND
    MinHash band-signature index, each arrival tagged with its admission
    verdict (see streaming/ingest_dedup.py ingest_verdicts for the
    precedence rules). This is the operator a 100 TB incremental curation
    pipeline runs per micro-batch — the q104 exact probe extended to
    near-duplicates, sharing q34's sketch so index membership means
    "would have been an LSH candidate pair in the batch dedup".

    Scale: the index frames are (fp) and (band, bkey) — narrow derived-key
    tables probed with semi/anti equi-joins; the within-batch near rule is
    a window min per band bucket (linear), never a candidate self-join.
    """
    from csv_loader_spark.streaming.ingest_dedup import (
        band_signature_index,
        fingerprint_index,
        ingest_verdicts,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    arrivals = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source", "text")
    return ingest_verdicts(
        arrivals, fingerprint_index(corpus), band_signature_index(corpus)
    ).select("doc_id", "source", "verdict")


# ---------------------------------------------------------------------------
# q132: the FULL admission manifest — five curation rules composed
# ---------------------------------------------------------------------------


def _q132_oracle() -> str:
    from csv_loader_spark.queries.llm5 import _BLOCKLIST, _URL_RE
    from csv_loader_spark.queries.llm7 import (
        _INJECTED_TEXT_SQL,
        _PASSAGE,
        _QUOTA,
        _QUOTA_SALT,
        _SPLIT_SALT,
        _split_case,
    )

    blocked = ", ".join(f"'{b}'" for b in _BLOCKLIST)
    h_quota = _hash16_sql(f"CAST(doc_id AS VARCHAR) || '{_QUOTA_SALT}'")
    h_split = _hash16_sql(f"CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'")
    return rf"""
    WITH injected AS (
      SELECT doc_id, source, {_INJECTED_TEXT_SQL} AS text
      FROM documents
    ),
    surviving AS (
      SELECT doc_id, source, text FROM injected
      WHERE lower(coalesce(regexp_extract(text, '{_URL_RE}', 1), ''))
            NOT IN ({blocked})
    ),
    corpus AS (SELECT * FROM surviving WHERE doc_id % 10 <> 0),
    toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM injected
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
               AS g
      FROM toks WHERE len(t) >= 4
    ),
    contaminated AS (
      SELECT DISTINCT c.doc_id
      FROM grams c JOIN grams e ON c.g = e.g
      WHERE c.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
    ),
    clean AS (
      SELECT * FROM corpus
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    ptoks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n
      FROM clean
    ),
    passages AS (
      SELECT doc_id, i,
             array_to_string(t[1 + i * {_PASSAGE} : i * {_PASSAGE} + {_PASSAGE}], ' ')
               AS passage
      FROM ptoks, LATERAL unnest(range(0, (n - 1) // {_PASSAGE} + 1)) AS u(i)
      WHERE n >= 1
    ),
    pstats AS (
      SELECT doc_id, count(*) AS n_p,
             sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_k
      FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(passage)
                                  ORDER BY doc_id, i) AS rn
        FROM passages
      ) GROUP BY doc_id
    ),
    novel AS (
      SELECT c.doc_id, c.source, c.text
      FROM clean c JOIN pstats p ON p.doc_id = c.doc_id
      WHERE 2 * p.n_k >= p.n_p
    ),
    quota AS (
      SELECT doc_id, source, text,
             row_number() OVER (PARTITION BY source
                                ORDER BY {h_quota}, doc_id) AS rnk
      FROM novel
    )
    SELECT doc_id, source,
           {_split_case(h_split)} AS split,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
             AS n_tok
    FROM quota WHERE rnk <= {_QUOTA}
    """


@query("q132_admission_manifest", oracle=_q132_oracle(), tags=("curation", "llm"))
def q132_admission_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL admission manifest: all five curation rules composed in
    pipeline order on one corpus scan — (1) domain blocklist (q102, with
    q127's URL-injection scaffolding so the rule fires), (2) eval-set
    decontamination (q85's word-4-gram rule: any gram shared with the
    held-out doc_id % 10 = 0 split rejects the doc), (3) passage-level
    near-dup exclusion (q115's keep-first flags over the SURVIVORS: a doc
    whose passages are majority-duplicated — 2 * kept < total — is
    dropped), (4) the per-source quota cap (q121, hash-ordered), and
    (5) the deterministic split assignment (q116), emitting
    (doc_id, source, split, n_tok). q127 proved three rules compose; this
    proves the whole admission DAG — dedup and decontamination included —
    composes deterministically with an exact oracle.

    Scale: blocklist is map-side regexp; decontamination is the gram
    equi-join (eval side broadcast-sized in production); the passage rule
    is one window keep-first on md5(passage) — the hashed key (r9
    default, 32-byte bound) — plus a doc_id roll-up; quota is the one
    source-keyed WindowGroupLimit shuffle; split/n_tok are map-only.
    No pairwise joins anywhere: every rule is linear in the corpus.
    """
    from csv_loader_spark.queries.llm5 import _BLOCKLIST, _URL_RE
    from csv_loader_spark.queries.llm7 import (
        _PASSAGE,
        _QUOTA,
        _QUOTA_SALT,
        _SPLIT_SALT,
        _split_case,
        injected_url_text,
    )

    d = load_table(spark, sf_dir, "documents")
    inj = d.select("doc_id", "source", injected_url_text().alias("text"))
    # rule 1: blocklist
    domain = F.lower(F.coalesce(F.regexp_extract("text", _URL_RE, 1), F.lit("")))
    surviving = inj.filter(~domain.isin(*_BLOCKLIST))
    corpus = surviving.filter(F.col("doc_id") % 10 != 0)
    # rule 2: eval-set decontamination (grams over ALL injected docs; the
    # eval side never passes the blocklist — it is a reference set)
    grams = inj.select("doc_id", F.explode(TXT.word_shingles("text", 4)).alias("g"))
    eval_g = grams.filter(F.col("doc_id") % 10 == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(eval_g), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    # rule 3: passage-level dup exclusion over the survivors
    t = TXT.tokens("text")
    base = clean.select("doc_id", t.alias("t"), F.size(t).alias("n")).filter(
        F.col("n") >= 1
    )
    passages = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.expr(f"(n - 1) div {_PASSAGE}"))).alias("i"),
        "t",
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice("t", (F.lit(1) + F.col("i") * _PASSAGE).cast("int"), _PASSAGE),
            " ",
        ).alias("passage"),
    )
    wp = W.partitionBy(F.md5("passage")).orderBy("doc_id", "i")
    pstats = (
        passages.withColumn("rn", F.row_number().over(wp))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_p"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_k"),
        )
    )
    novel = clean.join(
        pstats.filter(2 * F.col("n_k") >= F.col("n_p")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    # rule 4: per-source quota (hash order)
    h_quota = _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_QUOTA_SALT}')")
    wq = W.partitionBy("source").orderBy(F.expr(h_quota), F.col("doc_id"))
    kept = (
        novel.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= _QUOTA)
        .drop("rnk")
    )
    # rule 5: split + token count
    h_split = _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_SPLIT_SALT}')")
    return kept.select(
        "doc_id",
        "source",
        F.expr(_split_case(h_split)).alias("split"),
        F.size(TXT.tokens("text")).cast("long").alias("n_tok"),
    )
