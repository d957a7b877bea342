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
from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.llm import _SHINGLE_CTE, _minhash_oracle_band_ctes
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
