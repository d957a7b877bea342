"""Round-12b dedup additions: string-similarity join under EDIT distance
and exact duplicated-substring spans.

Public-literature basis:
- q155: Gravano et al. 2001, "Approximate String Joins in a Database
  (Almost) for Free" — positional q-gram count/length filters for edit
  distance — tightened with the df-ordered constant-size prefix of
  Xiao, Wang & Lin 2008, "Ed-Join": two strings within edit distance D
  must share a q-gram among each side's (q*D + 1) globally-rarest
  q-grams (bag-overlap >= max(m_a, m_b) - q*D combined with the
  standard prefix-filter theorem), provided both strings carry at
  least q*D + 1 grams, i.e. length >= q*(D+1). Candidates are then
  verified with the exact ``levenshtein`` built-in (JVM-side in Spark,
  vectorized in DuckDB — both classic unit-cost edit distance).
- q156: Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better" (ExactSubstr) — find every token span that occurs
  more than once in the corpus and merge overlapping/adjacent
  duplicated K-grams into MAXIMAL duplicated spans per document.
  The suffix-array of the paper is a single-machine structure; the
  distributed re-expression is fingerprint-grouped positional K-grams
  (one narrow shuffle on a 16-hex md5 prefix) + a per-document
  gaps-and-islands window — the classic Spark shape for interval
  merging.

The reference (CsvLoader.java, 274 lines) has no similarity-join or
substring-dedup surface; both operators belong to the beyond-reference
training-data pipeline mandated by the build brief. Everything here
derives from the cited public papers and the public Spark / DuckDB APIs.

Scale notes (100 TB):
- q155's join key space is the q-gram alphabet (|charset|^q — tiny for
  q=2..3), so the df table is always broadcast-able; per-string join
  fan-out is capped at the CONSTANT prefix size q*D+1 regardless of
  string length, and the df-ascending prefix order makes prefix grams
  the rarest ones, so posting lists stay short without a lossy cap.
  The candidate shuffle carries (key, gram); names are short keys here
  (<= 12 chars) and ride along — for long strings re-attach them by an
  id equi-join after the pair distinct, exactly like q97's verify stage.
- q156 shuffles (doc_id, pos, fp16) — never the gram text — then a
  per-document window whose partition size is bounded by document
  length. The duplicated-fingerprint side is produced by the same
  map-side-combined count; no all-pairs stage exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q155: edit-distance similarity self-join on part names ---------------

#: q-gram width and edit-distance threshold. Losslessness of the prefix
#: filter requires length >= ED_Q * (ED_D + 1) on both sides (shorter
#: strings can lose every shared gram to the D edits); the length floor
#: is applied identically in the Spark plan and the oracle.
ED_Q = 2
ED_D = 2
ED_PREFIX = ED_Q * ED_D + 1  # Ed-Join constant prefix size
ED_MINLEN = ED_Q * (ED_D + 1)


def _edit_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct candidate (ka, sa, kb, sb) pairs from the Ed-Join prefix
    filter — separated from q155's final aggregate so the losslessness
    test can compare the verified pair set against brute force."""
    parts = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s"))
        .filter(F.length("s") >= ED_MINLEN)
    )
    # positional q-grams via the zip-of-shifted-slices shape (the lambda
    # touches only its own variable — see functions/text.py word_ngrams
    # for why that matters 20x under interpreted HOFs)
    chars = F.split(F.col("s"), "")
    m = F.greatest(F.size(chars) - (ED_Q - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(chars, j + 1, m) for j in range(ED_Q)])
    gram_arr = F.transform(
        zipped, lambda t: F.concat(*[t[str(j)] for j in range(ED_Q)])
    )
    grams = parts.select(
        "k", "s", F.length("s").alias("ln"),
        F.posexplode(gram_arr).alias("pos", "g"),
    )
    # global gram frequency: key space <= |charset|^q, always tiny ->
    # broadcast; ordering prefixes df-ascending keeps posting lists short
    gram_df = grams.groupBy("g").agg(F.count("*").alias("cdf"))
    w = Window.partitionBy("k").orderBy("cdf", "g", "pos")
    prefix = (
        grams.join(F.broadcast(gram_df), "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ED_PREFIX)
        .select("k", "s", "ln", "g")
    )
    a = prefix.select(
        F.col("k").alias("ka"), F.col("s").alias("sa"),
        F.col("ln").alias("la"), "g",
    )
    b = prefix.select(
        F.col("k").alias("kb"), F.col("s").alias("sb"),
        F.col("ln").alias("lb"), "g",
    )
    return (
        a.join(b, "g")
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("la") - F.col("lb")) <= ED_D)
        )
        .select("ka", "sa", "kb", "sb")
        .distinct()
    )


def _editdist_oracle() -> str:
    # brute force: the oracle deliberately runs the unfiltered quadratic
    # join so an exact match PROVES the Spark-side prefix filter lossless
    return f"""
    WITH p AS (
      SELECT p_partkey AS k, p_name AS s FROM part
      WHERE length(p_name) >= {ED_MINLEN}
    ),
    pairs AS (
      SELECT levenshtein(a.s, b.s) AS d, a.k AS ka, b.k AS kb
      FROM p a JOIN p b ON a.k < b.k
      WHERE abs(length(a.s) - length(b.s)) <= {ED_D}
    )
    SELECT CAST(d AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ka + kb) AS BIGINT) AS key_sum
    FROM pairs WHERE d <= {ED_D}
    GROUP BY d ORDER BY d
    """


@query(
    "q155_editdist_join",
    oracle=_editdist_oracle(),
    tags=("llm", "dedup", "r12"),
)
def q155_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join (Gravano q-gram filters +
    Ed-Join df-ordered prefix + exact levenshtein verify), aggregated to
    per-distance pair counts with a key-sum checksum so the oracle's
    brute-force join verifies the EXACT pair set, not just its size."""
    pairs = _edit_candidate_pairs(spark, sf_dir)
    verified = pairs.withColumn(
        "d", F.levenshtein("sa", "sb").cast("long")
    ).filter(F.col("d") <= ED_D)
    return (
        verified.groupBy("d")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("ka") + F.col("kb")).alias("key_sum"),
        )
        .orderBy("d")
    )


# --- q156: maximal duplicated token spans (ExactSubstr, distributed) ------

#: duplicated-span gram width (tokens). Lee et al. use 50 bytes; 8 tokens
#: is the same idea scaled to the synthetic corpus' document lengths.
SPAN_K = 8
SPAN_TOP = 25


def dup_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Per-document maximal duplicated spans over a (doc_id, text) frame.

    A position's K-gram is *duplicated* when its fingerprint occurs >= 2
    times corpus-wide (including repeats inside the same document — a
    doc-internal repetition is still duplication, matching ExactSubstr's
    any-second-occurrence definition). Overlapping or token-adjacent
    duplicated K-grams merge into one maximal span via gaps-and-islands.

    Returns one row per document that carries at least one duplicated
    span: (doc_id, n_spans, dup_tokens, n_tokens, dup_ratio).
    """
    grams = docs.select(
        "doc_id",
        TXT.token_count("text").alias("n_tok"),
        F.posexplode(TXT.word_ngrams("text", k)).alias("pos0", "g"),
    ).select(
        "doc_id",
        "n_tok",
        (F.col("pos0") + 1).alias("pos"),
        # shuffle the 16-hex fingerprint, never the gram text
        F.substring(F.md5("g"), 1, 16).alias("fp"),
    )
    dup_fp = grams.groupBy("fp").agg(F.count("*").alias("c")).filter(
        F.col("c") >= 2
    ).select("fp")
    dup = grams.join(dup_fp, "fp").select("doc_id", "n_tok", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    islands = dup.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "n_tok", "island").agg(
        (F.max("pos") + (k - 1) - F.min("pos") + 1).alias("span_tokens")
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.first("n_tok").cast("long").alias("n_tokens"),
        F.round(
            F.sum("span_tokens") / F.first("n_tok").cast("double"), 4
        ).alias("dup_ratio"),
    )


def _dup_spans_oracle() -> str:
    k = SPAN_K
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, len(t) AS n_tok, i AS pos,
             substr(md5(list_aggregate(t[i:i+{k - 1}], 'string_agg', ' ')),
                    1, 16) AS fp
      FROM toks, unnest(range(1, len(t) - {k - 2})) AS u(i)
      WHERE len(t) >= {k}
    ),
    dupfp AS (SELECT fp FROM grams GROUP BY fp HAVING count(*) >= 2),
    d AS (SELECT g.doc_id, g.n_tok, g.pos FROM grams g JOIN dupfp USING (fp)),
    marked AS (
      SELECT doc_id, n_tok, pos,
             CASE WHEN max(pos + {k - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR pos > max(pos + {k - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS brk
      FROM d
    ),
    islands AS (
      SELECT *, sum(brk) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, n_tok, island,
             max(pos) + {k - 1} - min(pos) + 1 AS span_tokens
      FROM islands GROUP BY doc_id, n_tok, island
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
             CAST(any_value(n_tok) AS BIGINT) AS n_tokens,
             round(CAST(sum(span_tokens) AS DOUBLE) / any_value(n_tok), 4)
               AS dup_ratio
      FROM spans GROUP BY doc_id
    )
    SELECT doc_id, n_spans, dup_tokens, n_tokens, dup_ratio
    FROM agg ORDER BY dup_tokens DESC, doc_id LIMIT {SPAN_TOP}
    """


@query(
    "q156_dup_spans",
    oracle=_dup_spans_oracle(),
    tags=("llm", "dedup", "r12"),
)
def q156_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span report: top documents by total
    tokens covered by corpus-duplicated maximal {K}-token spans."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = dup_spans(docs, SPAN_K)
    return out.orderBy(F.desc("dup_tokens"), "doc_id").limit(SPAN_TOP)
