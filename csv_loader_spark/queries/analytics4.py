"""r14 analytics: decontamination meter, graph assortativity, source
vocabulary overlap.

Public-literature basis:
- q225: benchmark decontamination by n-gram membership — Lee et al. 2022
  ("Deduplicating Training Data Makes Language Models Better", the
  ExactSubstr convention q156/q164 implement) and the GPT-3 appendix-C
  n-gram overlap protocol (Brown et al. 2020): an eval document is
  contaminated to the degree its K-grams occur anywhere in the training
  split.
- q226: degree assortativity coefficient — Newman 2002 ("Assortative
  mixing in networks"): the Pearson correlation of endpoint degrees over
  edges; positive = hubs link hubs. A standard crawl/source-graph health
  signal.
- q227: pairwise source vocabulary overlap (Jaccard over distinct
  unigrams) — the classic corpus-similarity matrix used for mixture
  design (e.g. the Pile's source analyses, Gao et al. 2020). Chosen over
  a KL divergence deliberately: KL needs a float SUM over a data-sized
  vocabulary, whose summation order differs between engines; Jaccard is
  exact integers + one rounded division.

The reference (CsvLoader.java, 274 lines) has no analytics surface; these
extend the beyond-reference training-data operators (SURVEY.md §2.3).

Scale notes (100 TB):
- q225 shuffles gram FINGERPRINTS (8-byte xxhash64 of the token tuple —
  the q156 shape: no gram text moves, the fp never reaches the output, so
  the oracle's md5 grouping is equivalent), one membership semi-join on
  the fp, one per-doc count. Linear in token positions.
- q226 is two node-keyed shuffles (degree agg, degree join back to the
  edge list) and one 1-row aggregate of exact BIGINT sums; the Pearson
  ratio is computed from those sums in DOUBLE at the very end (products
  of the same exact integers on both engines — IEEE-deterministic, no
  data-sized float sum).
- q227's self-join is on the TOKEN over per-source DISTINCT vocabularies
  (vocab-sized, not corpus-sized); output is |sources|^2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q225: split contamination (eval K-grams found in train) ---------------

#: contamination gram width, matching q156's span gram (Lee et al. use
#: 50 bytes; 8 tokens is the synthetic corpus' equivalent)
CONTAM_K = 8
CONTAM_TOP = 25


def _gram_fps(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, fp): every K-gram position's xxhash64 fingerprint —
    the q156 gram pipeline (zip of shifted token slices, hash the struct
    fields post-explode, never materialize gram text; cites
    queries/llm10.py dup_islands for the re-evaluation traps this shape
    avoids)."""
    toks = TXT.tokens("text")
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(k)])
    return docs.select(
        "doc_id", F.posexplode(zipped).alias("pos0", "g")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64(*[F.col("g")[str(j)] for j in range(k)]).alias("fp"),
    )


def _contam_oracle() -> str:
    k = CONTAM_K
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(list_aggregate(t[i:i+{k - 1}], 'string_agg', ' ')) AS fp
      FROM toks, unnest(range(1, len(t) - {k - 2})) AS u(i)
      WHERE len(t) >= {k}
    ),
    train AS (SELECT DISTINCT fp FROM grams WHERE doc_id % 2 = 0),
    ev AS (SELECT * FROM grams WHERE doc_id % 2 = 1),
    hits AS (
      SELECT ev.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN train.fp IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM ev LEFT JOIN train ON ev.fp = train.fp
      GROUP BY ev.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           round(CAST(n_hit AS DOUBLE) / n_grams, 4) AS hit_rate
    FROM hits
    ORDER BY n_hit DESC, doc_id
    LIMIT {CONTAM_TOP}
    """


@query(
    "q225_split_contamination",
    oracle=_contam_oracle(),
    tags=("llm", "dedup", "r14"),
)
def q225_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination meter (Lee et al. 2022; Brown et al. 2020
    app. C): treating even doc_ids as TRAIN and odd as EVAL, the top-{TOP}
    eval docs by number of {K}-gram positions whose gram occurs anywhere
    in train — (doc_id, n_grams, n_hit, hit_rate).

    The gram fp is internal (grouping/membership only), so Spark's
    xxhash64 and the oracle's md5 group identically; train membership is
    a distinct-fp LEFT join counted per eval doc.

    The gram stream is terminated by an fp-keyed repartition (r15).
    The original intent — share one gram-pipeline execution between the
    train/eval branches via ReuseExchange — does NOT happen: the
    optimizer pushes each branch's parity filter below the repartition,
    splitting it into two disjoint half-corpus exchanges
    (plans/r15/q225_split_contamination_after.txt), so each document is
    tokenized exactly once in both forms and there is no common subplan
    to reuse. The exchange still wins, for a different, plan-visible
    reason: without it the train branch runs its partial DISTINCT
    map-side, inside the tokenize+explode stage — a per-task hash table
    over a gram stream whose fingerprints are near-unique, so it
    thrashes memory while deduplicating almost nothing — and the eval
    branch fuses tokenize+probe+aggregate into one oversized stage.
    With the exchange, dedup happens once post-shuffle and AQE sizes
    the downstream stages. Measured at x100 (3 interleaved
    fresh-process pairs, 1 prime + min of 2 timed): 7.65/4.98/6.87 s
    with vs 8.79/14.18/9.14 s without — faster in all three pairs;
    at sf0.1 the difference is inside host noise. The residual ~1.2 s
    at sf0.1 is the gram scan itself (tokenize + 8-slice zip + hash
    over every document) plus the fp shuffle — real per-row work, not
    plan waste."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = _gram_fps(docs, CONTAM_K).repartition("fp")
    train = (
        grams.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()
    )
    ev = grams.filter(F.col("doc_id") % 2 == 1)
    hits = (
        ev.join(
            train.withColumn("hit", F.lit(1)), "fp", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    return (
        hits.select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("hit_rate"),
        )
        .orderBy(F.desc("n_hit"), "doc_id")
        .limit(CONTAM_TOP)
    )


# --- q226: degree assortativity (Newman 2002) -------------------------------


@query(
    "q226_degree_assortativity",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (
      SELECT a, b FROM e UNION ALL SELECT b, a FROM e
    ),
    deg AS (
      SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
      FROM und GROUP BY a
    ),
    pairs AS (
      SELECT da.deg AS x, db.deg AS y
      FROM und JOIN deg da ON und.a = da.node JOIN deg db ON und.b = db.node
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT m AS n_directed_edges,
           round(
             (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt(
                 (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
               ),
             4
           ) AS assortativity
    FROM sums
    """,
    tags=("graph", "analytics", "r14"),
)
def q226_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    customer-supplier trade graph: the Pearson correlation of endpoint
    degrees across directed edge copies — (n_directed_edges,
    assortativity). Supplier ids are offset into their own key space so
    the bipartite node sets cannot collide.

    Exactness: all six sufficient statistics are exact BIGINT sums
    (x*y <= deg_max^2 and the edge count keeps Σ far from 2^63); the
    Pearson ratio is evaluated in DOUBLE from those exact integers —
    both engines multiply the same integers under IEEE semantics, so
    round(,4) agrees with no data-sized float sum anywhere.

    One-pass plan (r15): the oracle's symmetrized copy (und = e UNION
    reverse(e)) makes every statistic SYMMETRIC — m = 2|e|, sx = sy =
    Σ(da+db), sxx = syy = Σ(da²+db²), sxy = 2·Σ(da·db) — so Spark reads
    each undirected edge ONCE: the distinct edge list is checkpointed
    (the previous shape re-executed the orders-lineitem join for every
    branch that read `und`), the two per-side degree tables are
    dimension-sized (customers / suppliers — bipartite, so the a/b key
    spaces are disjoint) and BROADCAST onto the edges, and one map-side-
    combined aggregate produces all four sums. The double-precision
    assembly mirrors the oracle's operation order term by term (the
    products pass 2^53, so associativity matters); the sqrt's two
    factors are the identical double, preserving sqrt(A·A). Residual
    ~1.5 s at sf0.1 is ~1.1 s of shared edge-build floor (scan + join +
    distinct of 587k edges) — measured, not plan waste."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dega = e.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("da"))
    degb = e.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("db"))
    j = e.join(F.broadcast(dega), "a").join(F.broadcast(degb), "b")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("ne"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("sx"),
        F.sum(F.col("da") * F.col("db")).cast("long").alias("sab"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db"))
        .cast("long")
        .alias("sxx"),
    )
    # exact BIGINT totals first, then the oracle's double ops verbatim
    s = s.select(
        (F.col("ne") * 2).alias("m"),
        F.col("sx"),
        (F.col("sab") * 2).alias("sxy"),
        F.col("sxx"),
    )
    md = F.col("m").cast("double")
    sxd = F.col("sx").cast("double")
    a_term = md * F.col("sxx") - sxd * F.col("sx")
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.round(
            (md * F.col("sxy") - sxd * F.col("sx"))
            / F.sqrt(a_term * a_term),
            4,
        ).alias("assortativity"),
    )


# --- q227: pairwise source vocabulary overlap -------------------------------

OVERLAP_TOP = 25


@query(
    "q227_source_vocab_overlap",
    oracle=rf"""
    WITH vocab AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_terms
      FROM vocab GROUP BY source
    ),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM vocab a JOIN vocab b ON a.term = b.term
      WHERE a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, n_common,
           sa.n_terms + sb.n_terms - n_common AS n_union,
           round(CAST(n_common AS DOUBLE)
                 / (sa.n_terms + sb.n_terms - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY jaccard DESC, source_a, source_b
    LIMIT {OVERLAP_TOP}
    """,
    tags=("llm", "analytics", "r14"),
)
def q227_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard matrix (corpus mixture
    analysis, Gao et al. 2020 style): top-{TOP} source pairs by distinct-
    unigram Jaccard — (source_a, source_b, n_common, n_union, jaccard).
    Exact integers + one rounded division; the self-join runs over
    per-source DISTINCT vocabularies (vocab-sized, not corpus-sized)."""
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    vocab = d.select(
        "source", F.explode(TXT.tokens("text")).alias("term")
    ).distinct()
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    common = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_terms").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_terms").alias("nb")
    )
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (F.col("na") + F.col("nb") - F.col("n_common")).alias("n_union"),
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "source_a", "source_b")
        .limit(OVERLAP_TOP)
    )
