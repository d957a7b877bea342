"""Round-12b dedup additions: string-similarity join under EDIT distance
and exact duplicated-substring spans.

Public-literature basis:
- q155: Li, Deng & Feng, ICDE 2011, "PASS-JOIN: A Partition-based
  Method for Similarity Joins" — partition every string into D+1
  disjoint segments; at most D edit operations must leave one segment
  untouched, so any string within edit distance D contains that segment
  VERBATIM at a position shifted by at most D. Candidates come from an
  equi-join of indexed segments against ±D-shifted probe substrings and
  are verified with the exact ``levenshtein`` built-in (JVM-side in
  Spark, vectorized in DuckDB — both classic unit-cost edit distance).
  (The original r12 formulation used Gravano-2001 q-gram prefixes per
  Ed-Join; a 2-gram alphabet over this corpus' tiny word vocabulary has
  so little selectivity that the filter admitted 41M of 200M possible
  pairs at sf0.1 — segment keys are ~l/(D+1) chars and stay selective.)
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
- q155's index side is D+1 rows per string and its probe side at most
  (2D+1)²·(D+1) = 75 — both CONSTANT fan-outs; the equi-join key is a
  ~l/(D+1)-char segment (near-unique even over a tiny vocabulary), so
  posting lists — and therefore candidates — stay O(1) per string with
  no lossy cap. The candidate shuffle carries (l, i, segment, id) only;
  full strings re-attach by an id equi-join after the pair distinct,
  exactly like q97's verify stage. Measured at sf0.1: the r12 q-gram
  prefix formulation admitted 41M candidates / 149 s; PASS-JOIN admits
  ~the true pair set.
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

#: edit-distance threshold and the query's length floor (kept from the
#: r12 Ed-Join formulation so the registered answer is unchanged; the
#: floor is applied identically in the Spark plan and the oracle).
ED_Q = 2
ED_D = 2
ED_MINLEN = ED_Q * (ED_D + 1)

#: PASS-JOIN segment count: D+1 disjoint segments — by pigeonhole, at
#: most D edit operations leave at least one segment untouched.
ED_SEGS = ED_D + 1


def _seg_len_sql(l: str, i: int) -> str:  # noqa: E741
    """SQL fragment: length of segment ``i`` (0-based) of an ``l``-char
    string under the even-partition scheme — the first (SEGS - l%SEGS)
    segments get floor(l/SEGS) chars, the rest one extra (PASS-JOIN's
    convention; index and probe side derive the SAME scheme from l alone).

    SQL-fragment form (r15): the Column-composed original cost ~10 py4j
    round trips per use and the probe loop below uses it 75 times per
    build (q155's build issued 14k round trips, multi-ms each under
    driver-host load); one F.expr over the assembled array parses the
    same integer arithmetic in a single trip. Pure integer/floor math —
    no float-rounding sensitivity — and the q155/q119 oracles plus the
    PASS-JOIN losslessness test pin the results."""
    base = f"FLOOR({l} / {ED_SEGS})"
    rem = f"({l} % {ED_SEGS})"
    return (
        f"CAST(({base} + (CASE WHEN {i} >= ({ED_SEGS} - {rem}) "
        f"THEN 1 ELSE 0 END)) AS INT)"
    )


def _seg_start_sql(l: str, i: int) -> str:  # noqa: E741
    """SQL fragment: 1-based start of segment ``i`` —
    1 + i*base + #longer-segments-before (see :func:`_seg_len_sql`)."""
    base = f"FLOOR({l} / {ED_SEGS})"
    rem = f"({l} % {ED_SEGS})"
    return (
        f"CAST((1 + ({i} * {base}) + GREATEST(0, {i} - ({ED_SEGS} - {rem})))"
        f" AS INT)"
    )


def _parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO checkpoint here: q155 reads this frame once (into the 64-row
    # groupBy) and the materialization barrier cost ~2x the whole query
    # (measured 7.6 -> 3.9 s warm at sf0.1); _edit_candidate_pairs, which
    # reads it three times, adds its own.
    return (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("k"), F.col("p_name").alias("s"))
        .filter(F.length("s") >= ED_MINLEN)
    )


def _name_candidate_pairs(names: DataFrame) -> DataFrame:
    """PASS-JOIN candidate pairs over a DISTINCT-string frame ``names``
    with column ``s`` (Li, Deng & Feng, ICDE 2011: partition-based
    similarity join). Returns (pa, pb) with pa < pb lexicographically.

    Pigeonhole: split every string into D+1 disjoint segments; ≤ D edit
    operations must leave some segment untouched, and that segment
    appears VERBATIM in the partner at a position shifted by at most D
    (net indels before it). So: index each string's D+1 segments under
    key (l, i, segment-text); probe each string's substrings at the
    ±D-shifted windows for every source length l within ±D of its own.

    Scale: index side is (D+1) rows per string, probe side at most
    (2D+1)²·(D+1) = 75 — both CONSTANT fan-outs; segment keys are
    ~l/(D+1)-char substrings, so posting lists stay short whenever the
    DISTINCT strings are diverse. Operating on distinct strings is the
    load-bearing choice: the corpus has massive string multiplicity
    (64 distinct names over 20k rows at sf0.1), so any pair-ENUMERATING
    filter is Ω(n²/64) no matter how selective — q155 folds multiplicity
    back in arithmetically from per-name (count, key-sum) stats instead.
    """
    seg_structs = ", ".join(
        f"struct({i} AS i, "
        f"substring(s, {_seg_start_sql('length(s)', i)}, "
        f"{_seg_len_sql('length(s)', i)}) AS sub)"
        for i in range(ED_SEGS)
    )
    index = names.select(
        F.col("s").alias("pa"),
        F.expr("length(s) AS l"),
        F.explode(F.expr(f"array({seg_structs})")).alias("seg"),
    ).select("pa", "l", F.col("seg.i").alias("i"), F.col("seg.sub").alias("sub"))
    # probe side: for every source length l = m+dl (|dl| <= D), segment i,
    # and shift in [-D, +D], the substring of THIS string that an
    # untouched segment could equal. One F.expr for the whole 75-struct
    # array (see _seg_len_sql's rationale).
    probes = []
    for dl in range(-ED_D, ED_D + 1):
        l_src = f"(length(s) + ({dl}))"
        for i in range(ED_SEGS):
            start0 = _seg_start_sql(l_src, i)
            slen = _seg_len_sql(l_src, i)
            for shift in range(-ED_D, ED_D + 1):
                probes.append(
                    f"struct({dl} AS dl, {i} AS i, "
                    f"CAST(({start0} + {shift}) AS INT) AS st, "
                    f"{slen} AS sl)"
                )
    probe = (
        names.select(
            F.col("s").alias("pb"),
            F.expr("length(s) AS m"),
            F.explode(F.expr("array({})".format(", ".join(probes)))).alias("p"),
        )
        .select(
            "pb",
            (F.col("m") + F.col("p.dl")).cast("int").alias("l"),
            F.col("p.i").alias("i"),
            F.col("p.st").alias("st"),
            F.col("p.sl").alias("sl"),
            "m",
        )
        .filter(
            (F.col("st") >= 1)
            & (F.col("st") + F.col("sl") - 1 <= F.col("m"))
            & (F.col("l") >= ED_MINLEN)
        )
        .select("pb", "l", "i", F.col("pb").substr(F.col("st"), F.col("sl")).alias("sub"))
    )
    return (
        index.join(probe, ["l", "i", "sub"])
        .filter(F.col("pa") != F.col("pb"))
        .select(F.least("pa", "pb").alias("pa"), F.greatest("pa", "pb").alias("pb"))
        .distinct()
    )


def _edit_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerated candidate (ka, sa, kb, sb) key pairs, expanded from the
    distinct-name PASS-JOIN — kept for the losslessness test, which
    compares the verified pair set against brute force. q155 itself
    never enumerates; it aggregates name-level stats (see below)."""
    parts = _parts(spark, sf_dir).localCheckpoint(eager=False)  # read 3x here
    names = parts.select("s").distinct().localCheckpoint(eager=False)
    cross = _name_candidate_pairs(names)
    a = parts.select(F.col("k").alias("k1"), F.col("s").alias("pa"))
    b = parts.select(F.col("k").alias("k2"), F.col("s").alias("pb"))
    cross_keys = (
        cross.join(a, "pa")
        .join(b, "pb")
        .select(
            F.least("k1", "k2").alias("ka"),
            F.when(F.col("k1") < F.col("k2"), F.col("pa"))
            .otherwise(F.col("pb"))
            .alias("sa"),
            F.greatest("k1", "k2").alias("kb"),
            F.when(F.col("k1") < F.col("k2"), F.col("pb"))
            .otherwise(F.col("pa"))
            .alias("sb"),
        )
    )
    # identical-string pairs (ed = 0): self-join within each name group
    same_keys = (
        a.join(b, a["pa"] == b["pb"])
        .filter(F.col("k1") < F.col("k2"))
        .select(
            F.col("k1").alias("ka"),
            F.col("pa").alias("sa"),
            F.col("k2").alias("kb"),
            F.col("pb").alias("sb"),
        )
    )
    return cross_keys.unionAll(same_keys).select("ka", "sa", "kb", "sb")


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
    """Edit-distance similarity self-join aggregated to per-distance pair
    counts with a key-sum checksum, so the oracle's brute-force join
    verifies the EXACT pair set, not just its size.

    Dedupe-then-join: PASS-JOIN + levenshtein verify run over DISTINCT
    names only; row multiplicity folds back arithmetically from per-name
    (count, key-sum) group stats —
      cross-name pairs at distance d:  n = c_a*c_b,
                                       key_sum = c_b*Σk_a + c_a*Σk_b
      identical-name pairs (d = 0):    n = C(c,2),
                                       key_sum = (c-1)*Σk
    so the enumerated Θ(n²/|names|) pair set never materializes. At
    sf0.1 (64 names over 20k rows, 3.3M true pairs) this is the
    difference between 149 s (enumerating prefix-filter) and ~1 s."""
    parts = _parts(spark, sf_dir)
    groups = (
        parts.groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k").alias("ksum"))
        .localCheckpoint(eager=False)
    )
    names = groups.select("s")
    ga = groups.select(
        F.col("s").alias("pa"), F.col("cnt").alias("ca"), F.col("ksum").alias("ksa")
    )
    gb = groups.select(
        F.col("s").alias("pb"), F.col("cnt").alias("cb"), F.col("ksum").alias("ksb")
    )
    cross = (
        _name_candidate_pairs(names)
        .withColumn("d", F.levenshtein("pa", "pb").cast("long"))
        .filter(F.col("d") <= ED_D)
        .join(ga, "pa")
        .join(gb, "pb")
        .select(
            "d",
            (F.col("ca") * F.col("cb")).alias("n"),
            (F.col("cb") * F.col("ksa") + F.col("ca") * F.col("ksb")).alias("ks"),
        )
    )
    same = groups.filter(F.col("cnt") >= 2).select(
        F.lit(0).cast("long").alias("d"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("n"),
        ((F.col("cnt") - 1) * F.col("ksum")).alias("ks"),
    )
    return (
        cross.unionAll(same)
        .groupBy("d")
        .agg(F.sum("n").alias("n_pairs"), F.sum("ks").alias("key_sum"))
        .orderBy("d")
    )


# --- q156: maximal duplicated token spans (ExactSubstr, distributed) ------

#: duplicated-span gram width (tokens). Lee et al. use 50 bytes; 8 tokens
#: is the same idea scaled to the synthetic corpus' document lengths.
SPAN_K = 8
SPAN_TOP = 25


def dup_islands(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Duplicated K-gram positions per document, labeled with their
    maximal-span island id — the shared core of the span REPORT (q156)
    and span REMOVAL (q164).

    A position's K-gram is *duplicated* when its fingerprint occurs >= 2
    times corpus-wide (including repeats inside the same document — a
    doc-internal repetition is still duplication, matching ExactSubstr's
    any-second-occurrence definition). Overlapping or token-adjacent
    duplicated K-grams merge into one maximal span via gaps-and-islands.

    Returns (doc_id, pos, island). Per-doc token counts deliberately do
    NOT ride through here: a column computed from ``text`` and carried
    past the posexplode gets its defining Project collapsed ABOVE the
    Generate, so the whole ``split()`` re-runs once per gram POSITION
    instead of once per document (measured +2.2 s at sf0.1 — same
    re-evaluation class as the HOF-lambda trap in CLAUDE.md). Callers
    join :func:`_doc_token_counts` back per doc_id instead.
    """
    # Fingerprint WITHOUT materializing gram strings, r15 shape: explode
    # the token array ONCE, hash each token ONCE (xxhash64 over the
    # string), then build each position's gram fp as xxhash64 over the
    # k per-token hashes gathered by k-1 lead() calls in a single
    # doc-keyed window pass — every operator whole-stage-codegen, the
    # only per-token string work is one hash. This replaced the r14
    # arrays_zip-of-k-shifted-slices + posexplode-struct shape, whose
    # struct-array materialization copied every token k times (the
    # residual the r14 verdict flagged): gram generation measured 0.86
    # -> 0.42 s and the whole q156 1.8-2.2 -> 1.0-1.15 s at sf0.1,
    # landing inside the standing <=3x-DuckDB bar. The extra doc-keyed
    # shuffle the window costs is gram-stream-sized and doc-bounded per
    # partition group. The fp is an internal grouping key (never an
    # output column), so the oracle keeping md5 is fine: groups are
    # hash-agnostic. Duplication detection stays a window count over fp
    # (one shuffle, single pipeline evaluation); the r15 profile
    # re-measured the groupBy + broadcast-semi-join alternatives at
    # 2.6-3.2 s — the window still wins.
    tr = docs.select(
        "doc_id", F.posexplode(TXT.tokens("text")).alias("pos0", "t")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64("t").alias("h"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.col("h")] + [
        F.lead("h", i).over(w_doc).alias(f"h{i}") for i in range(1, k)
    ]
    grams = (
        tr.select("doc_id", "pos", *lead_cols)
        .filter(F.col(f"h{k - 1}").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.xxhash64(
                F.col("h"), *[F.col(f"h{i}") for i in range(1, k)]
            ).alias("fp"),
        )
    )
    dup = (
        grams.withColumn(
            "c", F.count("*").over(Window.partitionBy("fp"))
        )
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    return dup.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def _doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tok) — one row per document, computed on the un-exploded
    frame (see :func:`dup_islands` for why it must not ride the explode)."""
    return docs.select(
        "doc_id", TXT.token_count("text").alias("n_tok")
    )


def dup_span_intervals(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Maximal duplicated spans as 1-based token intervals:
    (doc_id, s_pos, e_pos)."""
    return dup_islands(docs, k).groupBy("doc_id", "island").agg(
        F.min("pos").alias("s_pos"),
        (F.max("pos") + (k - 1)).alias("e_pos"),
    )


def dup_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Per-document duplicated-span report (see :func:`dup_islands` for
    the duplication definition). One row per document carrying at least
    one span: (doc_id, n_spans, dup_tokens, n_tokens, dup_ratio).

    The per-doc token count joins back on doc_id at the end — one row per
    document on each side (report side already hash-partitioned by doc_id
    from its groupBy), so the join stays doc-count-sized at any corpus
    scale while the exploded gram stream never carries the text column.
    """
    spans = dup_span_intervals(docs, k).withColumn(
        "span_tokens", F.col("e_pos") - F.col("s_pos") + 1
    )
    rep = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    return rep.join(_doc_token_counts(docs), "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.round(
            F.col("dup_tokens") / F.col("n_tok").cast("double"), 4
        ).alias("dup_ratio"),
    )


def _spans_ctes(k: int) -> str:
    """Shared oracle CTE chain toks → spans (1-based maximal duplicated
    span intervals as (doc_id, n_tok, island, s_pos, e_pos)) — the SQL
    twin of :func:`dup_span_intervals`, used by q156 and q164."""
    return rf"""toks AS (
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
             min(pos) AS s_pos, max(pos) + {k - 1} AS e_pos
      FROM islands GROUP BY doc_id, n_tok, island
    )"""


def _dup_spans_oracle() -> str:
    return rf"""
    WITH {_spans_ctes(SPAN_K)},
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e_pos - s_pos + 1) AS BIGINT) AS dup_tokens,
             CAST(any_value(n_tok) AS BIGINT) AS n_tokens,
             round(CAST(sum(e_pos - s_pos + 1) AS DOUBLE) / any_value(n_tok), 4)
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


# --- q164: ExactSubstr span REMOVAL (the dedup action, not the meter) ------


def _dedup_clean_oracle() -> str:
    return rf"""
    WITH {_spans_ctes(SPAN_K)},
    covered AS (
      SELECT DISTINCT doc_id, CAST(u.p AS BIGINT) AS pos
      FROM spans, unnest(generate_series(s_pos, e_pos)) AS u(p)
    ),
    tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INTEGER)] AS term,
             len(t) AS n_tok
      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    ),
    kept AS (
      SELECT tok.doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(term, ' ' ORDER BY tok.pos) AS cleaned
      FROM tok LEFT JOIN covered
        ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
      WHERE covered.pos IS NULL
      GROUP BY tok.doc_id
    ),
    nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok FROM toks)
    SELECT nt.doc_id,
           coalesce(kept.n_kept, 0) AS n_kept,
           nt.n_tok - coalesce(kept.n_kept, 0) AS n_removed,
           substr(md5(coalesce(kept.cleaned, '')), 1, 16) AS clean_fp
    FROM nt LEFT JOIN kept USING (doc_id)
    """


@query(
    "q164_dedup_clean",
    oracle=_dedup_clean_oracle(),
    tags=("llm", "dedup", "r12"),
)
def q164_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022): drop every token
    covered by a corpus-duplicated maximal {SPAN_K}-token span and emit
    the cleaned corpus as (doc_id, n_kept, n_removed, clean_fp) — the
    fingerprint stands in for the cleaned text so the oracle hash-checks
    the actual output string, not just its length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_clean(docs, SPAN_K)


def dedup_clean(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Remove every token covered by a duplicated maximal span (per
    :func:`dup_islands`'s definition) from a (doc_id, text) frame.

    Scale: spans expand to covered (doc_id, pos) int pairs — total ≤
    corpus token count, one explode — and the removal is a left-anti
    equi-join on (doc_id, pos); reassembly is one per-doc sort_array
    over the kept tokens. Linear end-to-end; no all-pairs stage."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos0", "term"
        ),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "term")
    covered = (
        dup_span_intervals(docs, k)
        .select(
            "doc_id",
            F.explode(F.sequence("s_pos", "e_pos")).alias("pos"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"))
        .distinct()
    )
    kept = (
        toks.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda x: x["term"],
                ),
            ).alias("cleaned"),
        )
    )
    nt = docs.select(
        "doc_id", TXT.token_count("text").cast("long").alias("n_tok")
    )
    return nt.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_tok") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        F.substring(F.md5(F.coalesce("cleaned", F.lit(""))), 1, 16).alias(
            "clean_fp"
        ),
    )
