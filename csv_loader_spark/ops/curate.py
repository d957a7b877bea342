"""The PRODUCT curation entry point: one function (and a CLI subcommand,
``python -m csv_loader_spark curate``) composing the admission rules the
query surface proves piecewise — so a pipeline owner can run the whole
DAG over a real documents table without touching the query registry.

Rules, in q132's adjudicated order, each one an oracle-gated operator
elsewhere in the tree:

1. domain BLOCKLIST          (q102's broadcast anti rule)
2. eval DECONTAMINATION      (q85/q132's word-4-gram rule, optional via
                              ``eval_docs``)
3. exact + NEAR dedup        (ingest_verdicts — q131's five-verdict
                              precedence run batch-mode against an empty
                              corpus index, i.e. within-input dedup; pass
                              ``corpus`` to dedup against a snapshot, or
                              ``verify_members=True`` for the
                              precision-1.0 tier, q145; ``dedup=False``
                              skips the stage)
4. PASSAGE-level dedup       (q115/q132's majority-recycled rule,
                              optional via ``passage_dedup``)
5. per-source hash QUOTA     (q121's corpus-stable rule)
6. train/valid/test SPLIT    (q116's salted hash buckets)

Output: (kept, manifest) — ``kept`` carries (doc_id, source, text,
split), ``manifest`` one verdict row per input doc (blocked / exact_* /
near_* / quota_rejected / admitted). Deterministic end to end: re-running
on the same input yields byte-identical decisions (every rule keys on
content or salted doc_id hashes, never on partition order).

Scale: exactly the q132 shape — one corpus scan, narrow derived-key
shuffles (md5 fingerprints, band keys, 16-bit hashes), no all-pairs
anywhere; the blocklist is a literal ``isin`` (broadcast by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_blocklisted(
    docs: DataFrame, domains: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """(blocked, survivors) by q102's rule: the doc's domain is the first
    URL host in its text, lowercased; membership in ``domains`` blocks.
    Shared by the batch curate entry point and the streaming curation
    loop (r10 review) so the domain-extraction rule cannot drift."""
    from csv_loader_spark.queries.llm5 import _URL_RE

    domain = F.lower(F.coalesce(F.regexp_extract("text", _URL_RE, 1), F.lit("")))
    tagged = docs.withColumn("_dom", domain)
    if not domains:
        return tagged.limit(0).drop("_dom"), tagged.drop("_dom")
    blocked = tagged.filter(F.col("_dom").isin(*domains)).drop("_dom")
    survivors = tagged.filter(~F.col("_dom").isin(*domains)).drop("_dom")
    return blocked, survivors


def curate(
    docs: DataFrame,
    *,
    blocklist: tuple[str, ...] = (),
    eval_docs: DataFrame | None = None,
    dedup: bool = True,
    passage_dedup: bool = False,
    corpus: DataFrame | None = None,
    verify_members: bool = False,
    quota_cap: int = 30,
) -> tuple[DataFrame, DataFrame]:
    """Run the admission DAG over ``docs`` (doc_id, source, text).

    ``blocklist``: lowercase domains to drop (first URL in the text is
    the doc's domain, q102's rule). ``eval_docs``: an optional held-out
    evaluation set (doc_id, text) — any candidate sharing a word 4-gram
    with it is rejected as ``contaminated`` (q85/q132's decontamination
    rule; the eval side is a reference set and is never itself a
    candidate). ``dedup``: run the doc-level exact+near verdicts (on by
    default; off lets the CLI reproduce pipelines whose dedup happens at
    another granularity, e.g. q132's passage-level rule). ``corpus``: an
    optional already-accepted snapshot to dedup AGAINST (its fingerprint
    and band indexes are built here); omitted, dedup is within-input
    only. ``verify_members``: use the Jaccard-verified near rule (q145)
    instead of bucket membership (q131) for the CORPUS probe — it
    requires ``corpus`` (with no snapshot there are no corpus buckets to
    verify against, and the within-input near rule is the same
    window-min in both tiers, so the flag would silently change
    nothing; r10 review makes that a loud error instead).
    ``passage_dedup``: q115/q132's passage-granularity rule — a doc
    whose {_PASSAGE}-token passages are majority-duplicated within the
    surviving set (2 * kept < total, keep-first by (doc_id, i) over
    md5(passage)) is rejected as ``passage_dup``.
    ``quota_cap``: max admitted docs per source (q121's hash-stable
    selection).

    With ``eval_docs`` + ``dedup=False`` + ``passage_dedup=True`` and
    q132's blocklist/quota parameters, this DAG IS q132's oracle-gated
    admission manifest — tests/test_cli.py's capstone drives the CLI
    over the sf0.01 table and asserts row-for-row equality against the
    q132 DuckDB oracle.
    """
    from csv_loader_spark.queries.llm2 import _hash16_spark_sql
    from csv_loader_spark.queries.llm7 import (
        _QUOTA_SALT,
        _SPLIT_SALT,
        _split_case,
    )
    from csv_loader_spark.streaming.ingest_dedup import (
        band_member_index,
        band_signature_index,
        fingerprint_index,
        ingest_verdicts,
        ingest_verdicts_verified,
    )

    from csv_loader_spark.functions import text as TXT

    # stage 1: blocklist
    blocked, survivors = split_blocklisted(docs, blocklist)

    # stage 2: eval-set decontamination (q85's word-4-gram rule): the
    # eval grams are a distinct broadcast-sized reference; one semi-join
    # flags contaminated candidates, one anti-join drops them. Computing
    # candidate grams AFTER the blocklist is equivalent to q132's
    # pre-blocklist gram frame (blocked docs are out either way) and
    # scans one fewer copy of the text.
    if eval_docs is not None:
        eval_g = (
            eval_docs.select(
                F.explode(TXT.word_shingles("text", 4)).alias("g")
            ).distinct()
        )
        cand_g = survivors.select(
            "doc_id", F.explode(TXT.word_shingles("text", 4)).alias("g")
        )
        contaminated_ids = (
            cand_g.join(F.broadcast(eval_g), "g", "left_semi")
            .select("doc_id")
            .distinct()
        )
        contaminated = survivors.join(contaminated_ids, "doc_id", "left_semi")
        survivors = survivors.join(contaminated_ids, "doc_id", "left_anti")
    else:
        contaminated = survivors.limit(0)

    if verify_members and corpus is None:
        raise ValueError(
            "verify_members requires a corpus snapshot: the verified rule "
            "confirms CORPUS-probe rejections against stored member "
            "shingles, and without a corpus the verdicts would be "
            "identical to the membership tier (the within-input near rule "
            "is the same window-min in both)"
        )

    # stage 3: doc-level dedup verdicts (against the snapshot when given,
    # else within-input via empty indexes — same precedence either way)
    if dedup:
        base = corpus if corpus is not None else docs.limit(0)
        fp_idx = fingerprint_index(base)
        if verify_members:
            verdicts = ingest_verdicts_verified(
                survivors, fp_idx, band_member_index(base)
            )
        else:
            verdicts = ingest_verdicts(
                survivors, fp_idx, band_signature_index(base)
            )
        verdicts = verdicts.localCheckpoint(eager=False)
        accepted = verdicts.filter(F.col("verdict") == "accepted").drop(
            "verdict", "fp"
        )
    else:
        verdicts = survivors.select(
            "doc_id", "source", F.lit("accepted").alias("verdict")
        ).limit(0)
        accepted = survivors

    # stage 4: passage-granularity dup exclusion (q115/q132): keep-first
    # per md5(passage) by (doc_id, i), reject docs with 2 * kept < total
    if passage_dedup:
        from csv_loader_spark.queries.llm7 import doc_passages

        passages = doc_passages(accepted)
        wp = Window.partitionBy(F.md5("passage")).orderBy("doc_id", "i")
        pstats = (
            passages.withColumn("rn", F.row_number().over(wp))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_p"),
                F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_k"),
            )
        )
        novel_ids = pstats.filter(2 * F.col("n_k") >= F.col("n_p")).select(
            "doc_id"
        )
        passage_dup = accepted.join(novel_ids, "doc_id", "left_anti")
        accepted = accepted.join(novel_ids, "doc_id", "left_semi")
    else:
        passage_dup = accepted.limit(0)

    # stage 5: per-source hash quota (corpus-stable order)
    h_quota = F.expr(
        _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_QUOTA_SALT}')")
    )
    w = Window.partitionBy("source").orderBy(h_quota, F.col("doc_id"))
    ranked = accepted.withColumn("_rnk", F.row_number().over(w))
    kept = ranked.filter(F.col("_rnk") <= quota_cap).drop("_rnk")
    quota_rejected = ranked.filter(F.col("_rnk") > quota_cap).drop("_rnk")

    # stage 6: split assignment on the admitted set, plus the token count
    # (q132's n_tok — the budget accounting column a pipeline owner reads)
    h_split = _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_SPLIT_SALT}')")
    kept = kept.withColumn("split", F.expr(_split_case(h_split))).withColumn(
        "n_tok", F.size(TXT.tokens("text")).cast("long")
    )

    manifest = (
        blocked.select("doc_id", "source", F.lit("blocked").alias("verdict"))
        .unionByName(
            contaminated.select(
                "doc_id", "source", F.lit("contaminated").alias("verdict")
            )
        )
        .unionByName(
            verdicts.filter(F.col("verdict") != "accepted").select(
                "doc_id", "source", "verdict"
            )
        )
        .unionByName(
            passage_dup.select(
                "doc_id", "source", F.lit("passage_dup").alias("verdict")
            )
        )
        .unionByName(
            quota_rejected.select(
                "doc_id", "source", F.lit("quota_rejected").alias("verdict")
            )
        )
        .unionByName(
            kept.select("doc_id", "source", F.lit("admitted").alias("verdict"))
        )
    )
    return kept, manifest


def run_curate(
    input_path: str,
    output_path: str,
    *,
    blocklist: tuple[str, ...] = (),
    eval_path: str | None = None,
    dedup: bool = True,
    passage_dedup: bool = False,
    corpus_path: str | None = None,
    verify_members: bool = False,
    quota_cap: int = 30,
    spark=None,
) -> dict[str, int]:
    """CLI body: read a documents parquet (doc_id, source, text), run
    :func:`curate`, write ``output/kept`` partitioned by split and
    ``output/manifest``, and return the per-verdict counts (also printed
    as one JSON line by the CLI)."""
    import os

    from csv_loader_spark.session import get_spark

    spark = spark or get_spark("curate")
    docs = spark.read.parquet(input_path).select("doc_id", "source", "text")
    corpus = (
        spark.read.parquet(corpus_path).select("doc_id", "text")
        if corpus_path
        else None
    )
    eval_docs = (
        spark.read.parquet(eval_path).select("doc_id", "text")
        if eval_path
        else None
    )
    kept, manifest = curate(
        docs,
        blocklist=blocklist,
        eval_docs=eval_docs,
        dedup=dedup,
        passage_dedup=passage_dedup,
        corpus=corpus,
        verify_members=verify_members,
        quota_cap=quota_cap,
    )
    kept.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(output_path, "kept")
    )
    manifest.write.mode("overwrite").parquet(os.path.join(output_path, "manifest"))
    counts = {
        r["verdict"]: r["n"]
        for r in spark.read.parquet(os.path.join(output_path, "manifest"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return counts
