"""The PRODUCT curation entry point: one function (and a CLI subcommand,
``python -m csv_loader_spark curate``) composing the admission rules the
query surface proves piecewise — so a pipeline owner can run the whole
DAG over a real documents table without touching the query registry.

Rules, in q132's adjudicated order, each one an oracle-gated operator
elsewhere in the tree:

1. domain BLOCKLIST          (q102's broadcast anti rule)
2. exact + NEAR dedup        (ingest_verdicts — q131's five-verdict
                              precedence run batch-mode against an empty
                              corpus index, i.e. within-input dedup; pass
                              ``corpus`` to dedup against a snapshot, or
                              ``verify_members=True`` for the
                              precision-1.0 tier, q145)
3. per-source hash QUOTA     (q121's corpus-stable rule)
4. train/valid/test SPLIT    (q116's salted hash buckets)

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
    corpus: DataFrame | None = None,
    verify_members: bool = False,
    quota_cap: int = 30,
) -> tuple[DataFrame, DataFrame]:
    """Run the admission DAG over ``docs`` (doc_id, source, text).

    ``blocklist``: lowercase domains to drop (first URL in the text is
    the doc's domain, q102's rule). ``corpus``: an optional
    already-accepted snapshot to dedup AGAINST (its fingerprint and band
    indexes are built here); omitted, dedup is within-input only.
    ``verify_members``: use the Jaccard-verified near rule (q145)
    instead of bucket membership (q131) for the CORPUS probe — it
    requires ``corpus`` (with no snapshot there are no corpus buckets to
    verify against, and the within-input near rule is the same
    window-min in both tiers, so the flag would silently change
    nothing; r10 review makes that a loud error instead).
    ``quota_cap``: max admitted docs per source (q121's hash-stable
    selection).
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

    # stage 1: blocklist
    blocked, survivors = split_blocklisted(docs, blocklist)

    if verify_members and corpus is None:
        raise ValueError(
            "verify_members requires a corpus snapshot: the verified rule "
            "confirms CORPUS-probe rejections against stored member "
            "shingles, and without a corpus the verdicts would be "
            "identical to the membership tier (the within-input near rule "
            "is the same window-min in both)"
        )

    # stage 2: dedup verdicts (against the snapshot when given, else
    # within-input via empty indexes — same precedence either way)
    base = corpus if corpus is not None else docs.limit(0)
    fp_idx = fingerprint_index(base)
    if verify_members:
        verdicts = ingest_verdicts_verified(
            survivors, fp_idx, band_member_index(base)
        )
    else:
        verdicts = ingest_verdicts(survivors, fp_idx, band_signature_index(base))
    verdicts = verdicts.localCheckpoint(eager=False)
    accepted = verdicts.filter(F.col("verdict") == "accepted").drop("verdict", "fp")

    # stage 3: per-source hash quota (corpus-stable order)
    h_quota = F.expr(
        _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_QUOTA_SALT}')")
    )
    w = Window.partitionBy("source").orderBy(h_quota, F.col("doc_id"))
    ranked = accepted.withColumn("_rnk", F.row_number().over(w))
    kept = ranked.filter(F.col("_rnk") <= quota_cap).drop("_rnk")
    quota_rejected = ranked.filter(F.col("_rnk") > quota_cap).drop("_rnk")

    # stage 4: split assignment on the admitted set
    h_split = _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_SPLIT_SALT}')")
    kept = kept.withColumn("split", F.expr(_split_case(h_split)))

    manifest = (
        blocked.select("doc_id", "source", F.lit("blocked").alias("verdict"))
        .unionByName(
            verdicts.filter(F.col("verdict") != "accepted").select(
                "doc_id", "source", "verdict"
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
    kept, manifest = curate(
        docs,
        blocklist=blocklist,
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
