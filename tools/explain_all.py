"""Snapshot formatted physical plans of the headline queries into PLANS.md.

The plan-shape PROPERTIES are enforced by tests/test_plans.py; this file is
the human-readable evidence (scan pushdown, pruned ReadSchema, broadcast
placement, WindowGroupLimit) for review without a Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, R8_OPS, R9_OPS, R10_OPS, R12_OPS  # noqa: E402
from csv_loader_spark.queries.registry import all_specs  # noqa: E402
from csv_loader_spark.session import get_spark  # noqa: E402

# Adjudication notes rendered under the matching plan — for queries whose
# bench ratio keeps getting re-litigated even though the plan is already
# the one we'd want. Keep these with the generator so regeneration
# preserves them.
NOTES = {
    "q151_repetition_rules": (
        "**The crossover query (r12).** One exploded gram stream covers all "
        "five n's, one count shuffle keyed (doc_id, n, gram), a per-(doc, n) "
        "fold, a pivot back to doc rows, and integer cross-multiplied "
        "thresholds. At sf0.1 Spark (0.70 s) already beats the DuckDB oracle "
        "(0.98 s) — the first r12 operator past the per-stage floor — and "
        "x10 data grows Spark 0.9x vs DuckDB 10.5x "
        "(SCALING.json r12_ops_scaling)."
    ),
    "q154_curation_capstone": (
        "**The model-based curation tier, composed (r12).** Gopher base + "
        "repetition rules, then the curated-split bigram-LM scores with "
        "per-language ntile buckets (tail dropped), then UniMax "
        "water-filling over kept tokens. Every inter-stage join is a "
        "doc_id/source equi-join carrying scalars; the only nested-loop "
        "joins are 1-row scalar broadcasts (their count reflects the four "
        "manifest branches re-reading the survivor subtree — heavy "
        "exchanges dedup via ReuseExchange, 1-row cross-joins do not). "
        "Warm sf0.1 cost 2.6 s, cheaper than the rule-based q132 manifest."
    ),
    "q21_monthly_orders": (
        "**Floor query — ratio is fixed cost, not plan waste (r7 note).** "
        "The worst bench ratios belong to the tiniest queries, and this is "
        "the canonical one (~0.25 s Spark vs ~0.013 s DuckDB): one scan "
        "with the date filter PUSHED (see PushedFilters) and a two-column "
        "ReadSchema, partial aggregate map-side, ONE exchange on the "
        "(year, month) grouping key, final aggregate — two stages plus "
        "collect, nothing removable. The residual is Spark's per-stage "
        "scheduling/codegen floor (~0.1-0.2 s/stage), which is constant in "
        "data size: SCALING.json runs 6-7 show exactly this family's "
        "ratio falling from ~5x to ~2-4x at x100 data. Do not re-tune."
    ),
    "q26_distinct_exact": (
        "**Floor query — two exchanges are the exact-distinct price (r7 "
        "note).** count(DISTINCT user_id) per event_type expands to the "
        "standard two-phase shape: partial agg keyed (event_type, "
        "user_id) with its exchange to dedup, then re-agg keyed "
        "event_type with a second exchange. Both exchanges are required "
        "for exactness on distributed data; the single-process oracle "
        "dedups in one hash table and wins the constant factor. The "
        "bounded-state alternative is q27's HLL sketch (one exchange, "
        "mergeable); this query exists to BE the exact twin. Plan is "
        "minimal — the ratio (~13x on 600k rows) is stage floor, "
        "amortizing with scale like q21's."
    ),
    "q117_dup_fraction": (
        "**Two shuffles, both on shrinking keys (r8).** Explode per-doc "
        "DISTINCT shingles, window count over the shingle (document "
        "frequency), roll up on doc_id. The shingle exchange carries "
        "(doc_id, s) only; the window is a count, not a sort-heavy rank. "
        "Same posting-list shape as q34/q96, so the df stop-list bolts on "
        "if a boilerplate flood ever makes shingle groups hot."
    ),
    "q118_sq8_knn_recall": (
        "**q35's broadcast shape, twice the arithmetic, ONE pair pass "
        "(r8).** The per-dim min/max agg is a d-row frame crossJoined "
        "back (1-row broadcast — the allowed cross); quantize/dequantize "
        "are zip_with lambdas touching only their own variables (the HOF "
        "re-evaluation trap documented in functions/text.py does not "
        "bite); the corpus never hash-shuffles — exact and quantized "
        "ranks come from two windows over the same broadcast-join "
        "output, then one roll-up per query."
    ),
    "q131_ingest_neardup": (
        "Ingest-time near-dup verdicts: every index probe is a semi/anti\n"
        "equi-join on a derived key (fp / (band, bkey) / doc_id) and the\n"
        "within-batch near rule is a window MIN per band bucket — look for\n"
        "LeftSemi/LeftAnti joins and min(doc_id) windows, and the absence\n"
        "of any candidate self-join."
    ),
    "q132_admission_manifest": (
        "The five-rule admission manifest: map-side regexp blocklist,\n"
        "broadcast gram equi-join (decontamination), window keep-first on\n"
        "md5(passage) (projected to _w0), WindowGroupLimit quota, map-only\n"
        "split/token-count. No pairwise joins anywhere."
    ),
    "q119_prefix_jaccard_join": (
        "**The optimized exact join: index once, prune three ways, "
        "verify narrow (r8).** The df-sorted token index is persisted "
        "(three subtrees read it; building it thrice measured 8.2 s vs "
        "0.9 s at sf0.1) and the candidate self-join runs on PREFIX "
        "tokens only with the AllPairs length filter and PPJoin "
        "positional filter in the join condition (candidates 409k -> "
        "125k at sf0.1). Verification re-attaches the full token arrays "
        "by id equi-join AFTER the distinct — arrays never ride the "
        "token-keyed shuffle. Lossless by construction and by gate: the "
        "oracle is q33's naive SQL. Boilerplate-flood immunity measured "
        "in SCALING.json `prefix_filter`."
    ),
    "q145_ingest_verified_neardup": (
        "**The r10 verify tier (plan story).** Identical probe shapes to "
        "q131 (semi/anti equi-joins on fp and doc_id, window min per band "
        "bucket) plus ONE (band, bkey) equi-join against the member index "
        "whose build side carries the stored shingle arrays — the arrays "
        "ship only for colliding (arrival, member) pairs, verification is "
        "JVM array_intersect, and the rejection rule becomes "
        "precision-1.0 (q146 gates it at 10000 bp). No cartesian shape "
        "anywhere; the flood bound is the per-bucket member cap."
    ),
    "q05_nation_volume": (
        "**r7:** autoBroadcastJoinThreshold restored to the stock 10 MB, "
        "so at sf0.1 the orders-lineitem join now SHUFFLES on orderkey as "
        "this query's scale note always claimed (the old 64 MB override "
        "was broadcasting the 10.3 MB lineitem FACT). At the sf0.001 "
        "snapshot below everything still fits under 10 MB and "
        "auto-broadcasts — tiny-scale-only, by design."
    ),
    "q148_dsir_importance": (
        "**DSIR selection (r12).** Two hashed-count aggregates bounded at "
        "2^16 rows each (map-side combined), the log-ratio table joins the "
        "candidate feature stream as a BroadcastHashJoin on the bucket id, "
        "per-doc sum is one groupBy(doc_id), and the top-k is "
        "TakeOrderedAndProject - no global sort, nothing pairwise; the "
        "candidate-side token scan is the only corpus-sized work."
    ),
    "q149_semdedup": (
        "**SemDeDup (r12).** The centroid-assignment broadcast scan sits "
        "behind the assign checkpoint; the executed plan's joins are the "
        "cluster-id pair equi-join (ids + precedence scalar only) and two "
        "by-id BroadcastHashJoins that re-attach vectors for the single "
        "dot-product filter. The quadratic term is Sum |cluster|^2, sized "
        "by k - the paper's own scale story."
    )
}


APPENDIX = """\
## q97_lsh_cosine_dedup (candidate subplan — literals elided)

The raw formatted plan is ~185 KB because every LSH signature bit embeds its
96-element hyperplane literal; the skeleton below keeps every operator and
every exchange's carried columns (the part that matters at scale). The
narrow-shuffle property is regression-guarded by
tests/test_plans.py::test_q97_candidate_shuffle_carries_ids_only.

```
HashAggregate(keys=[vec_a, vec_b])                 -- distinct candidate pairs
+- Exchange hashpartitioning(vec_a, vec_b)         -- carries [vec_a, vec_b] (ids only)
   +- HashAggregate(partial)
      +- Project [vec_id AS vec_a/vec_b, bucket]
         +- BroadcastHashJoin bucket               -- AQE picks broadcast at sf0.001;
            |                                         flips to shuffled hash/SMJ on the
            |                                         same narrow frames at scale
            :- Filter (rn <= 1024)                 -- hot-bucket guard
            :  +- Window row_number over (bucket, vec_id)
            :     +- Sort [bucket, vec_id]
            :        +- Exchange hashpartitioning(bucket)   -- carries [vec_id, bucket] ONLY
            :           +- Generate explode(array(sig_0..sig_L))  -- 16 signature exprs
            :              +- Project [vec_id, v]  -- v never leaves this stage
            :                 +- FileScan parquet ReadSchema: struct<vec_id,embedding>
            +- (same capped narrow frame, other side of the self-join)
```

Verify stage (not shown): two id equi-joins re-attach (v, nrm) AFTER the
distinct — the arrays ride only id-keyed joins whose build side is the
deduplicated candidate list, never the bucket shuffle.
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("explain_all")
    specs = all_specs()
    out = [
        "# PLANS — headline-query physical plans (generated by tools/explain_all.py)",
        "",
        f"Source: `{sf_dir}`; plan-shape assertions live in tests/test_plans.py.",
        "",
    ]
    heavy_r8 = tuple(
        n for n in (R8_OPS + R9_OPS + R10_OPS + R12_OPS) if n in NOTES
    )  # the r8/r9 queries whose plans warrant the human-readable snapshot
    for name in HEADLINE + heavy_r8:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", ""]
        if name in NOTES:
            out += [NOTES[name], ""]
        out += ["```", plan.rstrip(), "```", ""]
    out.append(APPENDIX)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE) + len(heavy_r8)} plans)")


if __name__ == "__main__":
    main()
