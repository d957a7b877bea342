"""Flood-behavior measurement for the ingest-time near-dup probe
(streaming/ingest_dedup.py ingest_verdicts): the degenerate arrival batch
where EVERY doc is a near-copy — the shape that blows a pairwise LSH
candidate join up to C(n, 2) — must stay near-linear here, because the
within-batch rule is a window MIN per band bucket and the index probe is
a semi-join.

Setup (no synthesized text — sf docs with per-copy one-word tails):
arrivals = m variants of every corpus doc (tail word differs per copy, so
fingerprints are all distinct but band signatures collide massively).
Probed two ways:
- seeded: index = the original corpus -> every arrival should reject as
  near_corpus through the index semi-join;
- cold: EMPTY indexes -> everything lands in the within-batch window-min
  rule with bucket sizes ~m (the pure flood path).

Usage: python tools/bench_ingest_probe.py [sf_dir]
Prints one JSON line; merge into SCALING.json under "ingest_probe".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from csv_loader_spark.session import get_spark  # noqa: E402
from csv_loader_spark.streaming.ingest_dedup import (  # noqa: E402
    band_member_index,
    band_signature_index,
    fingerprint_index,
    ingest_verdicts,
    ingest_verdicts_verified,
)

MULTIPLIERS = (1, 3, 10)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bench_ingest_probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "source", "text"
    )
    n_docs = docs.count()
    fp_idx = fingerprint_index(docs).localCheckpoint(eager=True)
    band_idx = band_signature_index(docs).localCheckpoint(eager=True)
    member_idx = band_member_index(docs).localCheckpoint(eager=True)
    empty_fp = fp_idx.limit(0).localCheckpoint(eager=True)
    empty_band = band_idx.limit(0).localCheckpoint(eager=True)

    out: dict[str, dict] = {}
    for m in MULTIPLIERS:
        arrivals = None
        for k in range(m):
            part = docs.select(
                (F.col("doc_id") + (k + 1) * 10_000_000).alias("doc_id"),
                "source",
                F.concat(F.col("text"), F.lit(f" floodvariant{k}")).alias("text"),
            )
            arrivals = part if arrivals is None else arrivals.unionAll(part)

        res: dict[str, dict] = {}
        for mode, fpi, bdi in (
            ("seeded", fp_idx, band_idx),
            ("cold", empty_fp, empty_band),
            # r10 VERIFY tier under the same flood: every arrival collides
            # with its origin doc's bucket AND truly is a near-dup, so the
            # member join fans out ~bucket-cap witnesses per arrival — the
            # tier's worst case (all collisions need confirmation)
            ("seeded_verified", fp_idx, member_idx),
        ):
            verdicts_fn = (
                ingest_verdicts_verified
                if mode == "seeded_verified"
                else ingest_verdicts
            )
            def agg(frame):
                return {
                    r["verdict"]: r["n"]
                    for r in frame.groupBy("verdict")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }

            agg(verdicts_fn(arrivals, fpi, bdi))  # prime (JIT + plan)
            # timed run constructs a FRESH verdict frame so the lazy
            # localCheckpoints inside ingest_verdicts materialize within
            # the measured window — one full micro-batch's cost, not a
            # warm-block replay
            t0 = time.perf_counter()
            counts = agg(verdicts_fn(arrivals, fpi, bdi))
            res[mode] = {
                "sec": round(time.perf_counter() - t0, 4),
                "n_arrivals": n_docs * m,
                "verdicts": counts,
            }
        out[f"x{m}"] = res
        print(f"# x{m}: {res}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "ingest_probe_flood",
                "sf_dir": sf_dir,
                "multipliers": list(MULTIPLIERS),
                "results": out,
            }
        )
    )


if __name__ == "__main__":
    main()
