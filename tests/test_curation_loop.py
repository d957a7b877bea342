"""The closed-loop admission pipeline (streaming/curation.py): blocklist →
near-dup probe → hash-consistent quota composed per micro-batch over a
growing store, with the commutes-with-batching property asserted against
the batch q121 rule."""

import json
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from csv_loader_spark.streaming.curation import (
    read_quota_snapshot,
    start_curation_pipeline,
)

_SCHEMA = "doc_id long, ts timestamp, source string, text string"

# MinHash-verified fixture texts (see test_stream_static_dedup.py): _N1 and
# _N3 collide in 2 of 3 bands; the others share no bands.
_N1 = (
    "distributed stream processing with incremental checkpoints handles "
    "late data gracefully in production pipelines"
)
_N3 = (
    "distributed stream processing with incremental checkpoints handles "
    "late data gracefully in modern pipelines"
)
_A = "an entirely original first document about columnar storage engines"
_B = "another unrelated piece describing vectorized execution and codegen"
_C = "a third standalone text on adaptive query replanning at runtime"
_BLOCKED = "spam content see http://site1.example/landing page now"

# q121 hash order (md5 first-16-bits of '<id>:quota'):
# h(2)=1994 < h(22)=15594 < h(12)=15758 < h(6)=17484


def _write_batch(path, rows):
    with open(path, "w") as f:
        for doc_id, ts, source, text in rows:
            f.write(
                json.dumps(
                    {"doc_id": doc_id, "ts": ts, "source": source, "text": text}
                )
                + "\n"
            )


def _run(spark, src, store, ck):
    q = start_curation_pipeline(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        store,
        ck,
        cap=2,
        available_now=True,
    )
    q.awaitTermination(240)


def test_curation_loop_composes_and_commutes(spark, tmp_path):
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    src = tmp_path / "arrivals"
    src.mkdir()

    _write_batch(
        src / "b1.json",
        [
            (6, "2026-01-01 10:00:00", "s", _A),
            (12, "2026-01-01 10:00:01", "s", _B),
            (22, "2026-01-01 10:00:02", "s", _N1),
            (13, "2026-01-01 10:00:03", "s", _A),        # exact dup of 6
            (7, "2026-01-01 10:00:04", "s", _BLOCKED),   # blocklisted
        ],
    )
    _run(spark, src, store, ck)
    snap1 = {
        r["doc_id"] for r in read_quota_snapshot(spark, store).collect()
    }
    # cap=2, hash order 22 < 12 < 6: doc 6 is dedup-accepted but over cap
    assert snap1 == {22, 12}

    # batch 2 lands after a RESTART (state lives in the store, not memory):
    # a better-hash newcomer displaces doc 12; a near-dup of doc 22 is
    # rejected by the band index the loop grew
    _write_batch(
        src / "b2.json",
        [
            (2, "2026-01-01 10:01:00", "s", _C),
            (19, "2026-01-01 10:01:01", "s", _N3),       # near dup of 22
        ],
    )
    _run(spark, src, store, ck)
    snap2 = {
        r["doc_id"] for r in read_quota_snapshot(spark, store).collect()
    }
    assert snap2 == {2, 22}

    # manifest verdicts, folded over the replay
    manifest = spark.read.parquet(os.path.join(store, "manifest"))
    got = {
        (r["doc_id"], r["verdict"])
        for r in manifest.select("doc_id", "verdict").collect()
    }
    assert (7, "blocked") in got
    assert (13, "exact_batch") in got
    assert (19, "near_corpus") in got
    assert (6, "quota_rejected") in got
    assert (12, "admitted") in got and (12, "quota_evicted") in got
    assert (2, "admitted") in got and (22, "admitted") in got

    # the COMMUTES-WITH-BATCHING property: the standing set equals the
    # batch q121 rule applied to every dedup-accepted doc of the whole
    # replay, computed with the rule's own expression
    from csv_loader_spark.queries.llm2 import _hash16_spark_sql
    from csv_loader_spark.queries.llm7 import _QUOTA_SALT

    accepted = spark.read.parquet(os.path.join(store, "accepted"))
    h = _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_QUOTA_SALT}')")
    w = Window.partitionBy("source").orderBy(F.expr(h), F.col("doc_id"))
    expected = {
        r["doc_id"]
        for r in accepted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .collect()
    }
    assert snap2 == expected

    # blocked docs never reached any store surface
    for sub in ("accepted", "quota"):
        df = spark.read.parquet(os.path.join(store, sub))
        assert df.filter(F.col("doc_id") == 7).count() == 0


def test_curation_loop_compacts_on_cadence(spark, tmp_path):
    """r10: compact_every=2 folds the committed fp/band partitions into
    their seeds and prunes superseded quota snapshots WHILE the stream
    runs — and every externally visible result (manifest verdicts, final
    standing set) is identical to an uncompacted run over the same
    arrivals."""
    src = tmp_path / "arrivals"
    src.mkdir()
    _write_batch(
        src / "b1.json",
        [
            (6, "2026-01-01 10:00:00", "s", _A),
            (13, "2026-01-01 10:00:01", "s", _A),      # exact dup of 6
            (22, "2026-01-01 10:00:02", "s", _N1),
        ],
    )
    _write_batch(src / "b2.json", [(12, "2026-01-01 10:01:00", "s", _B)])
    _write_batch(
        src / "b3.json",
        [
            (2, "2026-01-01 10:02:00", "s", _C),
            (19, "2026-01-01 10:02:01", "s", _N3),     # near dup of 22
        ],
    )
    # the file source orders same-mtime files arbitrarily; pin b1 < b2 < b3
    # so the near-dup of 22 really arrives AFTER 22 in both runs
    for i, name in enumerate(("b1.json", "b2.json", "b3.json")):
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))

    stores = {}
    for label, compact_every in (("plain", None), ("compacted", 2)):
        store = str(tmp_path / f"store_{label}")
        q = start_curation_pipeline(
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src)),
            store,
            str(tmp_path / f"ck_{label}"),
            cap=2,
            compact_every=compact_every,
            available_now=True,
        )
        q.awaitTermination(240)
        stores[label] = store

    # the compacted store's probe state collapsed MID-stream: batches 0+1
    # folded at the K=2 cadence point, batch 2 still stands alone; only
    # the newest quota snapshot survives the prune
    for sub in ("fp_index", "band_index"):
        parts = sorted(
            e
            for e in os.listdir(os.path.join(stores["compacted"], sub))
            if e.startswith("batch=")
        )
        assert parts == ["batch=-1", "batch=2"], (sub, parts)
    quota_parts = sorted(
        e
        for e in os.listdir(os.path.join(stores["compacted"], "quota"))
        if e.startswith("batch=")
    )
    assert quota_parts == ["batch=1", "batch=2"]
    plain_parts = [
        e
        for e in os.listdir(os.path.join(stores["plain"], "fp_index"))
        if e.startswith("batch=")
    ]
    assert sorted(plain_parts) == ["batch=0", "batch=1", "batch=2"]

    # verdicts and the standing set are identical across the two stores
    def _manifest(store):
        return {
            (r["doc_id"], r["verdict"])
            for r in spark.read.parquet(os.path.join(store, "manifest"))
            .select("doc_id", "verdict")
            .collect()
        }

    assert _manifest(stores["compacted"]) == _manifest(stores["plain"])
    assert (19, "near_corpus") in _manifest(stores["compacted"])
    assert {
        r["doc_id"] for r in read_quota_snapshot(spark, stores["compacted"]).collect()
    } == {
        r["doc_id"] for r in read_quota_snapshot(spark, stores["plain"]).collect()
    }


def test_curation_loop_verify_members_mode(spark, tmp_path):
    """The capstone loop on the VERIFY tier: a true near-dup of a prior
    admission is still rejected (with a confirmed witness), the band
    store carries member shingle arrays, and compaction re-caps it."""
    from csv_loader_spark.streaming.ingest_dedup import read_band_member_index

    store = str(tmp_path / "store")
    src = tmp_path / "arrivals"
    src.mkdir()
    _write_batch(
        src / "b1.json",
        [
            (6, "2026-01-01 10:00:00", "s", _A),
            (22, "2026-01-01 10:00:01", "s", _N1),
        ],
    )
    _write_batch(
        src / "b2.json",
        [(19, "2026-01-01 10:01:00", "s", _N3)],  # true near dup of 22
    )
    for i, name in enumerate(("b1.json", "b2.json")):
        os.utime(src / name, (1_700_000_000 + i, 1_700_000_000 + i))
    q = start_curation_pipeline(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        store,
        str(tmp_path / "ck"),
        cap=5,
        compact_every=2,
        verify_members=True,
        available_now=True,
    )
    q.awaitTermination(240)

    manifest = {
        (r["doc_id"], r["verdict"])
        for r in spark.read.parquet(os.path.join(store, "manifest"))
        .select("doc_id", "verdict")
        .collect()
    }
    assert (19, "near_corpus") in manifest
    assert (6, "admitted") in manifest and (22, "admitted") in manifest

    members = read_band_member_index(
        spark, os.path.join(store, "band_index")
    )
    assert {r["doc_id"] for r in members.collect()} == {6, 22}
    assert members.filter(F.size("toks") < 1).count() == 0
    # compaction cadence fired after batch 1: both batches folded
    parts = sorted(
        e
        for e in os.listdir(os.path.join(store, "band_index"))
        if e.startswith("batch=")
    )
    assert parts == ["batch=-1"]
