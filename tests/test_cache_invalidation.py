"""File-identity invalidation for the two session caches (r7):

- io.tables._TABLE_CACHE holds lazy plans; a regenerated file under the
  same path must produce a fresh plan (the r5 mid-round testdata
  regeneration is the motivating incident).
- llm4._CAND_CACHE holds PERSISTED candidate pairs — worse than a stale
  plan, frozen rows: regenerating embeddings.parquet must unpersist the
  stale pairs and rebuild, or q97/q98 silently join fresh vectors against
  dead candidates.

Plus the hot-bucket guard observability (ADVICE r6): the cap binding must
be visible at runtime, not just documented.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from csv_loader_spark.io.tables import _TABLE_CACHE, file_fingerprint, load_table
from csv_loader_spark.queries.llm4 import (
    _CAND_CACHE,
    _lsh_candidates,
    hot_bucket_guard_stats,
)


def _write_documents(path, n, salt=""):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": [f"document {salt} number {i}" for i in range(n)],
            }
        ),
        path,
    )


def _bump_mtime(path):
    """Guarantee the fingerprint moves even on coarse-mtime filesystems."""
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))


def test_table_cache_picks_up_regenerated_file(spark, tmp_path):
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    _write_documents(p, 5)
    assert load_table(spark, sf_dir, "documents").count() == 5
    assert (spark, sf_dir, "documents") in _TABLE_CACHE

    _write_documents(p, 9, salt="regen")
    _bump_mtime(p)
    assert load_table(spark, sf_dir, "documents").count() == 9


def test_table_cache_still_caches_unchanged_file(spark, tmp_path):
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    _write_documents(p, 3)
    a = load_table(spark, sf_dir, "documents")
    b = load_table(spark, sf_dir, "documents")
    assert a is b  # same plan object — the cache hit that saves the footer read


def test_file_fingerprint_covers_directories(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"abc")
    fp1 = file_fingerprint(str(d))
    (d / "part-1").write_bytes(b"defg")
    fp2 = file_fingerprint(str(d))
    assert fp1 != fp2 and fp2[1] == 7
    assert file_fingerprint(str(tmp_path / "missing")) is None


def _write_embeddings(path, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        path,
    )


def test_cand_cache_invalidates_on_regenerated_embeddings(spark, tmp_path):
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "embeddings.parquet")
    # 6 identical vectors: every pair collides in every LSH table
    _write_embeddings(p, [[1.0, 2.0, 3.0, 4.0]] * 6)
    cand1, _ = _lsh_candidates(spark, sf_dir)
    assert cand1.count() == 15  # C(6,2)

    # 3 identical vectors: C(3,2)=3 — a stale cache would still say 15
    _write_embeddings(p, [[5.0, 6.0, 7.0, 8.0]] * 3)
    _bump_mtime(p)
    cand2, _ = _lsh_candidates(spark, sf_dir)
    assert cand2.count() == 3
    assert cand2 is not cand1
    # the stale persisted entry was evicted and replaced, not leaked
    # (df.storageLevel can't verify the unpersist: the cache manager
    # matches by logical-plan equality and the rebuilt frame's plan is
    # structurally equal to the stale one's)
    assert _CAND_CACHE[(spark, sf_dir)][1] is cand2

    # unchanged file: cache hit, same persisted frame
    cand3, _ = _lsh_candidates(spark, sf_dir)
    assert cand3 is cand2


def test_hot_bucket_guard_stats_signal(spark):
    from csv_loader_spark.functions import vectors as VEC

    flood = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(30)],
        "vec_id long, v array<double>",
    ).withColumn("nrm", VEC.norm("v"))
    bound = hot_bucket_guard_stats(flood, cap=10)
    assert bound["max_bucket"] == 30
    assert bound["n_evicted"] > 0 and bound["n_buckets_over"] > 0
    inert = hot_bucket_guard_stats(flood, cap=1024)
    assert inert["n_evicted"] == 0 and inert["n_buckets_over"] == 0


def test_cand_cache_rebuild_logs_guard_stats(spark, tmp_path, caplog):
    import logging

    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "embeddings.parquet")
    _write_embeddings(p, [[1.0, 0.5, -0.5, 2.0]] * 4)
    with caplog.at_level(logging.INFO, logger="csv_loader_spark.queries.llm4"):
        _lsh_candidates(spark, sf_dir)
    assert any("hot-bucket cap inert" in r.message for r in caplog.records)


def test_tokidx_cache_invalidates_on_regenerated_documents(spark, tmp_path):
    """q119's persisted df-sorted token index follows the same contract:
    same file -> same persisted frame; regenerated file -> stale frame
    unpersisted and a fresh index built over the new rows."""
    from csv_loader_spark.queries.llm7 import _TOKIDX_CACHE, _df_sorted_tokens

    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    _write_documents(p, 6)
    idx1 = _df_sorted_tokens(spark, sf_dir)
    assert idx1.count() == 6
    assert _df_sorted_tokens(spark, sf_dir) is idx1  # cache hit

    _write_documents(p, 11, salt="regen")
    _bump_mtime(p)
    idx2 = _df_sorted_tokens(spark, sf_dir)
    assert idx2 is not idx1
    assert idx2.count() == 11
    # the stale persisted entry was evicted and replaced, not leaked
    # (storageLevel can't verify the unpersist — see the _CAND_CACHE
    # test above for why: plan-equality matching in the cache manager)
    assert _TOKIDX_CACHE[(spark, sf_dir)][1] is idx2
    assert _df_sorted_tokens(spark, sf_dir) is idx2  # unchanged: hit again
