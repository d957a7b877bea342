"""Property tests for the r7 shaping operators (llm5): the chunker against
an independent pure-Python model (one Spark job for all cases), and the
greedy packing fold under hypothesis (pure pandas — no Spark job per
example)."""

import hashlib
import random

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from csv_loader_spark.queries.llm5 import (
    _CHUNK,
    _PACK_CAP,
    _STRIDE,
    _greedy_pack,
    q99_chunk_sliding,
)

# --- chunker vs pure-Python model ------------------------------------------


def _py_chunks(doc_id, words):
    """Independent model of q99: lowercase tokens, windows of _CHUNK at
    stride _STRIDE, last window placed to reach the final token."""
    toks = [w.lower() for w in words]
    n = len(toks)
    last_i = (n - _CHUNK + _STRIDE - 1) // _STRIDE if n > _CHUNK else 0
    out = set()
    for i in range(last_i + 1):
        start = 1 + i * _STRIDE
        chunk = toks[start - 1 : start - 1 + _CHUNK]
        fp = hashlib.md5(" ".join(chunk).encode()).hexdigest()
        out.add((doc_id, i, start, min(_CHUNK, n - start + 1), fp))
    return out


def test_chunker_matches_python_model_randomized(spark, tmp_path):
    rng = random.Random(7)
    words = ["alpha", "beta", "Gamma", "delta", "x1", "longword" * 3]
    docs = []
    # exercise the boundary lattice: n around multiples of stride/chunk
    sizes = [1, 2, _STRIDE - 1, _STRIDE, _STRIDE + 1, _CHUNK - 1, _CHUNK,
             _CHUNK + 1, _CHUNK + _STRIDE, _CHUNK + _STRIDE + 1, 97, 200]
    for doc_id, n in enumerate(sizes + [rng.randint(1, 300) for _ in range(40)]):
        docs.append((doc_id, [rng.choice(words) for _ in range(n)]))

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": [" ".join(ws) for _, ws in docs],
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": pa.array([0] * len(docs), pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_fp"])
        for r in q99_chunk_sliding(spark, str(tmp_path)).collect()
    }
    expected = set()
    for doc_id, ws in docs:
        expected |= _py_chunks(doc_id, ws)
    assert got == expected


# --- greedy packing fold invariants (hypothesis, driver-side) ---------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2 * _PACK_CAP), min_size=1, max_size=60)
)
def test_greedy_pack_invariants(n_toks):
    pdf = pd.DataFrame(
        {
            "source": ["s"] * len(n_toks),
            "doc_id": list(range(len(n_toks))),
            "n_tok": n_toks,
        }
    )
    out = _greedy_pack(pdf).sort_values("doc_id")
    packs = list(out["pack_id"])
    # contiguous, nondecreasing pack ids starting at 0
    assert packs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
    by_pack = out.groupby("pack_id")["n_tok"].agg(["sum", "count"])
    # a pack exceeds the budget only as a single oversize doc
    for _, row in by_pack.iterrows():
        assert row["sum"] <= _PACK_CAP or row["count"] == 1
    # greedy tightness: each new pack's opener did NOT fit in the previous
    firsts = out.groupby("pack_id").first()["n_tok"]
    for pid in range(1, int(out["pack_id"].max()) + 1):
        assert by_pack.loc[pid - 1, "sum"] + firsts[pid] > _PACK_CAP


# --- q108 Arrow KNN edge cases (r7 review fixes) ---------------------------


def test_knn_arrow_nan_sims_survive_prefilter(spark):
    """A zero-norm vector's 0/0 sim is NaN; Spark sorts NaN FIRST under
    sim DESC, so the batch prefilter must too, or q108 diverges from q35
    exactly on degenerate rows."""
    import numpy as np

    from csv_loader_spark.queries.llm5 import _knn_arrow_batches, _topk_idx

    sims = np.array([0.9, float("nan"), 0.5, 0.8])
    ids = np.array([10, 11, 12, 13])
    sel = _topk_idx(sims, ids, 3)
    assert list(ids[sel]) == [11, 10, 13]  # NaN first, then sim desc

    # end-to-end: corpus with one zero vector among k+1 finite candidates
    import pandas as pd

    qids = np.array([0])
    QM = np.array([[1.0, 0.0]])
    qn = np.array([1.0])
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4, 5, 6],
            "v": [
                [1.0, 0.0], [0.9, 0.1], [0.8, 0.2], [0.7, 0.3],
                [0.6, 0.4], [0.5, 0.5], [0.0, 0.0],  # zero-norm -> NaN
            ],
        }
    )
    gen = _knn_arrow_batches(qids, QM, qn, k=5)
    out = pd.concat(list(gen(iter([pdf]))))
    assert 6 in set(out["neighbor_id"])  # the NaN row survived


def test_knn_arrow_accumulates_across_batches(spark):
    """Per-PARTITION top-k: two batches through one generator must emit
    one combined top-k, not one per batch (the documented shuffle bound
    is partitions * |Q| * k)."""
    import numpy as np
    import pandas as pd

    from csv_loader_spark.queries.llm5 import _knn_arrow_batches

    qids = np.array([0])
    QM = np.array([[1.0, 0.0]])
    qn = np.array([1.0])
    b1 = pd.DataFrame({"vec_id": [1, 2], "v": [[0.5, 0.5], [0.4, 0.6]]})
    b2 = pd.DataFrame({"vec_id": [3, 4], "v": [[0.9, 0.1], [0.3, 0.7]]})
    frames = list(_knn_arrow_batches(qids, QM, qn, k=2)(iter([b1, b2])))
    assert len(frames) == 1  # single per-partition emission
    out = frames[0].sort_values("sim", ascending=False)
    assert list(out["neighbor_id"]) == [3, 1]  # global-best across batches


def test_knn_arrow_empty_query_set(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from csv_loader_spark.queries.llm5 import q108_knn_arrow

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1000, 1001], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = q108_knn_arrow(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "n_rank"]
