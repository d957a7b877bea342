"""Multimodal mapInPandas plumbing: schemas, batch iteration, frame fan-out."""

import hashlib

from csv_loader_spark.ops.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_features,
    sample_frames,
)


def _docs(spark):
    rows = [(i, "word " * (i + 1) + "end") for i in range(9)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shape(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_schema_and_features(spark):
    media = attach_fake_media(_docs(spark))
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)
    feats = extract_features(media)
    assert _shape(feats.schema) == _shape(FEATURE_SCHEMA)
    got = {r["doc_id"]: r for r in feats.collect()}
    assert len(got) == 9
    payload = ("word " * 3 + "end").encode()
    r2 = got[2]
    assert r2["media_type"] == "video"  # 2 % 3 == 2
    assert r2["n_bytes"] == len(payload)
    assert r2["content_sha256"] == hashlib.sha256(payload).hexdigest()
    assert abs(r2["mean_byte"] - sum(payload) / len(payload)) < 1e-3
    assert (r2["decoded_width"], r2["decoded_height"]) == (2 + 16, 2 + 16)


def test_frame_sampling_fanout(spark):
    media = attach_fake_media(
        spark.createDataFrame([(2, "x" * 700)], "doc_id long, text string")
    )  # doc_id 2 → video; 700 bytes → 10 full 64-byte frames → keep 0,4,8
    frames = sample_frames(media, frame_size=64, every_n=4)
    assert _shape(frames.schema) == _shape(FRAME_SCHEMA)
    rows = sorted(frames.collect(), key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in rows] == [0, 4, 8]
    assert all(len(r["frame_bytes"]) == 64 for r in rows)


def test_non_video_produces_no_frames(spark):
    media = attach_fake_media(
        spark.createDataFrame([(0, "y" * 700)], "doc_id long, text string")
    )  # doc_id 0 → image
    assert sample_frames(media).count() == 0


def _make_bmp(width: int, height: int, pixel: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER), solid color."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    pix = (bytes(pixel) * width + b"\x00" * (stride - width * 3)) * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    return hdr + info + pix


def test_real_bmp_decode_through_map_in_pandas(spark):
    """The real-decode branch: a generated 24-bit BMP flows through the
    Arrow-batched mapInPandas path and yields TRUE pixel dimensions and the
    padding-excluded pixel mean — not the metadata dims / whole-payload
    mean of the pseudo path."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    bmp = _make_bmp(3, 2, (10, 200, 30))  # stride pads 3*3=9 -> 12 bytes
    media = spark.createDataFrame(
        [Row(doc_id=7, media_type="image", payload=bytearray(bmp),
             width=999, height=888, duration_ms=0)],
        T.StructType(MEDIA_SCHEMA.fields),
    )
    r = extract_features(media).collect()[0]
    # real decode: BMP header dims win over the (wrong) metadata dims
    assert (r["decoded_width"], r["decoded_height"]) == (3, 2)
    expected_mean = (10 + 200 + 30) / 3
    assert abs(r["mean_byte"] - expected_mean) < 1e-3
    # whole-payload mean (pseudo path) would include headers + padding zeros
    assert abs(sum(bmp) / len(bmp) - expected_mean) > 1.0
    assert r["n_bytes"] == len(bmp)


def test_bmp_decoder_rejects_non_bmp_and_truncated():
    from csv_loader_spark.ops.multimodal import _decode_bmp

    assert _decode_bmp(b"not a bitmap at all, definitely") is None
    bmp = _make_bmp(4, 4, (1, 2, 3))
    assert _decode_bmp(bmp) == (4, 4, 2.0)
    assert _decode_bmp(bmp[:40]) is None          # truncated header
    assert _decode_bmp(bmp[: len(bmp) - 8]) is None  # truncated pixels


def test_pil_present_but_unusable_falls_through(monkeypatch):
    """A PIL that can't parse the payload must mean FALLTHROUGH to the
    BMP/pseudo tiers, never an error (VERDICT r5 'What's wrong' #1)."""
    import sys
    import types

    from csv_loader_spark.ops import multimodal as mm

    class _Image:
        @staticmethod
        def open(_fp):
            raise OSError("cannot identify image file")

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Image)

    # non-image payload → pseudo tier (metadata dims, whole-payload mean)
    w, h, mean = mm._decode_one(b"plain text payload", 11, 22)
    assert (w, h) == (11, 22)
    assert abs(mean - sum(b"plain text payload") / 18) < 1e-9

    # BMP payload → real BMP tier still wins when PIL chokes
    bmp = _make_bmp(4, 4, (1, 2, 3))
    assert mm._decode_one(bmp, 999, 888) == (4, 4, 2.0)


def test_pil_decode_used_when_it_works(monkeypatch):
    """When PIL CAN decode, its result is used (the gated upgrade is an
    upgrade): dims from the decoded image, mean over RGB channel bytes."""
    import sys
    import types

    from csv_loader_spark.ops import multimodal as mm

    class _Img:
        size = (5, 7)

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return bytes([10, 20, 30]) * (5 * 7)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Image:
        @staticmethod
        def open(_fp):
            return _Img()

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Image)

    w, h, mean = mm._decode_one(b"anything", 1, 1)
    assert (w, h) == (5, 7)
    assert abs(mean - 20.0) < 1e-9


def _make_bmp_fn(width: int, height: int, pixel_fn) -> bytes:
    """24-bit BMP with per-pixel control: pixel_fn(x, y) -> (b, g, r)."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up, positive height
        row = bytearray()
        for x in range(width):
            row += bytes(pixel_fn(x, y))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return hdr + info + pix


def test_media_dhash_real_decode_distances(spark):
    """r9 perceptual dHash over real decoded pixels: a one-block edit of a
    gradient image lands within the q133 Hamming ball, an unrelated image
    far outside it — computed through mapInPandas over Arrow batches."""
    from csv_loader_spark.ops.multimodal import media_dhash

    grad = lambda x, y: (x * 7 % 251, x * 7 % 251, x * 7 % 251)

    def grad_edited(x, y):
        # brighten one interior block: flips at most a couple of bits
        if 10 <= x < 14 and 10 <= y < 14:
            return (255, 255, 255)
        return grad(x, y)

    rnd = lambda x, y: ((x * 37 + y * 91) % 256,) * 3
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_make_bmp_fn(36, 32, grad)), 36, 32, 0),
            (2, "image", bytearray(_make_bmp_fn(36, 32, grad_edited)), 36, 32, 0),
            (3, "image", bytearray(_make_bmp_fn(36, 32, rnd)), 36, 32, 0),
        ],
        "doc_id long, media_type string, payload binary, width int, height int, duration_ms int",
    )
    sigs = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in media_dhash(media).collect()}

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert ham(sigs[1], sigs[2]) <= 3     # near-identical: inside the q133 ball
    assert ham(sigs[1], sigs[3]) > 10     # unrelated content: far outside
    assert ham(sigs[1], sigs[1]) == 0


def test_media_dhash_pseudo_tier_is_stable(spark):
    """Non-image bytes fall to the deterministic byte-sampling tier —
    stable signatures, no error, identical bytes => identical bands."""
    from csv_loader_spark.ops.multimodal import media_dhash

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(b"not an image " * 40), 0, 0, 0),
            (2, "audio", bytearray(b"not an image " * 40), 0, 0, 0),
        ],
        "doc_id long, media_type string, payload binary, width int, height int, duration_ms int",
    )
    sigs = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in media_dhash(media).collect()}
    assert sigs[1] == sigs[2]


def test_media_dhash_pseudo_tier_matches_engine_side_sigs(spark):
    """The decoder-side pseudo tier and q133's engine-side Catalyst
    signatures must be BIT-IDENTICAL on ASCII payloads (same fractional
    sample positions, byte == codepoint) — so one banded index can mix
    signatures from both paths."""
    from csv_loader_spark.ops.multimodal import attach_fake_media, media_dhash
    from csv_loader_spark.queries.llm8 import dhash_sigs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 4),
            (2, "completely different text about query planning " * 3),
        ],
        "doc_id long, text string",
    )
    engine = {
        r["doc_id"]: (r["v0"], r["v1"], r["v2"], r["v3"])
        for r in dhash_sigs(docs).collect()
    }
    decoder = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in media_dhash(attach_fake_media(docs)).collect()
    }
    assert engine == decoder


def test_wav_parse_rejects_malformed_and_roundtrips(spark):
    """Real RIFF walk: truncated/garbage payloads surface parse_ok=false;
    genuine WAV bytes decode to the synthesized parameters."""
    from csv_loader_spark.ops.multimodal import (
        _synth_wav_bytes,
        audio_features,
        parse_wav,
        synth_wav_params,
    )

    assert parse_wav(b"not a wav") is None
    assert parse_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    good = _synth_wav_bytes(13)
    assert parse_wav(good[:30]) is None  # truncated data chunk -> no data
    media = spark.createDataFrame(
        [(13, bytearray(good)), (14, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(media).collect()}
    n, half, amp = synth_wav_params(13)
    ok = rows[13]
    assert ok["parse_ok"] and ok["sr"] == 8000 and ok["n_samples"] == n
    assert ok["rms"] == float(amp) and ok["peak"] == amp
    assert ok["zero_crossings"] == (n - 1) // half
    assert rows[14]["parse_ok"] is False and rows[14]["sr"] is None


def test_wavdir_source_reads_lake_and_feeds_features(spark, tmp_path):
    """spark.read.format('wavdir'): executor-side header parse, numeric
    stems become doc_ids, malformed files surface as parse_ok=false rows,
    and the payloads feed audio_features to the synthesized closed forms."""
    from csv_loader_spark.io import wav_source
    from csv_loader_spark.ops.multimodal import (
        _synth_wav_bytes,
        audio_features,
        synth_wav_params,
    )

    lake = tmp_path / "lake"
    lake.mkdir()
    for doc_id in (3, 17):
        (lake / f"{doc_id}.wav").write_bytes(_synth_wav_bytes(doc_id))
    (lake / "broken.wav").write_bytes(b"RIFFxxxxWAVEgarbage")
    wav_source.register(spark)
    df = spark.read.format("wavdir").load(str(lake))
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"3.wav", "17.wav", "broken.wav"}
    n3, _, _ = synth_wav_params(3)
    assert rows["3.wav"]["doc_id"] == 3 and rows["3.wav"]["parse_ok"]
    assert rows["3.wav"]["sr"] == 8000 and rows["3.wav"]["n_samples"] == n3
    assert rows["broken.wav"]["parse_ok"] is False
    assert rows["broken.wav"]["doc_id"] is None
    # payloads re-parse downstream: features match the closed forms
    feats = {
        r["doc_id"]: r
        for r in audio_features(
            df.filter("parse_ok").select("doc_id", "payload")
        ).collect()
    }
    for doc_id in (3, 17):
        n, half, amp = synth_wav_params(doc_id)
        r = feats[doc_id]
        assert r["rms"] == float(amp)
        assert r["zero_crossings"] == (n - 1) // half


def test_wavdir_source_rejects_missing_literal_path_driver_side(spark, tmp_path):
    from csv_loader_spark.io import wav_source

    wav_source.register(spark)
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        spark.read.format("wavdir").load(str(tmp_path / "missing.wav")).collect()
    assert "no such file" in str(ei.value)


def test_wavdir_stream_growing_dir_matches_batch_features(spark, tmp_path):
    """The streaming first mile (wav_source.WavDirStreamReader): a
    growing audio lake consumed across two runs sharing one checkpoint —
    run 2 resumes at the committed offset (only new files planned) — and
    the landed feature rows equal the batch path over the same directory
    (stream==batch parity, the pings-chain convention)."""
    from pyspark.sql import functions as F

    from csv_loader_spark.io import wav_source
    from csv_loader_spark.ops.multimodal import _synth_wav_bytes, audio_features

    lake = tmp_path / "lake"
    lake.mkdir()
    for doc_id in (1, 2, 3):
        (lake / f"{doc_id}.wav").write_bytes(_synth_wav_bytes(doc_id))
    (lake / "bad.wav").write_bytes(b"RIFFxxxxWAVEgarbage")
    wav_source.register(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = spark.readStream.format("wavdir").load(str(lake))
        feats = audio_features(
            stream.filter("parse_ok").select("doc_id", "payload")
        )
        q = (
            feats.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _run()
    first = spark.read.parquet(sink)
    assert sorted(r["doc_id"] for r in first.select("doc_id").collect()) == [1, 2, 3]

    # lake grows; a second run on the same checkpoint plans ONLY new files
    for doc_id in (4, 5):
        (lake / f"{doc_id}.wav").write_bytes(_synth_wav_bytes(doc_id))
    _run()

    got = (
        spark.read.parquet(sink)
        .orderBy("doc_id")
        .collect()
    )
    # exactly-once over the growing dir: no re-read of run-1 files
    assert [r["doc_id"] for r in got] == [1, 2, 3, 4, 5]
    batch = (
        audio_features(
            spark.read.format("wavdir")
            .load(str(lake))
            .filter("parse_ok")
            .select("doc_id", "payload")
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
