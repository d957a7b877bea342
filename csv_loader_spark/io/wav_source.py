"""`wavdir` — a Spark 4 Python Data Source over a directory of WAV files.

The multimodal ingestion story's missing first mile: `ops/multimodal.py`
processes audio that is already IN a DataFrame; this source puts it
there from an audio lake. Each file is one `InputPartition` (audio files
are unsplittable), read and header-parsed EXECUTOR-side with the same
chunk-walking RIFF parser the feature stage uses (`parse_wav`) — the
driver only lists the directory.

Row schema: (path, doc_id, payload, parse_ok, sr, n_samples).
``doc_id`` comes from a numeric filename stem (the lake convention used
by the synthesizer; NULL otherwise); ``payload`` carries the raw bytes
so downstream stages (audio_features, frame samplers) re-parse from the
source of truth; ``parse_ok/sr/n_samples`` surface malformed files as
queryable rows instead of job failures — the reject-capture convention
of io/pings.py (op 8).

Scale: parallelism = file count; header parse is O(chunk list) per
file. For millions of tiny files, compact into larger containers
upstream (the standard small-files remedy) — the source itself stays
one-file-one-partition.
"""

from __future__ import annotations

import glob as globlib
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

WAV_ROW_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("sr", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


@dataclass
class WavFilePartition(InputPartition):
    path: str


def _list_wavs(path: str, allow_empty: bool = False) -> list[str]:
    """``allow_empty`` is the STREAMING contract: an empty (or not yet
    created) directory is a stream with no data yet, not an error."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(".wav")
        )
    elif any(ch in path for ch in "*?["):
        files = sorted(
            f
            for f in globlib.glob(path)
            if os.path.isfile(f) and f.lower().endswith(".wav")
        )
    else:
        if not os.path.isfile(path):
            if allow_empty:
                return []
            # fail DRIVER-side at load time, not executor-side mid-job
            raise FileNotFoundError(f"wavdir source: no such file {path!r}")
        files = [path]
    if not files and not allow_empty:
        raise FileNotFoundError(f"wavdir source: no .wav files at {path!r}")
    return files


def _read_wav_file(path: str) -> Iterator[tuple]:
    from csv_loader_spark.ops.multimodal import parse_wav

    with open(path, "rb") as f:
        payload = f.read()
    stem = os.path.splitext(os.path.basename(path))[0]
    doc_id = int(stem) if stem.isdigit() else None
    parsed = parse_wav(payload)
    if parsed is None:
        yield (path, doc_id, payload, False, None, None)
    else:
        sr, samples = parsed
        yield (path, doc_id, payload, True, int(sr), int(len(samples)))


class WavDirReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wavdir source requires a path: .load(<path>)")
        self._files = _list_wavs(path)

    def partitions(self) -> Sequence[InputPartition]:
        return [WavFilePartition(p) for p in self._files]

    def read(self, partition: WavFilePartition) -> Iterator[tuple]:
        yield from _read_wav_file(partition.path)


class WavDirStreamReader(DataSourceStreamReader):
    """File-discovery micro-batching over the audio lake: the streaming
    twin of ``WavDirReader`` (Structured Streaming's FileStreamSource
    pattern, expressed through the Spark 4 Python streaming source API).

    Offsets are the sorted listing of files seen so far — an explicit,
    replayable watermark over the directory: ``latestOffset`` re-lists
    the directory each trigger (one driver-side LIST, same cost as the
    batch load), ``partitions(start, end)`` plans exactly the files in
    ``end`` minus ``start`` (one unsplittable file per partition, parsed
    executor-side), and the checkpointed offset makes restarts resume at
    the first unprocessed file. Two triggers with no new files produce
    equal offsets, so Spark plans no batch. The offset grows with the
    lifetime file count — the same bound as Spark's own file-source
    seen-map; compact upstream for million-file lakes (module docstring).
    Late/duplicate delivery: a file REPLACED in place after its batch
    committed is not re-read (listing is by name, not mtime) — the lake
    convention is immutable, uniquely-named drops, exactly like a landed
    parquet directory."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wavdir source requires a path: .load(<path>)")
        self._path = path

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": _list_wavs(self._path, allow_empty=True)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        seen = set(start.get("files", []))
        return [
            WavFilePartition(p)
            for p in end.get("files", [])
            if p not in seen
        ]

    def read(self, partition: WavFilePartition) -> Iterator[tuple]:
        yield from _read_wav_file(partition.path)

    def commit(self, end: dict) -> None:
        # the checkpoint's offset log is the durability mechanism; files
        # are immutable in the lake, so nothing to clean up per-batch
        pass


class WavDirDataSource(DataSource):
    """spark.read.format("wavdir").load(dir_or_glob) after register();
    spark.readStream.format("wavdir").load(dir) for the streaming first
    mile (file-discovery triggers, checkpointed resume)."""

    @classmethod
    def name(cls) -> str:
        return "wavdir"

    def schema(self):
        return WAV_ROW_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WavDirReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return WavDirStreamReader(dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the `wavdir` format on a session."""
    spark.dataSource.register(WavDirDataSource)
