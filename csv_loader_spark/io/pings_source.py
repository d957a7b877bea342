"""`pings` — a Spark 4 Python Data Source for the reference's ping files.

Why it exists: `read_pings_raw` (io/pings.py) matches the reference's
source semantics (plain / .gz / .zip-first-entry, CsvLoader.java:84-91)
but has to stage .zip archives DRIVER-side, because Hadoop has no zip
codec — the one place the ingest chain doesn't distribute. This data
source moves that work to the EXECUTORS: each input file is one
`InputPartition`, and the zip/gzip decompression + RFC 4180 tokenization
run inside the partition read, so a 10,000-archive landing zone fans out
across the cluster instead of serializing through the driver.

Spark-first shape: implemented on the public
`pyspark.sql.datasource.DataSource` API (Spark 4's Python data source
surface — Arrow-batched, no py4j per row). It emits the same raw
11-string-column schema as `read_pings_raw`, so the whole downstream
parse chain (`project_pings` → ops 6-10) is shared verbatim — one parse
chain, two physical sources.

Semantics parity with the reference / read_pings_raw:
- suffix dispatch is case-insensitive (.gz / .zip / plain);
- .zip reads ONLY the first central-directory entry (CsvLoader.java:85-88);
- RFC 4180 via Python's csv module: doubled-quote escaping and quoted
  embedded newlines (commons-csv behavior) — the multiline=False scan
  switch is unnecessary here because files are per-partition anyway;
- empty fields and absent trailing fields surface as NULL, matching
  Spark csv's PERMISSIVE nullValue="" behavior;
- extra fields beyond 11 are ignored (positional projection never reads
  past f10).

Scale notes: parallelism = number of files (gz/zip are inherently
unsplittable, same as the reference); for a few huge PLAIN files prefer
`read_pings_raw(multiline=False)`, which byte-splits. Python-side
tokenization costs more per row than the JVM csv reader — this source
wins when file count ≥ cores or when the input is zip.
"""

from __future__ import annotations

import csv
import glob as globlib
import gzip
import io
import os
import zipfile
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from csv_loader_spark.io.pings import RAW_SCHEMA

N_FIELDS = 11


@dataclass
class PingFilePartition(InputPartition):
    path: str


def _list_input_files(path: str) -> list[str]:
    """Expand a file / directory / glob into a sorted file list (driver)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
    elif any(ch in path for ch in "*?["):
        files = sorted(f for f in globlib.glob(path) if os.path.isfile(f))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"pings source: no input files at {path!r}")
    return files


def _open_text(path: str) -> io.TextIOBase:
    """Suffix-dispatched text stream; runs on the executor."""
    lower = path.lower()
    if lower.endswith(".zip"):
        zf = zipfile.ZipFile(path)
        names = zf.namelist()  # central-directory order == Java's entries()
        if not names:
            raise ValueError(f"zip archive has no entries: {path}")
        # Only the first entry, streamed (never materialized to disk).
        return io.TextIOWrapper(zf.open(names[0]), encoding="utf-8", newline="")
    if lower.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8", newline="")
    return open(path, encoding="utf-8", newline="")


def _read_ping_file(path: str) -> Iterator[tuple]:
    """Tokenize one file into padded 11-field tuples; runs on the executor."""
    with _open_text(path) as stream:
        # csv module is RFC 4180 by default: "" escaping inside quoted
        # fields, quoted embedded newlines — commons-csv behavior.
        for rec in csv.reader(stream):
            if not rec:
                continue
            row = [f if f != "" else None for f in rec[:N_FIELDS]]
            row += [None] * (N_FIELDS - len(row))
            yield tuple(row)


class PingsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("pings source requires a path: .load(<path>)")
        self._files = _list_input_files(path)

    def partitions(self) -> Sequence[InputPartition]:
        return [PingFilePartition(p) for p in self._files]

    def read(self, partition: PingFilePartition) -> Iterator[tuple]:
        yield from _read_ping_file(partition.path)


class PingsStreamReader(DataSourceStreamReader):
    """Streaming flavor: discover newly landed ping files per micro-batch.

    Offsets are the sorted list of files already processed — the same
    ledger Spark's own FileStreamSource keeps in its checkpoint (file
    streams are exactly-once at FILE granularity; a file is either fully
    in a batch or not yet seen). A production landing zone would compact
    the ledger by retention age; at the reference's scale (one archive
    per upload) the list is small. Decompression/tokenization still run
    executor-side in :meth:`read`.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("pings source requires a path: .load(<path>)")
        self._path = path

    def _current_files(self) -> list[str]:
        try:
            return _list_input_files(self._path)
        except FileNotFoundError:  # empty dir: stream waits for data
            return []

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": sorted(set(self._current_files()))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        new = sorted(set(end["seen"]) - set(start["seen"]))
        return [PingFilePartition(p) for p in new]

    def read(self, partition: PingFilePartition) -> Iterator[tuple]:
        yield from _read_ping_file(partition.path)

    def commit(self, end: dict) -> None:
        pass


class PingsDataSource(DataSource):
    """spark.read.format("pings").load(path) after register().

    Also streams: spark.readStream.format("pings").load(dir) tails the
    directory for newly landed archives (see PingsStreamReader).
    """

    @classmethod
    def name(cls) -> str:
        return "pings"

    def schema(self):
        return RAW_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return PingsReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return PingsStreamReader(dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the `pings` format on a session."""
    spark.dataSource.register(PingsDataSource)
