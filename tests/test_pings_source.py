"""Custom `pings` Python data source: parity with read_pings_raw across
plain/gz/zip inputs, executor-side zip handling (first entry only), one
partition per file, and RFC 4180 edge cases."""

import zipfile

from conftest import write_gzip_csv, write_mixed_csv, write_narrow_csv

from csv_loader_spark.io.pings import project_pings, read_pings_raw
from csv_loader_spark.io.pings_source import (
    PingsDataSource,
    PingsReader,
    register,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pings_source_matches_builtin_reader_plain_and_gz(spark, tmp_path):
    register(spark)
    plain = str(tmp_path / "pings.csv")
    gz = str(tmp_path / "pings.csv.gz")
    write_mixed_csv(plain)
    write_gzip_csv(gz)
    for path in (plain, gz):
        via_source = spark.read.format("pings").load(path)
        via_builtin = read_pings_raw(spark, path)
        assert _rows(via_source) == _rows(via_builtin)
        # the downstream parse chain is shared: projected results agree too
        assert _rows(project_pings(via_source)) == _rows(project_pings(via_builtin))


def test_pings_source_zip_first_entry_only(spark, tmp_path):
    register(spark)
    zpath = str(tmp_path / "archive.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("first.csv", "2015-06-01 08:30:15+00,101,40.7128,-74.0060\n")
        zf.writestr("decoy.csv", "2015-06-01 08:30:15+00,999,0.0,0.0\n")
    rows = _rows(spark.read.format("pings").load(zpath))
    assert len(rows) == 1
    assert rows[0][1] == "101"  # decoy second entry ignored (ref :85-88)


def test_pings_source_one_partition_per_file(spark, tmp_path):
    register(spark)
    d = tmp_path / "landing"
    d.mkdir()
    for i in range(5):
        write_narrow_csv(str(d / f"part{i}.csv"))
    df = spark.read.format("pings").load(str(d))
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 5 * write_narrow_csv(str(tmp_path / "scratch.csv"))


def test_pings_source_rfc4180_quotes_and_ragged(spark, tmp_path):
    register(spark)
    p = tmp_path / "edge.csv"
    p.write_text(
        # doubled-quote escaping, embedded comma + newline, ragged short row,
        # empty field → NULL, >11 fields → extras ignored
        '2015-06-01 08:30:15+00,"id""7","a,b","line1\nline2"\n'
        "2015-06-01 08:30:16+00,8\n"
        "2015-06-01 08:30:17+00,,1.0,2.0\n"
        + "t," + ",".join(str(i) for i in range(15)) + "\n"
    )
    rows = _rows(spark.read.format("pings").load(str(p)))
    assert len(rows) == 4
    by_f0 = {r[0]: r for r in rows}
    assert by_f0["2015-06-01 08:30:15+00"][1] == 'id"7'
    assert by_f0["2015-06-01 08:30:15+00"][2] == "a,b"
    assert by_f0["2015-06-01 08:30:15+00"][3] == "line1\nline2"
    assert by_f0["2015-06-01 08:30:16+00"][2:] == (None,) * 9  # ragged → NULL
    assert by_f0["2015-06-01 08:30:17+00"][1] is None  # empty field → NULL
    assert len(by_f0["t"]) == 11  # extra fields dropped


def test_pings_reader_partition_listing_errors():
    import pytest

    with pytest.raises(ValueError):
        PingsReader({})
    with pytest.raises(FileNotFoundError):
        PingsReader({"path": "/nonexistent/glob*.csv"})
    assert PingsDataSource.name() == "pings"


def test_pings_source_streams_newly_landed_files(spark, tmp_path):
    import time
    import zipfile as zf_mod

    register(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    n1 = write_narrow_csv(str(landing / "a.csv"))

    stream = spark.readStream.format("pings").load(str(landing))
    q = (
        stream.writeStream.format("memory")
        .queryName("pings_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        def wait_rows(n, timeout=60):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if spark.table("pings_stream").count() >= n:
                    return spark.table("pings_stream").count()
                time.sleep(0.5)
            return spark.table("pings_stream").count()

        assert wait_rows(n1) == n1

        # a zip archive lands mid-stream: next batch picks it up,
        # decompressed on the executor; decoy second entry still ignored
        with zf_mod.ZipFile(str(landing / "b.zip"), "w") as zf:
            zf.writestr("data.csv", "2015-06-01 08:30:15+00,777,1.0,2.0\n")
            zf.writestr("decoy.csv", "2015-06-01 08:30:15+00,888,0.0,0.0\n")
        total = wait_rows(n1 + 1)
        assert total == n1 + 1
        vids = {r["_c1"] for r in spark.table("pings_stream").collect()}
        assert "777" in vids and "888" not in vids
    finally:
        q.stop()


# --- property test: RFC 4180 round-trip over the generative space ----------


def test_tokenizer_roundtrip_property(tmp_path):
    """Fields with embedded commas, quotes, newlines, and unicode written by
    Python's RFC 4180 writer must survive _read_ping_file exactly, with the
    documented pad/truncate/empty->None semantics (CsvLoader.java reads
    positionally from commons-csv, which implements the same RFC)."""
    import csv as _csv

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from csv_loader_spark.io.pings_source import N_FIELDS, _read_ping_file

    field = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
        ),
        max_size=12,
    )
    rows = st.lists(
        st.lists(field, min_size=1, max_size=N_FIELDS + 3).filter(
            lambda r: any(f != "" for f in r)  # an all-empty row writes as a
            # bare newline, which RFC readers see as no record at all
        ),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=60, deadline=None)
    @given(rows)
    def _check(data):
        p = tmp_path / "prop.csv"
        with open(p, "w", encoding="utf-8", newline="") as fh:
            _csv.writer(fh).writerows(data)
        got = list(_read_ping_file(str(p)))
        expected = []
        for r in data:
            row = [f if f != "" else None for f in r[:N_FIELDS]]
            row += [None] * (N_FIELDS - len(row))
            expected.append(tuple(row))
        assert got == expected

    _check()
