"""Extension-dispatch reader + partitioned writer."""

import gzip
import json
import os

import pytest

from csv_loader_spark.io.generic import read_any, write_partitioned


def test_read_csv_json_parquet_orc(spark, tmp_path):
    rows = [(1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "id long, s string")

    csv = str(tmp_path / "t.csv")
    with open(csv, "w") as f:
        f.write("id,s\n" + "".join(f"{i},{s}\n" for i, s in rows))
    jsonl = str(tmp_path / "t.json")
    with open(jsonl, "w") as f:
        for i, s in rows:
            f.write(json.dumps({"id": i, "s": s}) + "\n")
    jgz = str(tmp_path / "t2.json.gz")
    with gzip.open(jgz, "wt") as f:
        for i, s in rows:
            f.write(json.dumps({"id": i, "s": s}) + "\n")
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    orc = str(tmp_path / "t.orc")
    df.write.orc(orc)

    for path in (csv, jsonl, jgz, pq, orc):
        got = sorted(
            (int(r["id"]), r["s"]) for r in read_any(spark, path, schema="id long, s string").collect()
        )
        assert got == rows, path

    with pytest.raises(ValueError):
        read_any(spark, "/tmp/file.xyz")


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en", 10.0), (2, "fr", 20.0), (3, "en", 30.0)],
        "id long, lang string, v double",
    )
    out = str(tmp_path / "out")
    write_partitioned(df, out, ["lang"], sort_within=["id"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=en", "lang=fr"]
    back = spark.read.parquet(out).filter("lang = 'en'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # pruning reaches the scan
    assert back.count() == 2
