"""Golden tests for the 3-format timestamp parse + fractional reconstruction
(CsvLoader.java:237-273 semantics; FIXTURES.md §A1)."""

import pytest
from pyspark.sql import functions as F

from csv_loader_spark.functions.timestamps import parse_time_to_millis

CASES = [
    # format 1: explicit offset
    ("2015-06-01 08:30:15+00", 1433147415000),
    ("2015-06-01 08:30:15+05", 1433129415000),
    ("2015-06-01 08:30:15-0330", 1433160015000),
    ("2015-06-01 08:30:15Z", 1433147415000),
    # format 2: no offset → UTC (documented divergence from JVM-default-TZ)
    ("2015-06-01 08:30:15", 1433147415000),
    # format 3: ISO-8601
    ("2015-06-01T08:30:15Z", 1433147415000),
    ("2015-06-01T08:30:15+02:00", 1433140215000),
    # fractional seconds: snip, parse base, add floor(frac*1000)
    ("2015-06-01 08:30:15.5+00", 1433147415500),
    ("2015-06-01 08:30:15.25Z", 1433147415250),
    ("2015-06-01T08:30:15.123456Z", 1433147415123),
    ("2015-06-01 08:30:15.9999", 1433147415999),
]

BAD = ["not-a-time", "2015-13-45 99:99:99", "", "08:30:15"]


def _parse_all(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["ts"])
    rows = df.select(F.col("ts"), parse_time_to_millis("ts").alias("ms")).collect()
    return {r["ts"]: r["ms"] for r in rows}


def test_golden_formats(spark):
    got = _parse_all(spark, [c[0] for c in CASES])
    for value, expected in CASES:
        assert got[value] == expected, value


@pytest.mark.parametrize("value", [b for b in BAD if b])
def test_unparseable_is_null(spark, value):
    got = _parse_all(spark, [value])
    assert got[value] is None
