"""Text-function unit tests (incl. the short-doc shingle guard from ADVICE r1)."""

from pyspark.sql import functions as F

from csv_loader_spark.functions.text import fingerprint, token_count, word_shingles


def test_word_shingles_short_docs_no_crash(spark):
    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",), ("a b c d",)], ["text"]
    )
    rows = df.select(F.col("text"), word_shingles("text", 3).alias("sh")).collect()
    got = {r["text"]: r["sh"] for r in rows}
    assert got[""] == []
    assert got["one"] == []
    assert got["one two"] == []
    assert got["one two three"] == ["one two three"]
    assert got["a b c d"] == ["a b c", "b c d"]


def test_shingles_distinct(spark):
    df = spark.createDataFrame([("x y x y x y",)], ["text"])
    (row,) = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert sorted(row["sh"]) == ["x y x", "y x y"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")], ["i", "text"]
    )
    rows = df.select("i", fingerprint("text").alias("fp")).collect()
    fp = {r["i"]: r["fp"] for r in rows}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_token_count(spark):
    df = spark.createDataFrame([("a  b\tc",)], ["text"])
    assert df.select(token_count("text").alias("n")).collect()[0]["n"] == 3
