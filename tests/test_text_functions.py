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


def test_char_ngram_short_doc_parity_with_duckdb(spark):
    """q82's index arithmetic at the boundary: a doc of exactly 4 chars must
    yield exactly one 4-gram on BOTH engines, and 5/6-char docs the full
    sliding set including the final gram (the r3 verdict found both engines
    dropped the last gram, diverging 1-vs-0 at length==4)."""
    import duckdb

    docs = [(1, "abcd"), (2, "abcde"), (3, "ab cdef"), (4, "abc"), (5, "a  bc")]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    s = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    t = sdf.select("doc_id", s.alias("s")).filter(F.length("s") >= 4)
    grams = F.array_distinct(
        F.expr("transform(sequence(1, length(s) - 3), i -> substr(s, i, 4))")
    )
    got = {
        r["doc_id"]: sorted(r["gs"])
        for r in t.select("doc_id", grams.alias("gs")).collect()
    }
    assert got[1] == ["abcd"]
    assert got[2] == sorted(["abcd", "bcde"])
    assert got[3] == sorted(["ab c", "b cd", " cde", "cdef"])
    assert 4 not in got  # 3 chars: filtered by the length guard
    assert got[5] == ["a bc"]  # whitespace-collapsed to 4 chars -> one gram

    con = duckdb.connect()
    duck = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS s
          FROM (VALUES (1,'abcd'),(2,'abcde'),(3,'ab cdef'),(4,'abc'),(5,'a  bc'))
               AS v(doc_id, text)
        )
        SELECT doc_id,
               list_distinct(list_transform(range(1, length(s) - 2),
                             i -> substr(s, CAST(i AS INTEGER), 4))) AS gs
        FROM t WHERE length(s) >= 4
        """
    ).fetchall()
    duck_got = {doc_id: sorted(gs) for doc_id, gs in duck}
    assert duck_got == got
