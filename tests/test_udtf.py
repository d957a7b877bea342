"""Python UDTF extension surface (Spark 4): a table function usable from SQL
with LATERAL correlation — the reference has no extension points at all
(SURVEY §2.2); this demonstrates ours end to end.

UDTFs are row-at-a-time Python (the slow path) — appropriate for low-volume
generation/expansion, never for the relational hot path (those stay JVM-side
or Arrow-batched; see ops/multimodal.py)."""

from pyspark.sql.functions import lit, udtf


@udtf(returnType="ngram: string, pos: int")
class WordNGrams:
    def eval(self, text: str, n: int):
        toks = (text or "").lower().split()
        for i in range(len(toks) - n + 1):
            yield " ".join(toks[i : i + n]), i


def test_udtf_direct_call(spark):
    rows = WordNGrams(lit("The quick brown fox"), lit(2)).collect()
    assert [(r["ngram"], r["pos"]) for r in rows] == [
        ("the quick", 0),
        ("quick brown", 1),
        ("brown fox", 2),
    ]


def test_udtf_lateral_from_sql(spark):
    spark.udtf.register("word_ngrams", WordNGrams)
    spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "id long, text string"
    ).createOrReplaceTempView("docs")
    rows = spark.sql(
        """
        SELECT d.id, t.ngram, t.pos
        FROM docs d, LATERAL word_ngrams(d.text, 2) t
        ORDER BY d.id, t.pos
        """
    ).collect()
    assert [(r["id"], r["ngram"]) for r in rows] == [
        (1, "a b"),
        (1, "b c"),
        (2, "x y"),
    ]


def test_udtf_short_input_yields_nothing(spark):
    assert WordNGrams(lit("one"), lit(3)).count() == 0
