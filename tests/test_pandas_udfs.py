"""Vectorized pandas UDF surface (scalar + grouped-agg): the Arrow-batched
extension path for logic the built-ins can't express. These are demos of
the SLOW path done right — numpy over Arrow batches, never per-row Python —
kept out of the oracle-gated library (hot paths there are pure JVM)."""

import math

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def byte_entropy(payload: pd.Series) -> pd.Series:
    """Shannon entropy of each binary payload (bits/byte) — vectorized per
    Arrow batch with numpy bincount."""

    def one(b):
        if b is None or len(b) == 0:
            return 0.0
        counts = np.bincount(np.frombuffer(bytes(b), dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / len(b)
        return float(-(p * np.log2(p)).sum())

    return payload.map(one)


@pandas_udf(DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDF: weight-averaged value per group."""
    return float(np.average(v, weights=w))


def test_scalar_pandas_udf_entropy(spark):
    df = spark.createDataFrame(
        [(1, b"aaaa"), (2, b"ab"), (3, b"")], "id long, payload binary"
    )
    got = {r["id"]: r["e"] for r in df.select("id", byte_entropy("payload").alias("e")).collect()}
    assert got[1] == 0.0  # uniform → zero entropy
    assert math.isclose(got[2], 1.0)  # two equiprobable symbols → 1 bit
    assert got[3] == 0.0


def test_grouped_agg_pandas_udf(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 1.0)],
        "g string, v double, w double",
    )
    got = {
        r["g"]: r["wm"]
        for r in df.groupBy("g").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert math.isclose(got["a"], (10 * 1 + 20 * 3) / 4)
    assert got["b"] == 5.0
    # windowed use of the same UDAF
    from pyspark.sql import Window as W

    w = W.partitionBy("g").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    n = df.select(weighted_mean("v", "w").over(w).alias("wm")).distinct().count()
    assert n == 2
