"""Analytics operator library, part 2: experiment analysis (Welch
two-sample t-test), multi-touch conversion attribution, and cumulative
unique-user curves.

Public-literature basis:
- q183: Welch 1947 ("The generalization of 'Student's' problem...") —
  the unequal-variance two-sample t statistic and its Satterthwaite
  degrees of freedom, the standard A/B-test readout.
- q184: multi-touch attribution (last-touch / first-touch / linear) —
  the standard marketing-analytics credit models (e.g. Shapley-style
  position models reduce to these on a single channel dimension).
- q185: cumulative distinct users via first-touch reduction: a running
  COUNT(DISTINCT) rewritten as min-date-per-user + running sum — the
  classic incremental form (each user counted exactly once, at their
  first appearance).

Scale notes (100 TB):
- q183 is one map-side-combinable aggregate per (event_type, variant);
  the t statistic is arithmetic over the 10-row stats frame.
- q184's touch↔purchase pairing is a user-keyed equi-join with a time
  band predicate (the q165 interval-join shape): bounded per user, no
  cartesian anywhere; the per-purchase touch census is a window over the
  paired frame, partitioned by purchase.
- q185 reduces the fact to one row per user (min-date aggregate) before
  any window; the running sum runs over the span-bounded day series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q183: Welch two-sample t-test -------------------------------------------


@query(
    "q183_ab_welch_ttest",
    oracle="""
    WITH t AS (
      SELECT event_type, user_id % 2 AS variant, value FROM events
    ),
    s AS (
      SELECT event_type, variant,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS m,
             var_samp(value) AS v
      FROM t GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             a.m AS m_a, b.m AS m_b,
             a.v / a.n + b.v / b.n AS se2,
             a.v / a.n AS qa, b.v / b.n AS qb
      FROM s a JOIN s b ON a.event_type = b.event_type
      WHERE a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n_a, n_b,
           round(m_a, 4) AS mean_a,
           round(m_b, 4) AS mean_b,
           round((m_a - m_b) / sqrt(se2), 4) AS t_stat,
           round(se2 * se2 / (qa * qa / (n_a - 1) + qb * qb / (n_b - 1)), 4)
             AS welch_dof
    FROM w
    """,
    tags=("stats", "experiment", "agg", "r12"),
)
def q183_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch unequal-variance two-sample t-test per event_type between a
    deterministic user split (user_id parity as the assignment hash):
    one combinable (event_type, variant) aggregate of n/mean/var_samp,
    then the t statistic and Satterthwaite dof as arithmetic over the
    10-row stats frame — no second pass over the facts."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.select(
            "event_type", (F.col("user_id") % 2).alias("variant"), "value"
        )
        .groupBy("event_type", "variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = s.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    b = s.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("v").alias("v_b"),
    )
    j = a.join(b, "event_type")
    qa = F.col("v_a") / F.col("n_a")
    qb = F.col("v_b") / F.col("n_b")
    se2 = qa + qb
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            se2 * se2
            / (qa * qa / (F.col("n_a") - 1) + qb * qb / (F.col("n_b") - 1)),
            4,
        ).alias("welch_dof"),
    )


# --- q184: multi-touch conversion attribution --------------------------------

#: attribution lookback window before each purchase.
ATTR_WINDOW_H = 24
ATTR_TOUCH_TYPES = ("click", "view")


@query(
    "q184_multi_touch_attribution",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS touch_id, event_type AS touch_type,
             epoch_us(ts) AS tt
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.purchase_id, t.touch_id, t.touch_type, t.tt
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.tt < p.pt AND t.tt >= p.pt - {ATTR_WINDOW_H} * 3600000000
    ),
    ranked AS (
      SELECT *,
             count(*) OVER (PARTITION BY purchase_id) AS n_touches,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY tt DESC, touch_id) AS r_last,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY tt ASC, touch_id) AS r_first
      FROM pairs
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CASE WHEN r_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_conv,
           CAST(sum(CASE WHEN r_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_conv,
           round(sum(1.0 / n_touches), 4) AS linear_credit
    FROM ranked
    GROUP BY touch_type
    """,
    tags=("attribution", "join", "window", "r12"),
)
def q184_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over a {ATTR_WINDOW_H}h lookback: pair
    every purchase with the user's preceding click/view touches (user-
    keyed equi-join with a time-band predicate — the q165 interval-join
    shape, bounded per user), then credit conversions three ways per
    touch channel: last-touch, first-touch (exact integer winners via
    per-purchase rank windows) and linear (1/n_touches split). The
    windows partition by purchase_id over the already-paired frame."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pt"),
    )
    t = e.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("tt"),
    )
    pairs = p.join(t, "user_id").filter(
        (F.col("tt") < F.col("pt"))
        & (F.col("tt") >= F.col("pt") - ATTR_WINDOW_H * 3_600_000_000)
    )
    w_n = W.partitionBy("purchase_id")
    w_last = W.partitionBy("purchase_id").orderBy(F.col("tt").desc(), "touch_id")
    w_first = W.partitionBy("purchase_id").orderBy(F.col("tt").asc(), "touch_id")
    ranked = (
        pairs.withColumn("n_touches", F.count(F.lit(1)).over(w_n))
        .withColumn("r_last", F.row_number().over(w_last))
        .withColumn("r_first", F.row_number().over(w_first))
    )
    return ranked.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.when(F.col("r_last") == 1, 1).otherwise(0)).alias(
            "last_touch_conv"
        ),
        F.sum(F.when(F.col("r_first") == 1, 1).otherwise(0)).alias(
            "first_touch_conv"
        ),
        F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 4).alias("linear_credit"),
    )


# --- q185: cumulative unique users -------------------------------------------


@query(
    "q185_cumulative_uniques",
    oracle="""
    WITH f AS (
      SELECT user_id, min(epoch_us(ts) // 86400000000) AS first_day
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
      FROM f GROUP BY 1
    )
    SELECT day, n_new,
           CAST(sum(n_new) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM d
    """,
    tags=("window", "distinct", "timeseries", "r12"),
)
def q185_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day WITHOUT a running COUNT(DISTINCT):
    reduce each user to their first epoch-day (one combinable aggregate),
    count first-appearances per day, running-sum the span-bounded day
    series — each user contributes exactly once, so the running sum IS
    the expanding distinct count at a fraction of the cost."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return d.select(
        "day", "n_new", F.sum("n_new").over(w).cast("long").alias("cum_users")
    )
