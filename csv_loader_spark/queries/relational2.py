"""Relational operator library, part 2 — round-2 surface widening.

Adds: cross join, EXISTS/NOT EXISTS subqueries, array explode/posexplode,
regexp battery, null handling (nullif/coalesce/null-safe equality),
conditional aggregation, statistical aggregates, sorted collect, date
arithmetic, sliding (hopping) event-time windows.

Same contract as part 1: every query has a DuckDB oracle with identical
column names and identically-rounded floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table, register_views
from csv_loader_spark.queries.registry import query


@query(
    "q43_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           concat(r.r_name, '/', n.n_name) AS pair,
           (r.r_regionkey = n.n_regionkey) AS is_home
    FROM region r CROSS JOIN nation n
    """,
    tags=("join", "cross"),
)
def q43_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two dim tables (125 rows).

    Scale: cross joins are only ever sane when one side is broadcast-small;
    Spark plans this as BroadcastNestedLoopJoin — the right shape. A
    fact×fact cross join would be rejected at review, not optimized.
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select(
        "r_name",
        "n_name",
        F.concat(F.col("r_name"), F.lit("/"), F.col("n_name")).alias("pair"),
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


@query(
    "q44_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("subquery", "exists"),
)
def q44_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS (decorrelated by Catalyst into a
    semi-join + anti-join pair — check the plan: no per-row subquery exec)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        """
    )


@query(
    "q45_explode_tokens",
    oracle="""
    WITH toks AS (
      SELECT p_partkey,
             unnest(string_split(p_name, ' ')) AS token,
             generate_subscripts(string_split(p_name, ' '), 1) AS pos1
      FROM part
    )
    SELECT token,
           count(*) AS n_parts,
           CAST(min(pos1) - 1 AS BIGINT) AS min_pos,
           CAST(max(pos1) - 1 AS BIGINT) AS max_pos,
           round(avg(pos1) - 1, 4) AS avg_pos
    FROM toks
    GROUP BY token
    """,
    tags=("explode", "array"),
)
def q45_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over a split array → per-token position stats (the
    flatten-then-aggregate shape; generation is pipelined, agg shuffles only
    (token, partial-agg) pairs)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "token")
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            F.round(F.avg("pos"), 4).alias("avg_pos"),
        )
    )


@query(
    "q46_regexp",
    oracle=r"""
    SELECT p_partkey, p_name, p_type,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_lower_word,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS INTEGER)
             AS n_words
    FROM part
    WHERE regexp_matches(p_type, 'ECONOMY|PROMO')
    """,
    tags=("regexp", "string"),
)
def q46_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp battery: extract / replace-all / match-filter / char-class
    counting — all JVM regex inside codegen, no UDF."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").rlike("ECONOMY|PROMO")
    )
    return p.select(
        "p_partkey",
        "p_name",
        "p_type",
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_lower_word"),
        (F.length(F.regexp_replace("p_name", "[^ ]", "")) + 1)
        .cast("int")
        .alias("n_words"),
    )


@query(
    "q47_null_handling",
    oracle="""
    WITH t AS (
      SELECT l_linestatus,
             nullif(l_returnflag, 'N') AS rf,
             CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS disc
      FROM lineitem
    )
    SELECT l_linestatus,
           count(*) AS n_rows,
           count(rf) AS n_rf_nonnull,
           count(*) - count(rf) AS n_rf_null,
           count(DISTINCT rf) AS n_rf_distinct,
           round(sum(coalesce(disc, 0.0)), 4) AS sum_disc,
           round(avg(disc), 4) AS avg_disc_nonnull,
           CAST(sum(CASE WHEN rf IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_safe_eq
    FROM t
    GROUP BY l_linestatus
    """,
    tags=("null", "agg"),
)
def q47_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics battery: nullif/coalesce, count ignores nulls, avg over
    non-null, null-safe equality (<=>)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_linestatus",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf"),
        F.when(F.col("l_discount") == 0, None).otherwise(F.col("l_discount")).alias(
            "disc"
        ),
    )
    return t.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("rf").alias("n_rf_nonnull"),
        (F.count(F.lit(1)) - F.count("rf")).alias("n_rf_null"),
        F.countDistinct("rf").alias("n_rf_distinct"),
        F.round(F.sum(F.coalesce(F.col("disc"), F.lit(0.0))), 4).alias("sum_disc"),
        F.round(F.avg("disc"), 4).alias("avg_disc_nonnull"),
        F.sum(F.when(F.col("rf").eqNullSafe(F.lit(None)), 1).otherwise(0)).alias(
            "n_null_safe_eq"
        ),
    )


@query(
    "q48_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           round(sum(CASE WHEN o_totalprice > 150000 THEN o_totalprice ELSE 0 END), 2)
             AS big_revenue,
           round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4)
             AS avg_open_price,
           round(100.0 * count(*) FILTER (WHERE o_totalprice > 150000) / count(*), 4)
             AS pct_big
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional"),
)
def q48_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER-style counts, CASE-guarded sum/avg,
    ratio columns — one scan, one shuffle of partial aggregates."""
    o = load_table(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.round(F.sum(F.coalesce(big, F.lit(0.0))), 2).alias("big_revenue"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 4
        ).alias("avg_open_price"),
        F.round(
            100.0 * F.count(F.when(F.col("o_totalprice") > 150000, 1)) / F.count(F.lit(1)),
            4,
        ).alias("pct_big"),
    )


@query(
    "q49_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)  AS sd_qty,
           round(stddev_pop(l_quantity), 4)   AS sdp_qty,
           round(var_samp(l_quantity), 4)     AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS cov_qty_price,
           round(covar_pop(l_discount, l_tax), 4) + 0.0            AS cov_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q49_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar) — Spark's
    single-pass merge-able implementations; identical definitions to the
    oracle, 4dp rounding absorbs accumulation-order noise.

    The sign-capable stats (corr/covar) are normalized with ``+ 0.0`` on
    BOTH engines: DuckDB's round() preserves IEEE negative zero while
    Spark's F.round (BigDecimal) yields +0.0, and the driver's stringified
    hash treats "-0.0" != "0.0". Adding +0.0 maps -0.0 -> +0.0 and is an
    exact no-op for every other value (incl. null/NaN)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("sdp_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        (
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)
        ).alias("cov_qty_price"),
        (F.round(F.covar_pop("l_discount", "l_tax"), 4) + F.lit(0.0)).alias(
            "cov_disc_tax"
        ),
    )


@query(
    "q50_collect_sorted",
    oracle="""
    SELECT p_brand,
           array_to_string(list_sort(list_distinct(list(p_size))), ',') AS sizes,
           arg_min(p_name, p_partkey) AS first_part_name,
           arg_max(p_name, p_partkey) AS last_part_name
    FROM part
    GROUP BY p_brand
    """,
    tags=("agg", "collect"),
)
def q50_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array with deterministic ordering (collect_set →
    sort_array → join) + min_by/max_by on a unique key — the portable way to
    make list aggregation order-stable across engines."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("p_size"))).alias("sizes"),
        F.min_by("p_name", "p_partkey").alias("first_part_name"),
        F.max_by("p_name", "p_partkey").alias("last_part_name"),
    )


@query(
    "q51_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sun0,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1998-12-31') AS BIGINT)
             AS days_to_eoy
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("date", "scalar"),
)
def q51_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar battery: extraction, interval add, last_day, trunc,
    datediff. All emitted as formatted strings / ints so both engines hash
    identically regardless of date vs timestamp internal types."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
        F.year(d).cast("int").alias("o_year"),
        F.quarter(d).cast("int").alias("o_quarter"),
        (F.dayofweek(d) - 1).cast("int").alias("dow_sun0"),  # Spark: Sun=1; oracle: Sun=0
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_day"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias(
            "days_to_eoy"
        ),
    )


@query(
    "q52_sliding_window",
    oracle="""
    WITH k AS (SELECT unnest([0, 1, 2]) AS k),
    slid AS (
      -- make_timestamp(µs) keeps the arithmetic timezone-free (to_timestamp
      -- would yield TIMESTAMPTZ and strftime would render session-local)
      SELECT make_timestamp(
               (CAST(floor(epoch(e.ts) / 7200) AS BIGINT) - k.k) * 7200 * 1000000)
               AS window_start,
             e.value
      FROM events e CROSS JOIN k
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM slid
    GROUP BY 1
    """,
    tags=("window_time", "sliding", "agg"),
)
def q52_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time window: 6-hour windows every 2 hours —
    each event lands in exactly 3 windows (F.window handles the replication;
    the oracle reconstructs it arithmetically: starts k*2h back from the
    event's 2h bucket, k=0..2)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "sum_value",
        )
    )
