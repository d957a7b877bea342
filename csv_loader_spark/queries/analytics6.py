"""r14 analytics, batch 5 (q246-q249): rank statistics and robust
estimation — Spearman rank correlation, the Mann-Whitney U test,
one-way ANOVA, and winsorized means.

Public-literature basis:
- q246: Spearman 1904 rank correlation, computed as Pearson over
  AVERAGE ranks (the tie-correct form — the 1 − 6Σd²/n(n²−1) shortcut
  is exact only for tie-free data, so it is not used here).
- q247: Mann & Whitney 1947 two-sample U test with the standard
  tie-corrected normal approximation (variance reduced by
  Σ(t³−t)/(N(N−1)) — e.g. Lehmann, "Nonparametrics", ch. 1) — the
  nonparametric complement to q183's Welch t-test and q230's KS.
- q248: Fisher's one-way analysis of variance (classic F = MSB/MSW
  decomposition), next to q183 (two groups) for k > 2 groups.
- q249: winsorized mean (Winsor via Tukey 1962, "The future of data
  analysis") — the robust-center complement to q173's MAD outliers and
  q210's weighted median.

Determinism contract (CLAUDE.md): every statistic is assembled from
EXACT integer sufficient statistics; floats appear only in one final
expression written with identical operation order in the Spark plan and
the DuckDB oracle, rounded to 4dp. Ranks are carried as the exact
integer 2×average-rank (min-rank + max-rank = 2·rank() + tiecount − 1),
so tied data stays integral — no float midranks.

Scale notes (100 TB):
- q246 aggregates the fact table to one row per (brand, part) FIRST
  (one map-side-combinable shuffle); both rank windows then sort the
  part DIMENSION within each brand partition. Per-brand sufficient
  statistics overflow BIGINT only past ~4e4 parts per brand (4n⁴ >
  2^63) — promote rx/ry to DECIMAL(38) sums past that.
- q247 and q249 never window over the fact table: they reduce it to a
  per-(group, value) HISTOGRAM (cents domain — q230's bounded-domain
  convention), and all rank arithmetic runs over cumulative sums of the
  histogram. The oracle keeps the naive row-level rank()/row_number()
  form, proving the histogram algebra equivalent. Fact-sized work is
  one combinable groupBy; the window sorts |distinct values| rows.
  q247's S1 = Σ t1·r2 ≤ 2N² needs DECIMAL(38) past ~2e9 rows/group.
- q248 is one groupBy(priority) plus a grand total — k-bounded, the
  cheapest shape in the file; the k per-group SSB terms are summed by
  the q244 ordered-fold so the float addition order is pinned.

The reference (CsvLoader.java, 274 lines) has no analytics surface;
these extend the beyond-reference operators (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q246: Spearman rank correlation (tie-aware, per brand) -------------------


@query(
    "q246_spearman_brand",
    oracle="""
    WITH px AS (
      SELECT p_brand AS brand, l_partkey AS pk,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY brand, pk
    ),
    r AS (
      SELECT brand,
             2 * rank() OVER (PARTITION BY brand ORDER BY qty)
               + count(*) OVER (PARTITION BY brand, qty) - 1 AS rx,
             2 * rank() OVER (PARTITION BY brand ORDER BY rev)
               + count(*) OVER (PARTITION BY brand, rev) - 1 AS ry
      FROM px
    ),
    s AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy
      FROM r GROUP BY brand
    )
    SELECT brand, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4)
                END AS rho
    FROM s ORDER BY brand
    """,
    tags=("analytics", "stats", "r14"),
)
def q246_spearman_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Spearman rank correlation between each part's total
    shipped quantity and its total revenue — (brand, n, rho): does
    moving more units track earning more, monotonically, per brand?

    Ranks are the exact-integer doubled average rank (2·rank() +
    tie-count − 1 = min-rank + max-rank), so ties need no float
    midranks, and rho is Pearson over those integers: all five
    sufficient sums are exact BIGINT, and the only float is the final
    num/sqrt·sqrt expression, written identically in the oracle and
    rounded to 4dp. Brands whose ranks are constant (zero variance)
    return NULL rho under the same exact-integer guard on both engines.

    Scale: the fact table collapses to one row per (brand, part) in one
    combinable shuffle; the two rank windows sort the part DIMENSION
    within each of the 25 brand partitions. See module scale notes for
    the DECIMAL(38) promotion bound (~4e4 parts/brand)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round("l_quantity").cast("long").alias("qv"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("rv"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    px = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("brand", "l_partkey")
        .agg(
            F.sum("qv").cast("long").alias("qty"),
            F.sum("rv").cast("long").alias("rev"),
        )
    )
    rx = (
        2 * F.rank().over(Window.partitionBy("brand").orderBy("qty"))
        + F.count(F.lit(1)).over(Window.partitionBy("brand", "qty"))
        - 1
    ).cast("long")
    ry = (
        2 * F.rank().over(Window.partitionBy("brand").orderBy("rev"))
        + F.count(F.lit(1)).over(Window.partitionBy("brand", "rev"))
        - 1
    ).cast("long")
    r = px.select("brand", rx.alias("rx"), ry.alias("ry"))
    s = r.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    rho = F.when(
        (dx > 0) & (dy > 0),
        F.round(
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
            4,
        ),
    )
    return s.select("brand", "n", rho.alias("rho")).orderBy("brand")


# --- q247: Mann-Whitney U test (tie-corrected, per ship year) -----------------


@query(
    "q247_mann_whitney",
    oracle="""
    WITH v AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS x
      FROM lineitem WHERE l_returnflag IN ('N', 'R')
    ),
    r AS (
      SELECT yr, flag,
             2 * rank() OVER (PARTITION BY yr ORDER BY x)
               + count(*) OVER (PARTITION BY yr, x) - 1 AS r2
      FROM v
    ),
    t AS (
      SELECT yr, CAST(sum(tc * tc * tc - tc) AS BIGINT) AS ties
      FROM (SELECT yr, CAST(count(*) AS BIGINT) AS tc FROM v GROUP BY yr, x)
      GROUP BY yr
    ),
    s AS (
      SELECT yr,
             CAST(sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN flag = 'R' THEN r2 ELSE 0 END) AS BIGINT)
               AS s1
      FROM r GROUP BY yr
    )
    SELECT s.yr AS ship_year, n1, n2, s1 - n1 * (n1 + 1) AS u2,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 THEN
             round((CAST(s1 - n1 * (n1 + 1) AS DOUBLE)
                    - CAST(n1 * n2 AS DOUBLE))
                   / (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                  / 12.0)
                       * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                          - CAST(ties AS DOUBLE)
                            / (CAST(n1 + n2 AS DOUBLE)
                               * (CAST(n1 + n2 AS DOUBLE) - 1.0))))), 4)
           END AS z
    FROM s JOIN t ON s.yr = t.yr
    ORDER BY ship_year
    """,
    tags=("analytics", "stats", "r14"),
)
def q247_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test per ship YEAR (the inferential companion to
    q234's descriptive rank-sum skew): do returned ('R') line items
    have stochastically different prices than non-returned ('N') ones?
    Output (ship_year, n1, n2, u2, z) where u2 = 2·U_R exactly (the
    doubled U statistic stays integral under average ranks) and z is
    the tie-corrected normal approximation, rounded 4dp.

    The Spark plan never sorts the fact table: it reduces to a
    per-(year, cents) histogram, computes each value's doubled average
    rank from the cumulative count (r2 = 2·cum_before + t + 1 —
    identical to 2·rank() + ties − 1 on rows), and takes S1 = Σ t_R·r2.
    The oracle computes the SAME statistic the naive row-level way
    (rank() over every line item), proving the histogram algebra
    equivalent. Tie correction Σ(t³−t) comes from the same histogram.

    Scale: one combinable fact-table groupBy; the rank window runs over
    the |years|×|distinct cents| histogram (bounded value domain)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("N", "R")
    )
    v = li.select(
        F.year("l_shipdate").cast("long").alias("yr"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_r"),
    )
    h = v.groupBy("yr", "x").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_r").cast("long").alias("t1"),
    )
    wcum = (
        Window.partitionBy("yr")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = h.select(
        "yr",
        "t",
        "t1",
        (
            2 * F.coalesce(F.sum("t").over(wcum), F.lit(0)) + F.col("t") + 1
        ).alias("r2"),
    )
    s = ranked.groupBy("yr").agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * F.col("r2")).cast("long").alias("s1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u2 = F.col("s1") - F.col("n1") * (F.col("n1") + 1)
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1),
        F.round(
            (u2.cast("double") - (F.col("n1") * F.col("n2")).cast("double"))
            / (
                2.0
                * F.sqrt(
                    (n1d * n2d / 12.0)
                    * (
                        (nd + 1.0)
                        - F.col("ties").cast("double") / (nd * (nd - 1.0))
                    )
                )
            ),
            4,
        ),
    )
    return s.select(
        F.col("yr").alias("ship_year"),
        "n1",
        "n2",
        u2.alias("u2"),
        z.alias("z"),
    ).orderBy("ship_year")


# --- q248: one-way ANOVA over order priorities --------------------------------


@query(
    "q248_anova_priority",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS g, CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders
    ),
    pg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS BIGINT) AS s_g
      FROM v GROUP BY g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS q,
             CAST(count(DISTINCT g) AS BIGINT) AS k
      FROM v
    ),
    p AS (
      SELECT list_sum(list_transform(list_sort(list(ROW(g,
               CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                 / CAST(n_g AS DOUBLE)))), r -> r[2])) AS pt
      FROM pg
    )
    SELECT k, n,
           round(((pt - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((CAST(q AS DOUBLE) - pt)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4) AS f_stat,
           round((pt - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE))
                 / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                          / CAST(n AS DOUBLE)), 4) AS eta_sq
    FROM tot, p
    """,
    tags=("analytics", "stats", "r14"),
)
def q248_anova_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order total price (whole dollars, exact BIGINT)
    across the five order priorities — (k, n, f_stat, eta_sq): is any
    priority's mean spend different, and how much variance does
    priority explain? F = ((P − S²/N)/(k−1)) / ((Q − P)/(N−k)) with
    P = Σ_g S_g²/n_g; all of n_g, S_g, N, S, Q are exact integers
    (dollar grain keeps Q = Σx² inside BIGINT to ~1e9 orders), and the
    k per-group float terms are summed by the q244 ordered fold so both
    engines add identical doubles in identical order.

    Scale: one combinable groupBy(priority) over the orders table plus
    one grand aggregate — k-bounded state, no window, no join on the
    fact side (the k-row fold array is trivially small)."""
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round("o_totalprice").cast("long").alias("x"),
    )
    pg = v.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
    )
    tot = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
        F.countDistinct("g").cast("long").alias("k"),
    )
    term = (
        F.col("s_g").cast("double")
        * F.col("s_g").cast("double")
        / F.col("n_g").cast("double")
    )
    p = pg.select("g", term.alias("term")).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("g", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("pt")
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    grand = F.col("s").cast("double") * F.col("s").cast("double") / nd
    qd = F.col("q").cast("double")
    f_stat = ((F.col("pt") - grand) / (kd - 1.0)) / ((qd - F.col("pt")) / (nd - kd))
    eta_sq = (F.col("pt") - grand) / (qd - grand)
    return tot.crossJoin(F.broadcast(p)).select(
        "k",
        "n",
        F.round(f_stat, 4).alias("f_stat"),
        F.round(eta_sq, 4).alias("eta_sq"),
    )


# --- q249: winsorized mean per return flag ------------------------------------


@query(
    "q249_winsorized_mean",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS x
      FROM lineitem
    ),
    r AS (
      SELECT flag, x,
             row_number() OVER (PARTITION BY flag ORDER BY x) AS rn,
             count(*) OVER (PARTITION BY flag) AS nn
      FROM v
    ),
    b AS (
      SELECT flag, CAST(max(nn) AS BIGINT) AS n,
             CAST(max(CASE WHEN rn = (5 * nn + 99) // 100 THEN x END)
                  AS BIGINT) AS lo,
             CAST(max(CASE WHEN rn = (95 * nn + 99) // 100 THEN x END)
                  AS BIGINT) AS hi
      FROM r GROUP BY flag
    )
    SELECT v.flag AS flag, CAST(max(n) AS BIGINT) AS n,
           CAST(max(lo) AS BIGINT) AS lo, CAST(max(hi) AS BIGINT) AS hi,
           CAST(sum(least(greatest(x, lo), hi)) AS BIGINT) AS wsum,
           round(CAST(sum(least(greatest(x, lo), hi)) AS DOUBLE)
                 / CAST(max(n) AS DOUBLE) / 100.0, 4) AS wmean_dollars
    FROM v JOIN b ON v.flag = b.flag
    GROUP BY v.flag
    ORDER BY flag
    """,
    tags=("analytics", "stats", "r14"),
)
def q249_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean of line-item price per return flag —
    (flag, n, lo, hi, wsum, wmean_dollars): the robust per-segment
    price with tails clamped to the exact p5/p95 order statistics.
    Percentiles are defined EXPLICITLY as the value at rank
    ceil(0.05·n) / ceil(0.95·n) of the sorted cents (no engine
    quantile-interpolation semantics involved); the winsorized sum is
    exact BIGINT cents, and the mean is one rounded division.

    The Spark plan is fully histogram-shaped: the fact table reduces to
    a per-(flag, cents) histogram, the rank bounds come from cumulative
    counts over the value-sorted histogram (value at rank r = least x
    with cum(x) ≥ r — identical to the oracle's row_number pick), and
    the clamped sum is Σ t·clamp(x) over the same histogram. The oracle
    row_number()s every line item, proving the histogram form.

    Scale: one combinable groupBy; window + clamp over the bounded
    cents domain only. Complements q173 (MAD) and q210 (weighted
    median) in the robust-statistics family."""
    v = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
    )
    h = v.groupBy("flag", "x").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("flag")
    hc = h.select(
        "flag",
        "x",
        "t",
        F.sum("t").over(wcum).alias("cum"),
        F.sum("t").over(wall).cast("long").alias("n"),
    )
    lo_rank = F.expr("(5 * n + 99) DIV 100")
    hi_rank = F.expr("(95 * n + 99) DIV 100")
    bounds = hc.groupBy("flag").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= lo_rank, F.col("x"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("x"))).alias("hi"),
    )
    clamped = h.join(F.broadcast(bounds), "flag").select(
        "flag",
        "n",
        "lo",
        "hi",
        (
            F.col("t")
            * F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))
        ).alias("cx"),
    )
    return (
        clamped.groupBy("flag")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lo").cast("long").alias("lo"),
            F.max("hi").cast("long").alias("hi"),
            F.sum("cx").cast("long").alias("wsum"),
        )
        .select(
            "flag",
            "n",
            "lo",
            "hi",
            "wsum",
            F.round(
                F.col("wsum").cast("double") / F.col("n").cast("double") / 100.0,
                4,
            ).alias("wmean_dollars"),
        )
        .orderBy("flag")
    )
