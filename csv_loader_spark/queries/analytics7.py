"""r15 statistical batch: rank-correlation and categorical-association
operators over bounded value domains.

- q250: Kendall's tau-b rank correlation — Kendall 1938 ("A new measure
  of rank correlation"); the tau-b tie correction follows Kendall 1945.
  The pair counts come from the JOINT HISTOGRAM: concordant/discordant
  pairs are sums of c_a*c_b over ordered CELL pairs, so the quadratic
  pair space is |X-domain| x |Y-domain| cells squared — constant in the
  fact-table size — instead of n^2 rows (the q246/q247 two-level
  value-domain convention taken one step further).
- q251: Cramér's V association between two categorical columns —
  Cramér 1946 ch. 21. Chi-square over the r x c contingency grid with
  exact integer numerators and the q244 ordered-fold convention for the
  cross-cell float sum.

Determinism contract (CLAUDE.md): every statistic is assembled from
exact integer / DECIMAL(38,0) sufficient statistics; floats appear only
in final scalar expressions whose operation order mirrors the oracle
term by term, and any cross-group float summation is an ordered fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import query

# --- q250: Kendall tau-b between quantity and discount, per return flag -----


@query(
    "q250_kendall_tau",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_discount * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    h AS (
      SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY flag, x, y
    ),
    cd AS (
      SELECT a.flag,
             sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c
                      ELSE 0 END) AS cc,
             sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c
                      ELSE 0 END) AS dd
      FROM h a JOIN h b ON a.flag = b.flag AND a.x < b.x
      GROUP BY a.flag
    ),
    mx AS (
      SELECT flag, sum(CAST(tx AS HUGEINT) * (tx - 1)) AS m1
      FROM (SELECT flag, x, CAST(sum(c) AS BIGINT) AS tx
            FROM h GROUP BY flag, x) t
      GROUP BY flag
    ),
    my AS (
      SELECT flag, sum(CAST(ty AS HUGEINT) * (ty - 1)) AS m2
      FROM (SELECT flag, y, CAST(sum(c) AS BIGINT) AS ty
            FROM h GROUP BY flag, y) t
      GROUP BY flag
    ),
    nn AS (
      SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY flag
    )
    SELECT nn.flag, n,
           CAST(cc AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           CASE WHEN CAST(n AS HUGEINT) * (n - 1) - m1 > 0
                 AND CAST(n AS HUGEINT) * (n - 1) - m2 > 0 THEN
             round(CAST(2 * (cc - dd) AS DOUBLE)
                   / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - m1 AS DOUBLE)
                          * CAST(CAST(n AS HUGEINT) * (n - 1) - m2
                                 AS DOUBLE)), 4)
           END AS tau_b
    FROM nn JOIN cd ON nn.flag = cd.flag
    JOIN mx ON nn.flag = mx.flag JOIN my ON nn.flag = my.flag
    ORDER BY nn.flag
    """,
    tags=("analytics", "stats", "r15"),
)
def q250_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between line-item quantity and
    discount, per return flag — (flag, n, concordant, discordant, tau_b):
    do larger orders get deeper discounts, with full tie correction?

    tau_b = 2(C − D) / sqrt((n(n−1) − Σtx(tx−1))·(n(n−1) − Σty(ty−1)))
    — the doubled-m form keeps every term integral (no /2 anywhere).
    C and D are sums of c_a·c_b over ordered JOINT-HISTOGRAM cell pairs
    (a.x < b.x, then y compares), so the pair space is the x-domain
    times y-domain squared (~550² here) — CONSTANT in the fact-table
    size; the naive formulation is n² row pairs. Ties in either
    dimension fall out of both C and D and are corrected via the
    marginal tie terms, per Kendall's tau-b definition.

    Exactness: cell counts are BIGINT; C/D/m-terms accumulate in
    DECIMAL(38,0) (HUGEINT in the oracle — products pass 2^63 once
    groups reach ~3e9 rows); tau is one double expression mirroring the
    oracle's operation order. The reported concordant/discordant columns
    are cast to BIGINT for display (exact below ~9e18 pairs; the
    internal arithmetic stays 128-bit regardless).

    Scale: one combinable fact groupBy to the histogram (checkpointed —
    both the self-join sides and three marginal aggregates read it),
    then everything is cell-domain-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    h = (
        li.groupBy("flag", "x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = h.select(
        F.col("flag"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = h.select(
        F.col("flag").alias("flag_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), F.col("c").alias("cb"),
    )
    cd = (
        a.join(b, (a["flag"] == b["flag_b"]) & (a["xa"] < b["xb"]))
        .groupBy("flag")
        .agg(
            F.sum(
                F.when(
                    F.col("ya") < F.col("yb"), dec("ca") * F.col("cb")
                ).otherwise(F.lit(0))
            ).cast("decimal(38,0)").alias("cc"),
            F.sum(
                F.when(
                    F.col("ya") > F.col("yb"), dec("ca") * F.col("cb")
                ).otherwise(F.lit(0))
            ).cast("decimal(38,0)").alias("dd"),
        )
    )
    mx = (
        h.groupBy("flag", "x")
        .agg(F.sum("c").cast("long").alias("tx"))
        .groupBy("flag")
        .agg(
            F.sum(dec("tx") * (F.col("tx") - 1))
            .cast("decimal(38,0)")
            .alias("m1")
        )
    )
    my = (
        h.groupBy("flag", "y")
        .agg(F.sum("c").cast("long").alias("ty"))
        .groupBy("flag")
        .agg(
            F.sum(dec("ty") * (F.col("ty") - 1))
            .cast("decimal(38,0)")
            .alias("m2")
        )
    )
    nn = h.groupBy("flag").agg(F.sum("c").cast("long").alias("n"))
    j = (
        nn.join(cd, "flag").join(mx, "flag").join(my, "flag")
    )
    m0 = (dec("n") * (F.col("n") - 1)).cast("decimal(38,0)")
    den_x = m0 - F.col("m1")
    den_y = m0 - F.col("m2")
    tau = F.when(
        (den_x > 0) & (den_y > 0),
        F.round(
            (2 * (F.col("cc") - F.col("dd"))).cast("double")
            / F.sqrt(den_x.cast("double") * den_y.cast("double")),
            4,
        ),
    )
    return j.select(
        "flag",
        "n",
        F.col("cc").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        tau.alias("tau_b"),
    ).orderBy("flag")


# --- q251: Cramér's V between event type and day-of-week ---------------------


@query(
    "q251_cramers_v",
    oracle="""
    WITH v AS (
      SELECT event_type AS et,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
               AS dow
      FROM events
    ),
    o AS (
      SELECT et, dow, CAST(count(*) AS BIGINT) AS o
      FROM v GROUP BY et, dow
    ),
    rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY et),
    ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY dow),
    nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
    grid AS (
      SELECT rt.et, ct.dow, rt.rt, ct.ct, coalesce(o.o, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN o ON o.et = rt.et AND o.dow = ct.dow
    ),
    terms AS (
      SELECT et, dow,
             CAST(pow(CAST(CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
                           AS DOUBLE), 2)
                  / (CAST(rt AS DOUBLE) * ct * n) AS DOUBLE) AS term
      FROM grid CROSS JOIN nn
    ),
    dims AS (
      SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS r,
             CAST((SELECT count(*) FROM ct) AS BIGINT) AS c
    )
    SELECT r * c AS n_cells, n AS n_events,
           round(list_sum(list_transform(
             list_sort(list(ROW(et, dow, term))), t -> t[3])), 4) AS chi2,
           CASE WHEN least(r, c) > 1 THEN
             round(sqrt(list_sum(list_transform(
                     list_sort(list(ROW(et, dow, term))), t -> t[3]))
                   / (CAST(n AS DOUBLE) * (least(r, c) - 1))), 4)
           END AS cramers_v
    FROM terms CROSS JOIN nn CROSS JOIN dims
    GROUP BY r, c, n
    """,
    tags=("analytics", "stats", "r15"),
)
def q251_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and day-of-week —
    (n_cells, n_events, chi2, cramers_v): does activity mix shift across
    the week? V = sqrt(chi2 / (n·(min(r,c)−1))) over the r×c contingency
    grid, the scale-free companion to q244's goodness-of-fit chi2.

    dow is pure epoch-day arithmetic ((date − 1970-01-01) mod 7) — no
    engine weekday-numbering mismatch (the q243 convention). The grid is
    the CROSS of the observed margins, so structurally-zero cells (a
    type never seen on a weekday) still contribute their expected-count
    term, per the chi-square definition. Per-cell terms carry exact
    128-bit integer numerators (o·n − rt·ct ~ n² passes 2^63 at ~3e9
    events) divided once in double — written as (o·n − rt·ct)²/
    (rt·ct·n) term by term, mirroring the oracle — and the cross-cell
    float sum is the q244 ORDERED FOLD (sort_array → aggregate /
    list_sort → list_sum), so both engines add identical doubles in
    identical order.

    Scale: one combinable fact groupBy to the r×c grid; everything after
    is grid-sized (|event types| × 7)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            % 7
        ).alias("dow"),
    )
    o = (
        ev.groupBy("et", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rt = o.groupBy("et").agg(F.sum("o").cast("long").alias("rt"))
    ct = o.groupBy("dow").agg(F.sum("o").cast("long").alias("ct"))
    nn = o.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        rt.crossJoin(ct)
        .join(o, ["et", "dow"], "left")
        .select(
            "et", "dow", "rt", "ct", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    terms = grid.crossJoin(F.broadcast(nn)).select(
        "et",
        "dow",
        "n",
        (
            F.pow(
                (dec("o") * F.col("n") - dec("rt") * F.col("ct"))
                .cast("double"),
                F.lit(2),
            )
            / (F.col("rt").cast("double") * F.col("ct") * F.col("n"))
        ).alias("term"),
    )
    dims = rt.agg(F.count(F.lit(1)).cast("long").alias("r")).crossJoin(
        ct.agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    folded = terms.groupBy("n").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", "dow", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2_raw")
    )
    out = folded.crossJoin(F.broadcast(dims))
    minrc = F.least(F.col("r"), F.col("c"))
    return out.select(
        (F.col("r") * F.col("c")).alias("n_cells"),
        F.col("n").alias("n_events"),
        F.round(F.col("chi2_raw"), 4).alias("chi2"),
        F.when(
            minrc > 1,
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (F.col("n").cast("double") * (minrc - 1))
                ),
                4,
            ),
        ).alias("cramers_v"),
    )
