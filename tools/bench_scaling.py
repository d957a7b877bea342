"""Scaling-curve evidence for the BASELINE.md floor analysis.

BENCH shows Spark 4-25x slower than DuckDB per query at sf0.1 — the claim
(BASELINE.md) is that the gap is a fixed per-query stage-scheduling floor,
amortized as data grows, not a per-row deficit. This tool MEASURES that:
the same SQL text runs on both engines over the sf0.1 fact tables
multiplied x1/x4/x10 (UNION ALL of the same parquet — same bytes, same
values, no synthesized data), and prints per-engine wall times.

If the floor story is true, Spark's times should grow far slower than the
multiplier (floor-dominated) while DuckDB's grow ~linearly; the ratio
should fall toward (and past) 1 as the multiplier grows.

Usage:  python tools/bench_scaling.py   # one JSON line, plus a table on stderr
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_loader_spark.session import get_spark  # noqa: E402

MULTIPLIERS = (1, 10, 30, 100)

# Same SQL text on both engines (ANSI subset both parse identically).
# Only the FACT side is multiplied — dims stay x1 so join output scales
# linearly with the multiplier, like a real growing fact table.
QUERIES = {
    "scan_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS n
        FROM lineitem_m
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_agg": """
        SELECT o.o_orderpriority,
               round(sum(l.l_extendedprice), 2) AS volume,
               count(*) AS n
        FROM lineitem_m l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_totalprice > 100000
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "window_topk": """
        SELECT *
        FROM (
            SELECT l_orderkey, l_linenumber,
                   row_number() OVER (PARTITION BY l_suppkey
                                      ORDER BY l_extendedprice DESC,
                                               l_orderkey, l_linenumber) AS rnk
            FROM lineitem_m
        ) t
        WHERE rnk = 1
    """,
}


def run_spark(sf_dir: str, m: int) -> dict[str, float]:
    spark = get_spark("bench_scaling")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    fact = li
    for _ in range(m - 1):
        fact = fact.unionAll(li)
    fact.createOrReplaceTempView("lineitem_m")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).createOrReplaceTempView(
        "orders"
    )
    out: dict[str, float] = {}
    for name, sql in QUERIES.items():
        spark.sql(sql).count()  # prime (JIT/codegen/broadcast warm)
        t0 = time.perf_counter()
        spark.sql(sql).count()
        out[name] = round(time.perf_counter() - t0, 4)
    return out


def run_duckdb(sf_dir: str, m: int) -> dict[str, float]:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    li = os.path.join(sf_dir, "lineitem.parquet")
    union = " UNION ALL ".join([f"SELECT * FROM '{li}'"] * m)
    con.execute(f"CREATE VIEW lineitem_m AS {union}")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{os.path.join(sf_dir, 'orders.parquet')}'"
    )
    out: dict[str, float] = {}
    for name, sql in QUERIES.items():
        con.execute(sql).fetchall()  # prime
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out[name] = round(time.perf_counter() - t0, 4)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for m in MULTIPLIERS:
        s = run_spark(sf_dir, m)
        d = run_duckdb(sf_dir, m)
        results[str(m)] = {
            "spark": s,
            "duckdb": d,
            "spark_total": round(sum(s.values()), 4),
            "duckdb_total": round(sum(d.values()), 4),
            "ratio": round(sum(s.values()) / max(sum(d.values()), 1e-9), 2),
        }
        print(
            f"# x{m}: spark={results[str(m)]['spark_total']}s "
            f"duckdb={results[str(m)]['duckdb_total']}s "
            f"ratio={results[str(m)]['ratio']}",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "scaling_curve", "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
