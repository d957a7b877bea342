"""Dump the q160/q212 EDGE-BUILD subplans for plans/r16.

The full-query dumps show `Scan ExistingRDD` leaves where the edge prep
sits below a localCheckpoint, so (as in r15) the pre-checkpoint subtree
is dumped separately. Run with PYTHONPATH pointing at the tree whose
shape is wanted:

  PYTHONPATH=/root/wt_r15 python tools/dump_r16_edge_plans.py plans/r16 before
  PYTHONPATH=/root/repo  python tools/dump_r16_edge_plans.py plans/r16 after

`before` reproduces the r15 tree's edge prep (q160: distinct ->
explode_both_directions -> the repartition("src") pagerank applies
internally before its checkpoint; q212: join -> distinct); `after`
reproduces HEAD's (q160: symmetrized_dedup_edges, whose output pagerank
checkpoints as-is under pre_partitioned=True; q212: repartition("cu")
-> dropDuplicates).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def main() -> None:
    out_dir, mode = sys.argv[1], sys.argv[2]
    assert mode in ("before", "after")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from csv_loader_spark.io.tables import load_table
    from csv_loader_spark.session import get_spark

    spark = get_spark("dump_r16_edge_plans")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")

    # --- q160 edge prep (symmetrized trade graph) ---
    raw160 = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("cu"),
        (F.col("l_suppkey") * 2 + 1).alias("su"),
    )
    if mode == "before":
        from csv_loader_spark.ops.graph import explode_both_directions

        e160 = explode_both_directions(raw160.distinct(), "cu", "su").select(
            F.col("src"), F.col("dst")
        ).repartition("src")
    else:
        from csv_loader_spark.ops.graph import symmetrized_dedup_edges

        e160 = symmetrized_dedup_edges(raw160, "cu", "su")

    # --- q212 edge prep (bipartite cu-su pairs) ---
    raw212 = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_custkey").alias("cu"), F.col("l_suppkey").alias("su")
    )
    if mode == "before":
        p212 = raw212.distinct()
    else:
        p212 = raw212.repartition("cu").dropDuplicates(["cu", "su"])

    for name, df in (("q160_edge_build", e160), ("q212_edge_build", p212)):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{mode}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({mode}) — explain(formatted) @ {sf_dir}\n")
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
