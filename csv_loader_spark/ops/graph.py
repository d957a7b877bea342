"""Iterative graph op: connected components by min-label propagation.

The dedup pipeline's last step: near-dup PAIRS (from MinHash/SimHash/
Jaccard) → duplicate CLUSTERS (keep one doc per component). This is the
canonical iterative DataFrame algorithm — no single SQL expression computes
transitive closure, so we iterate to a fixpoint.

Scale notes:
- each iteration is one shuffle (join on node) + one aggregation; rounds
  needed = graph diameter (near-dup clusters are shallow, ~2-4 rounds);
- ``localCheckpoint`` every round truncates the lineage — without it the
  plan doubles per iteration and the optimizer chokes by round ~10;
- convergence test is a cheap driver-side aggregate (sum of labels is
  monotonically decreasing, so equality == fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iterations: int = 20
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns (node, component) where component = min node id reachable.
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = None
    # max_iterations bounds PROPAGATION rounds; convergence is detected by
    # sum-equality, which needs one extra confirming round after the last
    # change — hence the +1, so a graph converging in exactly
    # max_iterations rounds passes instead of raising spuriously.
    for _ in range(max_iterations + 1):
        neighbor_min = (
            labels.join(both, labels["node"] == both["b"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage each round
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # Rounds needed = graph diameter. Near-dup clusters are shallow
        # (~2-4), so hitting the cap means an adversarial long-chain graph
        # (diameter ≈ n) — returning the unconverged labels would silently
        # MERGE-UNDERCOUNT components, which for a dedup pipeline means
        # keeping duplicates. Fail loudly instead.
        raise RuntimeError(
            f"connected_components still changing after {max_iterations + 1} "
            f"propagation rounds (bound max_iterations={max_iterations} + 1 "
            "confirming round) — the graph's diameter exceeds the bound (a "
            "long-chain structure, not a near-dup cluster shape); raise "
            "max_iterations or pre-contract the chains"
        )
    return labels.select("node", F.col("label").alias("component"))
