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
    # ONE materialization of the edge frame (r10): every propagation
    # round joins against `both`, and the caller's edge plan may be
    # expensive (q143 feeds the prefix-filtered Jaccard join here) —
    # without the checkpoint Spark re-executes that whole plan per round
    # (measured 7.5 s for a 477-node graph at sf0.1; ~2.5 s after).
    # Checkpoint BEFORE the union: the two union branches would otherwise
    # each materialize the edge plan once.
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=False
    )
    both = e0.unionAll(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # seed with the 1-hop neighborhood min (node vs its neighbors) — this
    # IS round one's result, computed with one aggregation instead of a
    # join round
    labels = (
        both.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
        .select(F.col("a").alias("node"), "label")
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
            # truncate lineage each round; LAZY so the convergence sum
            # below is the round's ONE job (materializes the blocks as a
            # side effect) instead of a checkpoint job plus a sum job
            .localCheckpoint(eager=False)
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
