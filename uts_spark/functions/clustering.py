"""Connected components over near-duplicate pair graphs.

Pair-level dedup (`functions/dedup.py`) emits edges; turning edges into
KEEP/DROP decisions needs the transitive closure — A~B and B~C must land
in ONE cluster even when A~C was never emitted as a pair. The reference
has no graph ops at all (`uts.ts` nowhere iterates); this is a
north-star training-pipeline operator (the dedup stage of every large
corpus build ends with exactly this clustering step).

Algorithm: iterative min-label propagation entirely in DataFrame ops —
each round every node takes the min label over itself and its
neighbors; fixpoint when no label changes. Rounds = graph diameter.
Near-dup graphs are piles of tiny dense cliques (diameter 2-4), so this
beats the large-star/small-star O(log²n) machinery in both rounds and
per-round cost at corpus scale; a ``max_rounds`` guard fails loudly on
pathological chain graphs instead of looping forever.

Scale notes (100 TB story):
- per round: ONE shuffle (the groupBy on node); the edge list is
  re-partitioned once up front and reused every round;
- ``localCheckpoint`` truncates the lineage each round so the plan does
  not grow (iteration N would otherwise replay rounds 1..N-1);
- convergence check rides the same aggregation (max(changed)) — no
  extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Label each node of the undirected graph with the smallest node id
    reachable from it (the canonical component id).

    ``edges`` is one row per undirected edge; isolated nodes may simply
    be absent (callers union them back with label = own id). Returns
    ``(node, component)``.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("component"))
        .withColumn("component", F.least("component", "node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # neighbor labels flow along edges; keep own label in the pool
        msgs = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "component")
        new_labels = (
            msgs.union(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(graph diameter exceeds the guard — raise max_rounds)"
    )


def cluster_assignment(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Full dedup verdict: every id from ``all_ids`` mapped to its
    near-dup cluster (singletons cluster with themselves) with the
    KEEP/DROP bit — keep exactly the minimum id of each cluster."""
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        all_ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("cluster_id"),
            (F.coalesce("component", "node") == F.col("node")).alias("keep"),
        )
    )
