"""Distributed connected components (iterative label propagation).

The missing last step of every dedup pipeline: near-dup PAIRS →
duplicate CLUSTERS (pick one canonical doc per component). Exact
groups are trivial (hash equality is transitive) but near-dup
similarity is NOT transitive, so clustering requires a graph traversal.

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round a node takes the min of its label and its
neighbors' labels; fixpoint = components labeled by their min node id.
Each round is two shuffles (labels ⋈ edges, then min-groupBy) — all
DataFrame ops, driver only checks the convergence counter.

Scale notes (billions of edges):
- Rounds needed = graph diameter. Dedup-cluster components are tiny
  and dense (near-clique), so 2-4 rounds suffice; the
  large-star/small-star transformation (Kiveris et al.) is the
  documented upgrade path for long-chain graphs, same join mechanics.
- ``localCheckpoint`` every round truncates the lineage — without it
  the plan doubles per iteration and planning time explodes.
- Labels frame is (node, label): 16 bytes a row, partitioned on node;
  edge frame is re-used as-is each round (cache it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min
    node id reachable. Raises if not converged within max_iter."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    ).localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .select(sym.u.alias("n"), "label")
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.n, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
        ).localCheckpoint()  # truncate lineage every round
        n_changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            sym.unpersist()
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
