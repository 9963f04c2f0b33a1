"""Distributed connected components over a pair/edge list.

The end step of every dedup pipeline: near-duplicate PAIRS (from
minhash/simhash/ngram/embedding operators) become duplicate GROUPS, and
each group elects a canonical representative (min id).  The reference's
G2 greedy clustering is its small-scale, tile-local cousin; this is the
corpus-scale version.

Algorithm: iterative min-label propagation (a simplified large-star /
small-star scheme).  Each round every node adopts the smallest label in
its neighborhood (including its own); converged when no label changes.
Rounds = O(log(diameter)) for near-dup graphs (components are tiny —
near-dup relations are almost-cliques), so 3-5 shuffles in practice.
Each round is two hash-shuffles (groupBy on each edge end); AQE
coalesces as labels converge.

The driver-side loop only checks a scalar convergence count per round —
no data is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id of its connected component."""
    # materialize the (possibly expensive) pair pipeline once — the
    # symmetrize-union below references it twice
    edges = edges.localCheckpoint()
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct()
           # localCheckpoint (not persist): iterative algorithms must
           # TRUNCATE lineage each round or the logical plan doubles
           # per iteration — exponential analysis cost and multi-GB
           # plan strings long before any data problem
           .localCheckpoint())
    labels = (sym.select("a").distinct()
              .select(F.col("a").alias("node"), F.col("a").alias("comp"))
              .localCheckpoint())
    for _ in range(max_iter):
        # smallest neighbor label per node
        nbr = (sym.join(labels, sym["b"] == labels["node"])
               .groupBy("a").agg(F.min("comp").alias("nbr_comp")))
        merged = F.least(F.col("comp"),
                         F.coalesce("nbr_comp", F.col("comp")))
        # carry the changed flag instead of re-joining old vs new labels:
        # the convergence check is then a bare sum over the checkpointed
        # frame — one shuffle less per round
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select("node", merged.alias("comp"),
                    (merged != F.col("comp")).cast("int").alias("_chg"))
        ).localCheckpoint()
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_groups(pairs: DataFrame, src: str = "id_a", dst: str = "id_b",
                 max_iter: int = 20) -> DataFrame:
    """Duplicate groups from near-dup pairs: (node, canonical_id,
    group_size); canonical = min id of the component (the row a
    keep-one-per-group pipeline retains)."""
    comp = connected_components(pairs, src, dst, max_iter)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return (comp.join(sizes, on="comp")
            .select("node", F.col("comp").alias("canonical_id"),
                    "group_size"))
