"""Connected components over similarity pairs — dedup clustering at scale.

Reference analog: community_detection (reference utils/util.py:237-305)
greedily clusters a dense cosine matrix in memory; the distributed version
treats near-dup pairs (from MinHash/SimHash/cosine joins) as edges and finds
connected components, then keeps one representative per component.

Algorithm: iterative min-label propagation (each node adopts the smallest id
in its neighborhood incl. itself) — converges in O(diameter) rounds; dedup
graphs have tiny diameters. Each round is one shuffle (groupBy node).
A production-scale variant would switch to large-star/small-star; this shape
keeps rounds cheap and is exact.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 20, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """pairs: (id_a, id_b) undirected edges -> (id, component) where
    component = min node id reachable. Nodes only in no pair are absent
    (callers union isolated nodes as their own component)."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .withColumnRenamed("a", "id")
        .withColumn("comp", F.least(F.col("comp"), F.col("id")))
        .persist()
    )
    for _ in range(max_iter):
        # propagate: my new label = min(my label, labels of my neighbors)
        neigh = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
            .withColumnRenamed("a", "id")
        )
        # localCheckpoint (not persist): iterative self-joins otherwise nest
        # the plan tree once per round and Catalyst analysis blows up after
        # ~10 rounds (measured: driver OOM on a 13-node path graph). The
        # checkpoint materializes the round AND truncates lineage to a flat
        # scan; labels tables are component-count sized, tiny at any scale.
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("neigh_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # a chain whose graph diameter exceeds max_iter would otherwise be
        # silently split into several components — surface it so callers can
        # raise max_iter (or move to large-star/small-star for O(log d) rounds)
        warnings.warn(
            f"connected_components exited after max_iter={max_iter} rounds "
            f"with {changed} labels still changing; components may be split. "
            "Raise max_iter for graphs with long chains.",
            RuntimeWarning,
            stacklevel=2,
        )
    edges.unpersist()
    return labels.select("id", "comp")


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop all but the smallest-id member of each near-dup component —
    the distributed form of the reference's greedy community pruning."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
