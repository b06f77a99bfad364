"""Connected components over similarity pairs — dedup clustering at scale.

Reference analog: community_detection (reference utils/util.py:237-305)
greedily clusters a dense cosine matrix in memory; the distributed version
treats near-dup pairs (from MinHash/SimHash/cosine joins) as edges and finds
connected components, then keeps one representative per component.

Two algorithms, identical output (component = min reachable node id):

- 'star' (default): alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC 2014) — converges in
  O(log d) rounds, the production choice: a path graph of length 10^6 needs
  10^6 propagation rounds but ~20 star rounds. Each round is two
  groupBy(min) shuffles over the shrinking edge set.
- 'propagation': iterative min-label propagation — each node adopts the
  smallest id in its neighborhood incl. itself. One shuffle per round,
  converges in O(diameter) rounds; fine when diameters are known-tiny,
  kept as the parity baseline for the star mode.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "star",
) -> DataFrame:
    """pairs: (id_a, id_b) undirected edges -> (id, component) where
    component = min node id reachable. Nodes in no pair are absent
    (callers union isolated nodes as their own component)."""
    if algorithm == "star":
        return _star_components(pairs, max_iter=max_iter, id_a=id_a, id_b=id_b)
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
    changed = -1  # sentinel: max_iter <= 0 skips the loop body entirely
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
        # raise max_iter or switch to algorithm='star' (O(log d) rounds)
        warnings.warn(
            f"connected_components exited after max_iter={max_iter} rounds "
            f"with {changed if changed >= 0 else 'unknown'} labels still "
            "changing; components may be split. Raise max_iter or use "
            "algorithm='star' for graphs with long chains.",
            RuntimeWarning,
            stacklevel=2,
        )
    edges.unpersist()
    return labels.select("id", "comp")


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical directed form: (u, v) with u > v, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node u connects its STRICTLY LARGER neighbors to
    m(u) = min(N(u) + {u}). Input/output: undirected edge set represented
    symmetrically."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: with edges directed high->low, every node u connects its
    (all <= u) neighbors AND itself to m(u) = min(N(u))."""
    e = _canon(edges)
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    neigh = e.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        neigh.unionByName(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_components(
    pairs: DataFrame, max_iter: int, id_a: str, id_b: str
) -> DataFrame:
    """Alternating large-star/small-star until the edge set is stable: at
    convergence every non-root node holds exactly one edge to its component
    minimum. max_iter here bounds ROUNDS (each O(log d) effective), so the
    default of 20 covers diameters up to ~2^20."""
    raw = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = _canon(raw).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        # localCheckpoint per round: same lineage-truncation requirement as
        # the propagation loop (plan nesting otherwise grows per round)
        after = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        diff = (
            after.exceptAll(edges).limit(1).count()
            + edges.exceptAll(after).limit(1).count()
        )
        edges = after
        if diff == 0:
            converged = True
            break
    if not converged and max_iter > 0:
        # stability is only OBSERVABLE one round after the last change, so
        # a graph whose final change lands exactly on round max_iter would
        # warn spuriously — run one confirming round before warning
        final = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        diff = (
            final.exceptAll(edges).limit(1).count()
            + edges.exceptAll(final).limit(1).count()
        )
        edges = final
        converged = diff == 0
    if not converged:
        warnings.warn(
            f"star connected_components did not stabilize in {max_iter} "
            "rounds; components may be split. Raise max_iter.",
            RuntimeWarning,
            stacklevel=3,
        )
    # edges is now (node -> component min) for every non-root node; roots
    # (the minima) label themselves
    roots = (
        edges.select(F.col("v").alias("id"))
        .distinct()
        .join(edges.select(F.col("u").alias("id")).distinct(), "id", "left_anti")
        .select("id", F.col("id").alias("comp"))
    )
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("comp")).unionByName(
        roots
    )
    # parity with propagation mode: a node whose only pair is a self-loop
    # is dropped by _canon but is still a (singleton) graph member
    self_only = (
        raw.filter(F.col("u") == F.col("v"))
        .select(F.col("u").alias("id"))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("comp"))
    )
    return labels.unionByName(self_only)


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
