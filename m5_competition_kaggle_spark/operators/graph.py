"""Graph operators for dedup-cluster formation.

Near-dup detection (MinHash LSH, SimHash, embedding ANN) emits candidate
PAIRS; turning pairs into duplicate CLUSTERS — so one canonical document
per cluster survives — is a connected-components problem. Implemented as
iterative min-label propagation over DataFrames:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixpoint. Each round is ONE shuffle (join on node id +
map-side-combinable min aggregate); lineage is truncated per round with
``localCheckpoint`` so plans don't grow with the iteration count (on a
cluster, point ``spark.sparkContext.setCheckpointDir`` at durable storage
and swap in ``checkpoint``). Convergence takes O(cluster diameter)
rounds: near-duplicate graphs are locally dense (a cluster of rewrites
of one document), so diameters are small — typically 2-4 rounds. For
adversarially long path graphs, the alternating large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and Beyond")
halves diameters per round; the propagation loop below is the right
default for dedup workloads.

Termination is detected with a 1-row aggregate (sum of labels, which
strictly decreases until the fixpoint) — no driver-side collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id reachable from the node.

    Undirected: edges are symmetrized internally. Isolated nodes (absent
    from ``edges``) are absent from the output — union them in as
    singleton components if the full vertex set matters.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # No dedup of the symmetrized edge list: duplicate edges are harmless
    # under min-aggregation, and skipping the distinct saves a shuffle of
    # the whole edge set.
    sym = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # Fold init + the first propagation round into ONE shuffle: with
    # initial labels = node ids, round 1 is exactly min(self, min nbr).
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("comp").alias("nbr_comp")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
        )
        labels = (
            labels.join(
                nbr_min.select(F.col("a").alias("node"), "min_nbr"),
                "node",
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("min_nbr", "comp")
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    sym.unpersist()
    return labels.select("node", F.col("comp").alias("component"))


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster assignment for near-dup pairs: (doc_id, cluster_id,
    cluster_size, is_canonical) — cluster_id is the minimum member id and
    that member is the canonical survivor; everything else in the cluster
    is droppable. Only clustered docs (size >= 2 by construction) appear.
    """
    from pyspark.sql.window import Window

    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
