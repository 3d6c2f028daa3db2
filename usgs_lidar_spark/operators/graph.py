"""Connected components over a pair graph — the cluster-collapse step of
a near-duplicate pipeline (pairs -> clusters -> one representative doc).

Not in the reference (its dedup surface is nonexistent; see
operators/dedup.py); this is the north-star extension that turns pairwise
near-dup output into the thing a training-data pipeline actually keeps:
one canonical document per duplicate cluster.

Spark design — iterative min-label propagation:
  * state is (id, label); label converges to the component's min id;
  * one round = propagate labels across edges (equi-join) + min-agg.
    Rounds needed = component diameter, which for near-dup clusters is
    tiny (duplicates of a common source are mutually similar — diameter
    1-3 in practice). `max_iter` bounds pathological chains;
  * every round ends in localCheckpoint(): iterative DataFrame loops
    otherwise stack exponentially-growing lineage, and the convergence
    check re-executes it. On a cluster with a checkpoint dir configured,
    reliable checkpoint() is the drop-in upgrade;
  * convergence = zero labels changed (one count() action per round —
    the driver only sees a scalar, never the data);
  * the edge list is made undirected + distinct once, up front.

The alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond") drops round count to
O(log n) for high-diameter graphs; min-label propagation is chosen here
because dedup graphs are shallow and each round is a single cheap
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable through
    `edges` (undirected). Output: (id, cluster_id).

    Vertices absent from the edge list keep themselves as cluster_id
    (singleton clusters), so the output has exactly one row per vertex.
    """
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )
    fwd = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    rev = edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    bidir = fwd.union(rev).distinct().localCheckpoint()

    for _ in range(max_iter):
        msgs = bidir.join(labels, bidir["u"] == labels["id"]).select(
            F.col("v").alias("id"), "label"
        )
        new_labels = (
            labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def collapse_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup cluster collapse: every document labeled with its cluster
    representative (min doc id in its connected component), plus the
    cluster size. Output: (doc_id, cluster_id, cluster_size, is_kept) —
    `is_kept` marks the representative row a dedup pipeline retains."""
    cc = connected_components(
        docs.select(F.col(id_col)), pairs,
        id_col=id_col, src_col=pair_a, dst_col=pair_b, max_iter=max_iter,
    ).withColumnRenamed("id", id_col)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "cluster_size",
            (F.col(id_col) == F.col("cluster_id")).alias("is_kept"),
        )
    )
