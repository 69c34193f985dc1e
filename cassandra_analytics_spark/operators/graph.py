"""Distributed connected components for near-dup cluster resolution.

Near-dup detection (MinHash/SimHash/Jaccard — ``operators/dedup.py``)
emits *pairs*; turning pairs into a deduplicated corpus needs the
transitive closure: if a~b and b~c, then {a,b,c} is ONE duplicate
cluster and exactly one representative should survive. The one-pass
"drop every greater id" heuristic (``dedup_keep_representatives``)
under-merges exactly when chains overlap — edges (a,c),(b,c) keep both a
and b even though a,b,c are one component.

``connected_components`` is iterative min-label propagation expressed in
DataFrame ops (the GraphX/Pregel pattern without GraphX): every node
repeatedly adopts the smallest label among itself and its neighbors.

Scale posture (100 TB corpus, billions of candidate edges):
* per round: one shuffle join (labels ⋈ symmetric edges, keyed on node
  id — maximum-cardinality, uniform) + one min-aggregate. No collect;
  the driver only sees a one-row convergence count.
* rounds = graph diameter. Dup clusters are near-cliques (diameter ≤
  2-3 in practice), so the loop converges in a handful of rounds; the
  ``max_iter`` guard bounds pathological chains. (The O(log n)
  large-star/small-star variant of Kiveris et al. drops in here if
  diameters ever grow — same join/agg building blocks.)
* ``localCheckpoint`` each round truncates lineage, keeping plan size
  and task-serialization cost constant across iterations.

Non-goal: the reference has no graph operators (SURVEY §2.3); this
belongs to the north-star training-data pipeline set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every non-NULL node appearing in ``edges``;
    component = the smallest node id in the connected component.

    A NULL endpoint identifies no node: the edge still registers its
    non-NULL side (as a singleton unless other edges connect it), but no
    ``(NULL, …)`` row reaches the output — NULL never propagates labels
    (joins skip it), so it used to linger as a phantom row that crashed
    downstream sorts (round-8 probe pass)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    # max_iter PRODUCTIVE rounds plus one certification round: a graph
    # that finishes its last label update exactly on round max_iter is
    # converged, but only a subsequent zero-change round can certify it —
    # without the +1, that caller would be rejected despite a correct
    # labeling (/code-review r7).
    for _ in range(max_iter + 1):
        msgs = sym.join(
            labels.withColumnRenamed("id", "u"), "u"
        ).select(F.col("v").alias("id"), "component")
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.withColumnRenamed("component", "old")
            .join(new_labels, "id")
            .filter(F.col("old") != F.col("component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Partially-propagated labels are silently WRONG (two docs in one
        # real component carry different labels — the dedup keeps both).
        # Dup clusters are near-cliques so hitting the cap means either a
        # pathological chain graph or a caller-lowered max_iter; fail
        # loudly rather than return an under-merged clustering (round-7
        # hostile pass over the cluster-resolution layer).
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds ({changed} labels still changing): the "
            "graph's diameter exceeds the iteration cap. Raise max_iter "
            "(rounds = diameter for min-label propagation) or switch to "
            "a large-star/small-star scheme for long-chain graphs."
        )
    return labels.filter(F.col("id").isNotNull())


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Assign every row of ``df`` its duplicate-cluster id (transitive
    closure of ``pairs``); rows in no pair form singleton clusters."""
    comps = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    return df.join(comps, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )


def keep_cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """One representative (smallest id) per duplicate cluster — the
    transitively-correct version of ``dedup_keep_representatives``."""
    clustered = dedup_clusters(df, pairs, id_col=id_col, src=src, dst=dst)
    return clustered.filter(F.col(id_col) == F.col("component")).drop("component")
