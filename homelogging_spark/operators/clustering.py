"""Duplicate-cluster assignment: connected components over a near-dup
pair graph.

The last stage of a corpus dedup pipeline: LSH banding + verification
(``operators/dedup.py``) yields *pairs*; keeping one representative per
duplicate *group* requires the transitive closure of those pairs —
connected components. The reference system has no analog (its dedup is
the idempotent append key, SURVEY.md §2.9); this is the training-data
extension tier.

Scale design:

- **Iterative min-label propagation.** Each node starts labeled with its
  own id; every iteration each node takes the minimum label among itself
  and its neighbors. Converges in ``O(graph diameter)`` iterations; the
  fixed point labels every node with the minimum id reachable from it —
  a deterministic cluster id independent of execution order or iteration
  count, which is what makes the operator oracle-checkable.
- **Why simple propagation (not large-star/small-star):** near-duplicate
  components are near-cliques (every member pair was verified above the
  Jaccard threshold), so diameters are tiny (2-4) and the O(log n) star
  contractions would add per-iteration shuffles to save iterations we
  never run. If this engine ever clusters long-chain graphs, swap the
  loop body; the contract stays.
- **Per-iteration cost** is a join of the edge list with the label frame
  (shuffle on node id) + a min-aggregate. The label frame holds only
  nodes that appear in some pair — at a 1% duplicate rate on 1e9 docs
  that is 1e7 rows, not 1e9. ``localCheckpoint`` truncates lineage every
  iteration so the plan does not grow with the iteration count.
- **The driver loop is control flow, not data flow**: the only thing
  crossing to the driver is the one-row "did any label change" count —
  the standard pattern for iterative graph algorithms on Spark (GraphX
  Pregel does the same internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns ``(node, cluster_id)`` where ``cluster_id`` is the minimum
    node id reachable from ``node`` — one row per distinct node that
    appears in ``edges``. Deterministic: the fixed point is a property of
    the graph, not of the schedule.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # Symmetrized edges feed every iteration — materialize once.
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                labels["node"],
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Near-dup components are near-cliques (diameter 2-4); hitting the
        # cap means the graph is not the one this operator is built for —
        # fail loudly rather than return a non-fixed-point labeling.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def assign_dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every document given verified near-dup
    pairs: ``(doc_id, cluster_id, cluster_size, is_canonical)``.

    Docs in no pair are singleton clusters of themselves. The canonical
    representative (the doc a dedup pass keeps) is the minimum id of the
    cluster — stable under re-runs and data order.
    """
    cc = connected_components(pairs, src=pair_a, dst=pair_b)
    out = (
        docs.select(id_col)
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            docs[id_col],
            F.coalesce(F.col("cluster_id"), docs[id_col]).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return (
        out.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
