"""Connected components: the cluster-assignment step that completes a
near-dedup pipeline (pairs → clusters → one kept representative).

Derivation: the reference dedups nothing (its lake keeps every row);
the training-data generalization — group near-duplicate documents and
keep one per group — needs the transitive closure of the pair relation,
which no single join can express. Implemented as iterative min-label
propagation on DataFrames: each round is one equi-join + one groupBy-min
(both plain hash exchanges), and the round count is the graph diameter,
not the node count. Near-dup graphs have tiny, shallow components, so
convergence is 2-3 rounds in practice; for adversarially deep graphs the
same two primitives compose into the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond") without
changing the storage or shuffle story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odl_etl_spark.operators.materialize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable in the undirected graph.

    Each iteration ``materialize``s the label table: it is read twice
    (convergence test + next round's join) and the plan would otherwise
    double every round — the standard lineage-truncation posture for
    iterative DataFrame algorithms (cut mode is a runtime switch, see
    ``operators/materialize.py``). The loop is driver-side control flow
    only; all data stays distributed.
    """
    # Checkpoint the edge list BEFORE symmetrizing: the union's two
    # branches would otherwise each materialize the (possibly expensive)
    # upstream pair-mining pipeline in the same job.
    e = materialize(edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")))
    sym = e.unionByName(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
    labels = materialize(
        sym.select("_u").distinct().select("_u", F.col("_u").alias("_label"))
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, "_u")
            .groupBy(F.col("_v").alias("_u"))
            .agg(F.min("_label").alias("_nl"))
        )
        stepped = labels.join(neigh, "_u", "left").select(
            "_u",
            "_label",
            F.least("_label", F.coalesce("_nl", "_label")).alias("_new"),
        )
        stepped = materialize(stepped)
        if stepped.where(F.col("_new") < F.col("_label")).limit(1).count() == 0:
            break
        labels = stepped.select("_u", F.col("_new").alias("_label"))
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return stepped.select(F.col("_u").alias("node"), F.col("_new").alias("component"))
