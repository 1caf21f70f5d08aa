"""Connected components over candidate-pair edges — the step that turns
near-duplicate PAIRS into duplicate GROUPS with one survivor each.

A pair list (a,b) under-specifies dedup policy: if a~b and b~c but not
a~c, dropping "the greater of each pair" removes b and c while a~c both
survive as an undetected near-pair through transitivity.  Components
make the policy exact: every doc gets the MIN id reachable through the
pair graph as its group id, and the group min is the canonical survivor.

Determinism/oracle story: the min-label fixpoint of an undirected graph
is unique (label propagation converges to min reachable id), so the
iterative DataFrame loop here and the DuckDB recursive-CTE reachability
closure compute the SAME grouping even though their iteration structures
differ — the fixpoint, not the schedule, is the contract.

100 TB posture: each round is one join + one partial-aggregated groupBy
shuffle on node id (state = one label per node), converging in
O(component diameter) rounds — near-dup components are shallow (pairs
come from banded LSH buckets, diameters of 2-4), and the LSH width caps
upstream already bound component size.  ``localCheckpoint`` per round
truncates the lineage so the plan does not grow with iterations (the
standard iterative-DataFrame idiom).  For billion-edge general graphs
use GraphFrames/Pregel; for dedup groups this is the right weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(id, comp): every node in ``edges``, labeled with the smallest id
    reachable through the undirected pair graph.  Converges by fixpoint
    (change-count action per round); ``max_iters`` is a runaway bound,
    not a semantic knob — raise it for graphs with huge diameters.
    """
    # Checkpoint the edge list BEFORE symmetrizing: the union references
    # `edges` twice, and an expensive upstream pair pipeline (LSH,
    # jaccard) would otherwise execute once per branch (the
    # exchange-reuse aliasing trap, again).
    edges_ck = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    sym = (
        edges_ck.union(edges_ck.select(F.col("v"), F.col("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym.u == labels.id)
            .groupBy("v")
            .agg(F.min("comp").alias("nmin"))
        )
        updated = (
            labels.join(neigh, labels.id == neigh.v, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nmin", F.col("comp"))
                ).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def duplicate_groups(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id, comp, is_survivor, group_size) for every node in the pair
    graph: comp = min reachable id (the canonical survivor), so the
    transitive-safe dedup drop-set is exactly the rows with
    ``is_survivor = false``."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            "id",
            "comp",
            (F.col("id") == F.col("comp")).alias("is_survivor"),
            "group_size",
        )
    )
