"""Connected components over a similarity-edge DataFrame.

Batch, order-free replacement for the reference's incremental greedy merge
(each insert folds into the first matching DB entity —
reference src/db/neo4j_handler.py:161-186): the canonical cluster is the
connected component of the fuzzy-match graph, canonical label = min(key).
This is a deterministic superset of the reference's order-dependent result
(parity is asserted on post-canonicalization triples, see SURVEY.md §7.4).

Algorithm: hash-to-min label propagation — each node adopts the minimum
label in its closed neighborhood each round; converges in O(diameter)
rounds. Alias clusters have diameter ≤ ~3 (surface variants of one company),
so 2-4 rounds suffice; ``max_iter`` bounds pathological chains and
convergence is verified by counting changed labels (a cheap AQE-coalesced
aggregate).

Scale notes:
- Nodes are DISTINCT name keys, not mentions — hub skew (one bank in 30% of
  docs) never reaches these joins (see linking.py).
- Per-round ``localCheckpoint`` truncates the lineage chain so the plan does
  not grow with iterations (the classic iterative-join trap).
- Each round is one shuffle (join on ``src``) + one hash agg; AQE handles
  residual key skew inside a round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "key",
    max_iter: int = 15,
) -> DataFrame:
    """→ DataFrame(id_col, comp) where comp = min key of the component.

    ``nodes``: one row per node (column ``id_col``).
    ``edges``: undirected pairs (key_a, key_b); singletons need not appear.
    """
    sym = (
        edges.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .union(edges.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst")))
        .distinct()
    )
    # materialize the edge list once — every iteration joins against it, and
    # without this the whole upstream blocking-join chain re-executes per round
    sym = sym.localCheckpoint(eager=True)
    comp = nodes.select(F.col(id_col).alias("id")).withColumn("comp", F.col("id"))
    comp = comp.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor labels: node 'dst' learns label of 'src'
        msgs = sym.join(
            comp.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "comp")
        new_comp = (
            comp.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        new_comp = new_comp.localCheckpoint(eager=True)
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp.select(F.col("id").alias(id_col), "comp")
