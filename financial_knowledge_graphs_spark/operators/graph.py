"""Query operators over the materialized graph tables.

The reference exposes its graph through Neo4j Cypher (counts at
reference src/db/neo4j_handler.py:362-393; ad-hoc queries in the notebooks).
Here the graph IS two tables, so graph queries are joins/aggregations the
optimizer already knows how to run at scale: degrees are one partial+final
hash agg over triples, neighborhoods are broadcast semi-joins, 2-hop
expansion is a self-join on the canonical entity id (shuffle on subj/obj —
the same key the triples table is hash-bucketed by, so a real deployment
co-locates it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_views(spark: SparkSession, warehouse: str) -> None:
    """Expose the graph + ops tables to the SQL surface
    (``spark.sql("SELECT ... FROM triples JOIN vertices ...")``)."""
    import os

    from .materialize import read_graph_table
    from ..ops import OpsStore

    read_graph_table(
        spark, os.path.join(warehouse, "graph", "vertices")
    ).createOrReplaceTempView("vertices")
    read_graph_table(
        spark, os.path.join(warehouse, "graph", "triples")
    ).createOrReplaceTempView("triples")
    ops = OpsStore(spark, os.path.join(warehouse, "ops"))
    for t in ("checkpoints", "lineage", "metrics", "runs"):
        ops.read(t).createOrReplaceTempView(t)


def degree_table(triples: DataFrame) -> DataFrame:
    """Per-entity out/in/total degree (by canonical name). One hash agg per
    direction + a full-outer merge — no row explosion."""
    out_d = triples.groupBy(F.col("subj_name").alias("name")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = triples.groupBy(F.col("obj_name").alias("name")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "name", "full_outer")
        .select(
            "name",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))).alias("degree"),
        )
    )


def neighbors(triples: DataFrame, entity_name: str) -> DataFrame:
    """1-hop neighborhood of a canonical entity (both directions), with the
    connecting predicate. Filter pushes to the scan; no shuffle."""
    fwd = triples.filter(F.col("subj_name") == entity_name).select(
        F.col("obj_name").alias("neighbor"), "pred",
        F.lit("out").alias("direction"),
    )
    bwd = triples.filter(F.col("obj_name") == entity_name).select(
        F.col("subj_name").alias("neighbor"), "pred",
        F.lit("in").alias("direction"),
    )
    return fwd.unionByName(bwd).distinct()


def two_hop(triples: DataFrame) -> DataFrame:
    """Distinct 2-hop (a)-[p1]->(b)-[p2]->(c) paths, a != c. Self-join on
    the canonical id — the bucketed key — so a co-located deployment runs
    it shuffle-free; AQE handles hub-entity skew on b."""
    e1 = triples.select(
        F.col("subj_name").alias("a"), F.col("pred").alias("p1"),
        F.col("obj_name").alias("b"),
    )
    e2 = triples.select(
        F.col("subj_name").alias("b"), F.col("pred").alias("p2"),
        F.col("obj_name").alias("c"),
    )
    return (
        e1.join(e2, "b")
        .filter(F.col("a") != F.col("c"))
        .select("a", "p1", "b", "p2", "c")
        .distinct()
    )
