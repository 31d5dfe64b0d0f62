"""Graph exports — the migration path BACK to the reference's world.

The reference sinks into Neo4j over bolt (reference
src/db/neo4j_handler.py:241-290). Users migrating to this engine may still
serve a Neo4j instance; ``export_neo4j_admin_csv`` writes the graph tables
in the ``neo4j-admin database import`` header convention (``:ID`` /
``:LABEL`` / ``:START_ID`` / ``:END_ID`` / ``:TYPE`` columns), which bulk
loads orders of magnitude faster than per-row MERGE over bolt — the right
interface at 10^9-node scale. Distributed CSV write: one file per
partition; neo4j-admin accepts globs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.materialize import read_graph_table


def export_neo4j_admin_csv(spark: SparkSession, warehouse: str, out_dir: str) -> dict:
    """Write nodes/ and relationships/ CSV dirs for neo4j-admin import.
    Returns {'nodes': n, 'relationships': n} counts."""
    v = read_graph_table(spark, os.path.join(warehouse, "graph", "vertices"))
    t = read_graph_table(spark, os.path.join(warehouse, "graph", "triples"))

    nodes = v.select(
        F.col("entity_id").alias("entity_id:ID"),
        F.col("type").alias(":LABEL"),
        "name", "norm_name", "companyName", "ticker", "industry", "country",
        F.col("n_mentions").alias("n_mentions:long"),
    )
    rels = t.select(
        F.col("subj").alias(":START_ID"),
        F.col("obj").alias(":END_ID"),
        F.col("pred_label").alias(":TYPE"),
        "doc_id",
        F.col("valueAmount").alias("valueAmount:double"),
        F.col("percentage").alias("percentage:double"),
        "transactionDate",
    )
    common = {"header": True, "quoteAll": True, "escape": '"', "emptyValue": ""}
    nodes.write.mode("overwrite").options(**common).csv(os.path.join(out_dir, "nodes"))
    rels.write.mode("overwrite").options(**common).csv(
        os.path.join(out_dir, "relationships")
    )
    return {"nodes": nodes.count(), "relationships": rels.count()}
