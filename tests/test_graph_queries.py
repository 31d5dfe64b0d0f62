"""Graph-query operators + the SQL view surface over the materialized
graph tables."""

import os

from pyspark.sql import functions as F

from financial_knowledge_graphs_spark import fixtures
from financial_knowledge_graphs_spark.operators import graph, materialize
from financial_knowledge_graphs_spark.pipeline import (
    PipelineConfig, graph_paths, run_pipeline,
)


def _build(spark, tmp_warehouse, small_corpus):
    docs = fixtures.documents_df(small_corpus)
    alias = fixtures.alias_dict_df(spark, 20, 42)
    run_pipeline(spark, docs, alias, PipelineConfig(warehouse=tmp_warehouse))
    return materialize.read_graph_table(spark, graph_paths(tmp_warehouse)["triples"])


def test_degree_matches_gt(spark, tmp_warehouse, small_corpus):
    t = _build(spark, tmp_warehouse, small_corpus)
    deg = graph.degree_table(t)
    gt = fixtures.gt_triples_df(small_corpus)
    want_out = {r["subj"]: r["n"] for r in gt.groupBy("subj").agg(F.count("*").alias("n")).collect()}
    got_out = {r["name"]: r["out_degree"] for r in deg.collect() if r["out_degree"]}
    assert got_out == want_out
    # total degree consistency
    assert deg.agg(F.sum("degree")).first()[0] == 2 * t.count()


def test_neighbors_and_two_hop(spark, tmp_warehouse, small_corpus):
    t = _build(spark, tmp_warehouse, small_corpus)
    some = t.select("subj_name").first()["subj_name"]
    nb = graph.neighbors(t, some)
    assert nb.count() > 0
    assert set(nb.columns) == {"neighbor", "pred", "direction"}
    th = graph.two_hop(t)
    # every 2-hop row chains two real edges
    edges = {(r["subj_name"], r["pred"], r["obj_name"]) for r in t.collect()}
    for r in th.limit(20).collect():
        assert (r["a"], r["p1"], r["b"]) in edges
        assert (r["b"], r["p2"], r["c"]) in edges
        assert r["a"] != r["c"]


def test_sql_view_surface(spark, tmp_warehouse, small_corpus):
    """spark.sql over registered views == the DataFrame result."""
    _build(spark, tmp_warehouse, small_corpus)
    graph.register_views(spark, tmp_warehouse)
    via_sql = spark.sql("""
        SELECT v.companyName, count(*) AS n_triples
        FROM triples t JOIN vertices v ON t.subj = v.entity_id
        GROUP BY v.companyName
    """)
    tdf = materialize.read_graph_table(spark, graph_paths(tmp_warehouse)["triples"])
    vdf = materialize.read_graph_table(spark, graph_paths(tmp_warehouse)["vertices"])
    via_df = tdf.join(vdf, tdf.subj == vdf.entity_id).groupBy("companyName").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    assert via_sql.exceptAll(via_df).count() == 0
    assert via_df.exceptAll(via_sql).count() == 0
    assert spark.sql("SELECT count(*) FROM metrics").first()[0] > 0
