"""Linking & canonicalization tests (SURVEY.md §5.2 item 3): alias clusters
merge, distinct companies stay separate, hub skew converges, idempotence."""

import pyspark.sql.functions as F

from financial_knowledge_graphs_spark.operators import materialize
from financial_knowledge_graphs_spark.operators.components import connected_components
from financial_knowledge_graphs_spark.operators.linking import name_keys, similarity_edges


def _mentions(spark, rows):
    return spark.createDataFrame(
        [("d%d" % i, "C1", "Company", n, n, None, None, None) for i, n in enumerate(rows)],
        "doc_id string, local_id string, type string, name string, "
        "companyName string, ticker string, industry string, country string",
    )


def test_alias_cluster_lands_in_one_component(spark):
    m = _mentions(spark, ["GlobalTech Inc.", "GlobalTech, Inc", "GLOBALTECH", "globaltech inc"])
    mapping = materialize.canonical_mapping(m)
    assert mapping.select("entity_id").distinct().count() == 1


def test_distinct_companies_stay_separate(spark):
    m = _mentions(spark, ["Apex Energy Corp", "Cobalt Energy Corp", "Juniper Foods Ltd"])
    mapping = materialize.canonical_mapping(m)
    assert mapping.select("entity_id").distinct().count() == 3


def test_containment_gate_len_gt_3(spark):
    # reference src/db/neo4j_handler.py:123-124 — contained side must be >3 chars
    m = _mentions(spark, ["ab", "ab Systems"])
    keys = name_keys(m)
    edges = similarity_edges(keys)
    assert edges.count() == 0


def test_jaccard_threshold(spark):
    # "alpha beta" vs "alpha beta gamma delta": containment yes, jaccard 2/4 = 0.5 (not > 0.5) -> no edge
    m = _mentions(spark, ["alpha beta", "alpha beta gamma delta"])
    assert similarity_edges(name_keys(m)).count() == 0
    # "alpha beta" vs "alpha beta gamma": jaccard 2/3 > 0.5 -> edge
    m2 = _mentions(spark, ["alpha beta", "alpha beta gamma"])
    assert similarity_edges(name_keys(m2)).count() == 1


def test_connected_components_chain_and_determinism(spark):
    nodes = spark.createDataFrame([(k,) for k in "abcdefg"], "key: string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"), ("e", "f")],
        "key_a string, key_b string",
    )
    want = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "d", "g": "d"}
    # driver union-find fast path (default threshold)
    got = {r["key"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert got == want
    # distributed hash-to-min path must agree (threshold forced to 0)
    got_dist = {
        r["key"]: r["comp"]
        for r in connected_components(nodes, edges, driver_threshold=0).collect()
    }
    assert got_dist == want


def test_mapping_idempotent_under_rerun(spark):
    m = _mentions(spark, ["GlobalTech Inc.", "GlobalTech, Inc", "Apex Energy Corp"])
    m1 = {(r["name"], r["entity_id"]) for r in materialize.canonical_mapping(m).collect()}
    m2 = {(r["name"], r["entity_id"]) for r in materialize.canonical_mapping(m).collect()}
    assert m1 == m2


def test_hub_skew_mentions_collapse_before_join(spark):
    # 500 mentions of one hub + 3 tail companies -> linking node count is 4,
    # independent of mention volume (the skew kill-shot, linking.py docstring)
    rows = [("d%d" % i, "C1", "Company", "Meridian Global Bank", None, None, None, None) for i in range(500)]
    rows += [("x1", "C1", "Company", "Tail One Inc", None, None, None, None),
             ("x2", "C1", "Company", "Tail Two Inc", None, None, None, None),
             ("x3", "C1", "Company", "Tail Three Inc", None, None, None, None)]
    m = spark.createDataFrame(
        rows,
        "doc_id string, local_id string, type string, name string, "
        "companyName string, ticker string, industry string, country string",
    )
    keys = name_keys(m)
    assert keys.count() == 4
    mapping = materialize.canonical_mapping(m)
    assert mapping.filter(F.col("name") == "Meridian Global Bank").select("n_mentions").first()[0] == 500


def test_embedding_similarity_edges_catch_typos(spark):
    from financial_knowledge_graphs_spark.operators.linking import (
        embedding_similarity_edges,
    )

    # 'GlobalTech' vs 'GlobalTec' (dropped char): token-set Jaccard = 0
    # (different single tokens), so the reference predicate finds nothing...
    m = _mentions(spark, ["GlobalTech", "GlobalTec"])
    keys = name_keys(m)
    assert similarity_edges(keys).count() == 0
    # ...but char-3-gram cosine links them
    e = embedding_similarity_edges(keys, threshold=0.75)
    assert e.count() == 1
    # and clearly different names stay unlinked
    m2 = _mentions(spark, ["GlobalTech", "Juniper Foods"])
    assert embedding_similarity_edges(name_keys(m2), threshold=0.75).count() == 0


def test_canonical_mapping_embedding_link_flag(spark):
    m = _mentions(spark, ["GlobalTech", "GlobalTec"])
    base = materialize.canonical_mapping(m)
    assert base.select("entity_id").distinct().count() == 2
    linked = materialize.canonical_mapping(m, embedding_link=True)
    assert linked.select("entity_id").distinct().count() == 1
