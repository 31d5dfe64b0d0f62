"""Evaluator parity tests — the FIXTURES.md §5 edge cases, asserted on the
pure-Python core and on the Spark grouped-map wrapper."""

import json

import pyspark.sql.functions as F
import pytest

from financial_knowledge_graphs_spark.operators.evaluate import (
    corpus_metrics,
    evaluate_doc,
    per_doc_metrics,
)


def ent(id, name, **attrs):
    return {"id": id, "type": "Company", "name": name, "attributes": attrs}


def rel(id, type_, s, t, **attrs):
    return {"id": id, "type": type_, "source": s, "target": t, "attributes": attrs}


def test_exact_match_and_counts():
    pred = {"entities": [ent("C1", "Alpha Corp")], "relationships": []}
    gt = {"entities": [ent("E1", "Alpha Corp")], "relationships": []}
    c = evaluate_doc(pred, gt)
    assert (c["ent_tp"], c["ent_fp"], c["ent_fn"]) == (1, 0, 0)


def test_name_sim_below_50_short_circuit():
    # reference :66-68 — attributes cannot rescue a very different name
    pred = {"entities": [ent("C1", "Zzz Qqq", companyName="Alpha Corp")], "relationships": []}
    gt = {"entities": [ent("E1", "Alpha Corp", companyName="Alpha Corp")], "relationships": []}
    c = evaluate_doc(pred, gt)
    assert (c["ent_tp"], c["ent_fp"], c["ent_fn"]) == (0, 1, 1)


def test_greedy_pool_exhaustion_two_preds_one_gt():
    # both preds match the single GT; second must become FP (reference :118-129)
    pred = {"entities": [ent("C1", "Alpha Corp"), ent("C2", "Alpha Corp")], "relationships": []}
    gt = {"entities": [ent("E1", "Alpha Corp")], "relationships": []}
    c = evaluate_doc(pred, gt)
    assert (c["ent_tp"], c["ent_fp"], c["ent_fn"]) == (1, 1, 0)


def test_weighting_07_03():
    # name sim 100, attr sim 0 -> 0.7*100 + 0.3*0 = 70 < 80 -> no match
    pred = {"entities": [ent("C1", "Alpha Corp", ticker="XXX")], "relationships": []}
    gt = {"entities": [ent("E1", "Alpha Corp", ticker="ZZZQQ")], "relationships": []}
    c = evaluate_doc(pred, gt)
    assert c["ent_tp"] == 0 and c["ent_fp"] == 1


def test_symmetric_relationship_swap():
    pred = {
        "entities": [ent("C1", "Alpha Corp"), ent("C2", "Beta Ltd")],
        "relationships": [rel("R1", "mergedWith", "C2", "C1")],  # swapped
    }
    gt = {
        "entities": [ent("E1", "Alpha Corp"), ent("E2", "Beta Ltd")],
        "relationships": [rel("G1", "mergedWith", "E1", "E2")],
    }
    c = evaluate_doc(pred, gt)
    assert c["rel_tp"] == 1
    # non-symmetric must NOT swap
    pred["relationships"] = [rel("R1", "acquired", "C2", "C1")]
    gt["relationships"] = [rel("G1", "acquired", "E1", "E2")]
    c2 = evaluate_doc(pred, gt)
    assert c2["rel_tp"] == 0 and c2["rel_fp"] == 1


def test_numeric_tolerance_10pct_and_date_fuzzy():
    pred = {
        "entities": [ent("C1", "Alpha Corp"), ent("C2", "Beta Ltd")],
        "relationships": [rel("R1", "acquired", "C1", "C2",
                              valueAmount=109.0, percentage=25.0,
                              transactionDate="2024-03-15")],
    }
    gt = {
        "entities": [ent("E1", "Alpha Corp"), ent("E2", "Beta Ltd")],
        "relationships": [rel("G1", "acquired", "E1", "E2",
                              valueAmount=100.0, percentage=30.0,
                              transactionDate="2024-03-16")],
    }
    c = evaluate_doc(pred, gt)
    assert c["ra_valueAmount_correct"] == 1      # 9% error ok
    assert c["ra_percentage_correct"] == 0       # 16.7% error
    assert c["ra_transactionDate_correct"] == 1  # 1-char diff, ratio >= 80


def test_string_prediction_treated_empty():
    gt = {"entities": [ent("E1", "Alpha Corp")], "relationships": [rel("G1", "acquired", "E1", "E1")]}
    c = evaluate_doc("raw LLM garbage", gt)
    assert (c["ent_tp"], c["ent_fn"], c["rel_fn"]) == (0, 1, 1)


def test_spark_grouped_map_matches_python_and_missing_doc_fn(spark):
    pred_rows = [
        ("d1", json.dumps({"entities": [ent("C1", "Alpha Corp")], "relationships": []})),
        # d2 has no prediction row at all -> all FN
        ("d3", "not json"),
    ]
    gt_rows = [
        ("d1", json.dumps({"entities": [ent("E1", "Alpha Corp")], "relationships": []})),
        ("d2", json.dumps({"entities": [ent("E1", "Beta Ltd"), ent("E2", "Gamma Corp")],
                           "relationships": [rel("G1", "acquired", "E1", "E2")]})),
        ("d3", json.dumps({"entities": [ent("E1", "Delta Inc")], "relationships": []})),
    ]
    pred = spark.createDataFrame(pred_rows, "doc_id string, payload string")
    gt = spark.createDataFrame(gt_rows, "doc_id string, payload string")
    dm = per_doc_metrics(pred, gt)
    rows = {r["doc_id"]: r for r in dm.collect()}
    assert rows["d1"]["ent_tp"] == 1
    assert rows["d2"]["ent_fn"] == 2 and rows["d2"]["rel_fn"] == 1   # missing pred
    assert rows["d3"]["ent_fn"] == 1 and rows["d3"]["ent_tp"] == 0  # unparseable
    m = corpus_metrics(dm)
    assert m["entity_precision"] == 1.0
    assert m["entity_recall"] == pytest.approx(1 / 4)
