"""Schema-constraint enforcement (SURVEY §2.6 row 43): conformance casts,
NOT NULL + UNIQUE detection, and the three enforcement modes."""

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from financial_knowledge_graphs_spark.operators.constraints import (
    Constraints, ConstraintViolation, conform, enforce,
)

SCHEMA = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("name", StringType()),
        StructField("n", LongType()),
    ]
)
CONS = Constraints(schema=SCHEMA, not_null=["entity_id"], unique=[["entity_id"]])


def _df(spark):
    rows = [
        ("e1", "Acme", 1),
        ("e1", "Acme Corp", 2),   # duplicate key
        (None, "Ghost", 3),       # null key
        ("e2", "Beta", 4),
    ]
    return spark.createDataFrame(rows, "entity_id string, name string, n int")


def test_conform_casts_and_prunes(spark):
    from pyspark.sql import functions as F

    df = _df(spark).withColumn("extra", F.lit(0))
    out = conform(df, SCHEMA)
    assert out.columns == ["entity_id", "name", "n"]
    assert dict(out.dtypes)["n"] == "bigint"  # int -> declared long
    with pytest.raises(ConstraintViolation):
        conform(df.drop("name"), SCHEMA)


def test_enforce_error_mode(spark):
    with pytest.raises(ConstraintViolation):
        enforce(_df(spark), CONS, mode="error")
    clean = _df(spark).filter("entity_id = 'e2'")
    assert enforce(clean, CONS, mode="error").count() == 1


def test_enforce_drop_mode(spark):
    out = enforce(_df(spark), CONS, mode="drop")
    got = {(r["entity_id"], r["name"]) for r in out.collect()}
    # null key dropped; deterministic first row per duplicate key kept
    assert got == {("e1", "Acme"), ("e2", "Beta")}


def test_enforce_report_mode(spark):
    out = enforce(_df(spark), CONS, mode="report")
    tags = {r["name"]: r["violation"] for r in out.collect()}
    assert tags["Beta"] is None
    assert "unique:entity_id" in tags["Acme"]
    assert "unique:entity_id" in tags["Acme Corp"]
    assert "not_null:entity_id" in tags["Ghost"]


def test_unique_allows_multiple_null_keys(spark):
    """SQL UNIQUE semantics: NULL keys never collide with each other."""
    cons = Constraints(schema=SCHEMA, unique=[["entity_id"]])
    rows = [(None, "a", 1), (None, "b", 2), ("e1", "c", 3)]
    df = spark.createDataFrame(rows, "entity_id string, name string, n int")
    # no duplicates among non-null keys -> error mode passes
    assert enforce(df, cons, mode="error").count() == 3
    # drop mode keeps BOTH null-keyed rows
    assert enforce(df, cons, mode="drop").count() == 3
    # report mode tags nothing
    out = enforce(df, cons, mode="report")
    assert out.filter("violation is not null").count() == 0


def test_domain_constraint_modes(spark):
    """CHECK-style closed domain (the ontology predicate vocabulary)."""
    schema = StructType(
        [StructField("subj", StringType()), StructField("pred", StringType())]
    )
    cons = Constraints(
        schema=schema,
        domains={"pred": ["acquired", "mergedWith"]},
    )
    rows = [("a", "acquired"), ("b", "OWNS"), ("c", None)]
    df = spark.createDataFrame(rows, "subj string, pred string")
    with pytest.raises(ConstraintViolation):
        enforce(df, cons, mode="error")
    # drop: off-vocab row removed, NULL passes (SQL CHECK semantics)
    kept = {r["subj"] for r in enforce(df, cons, mode="drop").collect()}
    assert kept == {"a", "c"}
    tags = {r["subj"]: r["violation"] for r in enforce(df, cons, mode="report").collect()}
    assert tags["a"] is None and tags["c"] is None
    assert "domain:pred" in tags["b"]


def test_pipeline_vocab_helpers(spark):
    from financial_knowledge_graphs_spark import schemas as S
    from financial_knowledge_graphs_spark.operators.constraints import (
        domain_filter, domain_violations,
    )

    rows = [("a", "acquired"), ("b", "novelPred")]
    df = spark.createDataFrame(rows, "subj string, pred string")
    vocab = {"pred": list(S.PREDICATES)}
    assert domain_filter(df, vocab).count() == 1
    bad = domain_violations(df, vocab).collect()
    assert len(bad) == 1 and bad[0]["pred"] == "novelPred"


def test_cast_violations_quarantined_not_crashing(spark):
    """Spark 4 runs ANSI mode: a plain cast of 'N/A' -> double fails the
    whole job, defeating drop/report. conform() try_casts and enforce()
    surfaces the failure as a cast:<col> violation computed on the
    pre-cast value (it must not null through the domain CHECKs)."""
    import pytest
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from financial_knowledge_graphs_spark.operators import constraints as C

    schema = StructType([StructField("k", StringType()),
                         StructField("v", DoubleType())])
    df = spark.createDataFrame(
        [("a", "1.5"), ("b", "N/A"), ("c", None)], "k string, v string")
    cons = C.Constraints(schema=schema)

    rep = {r["k"]: r["violation"]
           for r in C.enforce(df, cons, mode="report").collect()}
    assert rep["a"] is None and rep["c"] is None
    assert rep["b"] == "cast:v"

    kept = {r["k"]: r["v"] for r in C.enforce(df, cons, mode="drop").collect()}
    assert kept == {"a": 1.5, "c": None}

    with pytest.raises(C.ConstraintViolation, match="cast:v"):
        C.enforce(df, cons, mode="error")
