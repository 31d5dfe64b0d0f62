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
