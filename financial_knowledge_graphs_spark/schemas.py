"""Explicit schemas for every table the engine reads or writes.

The reference keeps schema implicit (prompt text + tolerant parsing —
reference src/utils/text_processing.py:12-33); here every stage has a fixed
StructType so Catalyst can prune nested fields and push filters to the scan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input: interleaved-span documents (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
SPAN = StructType(
    [
        StructField("kind", StringType()),       # 'text' | 'image' | 'table'
        StructField("text", StringType()),       # prose for kind='text', else ''
        StructField("media_ref", StringType()),  # 'media://<hash>' for media, else ''
        StructField("offset", IntegerType()),    # ordinal position within the doc
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN)),
        # optional metadata mirroring the reference CSV shape
        # (reference src/utils/data_processing.py:13-16)
        StructField("transmission_date", StringType()),
        StructField("headline", StringType()),
        StructField("isin_tags", StringType()),
        StructField("ticker_tags", StringType()),
        StructField("is_english", BooleanType()),
    ]
)

# ---------------------------------------------------------------------------
# Extraction document (reference prompt v3-v5 JSON shape,
# reference configs/prompts.yaml:159-192)
# ---------------------------------------------------------------------------
ENTITY_ATTRS = StructType(
    [
        StructField("companyName", StringType()),
        StructField("ticker", StringType()),
        StructField("industry", StringType()),
        StructField("country", StringType()),
    ]
)

ENTITY = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("name", StringType()),
        StructField("attributes", ENTITY_ATTRS),
    ]
)

REL_ATTRS = StructType(
    [
        StructField("valueAmount", DoubleType()),
        StructField("percentage", DoubleType()),
        StructField("transactionDate", StringType()),  # allows partial 'YYYY-MM'
    ]
)

RELATIONSHIP = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("source", StringType()),
        StructField("target", StringType()),
        StructField("attributes", REL_ATTRS),
    ]
)

EXTRACTION = StructType(
    [
        StructField("entities", ArrayType(ENTITY)),
        StructField("relationships", ArrayType(RELATIONSHIP)),
    ]
)

# The four ontology predicates (reference docs/ontology.md:13-33); 'mergedWith'
# is symmetric. The evaluator additionally treats 'partnersWith' as symmetric
# (reference src/utils/evaluation.py:168).
PREDICATES = ("hasDebtHolder", "hasEquityStakeIn", "mergedWith", "acquired")
SYMMETRIC_PREDICATES = ("mergedwith", "partnerswith")

# ---------------------------------------------------------------------------
# Graph tables (replaces the reference Neo4j sink)
# ---------------------------------------------------------------------------
VERTICES = StructType(
    [
        StructField("entity_id", StringType(), False),   # canonical id
        StructField("type", StringType()),
        StructField("name", StringType()),               # representative surface
        StructField("norm_name", StringType()),
        StructField("companyName", StringType()),
        StructField("ticker", StringType()),
        StructField("industry", StringType()),
        StructField("country", StringType()),
        StructField("n_mentions", LongType()),
    ]
)

TRIPLES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("subj", StringType(), False),        # canonical entity_id
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("subj_name", StringType()),
        StructField("obj_name", StringType()),
        StructField("valueAmount", DoubleType()),
        StructField("percentage", DoubleType()),
        StructField("transactionDate", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Ops tables (FIXTURES.md §6) — replace the reference's JSON-on-disk metadata
# (reference src/utils/batch_utils.py:156-164, execution_info.json et al.)
# ---------------------------------------------------------------------------
CHECKPOINTS = StructType(
    [
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("doc_id", StringType()),        # processed unit (anti-join key)
        StructField("partition_id", IntegerType()),
        StructField("updated_at", TimestampType()),
    ]
)

LINEAGE = StructType(
    [
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("input_rows", LongType()),
        StructField("output_rows", LongType()),
        StructField("dropped_rows", LongType()),
        StructField("started_at", TimestampType()),
        StructField("finished_at", TimestampType()),
        StructField("status", StringType()),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("name", StringType()),
        StructField("value", DoubleType()),
    ]
)

# run registry (SURVEY §2.3 rows 20-21): replaces the reference's
# execution_N directory counter (reference src/utils/batch_utils.py:117-158)
RUNS = StructType(
    [
        StructField("run_id", StringType()),
        StructField("run_num", IntegerType()),
        StructField("created_at", TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Fixture ground truth (FIXTURES.md §4)
# ---------------------------------------------------------------------------
GT_TRIPLES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("subj", StringType()),          # canonical company name
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("value_amount", DoubleType()),
        StructField("percentage", DoubleType()),
        StructField("transaction_date", StringType()),
    ]
)

ALIAS_DICT = StructType(
    [
        StructField("alias", StringType()),
        StructField("canonical_name", StringType()),
        StructField("ticker", StringType()),
        StructField("industry", StringType()),
        StructField("country", StringType()),
    ]
)
