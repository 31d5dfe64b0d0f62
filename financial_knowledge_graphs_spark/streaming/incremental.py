"""Structured-Streaming incremental extraction (Trigger.AvailableNow).

The reference's incremental unit is the execution batch with resume-skip
flags (SURVEY.md §2.8); batch-mode resume reproduces it exactly, and this
module adds the natural streaming extension: a file stream over the
documents table, extraction per micro-batch via ``foreachBatch`` (reusing
the exact batch operators), checkpointed by Spark's own streaming
checkpoint — so new document files are picked up incrementally with
exactly-once sink appends.

Canonicalization stays a downstream batch job (it is a global fixpoint over
all mentions; running it per micro-batch would re-link the world every few
seconds — same reasoning as the reference's separate `neo4j` phase).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import extract, prep


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    alias_dict: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    min_tokens: int = prep.DEFAULT_MIN_TOKENS,
    max_files_per_trigger: int | None = None,
):
    """Start an AvailableNow stream: parquet docs dir → extraction parquet.

    Returns the StreamingQuery (caller awaits termination). Dedup here is
    within-micro-batch only (cross-batch dedup is the batch pipeline's job —
    streaming state for global story-dedup would need
    ``dropDuplicatesWithinWatermark`` and an event-time column).
    """
    reader = (
        spark.readStream.schema(schemas.DOCUMENTS)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(docs_dir)

    udf = extract.make_extract_udf(spark, alias_dict)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = prep.dedup_by_story(
            prep.quality_filter(prep.with_story(batch_df), min_tokens=min_tokens)
        )
        ext = extract.run_extraction(staged, udf).select(
            "doc_id", F.to_json("extraction").alias("extraction_json"),
            F.lit(batch_id).alias("batch_id"),
        )
        ext.write.mode("append").parquet(os.path.join(out_dir, "extractions"))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
