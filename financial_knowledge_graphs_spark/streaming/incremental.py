"""Structured-Streaming incremental extraction (Trigger.AvailableNow).

The reference's incremental unit is the execution batch with resume-skip
flags (SURVEY.md §2.8); batch-mode resume reproduces it exactly, and this
module adds the natural streaming extension: a file stream over the
documents table, extraction per micro-batch via ``foreachBatch`` (reusing
the exact batch operators), checkpointed by Spark's own streaming
checkpoint — so new document files are picked up incrementally with
exactly-once OUTPUT: foreachBatch itself is at-least-once, so every
foreachBatch sink here is idempotent per batch_id (partition-dir overwrite,
keyed merge, or anti-joined append) and a crash-replayed micro-batch
rewrites rather than duplicates.

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
        )
        # idempotent sink: foreachBatch is at-least-once (offsets log before
        # the batch, commit after), so a crash-replayed batch would DOUBLE
        # its rows under a plain append. Writing each batch to its own
        # batch_id=N partition dir with overwrite makes replay rewrite the
        # same partition instead — exactly-once output. batch_id comes back
        # as a partition column on read.
        ext.write.mode("overwrite").parquet(
            os.path.join(out_dir, "extractions", f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_build_graph(
    spark: SparkSession,
    docs_dir: str,
    alias_dict: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    min_tokens: int = prep.DEFAULT_MIN_TOKENS,
    max_files_per_trigger: int | None = None,
):
    """Incremental KG construction: document stream → FULL pipeline per
    micro-batch (extract → link → canonicalize globally against the
    already-materialized graph → MERGE into the bucketed tables).

    Effectively-once end to end, from two independent mechanisms:
    - the streaming checkpoint replays a failed micro-batch;
    - the pipeline's own doc-checkpoint anti-join + keyed idempotent merge
      absorb the replay (the same crash-replay contract the batch resume
      tests prove), so a re-delivered batch is a no-op.

    This is the streaming expression of the north rule's resumable
    10^12-doc build: each trigger processes only new files, and
    canonicalization folds prior vertices in, so entities converge across
    batches exactly as in resumed batch runs.

    Cross-batch content dedup: the batch pipeline's corpus-level keep-first
    dedup only sees one micro-batch here, so a duplicate arriving in a LATER
    batch would be re-extracted under its own doc_id. A persistent
    story-digest table (ops/story_digests, appended AFTER each batch's merge
    lands) anti-joins it away — keep-first where "first" is arrival order.
    The append-after-merge ordering keeps every crash window safe: replay
    with digests unrecorded re-runs the docs and the pipeline's own
    doc-checkpoint absorbs them; replay with digests recorded is a no-op
    on an already-merged graph.
    """
    from ..pipeline import PipelineConfig, run_pipeline

    digests_path = os.path.join(warehouse, "ops", "story_digests")
    reader = spark.readStream.schema(schemas.DOCUMENTS).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        dig = prep.quality_filter(
            prep.with_story(batch_df), min_tokens=min_tokens
        ).select("doc_id", F.sha2(F.col("story"), 256).alias("digest"))
        if os.path.isdir(digests_path):
            seen = spark.read.parquet(digests_path).select("digest")
            fresh_ids = dig.join(seen, "digest", "left_anti").select("doc_id")
            fresh = batch_df.join(fresh_ids, "doc_id", "left_semi")
        else:
            fresh = batch_df
        run_pipeline(
            spark, fresh, alias_dict,
            PipelineConfig(warehouse=warehouse, min_tokens=min_tokens,
                           stage_name="stream_extract"),
        )
        # append only genuinely-new digests: re-appending the whole batch's
        # digests (already-seen duplicates included, and the entire batch on
        # crash-replay) would grow the table beyond its distinct-digest
        # count forever — every later batch re-scans that bloat.
        fresh_dig = dig.select("digest").distinct()
        if os.path.isdir(digests_path):
            fresh_dig = fresh_dig.join(
                spark.read.parquet(digests_path).select("digest"),
                "digest", "left_anti",
            )
        fresh_dig.write.mode("append").parquet(digests_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_mention_rates(
    spark: SparkSession,
    docs_dir: str,
    alias_dict: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    window_length: str = "1 hour",
):
    """Watermarked, windowed mention-rate aggregation over a document stream.

    Docs arrive with an ``event_ts`` column (publication time); mentions are
    extracted per micro-batch and counted per (company, event-time window).
    The watermark bounds state: rows later than ``watermark`` behind the max
    observed event time are dropped, so state size is O(active windows), not
    O(stream length) — the standard late-data contract a 10^12-doc stream
    needs. Output mode append: a window's counts are emitted once, when the
    watermark passes its end.
    """
    from pyspark.sql.types import StructField, StructType, TimestampType

    # COPY the shared schema: StructType.add mutates self, so using it on
    # the module-level schemas.DOCUMENTS would permanently graft event_ts
    # onto every later consumer in the process (and duplicate it on a
    # second call here).
    schema = StructType(
        list(schemas.DOCUMENTS.fields) + [StructField("event_ts", TimestampType())]
    )
    stream = spark.readStream.schema(schema).format("parquet").load(docs_dir)
    udf = extract.make_extract_udf(spark, alias_dict)
    withs = prep.with_story(stream)
    ext = extract.run_extraction(withs, udf)
    mentions = ext.select(
        "event_ts", F.explode("extraction.entities").alias("ent")
    ).select("event_ts", F.col("ent.attributes.companyName").alias("company"))
    agg = (
        mentions.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window_length).alias("w"), "company")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "company", "n_mentions",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_running_company_counts(
    spark: SparkSession,
    docs_dir: str,
    alias_dict: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Custom stateful operator via ``applyInPandasWithState``: cumulative
    per-company mention counts across micro-batches.

    State (one row per company) survives between triggers through Spark's
    state store — restarting the query from the same checkpoint continues
    the running totals instead of recounting. This is the building block
    for incremental vertex statistics (mention counts feed the
    representative-surface choice in build_vertices) without re-scanning
    history.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schemas.DOCUMENTS).format("parquet").load(docs_dir)
    udf = extract.make_extract_udf(spark, alias_dict)
    ext = extract.run_extraction(prep.with_story(stream), udf)
    mentions = ext.select(F.explode("extraction.entities").alias("ent")).select(
        F.col("ent.attributes.companyName").alias("company")
    )

    def update(key, pdfs, state):
        import pandas as pd

        new = 0
        for pdf in pdfs:
            new += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += new
        state.update((total,))
        yield pd.DataFrame({"company": [key[0]], "total_mentions": [total]})

    counts = mentions.groupBy("company").applyInPandasWithState(
        update,
        outputStructType="company string, total_mentions long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, batch_id):
        # per-batch partition overwrite = idempotent under foreachBatch's
        # at-least-once replay (see stream_extract)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize_events(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "6 hours",
    watermark: str = "0 seconds",
):
    """Streaming sessionization over an events file stream via Spark's
    native ``session_window`` — the stateful-merge twin of the batch
    ``operators/timeseries.sessionize``. State per key is the OPEN
    session only (merged windows are emitted and dropped once the
    watermark passes ``last_ts + gap``), so state is O(active users),
    not O(stream length).

    Boundary note: ``session_window`` extends a session while the next
    event is STRICTLY within ``gap`` of the previous one, the batch
    sessionizer while the gap is ``<= gap_seconds``; at-exactly-gap
    events differ. Sessions still open at end-of-input (within ``gap``
    of the max watermarked event time) are NOT emitted in append mode —
    the standard streaming contract; they emit when later input closes
    them.

    The ``watermark`` default of 0 seconds assumes per-key in-order input
    ACROSS micro-batches: an event older than the stream's max seen event
    time that arrives in a later batch is dropped by the watermark. For
    out-of-order feeds pass a real delay (e.g. "10 minutes") — sessions
    then close that much later, the usual latency/completeness trade.
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = spark.readStream.schema(schema).format("parquet").load(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .select("user_id", "n_events", "start_ts", "end_ts")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
