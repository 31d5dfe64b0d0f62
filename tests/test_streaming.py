"""Structured Streaming incremental extraction: AvailableNow over the docs
dir, new files picked up on restart, no re-processing of old files."""

import os

import pyspark.sql.functions as F

from financial_knowledge_graphs_spark import fixtures
from financial_knowledge_graphs_spark.streaming.incremental import stream_extract


def test_available_now_incremental(spark, tmp_warehouse):
    docs_dir = os.path.join(tmp_warehouse, "docs")
    out_dir = os.path.join(tmp_warehouse, "out")
    cp_dir = os.path.join(tmp_warehouse, "cp")

    corpus = fixtures.corpus_df(spark, n_docs=60, seed=42)
    docs = fixtures.documents_df(corpus)
    alias = fixtures.alias_dict_df(spark, 20, 42)

    # first drop of files
    docs.filter(F.col("doc_id") < "doc_00000030").write.mode("append").parquet(docs_dir)
    q = stream_extract(spark, docs_dir, alias, out_dir, cp_dir)
    q.awaitTermination(120)
    first = spark.read.parquet(os.path.join(out_dir, "extractions"))
    n1 = first.count()
    assert n1 > 0

    # second drop: only the new files are processed on restart
    docs.filter(F.col("doc_id") >= "doc_00000030").write.mode("append").parquet(docs_dir)
    q2 = stream_extract(spark, docs_dir, alias, out_dir, cp_dir)
    q2.awaitTermination(120)
    all_rows = spark.read.parquet(os.path.join(out_dir, "extractions"))
    n2 = all_rows.count()
    assert n2 > n1
    # no doc processed twice
    assert all_rows.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_watermarked_windowed_mention_rates(spark, tmp_warehouse):
    from financial_knowledge_graphs_spark.streaming.incremental import (
        stream_windowed_mention_rates,
    )

    docs_dir = os.path.join(tmp_warehouse, "wdocs")
    out_dir = os.path.join(tmp_warehouse, "wout")
    cp_dir = os.path.join(tmp_warehouse, "wcp")

    corpus = fixtures.corpus_df(spark, n_docs=40, seed=42)
    docs = fixtures.documents_df(corpus)
    alias = fixtures.alias_dict_df(spark, 20, 42)
    # event time: first 20 docs in the 10:00 window, rest at 12:05 so the
    # watermark (12:05 - 10min = 11:55) passes the 10:00-11:00 window only
    with_ts = docs.withColumn(
        "event_ts",
        F.when(F.col("doc_id") < "doc_00000020",
               F.lit("2026-01-01 10:15:00")).otherwise(
               F.lit("2026-01-01 12:05:00")).cast("timestamp"),
    )
    with_ts.write.mode("append").parquet(docs_dir)

    q = stream_windowed_mention_rates(spark, docs_dir, alias, out_dir, cp_dir)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    # only the closed 10:00 window is emitted (12:00 window end > watermark)
    assert got.select("window_start").distinct().count() == 1
    assert got.first()["window_start"].hour == 10

    # values match the batch computation over the same closed window
    from financial_knowledge_graphs_spark.operators import extract, prep
    udf = extract.make_extract_udf(spark, alias)
    batch = extract.run_extraction(
        prep.with_story(with_ts.filter(F.col("event_ts") < "2026-01-01 11:00:00")), udf
    ).select(F.explode("extraction.entities").alias("ent")).groupBy(
        F.col("ent.attributes.companyName").alias("company")
    ).count()
    want = {r["company"]: r["count"] for r in batch.collect()}
    have = {r["company"]: r["n_mentions"] for r in got.collect()}
    assert have == want


def test_stateful_running_counts_across_restart(spark, tmp_warehouse):
    from financial_knowledge_graphs_spark.streaming.incremental import (
        stream_running_company_counts,
    )

    docs_dir = os.path.join(tmp_warehouse, "sdocs")
    out_dir = os.path.join(tmp_warehouse, "sout")
    cp_dir = os.path.join(tmp_warehouse, "scp")

    corpus = fixtures.corpus_df(spark, n_docs=40, seed=42)
    docs = fixtures.documents_df(corpus)
    alias = fixtures.alias_dict_df(spark, 20, 42)

    docs.filter(F.col("doc_id") < "doc_00000020").write.mode("append").parquet(docs_dir)
    q = stream_running_company_counts(spark, docs_dir, alias, out_dir, cp_dir)
    q.awaitTermination(180)

    docs.filter(F.col("doc_id") >= "doc_00000020").write.mode("append").parquet(docs_dir)
    q2 = stream_running_company_counts(spark, docs_dir, alias, out_dir, cp_dir)
    q2.awaitTermination(180)

    # latest state row per company == full-batch mention counts (state
    # survived the restart; second run only added the increment)
    from financial_knowledge_graphs_spark.operators import extract, prep
    udf = extract.make_extract_udf(spark, alias)
    batch = extract.run_extraction(prep.with_story(docs), udf).select(
        F.explode("extraction.entities").alias("ent")
    ).groupBy(F.col("ent.attributes.companyName").alias("company")).count()
    want = {r["company"]: r["count"] for r in batch.collect()}

    out = spark.read.parquet(out_dir)
    from pyspark.sql import Window
    w = Window.partitionBy("company").orderBy(F.desc("batch_id"))
    latest = (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    have = {r["company"]: r["total_mentions"] for r in latest.collect()}
    assert have == want


def test_stream_build_graph_incremental_equals_batch(spark, tmp_warehouse):
    """Full incremental KG build through Structured Streaming: two file
    arrivals → same triples as one batch run (exactly-once merge)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from financial_knowledge_graphs_spark.operators import materialize
    from financial_knowledge_graphs_spark.pipeline import (
        PipelineConfig, graph_paths, run_pipeline,
    )
    from financial_knowledge_graphs_spark.streaming.incremental import (
        stream_build_graph,
    )

    corpus = fixtures.corpus_df(spark, n_docs=160, seed=7).cache()
    docs = fixtures.documents_df(corpus)
    alias = fixtures.alias_dict_df(spark, max(20, 160 // 20), 7)
    docs_dir = os.path.join(tmp_warehouse, "gdocs")
    wh = os.path.join(tmp_warehouse, "gwh")
    cp = os.path.join(tmp_warehouse, "gcp")

    # first arrival: docs 0-79; second arrival: docs 80-159
    docs.filter(F.col("doc_id") < "doc_00000080").write.mode("append").parquet(docs_dir)
    q = stream_build_graph(spark, docs_dir, alias, wh, cp)
    q.awaitTermination(300)
    docs.filter(F.col("doc_id") >= "doc_00000080").write.mode("append").parquet(docs_dir)
    q = stream_build_graph(spark, docs_dir, alias, wh, cp)
    q.awaitTermination(300)

    single = tempfile.mkdtemp(prefix="fkg_sbatch_")
    try:
        run_pipeline(spark, docs, alias, PipelineConfig(warehouse=single))
        key = ["doc_id", "subj_name", "pred", "obj_name"]
        a = materialize.read_graph_table(spark, graph_paths(wh)["triples"]).select(*key)
        b = materialize.read_graph_table(spark, graph_paths(single)["triples"]).select(*key)
        assert a.count() > 0
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    finally:
        shutil.rmtree(single, ignore_errors=True)
        corpus.unpersist()


def test_stream_sessionize_matches_batch(spark, tmp_warehouse):
    """session_window stream == batch gap-sessionizer on closed sessions."""
    import datetime as dt

    from financial_knowledge_graphs_spark.streaming.incremental import (
        stream_sessionize_events,
    )
    from financial_knowledge_graphs_spark.operators.timeseries import sessionize

    ev_dir = os.path.join(tmp_warehouse, "sess_events")
    out_dir = os.path.join(tmp_warehouse, "sess_out")
    cp_dir = os.path.join(tmp_warehouse, "sess_cp")

    base = dt.datetime(2026, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        # two sessions per user: bursts 10 min apart, separated by 7 h
        for burst_start in (0, 7 * 3600):
            for k in range(3):
                rows.append((eid, base + dt.timedelta(seconds=burst_start + 600 * k),
                             user, "click", 1.0, "{}"))
                eid += 1
    # far-future flush row so the watermark closes every real session
    rows.append((eid, base + dt.timedelta(days=30), 99, "flush", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    ev.write.mode("append").parquet(ev_dir)

    q = stream_sessionize_events(spark, ev_dir, out_dir, cp_dir, gap="6 hours")
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["start_ts"], r["end_ts"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = (
        sessionize(ev.filter(F.col("user_id") != 99), "user_id", "ts", 21600, "event_id")
        .groupBy("user_id", "session_num")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    want = {
        (r["user_id"], r["start_ts"], r["end_ts"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 4  # 2 users x 2 closed sessions (flush row's own session stays open)
