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
