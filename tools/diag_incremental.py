"""Diagnose incremental-batch cost: seed a warehouse from a cached corpus,
then instrument every stage of the touched-components path for one batch.

  python tools/diag_incremental.py [n_total=500000] [batch=2000] [cpus=8] [zipf]

Keeps the warehouse under .fixtures/diag_wh_* so re-runs skip the seed.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    zipf = len(sys.argv) > 4 and sys.argv[4] == "zipf"

    from pyspark.sql import functions as F

    from financial_knowledge_graphs_spark.operators import extract, materialize, prep
    from financial_knowledge_graphs_spark.operators.linking import name_keys
    from financial_knowledge_graphs_spark.pipeline import (
        PipelineConfig, graph_paths, run_pipeline,
    )
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark(
        "fkg-diag-incremental", master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = f"n{n_total}_b{batch}" + ("_zipf" if zipf else "")
    root = os.path.join(repo, ".fixtures",
                        f"bench_corpus_n{n_total}_s42" + ("_zipf" if zipf else ""))
    docs = spark.read.parquet(os.path.join(root, "documents"))
    alias = spark.read.parquet(os.path.join(root, "alias_dict"))
    frac_expr = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_total))
    history_docs = docs.filter(frac_expr >= batch)
    batch_docs = docs.filter(frac_expr < batch)

    wh = os.path.join(repo, ".fixtures", f"diag_wh_{tag}")
    out: dict = {"tag": tag}
    if not os.path.isdir(wh):
        t0 = time.time()
        r1 = run_pipeline(spark, history_docs, alias, PipelineConfig(warehouse=wh))
        out["t_seed"] = round(time.time() - t0, 3)
        out["seed_docs"] = r1.docs_processed

    paths = graph_paths(wh)
    prior_map = materialize.read_graph_table(spark, paths["mapping"])
    out["prior_map_rows"] = prior_map.count()

    # replicate the pipeline's batch mention extraction
    t0 = time.time()
    prepared = prep.dedup_by_story(
        prep.quality_filter(prep.with_story(batch_docs)).select("doc_id", "story")
    ).repartition(3 * cpus, "doc_id")
    udf = extract.make_extract_udf(spark, alias)
    extracted = extract.run_extraction(prepared, udf).select("doc_id", "extraction")
    mentions = extract.mentions_df(extracted)
    batch_keys = name_keys(mentions).persist()
    out["batch_keys"] = batch_keys.count()
    out["t_extract"] = round(time.time() - t0, 3)

    from financial_knowledge_graphs_spark.operators.materialize import (
        canonical_mapping_incremental,
    )
    from financial_knowledge_graphs_spark.operators.normalize import norm_tokens_expr

    t0 = time.time()
    new_keys = batch_keys.join(prior_map.select("key"), "key", "left_anti").persist()
    out["new_keys"] = new_keys.count()
    out["t_new_keys"] = round(time.time() - t0, 3)

    # token-BRIDGED prior surfaces (the operator's candidate collect size:
    # every prior surface sharing a blocking token with a new one — NOT the
    # retired round-3 design's "all members of token-mate components")
    t0 = time.time()
    prior_keys = prior_map.select(
        "key", "type", "name", "norm", "comp",
        norm_tokens_expr("name").alias("tokens"),
    )
    new_toks = new_keys.select("type", F.explode("tokens").alias("tok")).distinct()
    bridged = (
        prior_keys.select("key", "type", F.explode("tokens").alias("tok"))
        .join(F.broadcast(new_toks), ["type", "tok"])
        .select("key").distinct().persist()
    )
    out["bridged_surfaces"] = bridged.count()
    out["t_bridged"] = round(time.time() - t0, 3)

    t0 = time.time()
    updates = canonical_mapping_incremental(prior_map, batch_keys).persist()
    n_upd = updates.count()
    out["updates_rows"] = n_upd
    out["t_incremental_mapping"] = round(time.time() - t0, 3)

    t0 = time.time()
    batch_eids = prior_map.join(batch_keys.select("key"), "key").select("entity_id")
    touched = (
        batch_eids
        .unionByName(prior_map.join(updates.select("key"), "key").select("entity_id"))
        .unionByName(updates.select("entity_id"))
        .distinct().persist()
    )
    out["touched_eids"] = touched.count()
    out["t_touched"] = round(time.time() - t0, 3)

    t0 = time.time()
    remap = (
        prior_map.select("key", F.col("entity_id").alias("old_id"))
        .join(updates.select("key", F.col("entity_id").alias("new_id")), "key")
        .filter(F.col("old_id") != F.col("new_id"))
        .select("old_id", "new_id").distinct().persist()
    )
    out["remap_rows"] = remap.count()
    out["t_remap"] = round(time.time() - t0, 3)

    ledger = materialize.read_graph_table(spark, paths["surface_mentions"])
    out["ledger_rows"] = ledger.count()
    tri = materialize.read_graph_table(spark, paths["triples"])
    out["triples_rows"] = tri.count()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
