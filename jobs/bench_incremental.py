"""Incremental-canonicalization scale evidence: per-batch cost must be
O(batch + touched components), independent of warehouse history.

Protocol: from one cached deterministic corpus of N docs, (1) seed a
warehouse with the first N-B docs (full-path canonicalization), (2) run the
remaining B docs as an incremental batch against that history, (3) run the
SAME B docs alone into a fresh warehouse (the no-history lower bound).
If incremental linking is history-independent, t_incremental ~= t_fresh
(the gap is the ledger scan + mapping read); the round-2 full-ledger design
gave t_incremental growing with N.

  python jobs/bench_incremental.py [n_total=500000] [batch=20000] [cpus=8] [zipf] [mode=cow|mor]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    zipf = len(sys.argv) > 4 and sys.argv[4] == "zipf"
    # merge strategy for the graph tables: "mor" measures the Iceberg-v2
    # merge-on-read write path (equality-delete files instead of bucket
    # rewrites) against the same workload
    mode = sys.argv[5] if len(sys.argv) > 5 else "cow"

    from pyspark.sql import functions as F

    from financial_knowledge_graphs_spark import fixtures
    from financial_knowledge_graphs_spark.pipeline import PipelineConfig, run_pipeline
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark(
        "fkg-bench-incremental", master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".fixtures",
                        f"bench_corpus_n{n_total}_s42" + ("_zipf" if zipf else ""))
    # completion marker, not isdir: an interrupted write_corpus must not be
    # silently reused as a truncated corpus on the next run
    marker = os.path.join(root, "_TABLES")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        fixtures.write_corpus(spark, root, n_docs=n_total, seed=42, zipf=zipf)
        with open(marker, "w") as f:
            f.write("ok")
    docs = spark.read.parquet(os.path.join(root, "documents"))
    alias = spark.read.parquet(os.path.join(root, "alias_dict"))
    # split on a digest of doc_id (stable, order-free): ~batch docs held out
    frac_expr = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_total))
    # TWO held-out batches: the second incremental batch is the steady-state
    # datapoint (history+1 batch of state, warm caches settled) — with the
    # first it evidences per-batch cost FLAT in history, not just "smaller
    # than the seed"
    history_docs = docs.filter(frac_expr >= 2 * batch)
    batch_docs = docs.filter(frac_expr < batch)
    batch2_docs = docs.filter((frac_expr >= batch) & (frac_expr < 2 * batch))
    n_batch = batch_docs.count()

    out = {"n_total": n_total, "batch_docs": n_batch, "cpus": cpus,
           "zipf": zipf, "merge_mode": mode}

    wh = tempfile.mkdtemp(prefix="fkg_incr_wh_")
    t0 = time.time()
    r1 = run_pipeline(spark, history_docs, alias, PipelineConfig(warehouse=wh, merge_mode=mode))
    out["t_seed_history"] = round(time.time() - t0, 3)
    out["history_processed"] = r1.docs_processed

    # feed ONLY the new batch (the at-scale usage: a batch job reads new
    # files, not the whole corpus — corpus-level dedup/resume is carried by
    # the ledger + checkpoint tables, not by re-scanning history), so this
    # measures canonicalization-vs-history, not input re-prep
    t0 = time.time()
    r2 = run_pipeline(spark, batch_docs, alias, PipelineConfig(warehouse=wh, merge_mode=mode))
    out["t_incremental_batch"] = round(time.time() - t0, 3)
    out["incremental_processed"] = r2.docs_processed
    out["incremental_phases"] = r2.extra.get("phase_seconds")

    t0 = time.time()
    r2b = run_pipeline(spark, batch2_docs, alias, PipelineConfig(warehouse=wh, merge_mode=mode))
    out["t_incremental_batch2"] = round(time.time() - t0, 3)
    out["incremental2_processed"] = r2b.docs_processed
    out["incremental2_phases"] = r2b.extra.get("phase_seconds")

    fresh = tempfile.mkdtemp(prefix="fkg_incr_fresh_")
    t0 = time.time()
    r3 = run_pipeline(spark, batch_docs, alias, PipelineConfig(warehouse=fresh, merge_mode=mode))
    out["t_fresh_batch"] = round(time.time() - t0, 3)
    out["fresh_processed"] = r3.docs_processed
    out["fresh_phases"] = r3.extra.get("phase_seconds")

    out["incremental_over_fresh"] = round(
        out["t_incremental_batch"] / max(out["t_fresh_batch"], 1e-9), 3
    )
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(fresh, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
