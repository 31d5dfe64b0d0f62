"""spark-submit entry point: end-to-end KG construction.

  spark-submit --py-files fkg.zip jobs/run_pipeline.py \
      --docs /path/documents --alias /path/alias_dict \
      --warehouse /path/wh [--run-id r1 | --new-run] [--batch-size 5000]

Also runnable as plain `python jobs/run_pipeline.py ...` (local mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--alias", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default=None,
                    help="default: continue the latest registered run")
    ap.add_argument("--new-run", action="store_true",
                    help="allocate the next run_id from the registry")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--min-tokens", type=int, default=250)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.new_run and args.run_id:
        # mutually exclusive: --new-run would silently discard the explicit
        # --run-id (and its resume/checkpoint state); fail before any work
        ap.error("--run-id and --new-run are mutually exclusive")

    from financial_knowledge_graphs_spark.pipeline import PipelineConfig, run_pipeline
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark("fkg-pipeline", master=args.master)
    docs = spark.read.parquet(args.docs)
    alias = spark.read.parquet(args.alias)
    run_id = args.run_id
    if args.new_run:
        from financial_knowledge_graphs_spark.ops import OpsStore

        run_id = OpsStore(spark, os.path.join(args.warehouse, "ops")).next_run_id()
    res = run_pipeline(
        spark, docs, alias,
        PipelineConfig(
            warehouse=args.warehouse, run_id=run_id,
            batch_size=args.batch_size, min_tokens=args.min_tokens,
        ),
    )
    print(json.dumps({
        "run_id": res.extra.get("run_id"),
        "docs_in": res.docs_in,
        "docs_processed": res.docs_processed,
        "mentions": res.mentions,
        "triples": res.triples,
        "dropped_endpoint_rows": res.dropped_endpoint_rows,
        "seconds": round(res.seconds, 3),
        "docs_per_sec": round(res.docs_processed / res.seconds, 3) if res.seconds else 0,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
