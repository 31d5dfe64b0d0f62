"""spark-submit entry point: CDC tail-and-apply (table replication).

Tails a graph table's snapshot changelog with the Structured Streaming
CDC source (``format("graph_table_changes")``, Spark 4 Python DataSource)
and applies each micro-batch's delta to a downstream replica table via
the keyed MERGE — the Iceberg "CDC apply" pattern for keeping a
differently-bucketed / differently-placed copy fresh without re-reading
the source. Runs with Trigger.AvailableNow (drain-and-stop): schedule it
as a catch-up job, offsets live in the checkpoint, and the consumer's
committed offset is pinned on the source by default so the diff base
survives snapshot retention GC no matter how far behind the replica
falls.

  spark-submit --py-files fkg.zip jobs/stream_cdc_apply.py \
      --src /path/wh/graph/triples --dst /path/replica/triples \
      --keys doc_id,subj_id,pred,obj_id \
      --checkpoint /path/replica/_checkpoints/triples \
      [--n-buckets 32] [--mode cow|mor] [--no-pin]

Effectively-once end to end: offsets are checkpointed snapshot ids and
the apply is an idempotent keyed merge, so a replayed batch is a no-op.
Also runnable as plain `python jobs/stream_cdc_apply.py ...` (local mode).

Deployment note: the CDC source is a Spark 4 Python DataSource, and its
PLANNER runs in a separate Python worker that does not see ``--py-files``
— put the zip on PYTHONPATH as well (``PYTHONPATH=fkg.zip spark-submit
--py-files fkg.zip ...``) or the stream fails at plan time with
ModuleNotFoundError.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="source graph table path")
    ap.add_argument("--dst", required=True, help="replica table path")
    ap.add_argument("--keys", required=True, help="comma-separated merge keys")
    ap.add_argument("--checkpoint", required=True,
                    help="stream checkpoint dir (holds the committed offset)")
    ap.add_argument("--n-buckets", type=int, default=32,
                    help="replica bucket count (may differ from the source)")
    ap.add_argument("--mode", choices=("cow", "mor"), default="cow",
                    help="replica merge mode (mor = write-optimized applies)")
    ap.add_argument("--no-pin", action="store_true",
                    help="don't tag the committed offset on the source "
                         "(falls back to the raw retention bound)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from financial_knowledge_graphs_spark.operators.materialize import (
        snapshots, table_stats,
    )
    from financial_knowledge_graphs_spark.session import get_spark
    from financial_knowledge_graphs_spark.streaming.cdc_source import (
        stream_apply_changes,
    )

    spark = get_spark("fkg-cdc-apply", master=args.master)
    try:
        q = stream_apply_changes(
            spark, args.src, args.dst, args.keys.split(","),
            n_buckets=args.n_buckets, checkpoint=args.checkpoint,
            mode=args.mode, pin=None if args.no_pin else "auto",
        )
        q.awaitTermination()
        src_st = table_stats(args.src) or {}
        dst_st = table_stats(args.dst) or {}
        print(json.dumps({
            "src": args.src, "dst": args.dst,
            "src_rows": src_st.get("rows"), "dst_rows": dst_st.get("rows"),
            "dst_snapshots": [s["snapshot_id"] for s in snapshots(args.dst)],
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
