"""spark-submit entry point: graph-table maintenance operations.

The ops-facing surface for the bucketed snapshot tables (the Iceberg
procedures a 100 TB deployment schedules — ``rewrite_data_files``,
``expire_snapshots``/``remove_orphan_files``, partition-spec growth,
``rollback_to_snapshot``, incremental consume):

  spark-submit --py-files fkg.zip jobs/table_maintenance.py \
      --table /path/wh/graph/triples <command> [args]

Commands:
  snapshots                       list committed snapshots (id, ts, rows)
  stats                           manifest-level table stats, no scan
  compact [--max-files N]         fold over-full buckets (default to 1 file)
  cluster --by COL [--files N]    sort-order rewrite: range-split each
                                  bucket on COL so manifest bounds prune
          [--zorder]              Morton-interleave the --by columns: tight
                                  bounds on EVERY dimension, not just the
                                  leading one (numeric/date/timestamp cols)
          [--zorder-bits N]       rank granularity per z-order dimension
                                  (default 4; N*ncols must be <= 63)
  rebucket --keys k1,k2 --n N     grow/shrink the hash layout online
  rollback --snapshot SID         restore a retained snapshot (new commit)
  tag --name N [--snapshot SID]   pin a snapshot as a named ref (never expires)
  drop-tag --name N               remove a named ref
  tags                            list named refs
  gc                              expire old snapshots + orphan staging
  changes --from SID [--to SID] [--out DIR]
                                  row-level delta between snapshots; print
                                  counts or write parquet to --out

Maintenance ops are offline by contract: a merge committing underneath
raises CommitConflictError instead of losing either write — rerun after
inspecting the winner.

Also runnable as plain `python jobs/table_maintenance.py ...` (local mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("snapshots")
    sub.add_parser("stats")
    p = sub.add_parser("compact")
    p.add_argument("--max-files", type=int, default=1)
    p = sub.add_parser("cluster")
    p.add_argument("--by", required=True, help="sort/cluster column")
    p.add_argument("--files", type=int, default=4, help="range chunks per bucket")
    p.add_argument("--zorder", action="store_true",
                   help="interleaved-bit Morton key over --by columns: "
                        "chunks become tight hyper-rectangles, range scans "
                        "prune on ANY clustered column (numeric/date/ts only)")
    p.add_argument("--zorder-bits", type=int, default=4,
                   help="rank granularity per z-order dimension "
                        "(2**bits quantile ranks; bits*ncols must be <= 63)")
    p = sub.add_parser("rebucket")
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument("--n", type=int, required=True)
    p = sub.add_parser("rollback")
    p.add_argument("--snapshot", type=int, required=True)
    p = sub.add_parser("tag")
    p.add_argument("--name", required=True)
    p.add_argument("--snapshot", type=int, default=None)
    p = sub.add_parser("drop-tag")
    p.add_argument("--name", required=True)
    sub.add_parser("tags")
    sub.add_parser("gc")
    p = sub.add_parser("changes")
    p.add_argument("--from", dest="from_sid", type=int, required=True)
    p.add_argument("--to", dest="to_sid", type=int, default=None)
    p.add_argument("--out", default=None, help="write the delta as parquet here")
    args = ap.parse_args()

    from financial_knowledge_graphs_spark.operators import materialize as m

    t = args.table
    # metadata-only commands need no SparkSession at all
    if args.cmd == "snapshots":
        for s in m.snapshots(t):
            rows = sum(v.get("rows", 0) for v in (s.get("stats") or {}).values())
            print(json.dumps({"snapshot_id": s["snapshot_id"], "ts": s.get("ts"),
                              "n_buckets": s.get("n_buckets"), "rows": rows}))
        return
    if args.cmd == "stats":
        print(json.dumps(m.table_stats(t)))
        return
    if args.cmd == "rollback":
        sid = m.rollback_table(t, args.snapshot)
        print(json.dumps({"rolled_back_to": args.snapshot, "new_snapshot": sid}))
        return
    if args.cmd == "tag":
        sid = m.tag_snapshot(t, args.name, args.snapshot)
        print(json.dumps({"tag": args.name, "snapshot": sid}))
        return
    if args.cmd == "drop-tag":
        m.drop_tag(t, args.name)
        print(json.dumps({"dropped": args.name}))
        return
    if args.cmd == "tags":
        print(json.dumps(m.table_tags(t)))
        return
    if args.cmd == "gc":
        m._gc_versions(t)
        print(json.dumps({"gc": "done",
                          "snapshots": [s["snapshot_id"] for s in m.snapshots(t)]}))
        return

    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark("fkg-maintenance", master=args.master)
    try:
        if args.cmd == "compact":
            before = m.table_stats(t)
            m.compact_table(spark, t, max_files=args.max_files)
            after = m.table_stats(t)
            print(json.dumps({"files_before": (before or {}).get("files"),
                              "files_after": (after or {}).get("files")}))
        elif args.cmd == "cluster":
            m.cluster_table(spark, t, args.by.split(","),
                            files_per_bucket=args.files, zorder=args.zorder,
                            zorder_bits=args.zorder_bits)
            print(json.dumps({"clustered_by": args.by, "zorder": args.zorder,
                              "snapshot": m.snapshots(t)[-1]["snapshot_id"]}))
        elif args.cmd == "rebucket":
            m.rebucket_table(spark, t, args.keys.split(","), args.n)
            print(json.dumps({"n_buckets": args.n,
                              "snapshot": m.snapshots(t)[-1]["snapshot_id"]}))
        elif args.cmd == "changes":
            from pyspark.sql import functions as F

            # resolve the live sid NOW so the consumer can pin its next
            # --from offset (printing "to": null loses the offset and a
            # re-poll would re-apply the same delta)
            to_sid = (args.to_sid if args.to_sid is not None
                      else m.snapshots(t)[-1]["snapshot_id"])
            df = m.read_table_changes(spark, t, args.from_sid, to_sid)
            if args.out:
                df.write.mode("overwrite").parquet(args.out)
                df = spark.read.parquet(args.out)  # don't re-run the diff
            counts = {r["_change_type"]: r["n"] for r in
                      df.groupBy("_change_type")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            print(json.dumps({"from": args.from_sid, "to": to_sid,
                              "out": args.out, "counts": counts}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
