"""Write-amplification micro-bench: COW vs merge-on-read on one merge.

Seeds a table of N rows (32 buckets), then applies one U-row update
batch in each mode and reports the bytes the commit WROTE (new version
dirs only) plus merge wall time. Bytes-written is the scale-invariant
signal: COW rewrites every touched bucket (O(buckets_touched x
bucket_bytes) — at a fixed update count that is ~the whole table once U
>= buckets), MOR stages O(batch) regardless of table size. Wall time at
sandbox scale under-sells MOR because tiny buckets make COW rewrites
cheap; the bytes ratio is what a 100 TB deployment feels.

  python jobs/bench_mor_writes.py [n_rows=2000000] [n_updates=10000]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _dirs(path: str) -> set[str]:
    out = set()
    for root, dirs, _files in os.walk(path):
        for d in dirs:
            out.add(os.path.join(root, d))
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_upd = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from financial_knowledge_graphs_spark.operators import materialize as M
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark(
        "bench-mor-writes", master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_rows": n_rows, "n_updates": n_upd}
    base = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
        (F.col("id") % 1000).alias("grp"),
    )
    # update keys spread uniformly -> touch ~all 32 buckets (the regime
    # where COW degenerates to a near-full rewrite)
    upd = spark.range(n_upd).select(
        (F.col("id") * (n_rows // n_upd)).alias("k"),
        F.lit("updated").alias("v"),
        F.lit(-1).cast("bigint").alias("grp"),
    )

    for mode in ("cow", "mor"):
        t = os.path.join(tempfile.mkdtemp(prefix=f"morw_{mode}_"), "tbl")
        M.merge_upsert(spark, t, base, ["k"], 32)
        before_dirs = _dirs(t)
        before_bytes = _du(t)
        t0 = time.time()
        M.merge_upsert(spark, t, upd, ["k"], 32, mode=mode)
        wall = round(time.time() - t0, 3)
        new_dirs = _dirs(t) - before_dirs
        written = sum(_du(d) for d in new_dirs if os.path.isdir(d))
        out[mode] = {
            "table_bytes_before": before_bytes,
            "merge_wall_s": wall,
            "bytes_written": written,
            "new_dirs": len(new_dirs),
        }
    c, m = out["cow"]["bytes_written"], out["mor"]["bytes_written"]
    out["write_amplification_cow_over_mor"] = round(c / max(m, 1), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
