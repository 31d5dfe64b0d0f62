"""SparkSession factory with scale-oriented defaults.

The sandbox runs local[N] on one JVM; the config set below is the same one a
1000-executor deployment would ship (AQE + skew-join splitting on, Arrow
vectorization on, sane shuffle sizing), so plans exercised in tests are the
plans we'd get on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "fkg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    Key choices, and why they survive a 100x scale-up:
    - AQE on + skew-join on: hub entities (a major bank in ~30% of docs)
      produce skewed join keys; AQE splits those partitions at runtime.
    - ``spark.sql.shuffle.partitions`` defaults to 2 x cores locally; on a
      real cluster it is overridden per job (or left to AQE coalescing).
    - Arrow enabled with a bounded batch size so the pandas-UDF extraction
      stage streams fixed-size record batches instead of whole partitions.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cores = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's post-shuffle coalescing targets BYTES (64MB default) and is
        # core-oblivious: a 150MB shuffle collapses to ~3 tasks no matter how
        # many cores exist, capping CPU-heavy downstream stages (parquet
        # compression, wide sorts) far below the cluster. 8MB advisory keeps
        # coalesced stages at >= core-count tasks for our table sizes while
        # still folding away empty partitions.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", str(8 * 1024 * 1024)),
        )
        # Static shuffle partitions get a floor of 64 (not bare 2 x cores):
        # AQE can only coalesce DOWN, so a low-core session would otherwise
        # hard-cap wide shuffles (a 2-core run sorting a 2GB window shuffle
        # in 4 giant spill-prone tasks). Same value at every parallelism
        # level = same plan, which is what a fair N vs 4N comparison needs.
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or max(64, 2 * cores))
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 32MB scan splits (not the 128MB default): the corpus ships in
        # O(10) ~100MB files, and file-granular splits leave a 2-wave
        # straggler tail on an 8-core run (10 tasks / 8 cores). Finer splits
        # keep every core busy; at petabyte scale the file count dwarfs the
        # core count and this knob stops mattering (overridable via env).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", str(32 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Shuffle spill dir: prefer RAM-backed tmpfs when present AND large
    # enough. On a real cluster every executor brings its own local disks, so
    # shuffle bandwidth scales with the node count; a single shared disk is a
    # one-box artifact that caps shuffle-heavy stages regardless of core
    # count. Docker defaults /dev/shm to 64MB — spilling there would ENOSPC
    # mid-job (ADVICE r1) — so tmpfs is only used when it has real capacity;
    # otherwise Spark's default local dir stands. Overridable via
    # SPARK_GRAFT_LOCAL_DIR.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:  # >= 8 GiB free
                local_dir = "/dev/shm/spark-local"
        except OSError:
            pass
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
