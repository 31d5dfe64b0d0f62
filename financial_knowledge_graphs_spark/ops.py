"""Operational tables: checkpoints, lineage, metrics (FIXTURES.md §6).

Replaces the reference's filesystem metadata (execution_info.json /
metadata.json / summary.json — reference src/utils/batch_utils.py:156-164,
src/llm/openai_batch_processor.py:147-157) with three append-only tables.
Resume = left-anti join of input docs against the checkpoint table — the
exact semantics of the reference's processed_item_ids skip
(reference src/runners/run_llm_task.py:37-49).

Parquet-append here; on Iceberg these become ``writeTo(...).append()`` on
unpartitioned tables (tiny relative to the data plane).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas


class OpsStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.checkpoints_path = os.path.join(root, "checkpoints")
        self.lineage_path = os.path.join(root, "lineage")
        self.metrics_path = os.path.join(root, "metrics")
        self.runs_path = os.path.join(root, "runs")

    # -- run registry (SURVEY §2.3 rows 20-21) ------------------------------
    def next_run_id(self) -> str:
        """Allocate run_{max(run_num)+1} and register it — the reference's
        next-version counter (reference src/utils/batch_utils.py:117-158)."""
        nums = [r["run_num"] for r in self.read("runs").select("run_num").collect()]
        n = (max(nums) + 1) if nums else 1
        run_id = f"run_{n}"
        self.spark.createDataFrame(
            [(run_id, n)], "run_id string, run_num int"
        ).withColumn("created_at", F.current_timestamp()).write.mode("append").parquet(
            self.runs_path
        )
        return run_id

    def latest_run_id(self) -> str | None:
        """Highest-numbered registered run — the reference's latest-version
        pick (reference src/utils/batch_utils.py:95-115)."""
        rows = self.read("runs").orderBy(F.desc("run_num")).limit(1).collect()
        return rows[0]["run_id"] if rows else None

    # -- checkpoints --------------------------------------------------------
    def processed_docs(self, run_id: str, stage: str) -> DataFrame:
        if not os.path.isdir(self.checkpoints_path):
            return self.spark.createDataFrame([], schemas.CHECKPOINTS).select("doc_id")
        cp = self.spark.read.schema(schemas.CHECKPOINTS).parquet(self.checkpoints_path)
        return cp.filter(
            (F.col("run_id") == run_id) & (F.col("stage") == stage)
        ).select("doc_id")

    def checkpoint_docs(self, run_id: str, stage: str, docs: DataFrame,
                        id_col: str = "doc_id") -> None:
        out = docs.select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col(id_col).alias("doc_id"),
            F.spark_partition_id().alias("partition_id"),
            F.current_timestamp().alias("updated_at"),
        )
        out.write.mode("append").parquet(self.checkpoints_path)

    # -- lineage ------------------------------------------------------------
    def log_lineage(self, run_id: str, stage: str, input_rows: int,
                    output_rows: int, dropped_rows: int, status: str = "ok") -> None:
        row = self.spark.sql(
            "SELECT current_timestamp() AS started_at, current_timestamp() AS finished_at"
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.lit(-1).cast("int").alias("partition_id"),  # -1 = whole-stage row
            F.lit(input_rows).cast("long").alias("input_rows"),
            F.lit(output_rows).cast("long").alias("output_rows"),
            F.lit(dropped_rows).cast("long").alias("dropped_rows"),
            "started_at", "finished_at",
            F.lit(status).alias("status"),
        )
        row.write.mode("append").parquet(self.lineage_path)

    def log_partition_lineage(self, run_id: str, stage: str, df: DataFrame) -> None:
        """Per-partition row counts (north rule: per-partition lineage)."""
        per_part = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count(F.lit(1)).alias("output_rows")
        )
        out = per_part.select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.col("output_rows").alias("input_rows"),
            F.col("output_rows"),
            F.lit(0).cast("long").alias("dropped_rows"),
            F.current_timestamp().alias("started_at"),
            F.current_timestamp().alias("finished_at"),
            F.lit("ok").alias("status"),
        )
        out.write.mode("append").parquet(self.lineage_path)

    # -- metrics ------------------------------------------------------------
    def log_metrics(self, run_id: str, stage: str, values: dict[str, float]) -> None:
        rows = [(run_id, stage, k, float(v)) for k, v in values.items()]
        self.spark.createDataFrame(rows, schemas.METRICS).write.mode("append").parquet(
            self.metrics_path
        )

    def read(self, which: str) -> DataFrame:
        path = {"checkpoints": self.checkpoints_path,
                "lineage": self.lineage_path,
                "metrics": self.metrics_path,
                "runs": self.runs_path}[which]
        schema = {"checkpoints": schemas.CHECKPOINTS,
                  "lineage": schemas.LINEAGE,
                  "metrics": schemas.METRICS,
                  "runs": schemas.RUNS}[which]
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)
