"""spark-submit entry point: score extraction output against ground truth.

  spark-submit --py-files fkg.zip jobs/evaluate.py \
      --docs /path/documents --alias /path/alias_dict --gt /path/gt_extractions
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
    ap.add_argument("--gt", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from financial_knowledge_graphs_spark.operators import evaluate, extract, prep
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark("fkg-evaluate", master=args.master)
    docs = spark.read.parquet(args.docs)
    alias = spark.read.parquet(args.alias)
    staged = prep.dedup_by_story(prep.quality_filter(prep.with_story(docs)))
    ext = extract.run_extraction(staged, extract.make_extract_udf(spark, alias))
    pred = ext.select("doc_id", F.to_json(F.col("extraction")).alias("payload"))
    gt = spark.read.parquet(args.gt).select(
        "doc_id", F.to_json(F.struct("entities", "relationships")).alias("payload")
    )
    metrics = evaluate.corpus_metrics(evaluate.per_doc_metrics(pred, gt))
    print(json.dumps({k: round(v, 6) for k, v in metrics.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
