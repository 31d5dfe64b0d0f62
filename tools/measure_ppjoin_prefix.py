"""Measure the ppjoin prefix-order change (VERDICT r4 next #3).

Compares candidate-pair counts and wall time for ngram_jaccard_pairs'
prefix filter under the two global total orders:

- md5(shingle)            — the r1-r4 order (valid but frequency-blind:
                            prefixes regularly land on corpus-common
                            shingles, whose blocks explode into pairs)
- (doc-frequency, md5)    — the canonical ppjoin order (Xiao et al. 2011),
                            r5: prefixes land on each doc's RAREST
                            shingles, so blocking keys are near-unique

Both orders are exact (the prefix bound is order-agnostic), so the final
pair set must be IDENTICAL — asserted here. What changes is the candidate
set the verify join must score.

Usage: python tools/measure_ppjoin_prefix.py [sf_dir]
Prints one JSON line with candidate counts, final pairs, and timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from financial_knowledge_graphs_spark.operators.dedup import (
        ngram_jaccard_pairs, shingles_expr,
    )
    from financial_knowledge_graphs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold, n, max_block = 0.8, 3, 200
    spark = get_spark("ppjoin-measure",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = docs.select(
        F.col("doc_id").alias("id"), shingles_expr(F.col("text"), n).alias("sh")
    ).persist()
    sh.count()

    def candidates(ex) -> int:
        """id-only candidate pairs after the block cap — the set the
        verify join would have to score (same logic as the operator)."""
        sizes = ex.groupBy("s").agg(F.count(F.lit(1)).alias("bs"))
        ex = ex.join(F.broadcast(sizes.filter(F.col("bs") > max_block)),
                     "s", "left_anti")
        a = ex.select("s", F.col("id").alias("id_a"))
        b = ex.select("s", F.col("id").alias("id_b"))
        return (a.join(b, "s").filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct().count())

    # --- md5 order (the old path) --------------------------------------
    plen_arr = (
        F.size("sh")
        - F.ceil(F.size("sh") * F.lit(threshold) - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    t0 = time.time()
    ex_md5 = sh.select(
        "id",
        F.explode(
            F.slice(F.array_sort(F.transform(F.col("sh"), lambda s: F.md5(s))),
                    F.lit(1), plen_arr)
        ).alias("s"),
    )
    cand_md5 = candidates(ex_md5)
    t_md5 = time.time() - t0

    # --- df order (the r5 operator path) -------------------------------
    plen_sz = (
        F.col("sz")
        - F.ceil(F.col("sz") * F.lit(threshold) - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    t0 = time.time()
    ex_all = sh.select("id", F.size("sh").alias("sz"),
                       F.explode("sh").alias("shingle"))
    dfreq = ex_all.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfq"))
    wid = Window.partitionBy("id").orderBy(F.col("dfq").asc(),
                                           F.md5("shingle").asc())
    ex_df = (ex_all.join(dfreq, "shingle")
             .withColumn("rn", F.row_number().over(wid))
             .filter(F.col("rn") <= plen_sz)
             .select("id", F.md5("shingle").alias("s")))
    cand_df = candidates(ex_df)
    t_df = time.time() - t0

    # exactness cross-check: the operator's final pair set at this sf
    t0 = time.time()
    pairs = ngram_jaccard_pairs(docs, threshold=threshold, n=n,
                                max_block=max_block)
    n_pairs = pairs.count()
    t_op = time.time() - t0
    sh.unpersist()
    print(json.dumps({
        "sf_dir": sf_dir,
        "candidates_md5_order": cand_md5,
        "candidates_df_order": cand_df,
        "reduction": round(cand_md5 / max(cand_df, 1), 2),
        "final_pairs": n_pairs,
        "candgen_sec_md5": round(t_md5, 2),
        "candgen_sec_df": round(t_df, 2),
        "operator_sec_df_order": round(t_op, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
