"""spark-submit entry point: materialize the deterministic fixture corpus.

  spark-submit --py-files fkg.zip jobs/generate_corpus.py --out DIR --n-docs 100000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    ap.add_argument("--zipf", action="store_true",
                    help="log-uniform (Zipf s~1) tail popularity instead of uniform")
    args = ap.parse_args()

    from financial_knowledge_graphs_spark import fixtures
    from financial_knowledge_graphs_spark.session import get_spark

    spark = get_spark("fkg-generate", master=args.master)
    fixtures.write_corpus(spark, args.out, n_docs=args.n_docs, seed=args.seed,
                          zipf=args.zipf)
    print(f"corpus written to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
