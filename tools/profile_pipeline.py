"""Per-stage wall-clock profile of the KG pipeline at one parallelism level.

Usage: python tools/profile_pipeline.py <cpus> [corpus_dir]
Prints STAGE <name> <seconds> lines and a final PROFILE json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from financial_knowledge_graphs_spark.operators import extract, materialize, prep  # noqa: E402
from financial_knowledge_graphs_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".fixtures", "bench_corpus_n20000_s42"
    )
    spark = get_spark(
        "fkg-profile", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        print(f"STAGE {name} {dt:.3f}", flush=True)
        return time.time()

    t = time.time()
    docs = spark.read.parquet(os.path.join(corpus, "documents"))
    alias = spark.read.parquet(os.path.join(corpus, "alias_dict"))
    n_files = docs.rdd.getNumPartitions()
    t = mark("read_setup", t)

    prepared = prep.dedup_by_story(prep.quality_filter(prep.with_story(docs)))
    prepared = prepared.repartition(3 * spark.sparkContext.defaultParallelism, "doc_id")
    udf = extract.make_extract_udf(spark, alias)
    extracted = extract.run_extraction(prepared, udf).select("doc_id", "extraction")
    extracted = extracted.persist()
    n_docs = extracted.count()
    t = mark("prep_extract", t)

    mentions = extract.mentions_df(extracted)
    raw_triples = extract.raw_triples_df(extracted)
    mapping = materialize.canonical_mapping(mentions, max_block=1000)
    mapping = mapping.persist()
    n_map = mapping.count()
    t = mark("canonical_mapping", t)

    vertices = materialize.build_vertices(mentions, mapping)
    nv = vertices.count()
    t = mark("build_vertices", t)

    triples, dropped, _ep = materialize.build_triples(raw_triples, mentions, mapping)
    nt = triples.count()
    t = mark("build_triples", t)

    wh = tempfile.mkdtemp(prefix="fkg_prof_wh_")
    materialize.merge_upsert(spark, os.path.join(wh, "vertices"), vertices, ["entity_id"])
    materialize.merge_upsert(
        spark, os.path.join(wh, "triples"), triples,
        ["doc_id", "subj", "pred", "obj", "valueAmount", "percentage", "transactionDate"],
    )
    t = mark("merge_upsert", t)
    shutil.rmtree(wh, ignore_errors=True)

    total = sum(timings.values())
    print("PROFILE " + json.dumps({
        "cpus": cpus, "input_partitions": n_files, "docs": n_docs,
        "mapping_rows": n_map, "vertices": nv, "triples": nt,
        "timings": timings, "total": round(total, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
