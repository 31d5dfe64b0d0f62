"""Scaling-efficiency protocol (north rule: ≥0.8 efficiency from N to 4N
executors; sandbox substitute per driver instruction: local[8] vs local[32]
on the same input).

Runs the identical end-to-end KG pipeline job on the same cached corpus at
two parallelism levels in separate JVMs, reports docs/sec at both plus
efficiency = (T_low / T_high) / (cpus_high / cpus_low), and rewrites the
measurement section of BENCH/BASELINE.md.

Usage: python bench_scaling.py [n_docs] (default 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from financial_knowledge_graphs_spark.session import get_spark
from financial_knowledge_graphs_spark.pipeline import PipelineConfig, run_pipeline

cpus = int(sys.argv[1]); corpus = sys.argv[2]
spark = get_spark("fkg-scaling", master=f"local[{{cpus}}]", shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(corpus, "documents"))
alias = spark.read.parquet(os.path.join(corpus, "alias_dict"))
wh = tempfile.mkdtemp(prefix="fkg_scale_wh_")
t0 = time.time()
res = run_pipeline(spark, docs, alias, PipelineConfig(warehouse=wh))
dt = time.time() - t0
shutil.rmtree(wh, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": round(dt, 3),
                               "docs": res.docs_processed,
                               "docs_per_sec": round(res.docs_processed / dt, 3)}}))
spark.stop()
"""


def run_level(cpus: int, corpus: str) -> dict:
    script = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), corpus],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def ensure_corpus(n_docs: int) -> str:
    corpus = os.path.join(REPO, ".fixtures", f"bench_corpus_n{n_docs}_s42")
    if not os.path.exists(os.path.join(corpus, "_COMPLETE")):
        from financial_knowledge_graphs_spark import fixtures
        from financial_knowledge_graphs_spark.session import get_spark

        spark = get_spark("fkg-gen", extra_conf={"spark.ui.showConsoleProgress": "false"})
        spark.sparkContext.setLogLevel("ERROR")
        os.makedirs(corpus, exist_ok=True)
        fixtures.write_corpus(spark, corpus, n_docs=n_docs, seed=42)
        open(os.path.join(corpus, "_COMPLETE"), "w").write("ok")
        spark.stop()
    return corpus


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    corpus = ensure_corpus(n_docs)
    low = run_level(8, corpus)
    high = run_level(32, corpus)
    eff = (low["seconds"] / high["seconds"]) / (32 / 8)
    result = {
        "n_docs": n_docs,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    md = f"""
## 4. Measured results (this engine, deterministic fixture corpus)

Protocol: identical end-to-end KG pipeline job (read interleaved docs →
extract → link → canonicalize → materialize graph + ops tables), same
{n_docs:,}-doc corpus, identical shuffle partitioning (64), separate JVMs,
quiet machine, local[8] vs local[32] — the sandbox
substitute for N vs 4N executors mandated by the driver.

| parallelism | wall time (s) | docs processed | docs/sec |
|---|---|---|---|
| local[8]  | {low['seconds']} | {low['docs']} | {low['docs_per_sec']} |
| local[32] | {high['seconds']} | {high['docs']} | {high['docs_per_sec']} |

Scaling efficiency = (T8 / T32) / 4 = **{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("# BENCH — measured baseline numbers\n" + md)


if __name__ == "__main__":
    main()
