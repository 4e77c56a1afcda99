"""Two-parallelism scaling evidence for the corpus-curation job.

The north rule's two-cluster-size criterion, applied to the curation
pipeline (`jobs/run_corpus_job.py`): run the identical job on the
identical synthetic corpus at two local[] parallelism levels and report
throughput at both plus the scaling efficiency. The corpus is generated
deterministically in-Spark (md5-derived tokens with injected stopwords —
no external data), so every run curates the same documents.

Usage:
    python tools/scaling_corpus.py [n_docs] [cpus_lo] [cpus_hi]
    # defaults: 400000 2 8   (2 vs 8 per the sandbox envelope —
    #   this VM's 32 vCPUs are ~16 effective cores; see BASELINE.md)

Runs each level in its own subprocess (fresh JVM, no cache crosstalk),
with a small warmup job inside each so the timed run measures
steady-state throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
sys.path.insert(0, os.path.join(%(repo)r, "jobs"))
from concept_hierarchy_formation_in_property_graphs_spark.session import get_spark
from run_corpus_job import run

cpus = %(cpus)d
# a ~25 MB synthetic corpus packs into ONE 128 MB file-partition, which
# serializes every scan stage; a real corpus has thousands of splits.
# Model that: 1 MB split target -> ~25 scan partitions at 100k docs.
spark = get_spark(app_name=f"chf-corpus-scale-{cpus}", cpus=cpus,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(1 << 20)})
spark.sparkContext.setLogLevel("ERROR")

# warmup: tiny slice, fresh workdir (JIT + codegen + shuffle paths)
warm_wd = tempfile.mkdtemp(prefix=f"corpus_warm_{cpus}_")
run(spark, %(warm)r, warm_wd, bench_path=%(bench)r, n_shards=4)
shutil.rmtree(warm_wd)

wd = tempfile.mkdtemp(prefix=f"corpus_scale_{cpus}_")
t0 = time.time()
out = run(spark, %(docs)r, wd, bench_path=%(bench)r, n_shards=16)
dt = time.time() - t0
shutil.rmtree(wd)
print("RESULT " + json.dumps({"cpus": cpus, "sec": round(dt, 2),
                              "total": out["total"],
                              "admitted": out["admitted"],
                              "docs_per_sec": round(out["total"] / dt, 1)}))
"""


def synth_corpus(path: str, n_docs: int, seed: int, build_cpus: int = 8) -> None:
    from pyspark.sql import functions as F

    from concept_hierarchy_formation_in_property_graphs_spark.session import get_spark

    spark = get_spark(app_name="chf-corpus-gen", cpus=build_cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # 60 tokens/doc: every 3rd token a stopword (passes language/quality),
    # the rest md5-derived (trigram-unique, passes repetition thresholds)
    tok = (
        "CASE WHEN i % 3 = 0 THEN (CASE WHEN i % 2 = 0 THEN 'the' ELSE 'of' END) "
        f"ELSE substr(md5(concat(cast(id as string), ':', cast(i as string), ':{seed}')), 1, 6) END"
    )
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, 60), i -> {tok}), ' ')"
        ).alias("text"),
    )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    base = tempfile.mkdtemp(prefix="corpus_scale_data_")
    docs, warm, bench = (os.path.join(base, d) for d in ("docs", "warm", "bench"))
    synth_corpus(docs, n_docs, seed=1)
    synth_corpus(warm, 5_000, seed=1)
    synth_corpus(bench, 2_000, seed=2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    try:
        for cpus in (lo, hi):
            code = WORKER % {"repo": repo, "cpus": cpus, "docs": docs,
                             "warm": warm, "bench": bench}
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True, check=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
            results[cpus] = json.loads(line[len("RESULT "):])
            print(results[cpus])
        speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
        eff = speedup / (hi / lo)
        print(json.dumps({"n_docs": n_docs, "lo": results[lo], "hi": results[hi],
                          "speedup": round(speedup, 2),
                          "efficiency": round(eff, 2)}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
