"""One scaling-run worker: run the full KG pipeline at a given parallelism.

Usage: python tools/scaling_run.py <cpus> <pages_parquet> <n_entities> <out_json>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    pages_path = sys.argv[2]
    n_entities = int(sys.argv[3])
    out_json = sys.argv[4]

    from concept_hierarchy_formation_in_property_graphs_spark.plans.pipeline import (
        run_pipeline,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.session import get_spark

    # heap sized to concurrency: N tasks each hold an Arrow batch of
    # MB-sized html rows plus shuffle buffers (on a real cluster this is
    # per-executor memory; in local mode one JVM carries all N)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM") or f"{max(16, 2 * cpus)}g"
    spark = get_spark(
        app_name=f"chf-scale-{cpus}", cpus=cpus,
        extra_conf={"spark.driver.memory": mem},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/JIT + python-worker warmup on a tiny slice, so the timed run
    # measures steady-state throughput (what a long-lived cluster sees)
    from concept_hierarchy_formation_in_property_graphs_spark.fixtures.pages import (
        pages_spark_df,
    )

    warm_wd = tempfile.mkdtemp(prefix=f"chf_warm_{cpus}_")
    warm = run_pipeline(
        spark, pages_spark_df(spark, 300, n_entities=n_entities),
        warm_wd, n_entities=n_entities,
    )
    warm["triples"].count()
    warm["concepts"].count()
    shutil.rmtree(warm_wd, ignore_errors=True)

    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()  # warm FS cache, exclude from timing

    wd = tempfile.mkdtemp(prefix=f"chf_scale_{cpus}_")
    t0 = time.time()
    out = run_pipeline(spark, pages, wd, n_entities=n_entities)
    n_triples = out["triples"].count()
    out["concepts"].count()
    wall = time.time() - t0
    shutil.rmtree(wd, ignore_errors=True)

    with open(out_json, "w") as f:
        json.dump(
            {
                "cpus": cpus,
                "pages": n_pages,
                "triples": n_triples,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 2),
                "triples_per_sec": round(n_triples / wall, 2),
            },
            f,
        )
    spark.stop()


if __name__ == "__main__":
    main()
