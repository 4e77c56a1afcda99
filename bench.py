"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the end-to-end
KG-construction pipeline on the synthetic pages corpus, and prints ONE
JSON line:

    {"metric": "e2e_pipeline_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "pipeline": {"pages": P, "triples": T, "triples_per_sec": R,
                  "pages_per_sec": R2}, "cpus": C}

Scaling evidence (north rule): run twice, SPARK_GRAFT_CPUS=8 then =32, on
identical input; efficiency = T_8 / (4 * T_32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_revenue_by_nation",
    "q_top2_orders_per_customer",
    "kg_record_triples",
    "kg_structural_features",
    "kg_characteristic_sets",
    "kg_concept_hierarchy",
    "dd_minhash_signatures",
    "dd_lsh_near_dup_capped",
    "dd_simhash",
    "tx_quality_scores",
    "tx_fingerprints",
    "sim_cosine_topk",
    "sim_lsh_ann",
    "sim_lsh_ann_multiprobe",
    "sim_ivf_ann",
    "dd_embedding_near_dup",
    "ev_sessions",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "4000"))
    n_entities = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "500"))

    from concept_hierarchy_formation_in_property_graphs_spark import queries as q
    from concept_hierarchy_formation_in_property_graphs_spark.session import get_spark

    spark = get_spark(app_name="chf-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    reg = q.registry()
    # JVM/JIT + python-worker warmup so per-query numbers are steady-state
    # (a long-lived cluster's first job is not the benchmark)
    reg["q_deterministic_sample"](spark, sf_dir).count()
    reg["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = reg[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # end-to-end pipeline: pages -> ... -> concept hierarchy (checkpointed,
    # the production shape incl. snapshot writes)
    from concept_hierarchy_formation_in_property_graphs_spark.fixtures.pages import (
        pages_spark_df,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.plans.pipeline import (
        run_pipeline,
    )

    pages = pages_spark_df(
        spark, n_pages, n_entities=n_entities, partitions=max(cpus, 8)
    ).cache()
    pages.count()  # exclude driver-side fixture generation from the timing
    wd = tempfile.mkdtemp(prefix="chf_bench_")
    t0 = time.time()
    out = run_pipeline(spark, pages, wd, n_entities=n_entities)
    n_triples = out["triples"].count()
    out["concepts"].count()
    pipeline_sec = round(time.time() - t0, 3)
    shutil.rmtree(wd, ignore_errors=True)

    result = {
        "metric": "e2e_pipeline_sec",
        "value": pipeline_sec,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        "pipeline": {
            "pages": n_pages,
            "triples": n_triples,
            "pages_per_sec": round(n_pages / pipeline_sec, 2),
            "triples_per_sec": round(n_triples / pipeline_sec, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
