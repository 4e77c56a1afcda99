"""spark-submit entry point for INCREMENTAL concept-hierarchy ingest.

Each launch merges one new instance batch into the persisted intent state
(never rescanning previous batches' instances) and re-emits the hierarchy
tables — the production shape of `operators/concepts.update_hierarchy`:

    zip -r chf_spark.zip concept_hierarchy_formation_in_property_graphs_spark
    spark-submit --master <cluster> --py-files chf_spark.zip \
        jobs/run_incremental_job.py --batch <instances-parquet> \
        --state-dir <dir> [--galois] [--out <hierarchy-parquet-dir>]

The batch parquet must have columns (instance_id STRING,
intent ARRAY<STRING>). The state dir uses the same versioned layout as
`operators/streaming.run_hierarchy_stream` (state/v{N} + CURRENT pointer +
per-batch inst/b{N}/), so a batch job and a streaming job can share state.
Because the lattice is a pure function of the merged state, any batch
arrival order yields the identical tree (test-enforced).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", required=True,
                    help="parquet with (instance_id, intent) for this batch")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--galois", action="store_true")
    ap.add_argument("--out", default=None,
                    help="optional dir to write concepts/assignments/closure")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
        _canonical_intents,
        intent_state,
        merge_intent_state,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.operators.streaming import (
        hierarchy_from_state_dir,
        load_hierarchy_state,
    )

    spark = SparkSession.builder.appName("chf-incremental-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    batch = spark.read.parquet(args.batch)
    prev = load_hierarchy_state(spark, args.state_dir)
    delta = intent_state(batch)
    state = delta if prev is None else merge_intent_state(prev, delta)

    versions_dir = os.path.join(args.state_dir, "state")
    os.makedirs(versions_dir, exist_ok=True)
    existing = [int(v[1:]) for v in os.listdir(versions_dir) if v.startswith("v")]
    version = (max(existing) + 1) if existing else 0
    state.write.mode("overwrite").parquet(os.path.join(versions_dir, f"v{version}"))
    # per-version subdirectory with overwrite (same replay-safe layout as
    # run_hierarchy_stream): a re-launched batch rewrites, never duplicates
    _canonical_intents(batch).write.mode("overwrite").parquet(
        os.path.join(args.state_dir, "inst", f"b{version}")
    )
    tmp = os.path.join(args.state_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, os.path.join(args.state_dir, "CURRENT"))

    out = hierarchy_from_state_dir(spark, args.state_dir, galois=args.galois)
    summary = {
        "version": version,
        "batch_rows": batch.count(),
        "concepts": out["concepts"].count(),
    }
    if args.out:
        for name in ("concepts", "assignments", "closure"):
            out[name].write.mode("overwrite").parquet(
                os.path.join(args.out, name)
            )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
