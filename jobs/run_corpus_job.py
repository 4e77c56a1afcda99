"""spark-submit entry point for the training-corpus curation pipeline.

Cluster launch:

    zip -r chf_spark.zip concept_hierarchy_formation_in_property_graphs_spark
    spark-submit --master <cluster> --py-files chf_spark.zip \
        jobs/run_corpus_job.py --documents <parquet> --workdir <dir> \
        [--bench <parquet>] [--n-shards 16]

Runs the full curation funnel over a ``documents``-shaped table —
admission signals (quality / language / exact-fingerprint dedup /
repetition thresholds), optional benchmark n-gram decontamination —
then exports the admitted set as deterministic balanced training shards.
Every stage is a checkpointed snapshot via StageRunner: re-launching
with the same --workdir resumes after the last complete stage, and the
final shard export is reproducible bit-for-bit (portable md5 shard
assignment, not rand()/repartitionByRange).
"""

from __future__ import annotations

import argparse
import json
import os


def run(spark, documents_path: str, workdir: str, bench_path: str | None = None,
        n_shards: int = 16, min_quality: float = 0.5,
        max_dup_trigram: float = 0.2, max_top_bigram: float = 0.125,
        max_token_run: int = 2) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from concept_hierarchy_formation_in_property_graphs_spark.operators.dedup import (
        decontaminate,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.operators.textstats import (
        admission_signals,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.plans.checkpoint import (
        StageRunner,
    )
    from concept_hierarchy_formation_in_property_graphs_spark.sources.compaction import (
        write_training_shards,
    )

    docs = spark.read.parquet(documents_path)
    runner = StageRunner(spark, workdir)

    def build_signals():
        # one fused pass: projection signals share a single scan, only the
        # two aggregate-shaped repetition signals join in (3 scans + 2
        # joins vs 6 scans + 5 joins for the naive composition)
        return admission_signals(docs)

    signals = runner.stage("c1_signals", build_signals)

    if bench_path:
        bench = spark.read.parquet(bench_path)
        contaminated = runner.stage(
            "c2_contaminated", lambda: decontaminate(docs, bench, n=4))
    else:
        contaminated = None

    def build_admitted():
        # fingerprint dedup ranks AFTER the quality/language predicates —
        # the same stage order as tx_admission_funnel and its oracle, so
        # the funnel diagnostic describes exactly this job's admitted set
        # (a doc whose fingerprint twin fails quality must not shadow it)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        keep = (
            signals.where(
                (F.col("quality4") >= min_quality)
                & (F.col("lang_pred") == "en")
            )
            .withColumn("fp_rank", F.row_number().over(w).cast("long"))
            .where(
                (F.col("fp_rank") == 1)
                & (F.col("dup_trigram_frac4") <= max_dup_trigram)
                & (F.col("top_bigram_frac4") <= max_top_bigram)
                & (F.col("max_token_run") <= max_token_run)
            ).select("doc_id")
        )
        if contaminated is not None:
            keep = keep.join(contaminated.select("doc_id"), "doc_id", "left_anti")
        return docs.join(keep, "doc_id")

    admitted = runner.stage("c3_admitted", build_admitted)

    shards_dir = os.path.join(workdir, "c4_shards")
    # the partitioned write commits its own _SUCCESS marker — skip on resume
    if not os.path.exists(os.path.join(shards_dir, "_SUCCESS")):
        write_training_shards(
            admitted, shards_dir, n_shards,
            id_cols=["doc_id"], seed=7, key="portable")

    return {
        "total": docs.count(),
        "admitted": admitted.count(),
        "contaminated": contaminated.count() if contaminated is not None else None,
        "n_shards": n_shards,
        "metrics": runner.metrics,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True, help="documents parquet path")
    ap.add_argument("--bench", default=None,
                    help="optional benchmark/eval parquet for decontamination")
    ap.add_argument("--workdir", required=True, help="checkpoint/snapshot dir")
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-dup-trigram", type=float, default=0.2)
    ap.add_argument("--max-top-bigram", type=float, default=0.125)
    ap.add_argument("--max-token-run", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("chf-corpus-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.documents, args.workdir, bench_path=args.bench,
              n_shards=args.n_shards, min_quality=args.min_quality,
              max_dup_trigram=args.max_dup_trigram,
              max_top_bigram=args.max_top_bigram,
              max_token_run=args.max_token_run)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
