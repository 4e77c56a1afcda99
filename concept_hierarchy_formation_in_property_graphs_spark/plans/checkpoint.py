"""Checkpointed stage runner — the resume spine (north rule).

Each pipeline stage materializes to Parquet (Iceberg at cluster scale — the
writer is format-agnostic) together with:
  * per-partition lineage counters (stage, partition_id, rows), and
  * a stage metrics row (rows, partitions, wall seconds).

A re-run finds the committed snapshot (_SUCCESS) and skips the stage, so a
mid-pipeline kill resumes from the latest complete stage with byte-identical
final output (tests/test_resume.py proves it).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, base_dir: str, fmt: str = "parquet"):
        self.spark = spark
        self.base_dir = base_dir
        self.fmt = fmt
        self.metrics: list[dict] = []
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def is_complete(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage; returns the materialized DataFrame."""
        path = self._path(name)
        t0 = time.time()
        if self.is_complete(name):
            df = self.spark.read.format(self.fmt).load(path)
            self.metrics.append(
                {"stage": name, "resumed": True, "seconds": round(time.time() - t0, 3)}
            )
            return df
        df = build()
        df.write.mode("overwrite").format(self.fmt).save(path)
        out = self.spark.read.format(self.fmt).load(path)
        # per-partition lineage counters
        lineage = (
            out.select(F.spark_partition_id().alias("partition_id"))
            .groupBy("partition_id")
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(name))
        )
        lineage.write.mode("overwrite").parquet(path + "__lineage")
        rows = out.count()
        n_parts = out.rdd.getNumPartitions()
        rec = {
            "stage": name,
            "resumed": False,
            "rows": rows,
            "partitions": n_parts,
            "seconds": round(time.time() - t0, 3),
        }
        self.metrics.append(rec)
        with open(os.path.join(path, "_metrics.json"), "w") as f:
            json.dump(rec, f)
        return out

    def write_run_metrics(self) -> str:
        p = os.path.join(self.base_dir, "run_metrics.json")
        with open(p, "w") as f:
            json.dump(self.metrics, f, indent=2)
        return p
