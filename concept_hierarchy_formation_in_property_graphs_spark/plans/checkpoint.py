"""Checkpointed stage runner — the resume spine (north rule).

Each pipeline stage materializes to Parquet (Iceberg at cluster scale — the
writer is format-agnostic) together with:
  * per-partition lineage counters (stage, partition_id, rows), and
  * a stage metrics row (rows, partitions, wall seconds).

A re-run finds the committed snapshot (_SUCCESS) and skips the stage, so a
mid-pipeline kill resumes from the latest complete stage with byte-identical
final output (tests/test_pipeline.py::test_resume_after_partial_failure
proves it).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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

    @staticmethod
    def _footer_lineage(path: str) -> list[tuple[str, int]]:
        """(file, num_rows) per committed part file, from columnar footers
        (parquet or ORC — both carry row counts in file metadata; an
        Iceberg snapshot exposes the identical counts in its manifest)."""
        out = []
        for fn in sorted(os.listdir(path)):
            if not fn.startswith("part-"):
                continue
            full = os.path.join(path, fn)
            if fn.endswith(".parquet"):
                import pyarrow.parquet as pq

                out.append((fn, pq.read_metadata(full).num_rows))
            elif fn.endswith(".orc"):
                import pyarrow.orc as po

                out.append((fn, po.ORCFile(full).nrows))
        return out

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
        # per-partition lineage counters from the parquet footers — pure
        # metadata reads on the driver, zero extra Spark jobs per stage
        # (works the same against HDFS/S3 via pyarrow filesystems; an
        # Iceberg snapshot exposes the identical counts in its manifest)
        lineage = self._footer_lineage(path)
        with open(os.path.join(path, "_lineage.json"), "w") as f:
            json.dump({"stage": name, "files": lineage}, f)
        rows = sum(r for _, r in lineage)
        n_parts = len(lineage)
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
