"""Checkpointed stage runner — the resume spine (north rule).

Each pipeline stage materializes to Parquet (Iceberg at cluster scale — the
writer is format-agnostic) together with:
  * per-partition lineage counters (stage, partition_id, rows), and
  * a stage metrics row (rows, partitions, wall seconds).

A re-run finds the committed snapshot (_SUCCESS) and skips the stage, so a
mid-pipeline kill resumes from the latest complete stage with byte-identical
final output (tests/test_pipeline.py::test_resume_after_partial_failure
proves it).

Stages may checkpoint BUCKETED (``bucket_key=``): the snapshot is written
``bucketBy(N, key) + sortBy(key)`` as an EXTERNAL table whose location is
the ordinary stage directory, so every downstream join/groupBy on that key
is exchange-free by layout — the shuffle is paid once at checkpoint time,
not per consumer (the 100 TB story for the kg_* joins and the pagerank
loop over a checkpointed edge table). Resume is catalog-independent: the
files outlive the session's in-memory catalog, and a fresh session
re-registers the bucket spec with CREATE TABLE ... CLUSTERED BY ...
LOCATION before reading, so the layout survives restarts too.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
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

    def _table_name(self, name: str) -> str:
        """Catalog name for a bucketed stage — unique per workdir so two
        concurrent runs never collide on a table name."""
        tag = hashlib.md5(os.path.abspath(self.base_dir).encode()).hexdigest()[:10]
        return f"chf_ck_{tag}_{name}".lower()

    def _committed_layout(self, path: str) -> dict | None:
        """The layout RECORDED at write time (stage ``_metrics.json``), or
        None if the metrics file is missing (killed in the narrow window
        between the snapshot's _SUCCESS and the metrics write)."""
        try:
            with open(os.path.join(path, "_metrics.json")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _read_bucketed(self, name: str, path: str, bucket_key: str,
                       n_buckets: int) -> DataFrame:
        """Read a committed bucketed snapshot, re-registering the bucket
        spec if this session's catalog has never seen it (resume after
        restart — the files carry no bucket metadata, the catalog does).

        The spec registered is the one RECORDED at write time, never the
        caller's current arguments: a resume with a different
        ``n_buckets`` (or over a flat-era snapshot) must not declare a
        layout the committed files don't have — Spark would trust the
        catalog, elide exchanges, and silently mis-join (wrong-spec case)
        or crash on flat part-file names (flat case)."""
        rec = self._committed_layout(path)
        if rec is not None:
            if rec.get("bucketed_by") is None:
                # committed FLAT (bucketed=False era): read it flat even
                # though the caller now asks for the bucketed layout
                return self.spark.read.format(self.fmt).load(path)
            bucket_key = rec["bucketed_by"]
            n_buckets = rec["n_buckets"]
        tbl = self._table_name(name)
        if not self.spark.catalog.tableExists(tbl):
            schema = self.spark.read.format(self.fmt).load(path).schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING {self.fmt} "
                f"CLUSTERED BY (`{bucket_key}`) SORTED BY (`{bucket_key}`) "
                f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
        return self.spark.table(tbl)

    def stage(self, name: str, build: Callable[[], DataFrame],
              bucket_key: str | None = None, n_buckets: int = 8) -> DataFrame:
        """Run (or resume) one stage; returns the materialized DataFrame.

        ``bucket_key`` switches the snapshot to the bucketed layout:
        downstream joins/groupBys on that key read it exchange-free."""
        path = self._path(name)
        t0 = time.time()
        if self.is_complete(name):
            if bucket_key is not None:
                df = self._read_bucketed(name, path, bucket_key, n_buckets)
            else:
                df = self.spark.read.format(self.fmt).load(path)
            self.metrics.append(
                {"stage": name, "resumed": True, "seconds": round(time.time() - t0, 3)}
            )
            return df
        df = build()
        if bucket_key is not None:
            tbl = self._table_name(name)
            # external table: DROP forgets the spec but keeps files; the
            # incomplete dir is ours to clear (same overwrite semantics
            # as the flat path)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(path, ignore_errors=True)
            (
                # one output file per bucket — without the repartition a
                # bucketed write emits up to tasks×buckets files
                df.repartition(n_buckets, bucket_key)
                .write.format(self.fmt)
                .mode("overwrite")
                .bucketBy(n_buckets, bucket_key)
                .sortBy(bucket_key)
                .option("path", path)
                .saveAsTable(tbl)
            )
            out = self.spark.table(tbl)
        else:
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
        if bucket_key is not None:
            rec["bucketed_by"] = bucket_key
            rec["n_buckets"] = n_buckets
        self.metrics.append(rec)
        with open(os.path.join(path, "_metrics.json"), "w") as f:
            json.dump(rec, f)
        return out

    def write_run_metrics(self) -> str:
        p = os.path.join(self.base_dir, "run_metrics.json")
        with open(p, "w") as f:
            json.dump(self.metrics, f, indent=2)
        return p


def drop_checkpoint_tables(spark: SparkSession, base_dir: str) -> int:
    """Drop every ``chf_ck_<tag>_*`` catalog entry this workdir's bucketed
    stages registered (EXTERNAL tables — files are untouched). Call before
    deleting a workdir inside a live session; otherwise the entries dangle
    at a removed location and any later catalog enumeration that reads
    them fails. Returns the number of tables dropped."""
    tag = hashlib.md5(os.path.abspath(base_dir).encode()).hexdigest()[:10]
    prefix = f"chf_ck_{tag}_"
    n = 0
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and not t.isTemporary:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            n += 1
    return n
