"""Table sources.

Two families:
  * the driver-provided TPC-H-ish parquet tables under /root/testdata/sf*/
  * the ``pages`` corpus (Iceberg at scale; Parquet fallback in the sandbox)

The reference's sources are a Neo4j transaction scan
(`src/test/.../PropertyGraphCobwebProcTest.java:52-54`) and JSON-lines files
(`src/main/python/data_loader.py:19-27`); here every source is a columnar
scan so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source — the reference's file input
    (`src/main/python/data_loader.py:19-27`, APOC JSON `load_yelp.cql:2`).

    Pass an explicit schema at scale: schema inference is a full extra
    pass over the data.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_pages(
    spark: SparkSession,
    path: str | None = None,
    iceberg_table: str | None = None,
) -> DataFrame:
    """Read the web-pages corpus.

    On a production cluster this is an Iceberg table
    (``spark.read.format("iceberg").load(table)``) so snapshot isolation,
    partition pruning on ``warc_ts`` and metadata-only planning apply. The
    sandbox has no Iceberg runtime jar, so we fall back to a Parquet
    directory with the identical schema
    (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
    """
    if iceberg_table is not None:
        try:
            return spark.read.format("iceberg").load(iceberg_table)
        except Exception as ex:
            if path is None:
                # no fallback — surface the REAL failure (e.g. missing
                # Iceberg runtime jar), don't mask it
                raise RuntimeError(
                    f"Iceberg read of {iceberg_table!r} failed and no "
                    "parquet fallback path was given"
                ) from ex
            _log.warning(
                "Iceberg read of %r failed (%s); falling back to parquet %s",
                iceberg_table, ex, path,
            )
    if path is None:
        raise ValueError("read_pages needs a parquet path or an iceberg table")
    return spark.read.parquet(path)
