"""Bucketed-table write path — shuffle-free co-located joins at scale.

The 100 TB story for repeated big-big joins (e.g. triples ⋈ triples on
entity id, assignments ⋈ attrs on instance id): persist both sides
``bucketBy(N, key)`` + ``sortBy(key)`` so every future join on that key is
a zero-exchange sort-merge — the shuffle is paid ONCE at write time, not
per query. Catalyst recognizes matching bucket specs and drops both
Exchange nodes (assert in tests/test_sources_bucketed.py).

Bucketed writes require a managed table (saveAsTable) — the bucket spec
lives in the catalog, not the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   fmt: str = "parquet") -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.

    Reclaims an ORPHANED location first: a managed-table directory left on
    disk by a crashed run (or a previous session whose in-memory catalog
    is gone) makes ``saveAsTable`` raise LOCATION_ALREADY_EXISTS even in
    overwrite mode, because the catalog no longer knows the table. Drop +
    remove-location restores the overwrite semantics a rerun expects."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, table.split(".")[-1].lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    (
        df.write.format(fmt)
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(a: DataFrame, b: DataFrame, key: str) -> bool:
    """True iff joining a ⋈ b on ``key`` plans WITHOUT a shuffle exchange
    on either side (bucket specs matched). Disable
    spark.sql.autoBroadcastJoinThreshold first — a broadcast join also has
    no hash exchange and would mask the answer."""
    plan = a.join(b, key)._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
