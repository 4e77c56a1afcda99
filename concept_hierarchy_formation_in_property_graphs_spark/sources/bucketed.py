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

import os
import shutil
import uuid
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _managed_location(spark: SparkSession, table: str) -> str:
    """Filesystem path the session's catalog would assign a MANAGED
    ``table``. Qualified names resolve to ``<wh>/<db>.db/<tbl>`` — the
    naive ``<wh>/<tbl>`` is the DEFAULT-db table's directory, a different
    table's data."""
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    parts = [p.lower() for p in table.split(".")]
    name = parts[-1]
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    if db == "default":
        return os.path.join(wh, name)
    return os.path.join(wh, f"{db}.db", name)


def _catalog_owns_location(spark: SparkSession, loc: str) -> bool:
    """True if any registered (non-temp) table's managed location is
    ``loc`` — i.e. the directory is live catalog-owned data, not an
    orphan. Compares computed managed locations; an EXTERNAL table
    deliberately pointed inside the warehouse dir is out of scope."""
    loc = os.path.normpath(loc)
    for d in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(d.name):
            if t.isTemporary:
                continue
            owned = _managed_location(spark, f"{d.name}.{t.name}")
            if os.path.normpath(owned) == loc:
                return True
    return False


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   fmt: str = "parquet") -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.

    Reclaims an ORPHANED location first: a managed-table directory left on
    disk by a crashed run (or a previous session whose in-memory catalog
    is gone) makes ``saveAsTable`` raise LOCATION_ALREADY_EXISTS even in
    overwrite mode, because the catalog no longer knows the table.

    Reclaim discipline (never destroy live data): the true managed
    location is resolved db-qualifier-aware, the reclaim is refused if
    any catalog entry still owns that location, and the orphan is
    RENAMED aside rather than deleted — it is only removed after the new
    table commits successfully, so a failed write leaves the old bytes
    recoverable."""
    spark = df.sparkSession
    aside: str | None = None
    if not spark.catalog.tableExists(table):
        loc = _managed_location(spark, table)
        if os.path.isdir(loc):
            if _catalog_owns_location(spark, loc):
                raise ValueError(
                    f"refusing to reclaim {loc!r}: a catalog table still "
                    f"owns this location but {table!r} does not exist — "
                    "qualified-name mixup or shared-metastore race"
                )
            aside = f"{loc}.orphan-{uuid.uuid4().hex[:8]}"
            os.rename(loc, aside)
    (
        df.write.format(fmt)
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    if aside is not None:
        shutil.rmtree(aside, ignore_errors=True)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(a: DataFrame, b: DataFrame, key: str) -> bool:
    """True iff joining a ⋈ b on ``key`` plans WITHOUT a shuffle exchange
    on either side (bucket specs matched). Disable
    spark.sql.autoBroadcastJoinThreshold first — a broadcast join also has
    no hash exchange and would mask the answer."""
    plan = a.join(b, key)._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
