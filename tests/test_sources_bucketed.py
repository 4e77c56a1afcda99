"""Bucketed-table co-located joins: the write-once-shuffle-never pattern.

Both sides written bucketBy(N, key) → the join plan must contain NO
hash-partitioning exchange (the shuffle was paid at write time), and the
result must equal the plain-join result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from concept_hierarchy_formation_in_property_graphs_spark.sources.bucketed import (
    join_is_shuffle_free,
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("v2")
    )
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")
    write_bucketed(left, "bk_left", "k", n_buckets=8)
    write_bucketed(right, "bk_right", "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast so "no exchange" can only mean bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = read_bucketed(spark, "bk_left")
        b = read_bucketed(spark, "bk_right")
        assert join_is_shuffle_free(a, b, "k"), "bucketed join still shuffles"
        got = sorted(map(tuple, a.join(b, "k").collect()))
        exp = sorted(map(tuple, left.join(right, "k").collect()))
        assert got == exp and len(got) == 2500
        # control: plain (unbucketed) join DOES shuffle
        assert not join_is_shuffle_free(left, right, "k")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_reclaim_resolves_qualified_names(spark):
    """ADVICE r4 (medium): write_bucketed('db.tbl') must reclaim
    <wh>/db.db/tbl, never <wh>/tbl — the DEFAULT-db table of the same
    name keeps its data."""
    import os
    from urllib.parse import urlparse

    from concept_hierarchy_formation_in_property_graphs_spark.sources.bucketed import (
        _catalog_owns_location,
        _managed_location,
    )

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    spark.sql("DROP TABLE IF EXISTS bk_q")
    spark.sql("DROP TABLE IF EXISTS bdb.bk_q")
    try:
        write_bucketed(df, "bk_q", "k", n_buckets=4)       # default db
        default_loc = _managed_location(spark, "bk_q")
        qual_loc = _managed_location(spark, "bdb.bk_q")
        assert default_loc != qual_loc
        assert qual_loc.endswith(os.path.join("bdb.db", "bk_q"))
        # drop the qualified table from the catalog but leave an orphan
        # dir at ITS location; the reclaim must touch only that dir
        os.makedirs(qual_loc, exist_ok=True)
        open(os.path.join(qual_loc, "junk"), "w").write("x")
        write_bucketed(df, "bdb.bk_q", "k", n_buckets=4)
        # the default-db twin survived and both tables read back
        assert spark.table("bk_q").count() == 100
        assert spark.table("bdb.bk_q").count() == 100
        # the orphan was renamed aside and cleaned after the commit
        parent = os.path.dirname(qual_loc)
        assert not [d for d in os.listdir(parent) if ".orphan-" in d]
        # ownership probe: a live managed location is never reclaimable
        assert _catalog_owns_location(spark, default_loc)
        assert not _catalog_owns_location(spark, default_loc + "_nope")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        assert os.path.isdir(os.path.join(wh, "bk_q"))
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_q")
        spark.sql("DROP TABLE IF EXISTS bdb.bk_q")
        spark.sql("DROP DATABASE IF EXISTS bdb")
