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
