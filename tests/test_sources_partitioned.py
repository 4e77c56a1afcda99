"""Hive-layout partitioned tables: directory pruning must reach the scan.

Evidence is the executed plan itself, not a proxy: the filtered read's
scan must carry the date predicate in ``PartitionFilters`` (planning-time
pruning) and its post-execution ``numFiles`` metric must count ONLY the
surviving partition's files — at 100 TB that is the difference between
reading one day and reading a year.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from concept_hierarchy_formation_in_property_graphs_spark.sources.partitioned import (
    partition_filters,
    read_partitioned,
    scan_num_files,
    with_date_partition,
    write_partitioned,
)


@pytest.fixture(scope="module")
def day_table(spark):
    """1,000 synthetic events across 10 daily partitions, written
    partitionBy(event_date)."""
    path = tempfile.mkdtemp(prefix="chf_part_")
    ev = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=(F.col("id") % 10).cast("int"))
        ).alias("ts"),
        (F.col("id") % 7).alias("value"),
    )
    write_partitioned(with_date_partition(ev), path, ["event_date"])
    yield path, ev
    shutil.rmtree(path, ignore_errors=True)


def test_partition_filter_reaches_scan(spark, day_table):
    path, _ = day_table
    df = read_partitioned(spark, path).where(F.col("event_date") == "2024-01-03")
    pf = partition_filters(df)
    assert "event_date" in pf and "2024-01-03" in pf, pf
    # non-partition predicates must NOT ride in PartitionFilters — they
    # stay row-group predicates (PushedFilters) on the surviving files
    df2 = read_partitioned(spark, path).where(
        (F.col("event_date") == "2024-01-03") & (F.col("value") > 3)
    )
    assert "value" not in partition_filters(df2)


def test_pruned_scan_reads_only_surviving_files(spark, day_table):
    path, _ = day_table
    full = read_partitioned(spark, path)
    full.collect()
    n_all = scan_num_files(full)

    one_day = read_partitioned(spark, path).where(
        F.col("event_date") == "2024-01-03"
    )
    one_day.collect()
    n_pruned = scan_num_files(one_day)

    # 10 equal daily partitions -> one day's files are ~1/10 of the total
    assert n_pruned * 10 == n_all, (n_pruned, n_all)


def test_partitioned_roundtrip_matches_unpartitioned(spark, day_table):
    path, ev = day_table
    got = (
        read_partitioned(spark, path)
        .where(F.col("event_date") == "2024-01-03")
        .select("event_id", "ts", "value")
    )
    exp = ev.where(F.to_date("ts") == "2024-01-03")
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()
    assert got.count() == 100
