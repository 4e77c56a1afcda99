"""Z-order clustering: every clustered column gets narrow per-file ranges.

On a uniform 2-D grid written as 16 files, an x-sorted layout gives tight
x ranges but full-span y ranges; the Morton layout must give BOTH columns
per-file spans well under half the domain (16 files ≈ 4×4 tiles → spans
around a quarter of the domain each).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from concept_hierarchy_formation_in_property_graphs_spark.sources.zorder import (
    file_minmax,
    zorder_write,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="chf_zorder_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _avg_span(spark, path, col):
    mm = file_minmax(spark, path, [col]).collect()
    return sum(r[f"max_{col}"] - r[f"min_{col}"] for r in mm) / len(mm)


def test_zorder_tiles_both_dimensions(spark, tmpdir):
    side = 200  # 200x200 grid, domain [0, 199] in both x and y
    grid = spark.range(0, side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    xsorted, zordered = tmpdir + "/xsorted", tmpdir + "/zordered"
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        xsorted
    )
    zorder_write(spark, grid, zordered, ["x", "y"], n_files=16)

    # x-sorted: x tight, y spans the whole domain in every file
    assert _avg_span(spark, xsorted, "x") < 0.2 * side
    assert _avg_span(spark, xsorted, "y") > 0.9 * side

    # z-ordered: BOTH dimensions tile — each file a compact rectangle
    assert _avg_span(spark, zordered, "x") < 0.5 * side
    assert _avg_span(spark, zordered, "y") < 0.5 * side

    # lossless rewrite
    got = sorted(map(tuple, spark.read.parquet(zordered).collect()))
    exp = sorted(map(tuple, grid.collect()))
    assert got == exp


def test_zorder_skipping_reduces_rowgroups_read(spark, tmpdir):
    """The point of the layout: a one-tile predicate must let parquet
    row-group statistics skip most of the data. Pin it via the scan's
    actual output rows under pushdown on the NON-primary sort column."""
    side = 200
    grid = spark.range(0, side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    zordered = tmpdir + "/z"
    zorder_write(spark, grid, zordered, ["x", "y"], n_files=16)

    hits = (
        file_minmax(spark, zordered, ["y"])
        .where((F.col("min_y") <= 10) & (F.col("max_y") >= 0))
        .count()
    )
    # a y-slice predicate overlaps only the bottom row of tiles
    assert hits <= 8, hits
