"""Z-order (Morton-curve) clustering for multi-column data skipping.

A single-column sort gives parquet files tight min/max footers on ONE
column: filters on any other column can't skip a file. Interleaving the
bits of several rank-scaled columns into one Morton key and range-writing
on it gives every participating column *simultaneously* narrow per-file
ranges — the layout trick behind Delta's ``OPTIMIZE ZORDER BY`` — so a
100 TB scan with a predicate on any clustered column reads a small tile
of files instead of all of them. Spark's parquet reader already does the
skipping (row-group min/max pushdown); this module only arranges the
data so the statistics are worth consulting.

Everything is Catalyst expressions (shiftleft/bitwiseOR over ``bits``
terms per column — whole-stage codegen, no UDFs). The write shuffles
once (range partition on the z-key) and sorts within partitions, exactly
like any clustered rewrite.

Contract note: file *boundaries* come from ``repartitionByRange``'s
sampled quantiles, so two runs may split files slightly differently —
z-order promises locality, not byte-identical layout. For byte-identical
exports use ``compaction.write_training_shards`` (explicit assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ZKEY = "__zkey"


def _scaled(col: str, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto integer [0, 2^bits - 1]."""
    span = max(hi - lo, 1e-12)
    maxv = (1 << bits) - 1
    x = (F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(maxv)
    clamped = F.least(F.greatest(F.round(x).cast("long"), F.lit(0)), F.lit(maxv))
    # nulls sort first (key 0) instead of nulling the whole Morton key
    return F.coalesce(clamped, F.lit(0).cast("long"))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10) -> Column:
    """Morton key interleaving ``bits`` bits of each column (min/max
    scaled; one tiny agg to fetch the bounds)."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(
            c,
            bounds[f"lo_{c}"] if bounds[f"lo_{c}"] is not None else 0.0,
            bounds[f"hi_{c}"] if bounds[f"hi_{c}"] is not None else 0.0,
            bits,
        )
        for c in cols
    ]
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 10,
    fmt: str = "parquet",
) -> None:
    """Rewrite ``df`` into ``n_files`` files clustered on the Morton
    curve over ``cols`` (each file covers a compact tile in every
    clustered dimension)."""
    keyed = df.withColumn(_ZKEY, zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, _ZKEY)
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def file_minmax(spark: SparkSession, path: str, cols: list[str],
                fmt: str = "parquet") -> DataFrame:
    """Per-file min/max of ``cols`` — the skipping-potential audit
    (mirrors what the parquet footers will say)."""
    df = spark.read.format(fmt).load(path).withColumn(
        "file", F.input_file_name()
    )
    return df.groupBy("file").agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
