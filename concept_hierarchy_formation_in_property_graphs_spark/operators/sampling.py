"""Deterministic corpus sampling for training-data assembly.

A training-data pipeline rarely takes a corpus wholesale: over-represented
domains are down-sampled to a per-domain budget, and every sampling decision
must be reproducible run-to-run and cluster-size-independent. Both operators
here therefore derive "randomness" from the portable md5 family
(`functions/hashing.py`) instead of `rand()` — the same document is kept or
dropped regardless of partitioning, executor count, or engine (the DuckDB
oracle replays the identical arithmetic).

Reference analogue: the reference samples before clustering with reservoir
sampling (`src/main/python/data_loader.py:19-27`) — deterministic hash-order
selection is the distributed, replayable form of the same idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def stratified_sample(df: DataFrame, stratum_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """At most ``k`` rows per stratum, chosen by md5(id) order.

    Adds ``pick_rank`` (1-based rank within the stratum). The window
    partitions by the stratum, so at 100 TB the shuffle is keyed by the
    stratum column; a stratum's rows land on one task — for pathologically
    hot strata combine with a pre-filter (e.g. ``sample_fraction``-style
    hash-mod gating) before ranking, since only the first ``k`` of a
    stratum survive anyway.
    """
    key = md5_long(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= k)
    )


def temperature_weights(df: DataFrame, stratum_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """Per-stratum sampling weights ∝ count^alpha (temperature sampling).

    Returns (stratum, n_docs, weight6) where weight6 is the normalized
    probability mass the stratum should receive in a temperature-``alpha``
    mixture (alpha=1 → proportional, alpha=0 → uniform). One tiny
    aggregate — the weight table is dimension-sized and meant to be
    broadcast back onto the corpus.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            stratum_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                    / F.col("z"), 6).alias("weight6"),
        )
    )
