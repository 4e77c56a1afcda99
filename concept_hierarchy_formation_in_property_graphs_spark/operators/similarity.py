"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k (correctness baseline) and an LSH-bucketed
approximate variant (scale path). Dot products run JVM-side via
``zip_with`` + ``aggregate`` in double precision — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int],
                           k: int = 5) -> DataFrame:
    """(query_id, neighbor_id, rank, score4) — exact top-k by cosine.

    Queries are a tiny dimension → broadcast; the big side streams through
    one codegen'd projection, then a per-query top-k window. rank breaks
    ties by neighbor_id so output is engine-stable.
    """
    base = embeddings.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    queries = base.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "score",
            _dot(F.col("embedding"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("score", 4).alias("score4"),
        )
    )


def lsh_bucketed_ann(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                     n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket by sign pattern, search own bucket.

    The planes are a deterministic pseudo-random matrix generated from the
    seed (no runtime randomness). At 100 TB the bucket join replaces the
    cross join — candidate count drops by ~2^n_planes.
    """
    import numpy as np

    dim = len(embeddings.select("embedding").first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).tolist()

    def bucket_expr(emb):
        expr = F.lit(0)
        for i, plane in enumerate(planes):
            arr = F.array(*[F.lit(float(v)) for v in plane])
            d = _dot(emb, arr)
            expr = expr + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return expr

    base = embeddings.select(
        "vec_id", "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        bucket_expr(F.col("embedding")).alias("bucket"),
    )
    queries = base.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("q_bucket"))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "score",
            _dot(F.col("embedding"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                F.round("score", 4).alias("score4"))
    )
