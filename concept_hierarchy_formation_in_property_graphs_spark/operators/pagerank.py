"""Iterative PageRank over the property-graph edge table.

Entity salience for KG construction: after triples are materialized as
``edges(src, rel_type, dst)``, PageRank ranks entities by link structure —
the standard signal for picking canonical entities, ordering ambiguous
links, and pruning long-tail noise before the hierarchy stage.

The reference has no PageRank (its structural features are local ego-net
counts, `algos/PropertyGraphCobweb.java:394-431`); this is an engine
addition in the same spirit as its graph feature extraction — a global
rather than 1-hop structural feature.

Execution shape (100 TB design):
- Each iteration is ONE equi-join (edges ⋈ ranks on src) + ONE aggregate
  keyed by dst — both shuffle on the node id, the natural partitioning a
  bucketed edge table (`sources/bucketed.py`) makes exchange-free.
- The rank state is node-sized, `localCheckpoint`ed every iteration: the
  DAG stays constant-depth (no 2^iters lineage blowup — dangling mass and
  contributions both re-read the materialized state), which is exactly the
  iterate-checkpoint pattern the linking CC loop uses.
- Dangling mass (nodes without out-edges) is a single scalar aggregate
  cross-joined back as a broadcast literal — no collect in the loop beyond
  the one up-front node count.
- Multigraph semantics: parallel edges each carry mass (out-degree counts
  edge multiplicity), matching the engine's parallel-edge feature
  semantics elsewhere (`operators/features.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 5, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(id, rank) after ``iters`` synchronous iterations.

    rank_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/N)

    Ranks sum to 1 every iteration (dangling mass redistributed
    uniformly). Deterministic: no sampling, no rand(), stable under any
    partitioning.
    """
    out_deg = (
        edges.groupBy(F.col(src_col).alias("id"))
        .agg(F.count("*").alias("od"))
    )
    nodes = (
        edges.select(F.col(src_col).alias("id"))
        .unionByName(edges.select(F.col(dst_col).alias("id")))
        .distinct()
        .join(out_deg, "id", "left")
        .na.fill({"od": 0})
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))

    ranks = nodes.select("id", "od", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=True)
        dangling = ranks.where(F.col("od") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        contrib = (
            edges.select(F.col(src_col).alias("id"), F.col(dst_col).alias("dst_id"))
            .join(ranks.select("id", "od", "rank"), "id")
            .groupBy(F.col("dst_id").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("od")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id", "od",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.col("dm") / F.lit(float(n)))).alias("rank"),
            )
        )
    return ranks.select("id", "rank")
