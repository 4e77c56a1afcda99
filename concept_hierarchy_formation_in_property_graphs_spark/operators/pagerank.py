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
- The edge table is degree-annotated (outdeg(src)) and hash-partitioned on
  ``src`` ONCE before the loop, then ``persist()``ed — the cached
  InMemoryTableScan keeps its HashPartitioning (a localCheckpoint would
  NOT: it scans back as ExistingRDD with UnknownPartitioning), so the
  per-iteration ``edges ⋈ ranks`` join never re-exchanges the (large)
  edge side. Each iteration pays only the node-sized rank-state exchange
  plus the dst-keyed aggregate; on a bucketed edge table
  (`sources/bucketed.py`) even the up-front partition pass disappears.
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
             src_col: str = "src", dst_col: str = "dst",
             hash_keys: bool = True) -> DataFrame:
    """(id, rank) after ``iters`` synchronous iterations.

    rank_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/N)

    Ranks sum to 1 every iteration (dangling mass redistributed
    uniformly). Deterministic: no sampling, no rand(), stable under any
    partitioning.

    ``hash_keys`` runs the loop on ``xxhash64`` surrogate keys instead of
    the raw (string) node ids — fixed-width longs hash-join and aggregate
    ~2× faster than URI-sized strings, and the per-iteration state
    shrinks; the output is mapped back to the original ids, so the keys
    never leak. Birthday bound: p(collision) ≈ k²/2^65 — negligible to
    ~10^7 nodes (3e-6) and acceptable to ~10^8 (3e-4); past that widen to
    a 128-bit key pair (two seeded hashes) or set ``hash_keys=False``.
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    if hash_keys:
        # one distinct over the raw ids serves BOTH the surrogate→orig
        # map-back and the node set (checkpointed: used twice)
        id_map = (
            edges.select(F.col(src_col).alias("orig"))
            .unionByName(edges.select(F.col(dst_col).alias("orig")))
            .distinct()
            .select(F.xxhash64("orig").alias("id"), "orig")
            .localCheckpoint(eager=True)
        )
        node_ids = id_map.select("id")
        edges = edges.select(
            F.xxhash64(src_col).alias(src_col), F.xxhash64(dst_col).alias(dst_col))
    else:
        node_ids = (
            edges.select(F.col(src_col).alias("id"))
            .unionByName(edges.select(F.col(dst_col).alias("id")))
            .distinct()
        )

    # Degree-annotated edge list, hash-partitioned on src ONCE and
    # persist()ed — NOT localCheckpoint: a checkpointed RDD scans back as
    # ExistingRDD with UnknownPartitioning (measured, .explain), which
    # would re-exchange the edges every iteration, while InMemoryTableScan
    # keeps HashPartitioning(id, shuffle_n), so ENSURE_REQUIREMENTS
    # exchanges only the node-sized rank state inside the loop. (persist
    # is also evict-safe: lineage is retained, unlike a localCheckpoint
    # block loss which is unrecoverable.) The out-degree is a window
    # count over the SAME partitioning — satisfied by the repartition, so
    # the degree annotation costs a per-partition sort, not a join or a
    # second exchange. od is carried (not a precomputed 1/od weight) so
    # the loop's sum(rank/od) stays bit-identical to the unrolled-CTE
    # oracle: rank*(1/od) differs from rank/od in the last ULP.
    edges_w = (
        edges.select(F.col(src_col).alias("id"), F.col(dst_col).alias("dst_id"))
        .repartition(shuffle_n, "id")
        .withColumn("od", F.count("*").over(Window.partitionBy("id")))
        .persist()
    )
    edges_w.count()  # materialize once, before the loop
    out_deg = edges_w.groupBy("id").agg(F.first("od").alias("od"))
    nodes = (
        node_ids
        .join(out_deg, "id", "left")
        .na.fill({"od": 0})
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return edges.select(F.lit("").alias("id"), F.lit(0.0).alias("rank")).limit(0)

    ranks = nodes.select("id", "od", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=True)
        dangling = ranks.where(F.col("od") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        contrib = (
            edges_w.join(ranks.select("id", "rank"), "id")
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
    # final node-sized checkpoint truncates the lineage off edges_w so the
    # (loop-scoped) cache can be released before the result is consumed
    ranks = ranks.localCheckpoint(eager=True)
    edges_w.unpersist()
    if hash_keys:
        return (ranks.join(id_map, "id")
                .select(F.col("orig").alias("id"), "rank"))
    return ranks.select("id", "rank")
