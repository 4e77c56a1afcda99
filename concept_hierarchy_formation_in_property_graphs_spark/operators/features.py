"""Graph feature extraction — F2/F3 of the reference, exactly.

F2 `extractStructuralFeatures` (`algos/PropertyGraphCobweb.java:394-431`):
  EgoDegree              = undirected degree (in + out, multigraph)
  AverageNeighbourDegree = Σ_{incident e} deg(other(e))  INTEGER-DIV  deg,
                           0 for isolated nodes (the reference's
                           ``totalNeighbourDegree / egoDegree`` is Java int
                           division — replicated, not "fixed")
  EgoNetOutgoingEdges    = out(n) + Σ_{incident e} out(other(e))
  EgoNetIncomingEdges    = in(n)  + Σ_{incident e} in(other(e))
  NB: the reference iterates ``node.getRelationships()`` — BOTH directions —
  so a neighbour reachable via k parallel edges contributes k times.

F3 `extractCharacteristicSet` (`algos/PropertyGraphCobweb.java:250-258`):
  set of distinct rel types incident to the node, either direction.

Shuffle plan: degrees = two groupBys on edges; the neighbour gather is one
self-join of the incidence list with the per-node degree table. The degree
table has one row per node — under head-entity skew (hub nodes appear in a
large fraction of incidence rows) AQE skew-join splits the hot partitions;
an explicit salted variant is provided for the pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incidence(edges: DataFrame) -> DataFrame:
    """(id, other) — one row per (node, incident edge), both directions."""
    return edges.select(F.col("src").alias("id"), F.col("dst").alias("other")).union(
        edges.select(F.col("dst").alias("id"), F.col("src").alias("other"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_deg, in_deg, deg) for every endpoint that occurs in edges."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg", F.col("out_deg") + F.col("in_deg"))
    )


def salted_dim_join(fact: DataFrame, dim: DataFrame, key: str,
                    n_salt: int = 8) -> DataFrame:
    """Skew-safe fact⋈dim when dim has one row per key: replicate dim
    n_salt× and scatter fact rows across the replicas. Defuses head-entity
    hot keys without relying on AQE detection."""
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")


def structural_features(nodes: DataFrame | None, edges: DataFrame,
                        salt: int | None = None) -> DataFrame:
    """F2 for every node id in ``nodes`` (isolated nodes get 0s).

    nodes=None means the node set IS the edge endpoints — skips the
    endpoints-distinct shuffle and the outer join (every endpoint has a
    degree row already), the common case when the graph came from triples.
    """
    degs = degrees(edges)
    inc = incidence(edges)
    dim = degs.select(
        F.col("id").alias("other"),
        F.col("deg").alias("o_deg"),
        F.col("out_deg").alias("o_out"),
        F.col("in_deg").alias("o_in"),
    )
    joined = (
        salted_dim_join(inc, dim, "other", salt)
        if salt
        else inc.join(dim, "other")
    )
    nbr = joined.groupBy("id").agg(
        F.sum("o_deg").alias("tnd"),
        F.sum("o_out").alias("tno"),
        F.sum("o_in").alias("tni"),
    )
    feats = degs.join(nbr, "id", "left").select(
        "id",
        F.col("deg").alias("EgoDegree"),
        F.when(F.col("deg") == 0, F.lit(0))
        .otherwise(F.floor(F.coalesce("tnd", F.lit(0)) / F.col("deg")))
        .cast("long")
        .alias("AverageNeighbourDegree"),
        (F.col("out_deg") + F.coalesce("tno", F.lit(0))).alias("EgoNetOutgoingEdges"),
        (F.col("in_deg") + F.coalesce("tni", F.lit(0))).alias("EgoNetIncomingEdges"),
    )
    if nodes is None:
        return feats
    return (
        nodes.select("id")
        .join(feats, "id", "left")
        .select(
            "id",
            F.coalesce("EgoDegree", F.lit(0)).alias("EgoDegree"),
            F.coalesce("AverageNeighbourDegree", F.lit(0)).alias("AverageNeighbourDegree"),
            F.coalesce("EgoNetOutgoingEdges", F.lit(0)).alias("EgoNetOutgoingEdges"),
            F.coalesce("EgoNetIncomingEdges", F.lit(0)).alias("EgoNetIncomingEdges"),
        )
    )


def characteristic_sets(nodes: DataFrame | None, edges: DataFrame) -> DataFrame:
    """F3: (id, rel_types ARRAY<STRING> sorted) — the FCA intent column.

    ``array_sort`` makes the set canonical so it can serve directly as a
    groupBy key in the lattice stage. nodes=None ⇒ node set = edge
    endpoints (skips the distinct + outer join; isolated nodes can't
    exist then).
    """
    inc_types = edges.select(F.col("src").alias("id"), "rel_type").union(
        edges.select(F.col("dst").alias("id"), "rel_type")
    )
    cs = inc_types.groupBy("id").agg(
        F.array_sort(F.collect_set("rel_type")).alias("rel_types")
    )
    if nodes is None:
        return cs
    return (
        nodes.select("id")
        .join(cs, "id", "left")
        .select(
            "id",
            F.coalesce("rel_types", F.array().cast("array<string>")).alias("rel_types"),
        )
    )
