"""S4 — property-graph materialization.

Data model (SURVEY §1.2):
    nodes(id BIGINT|STRING, labels ARRAY<STRING>,
          props MAP<STRING,STRING>, num_props MAP<STRING,DOUBLE>)
    edges(src, dst, rel_type STRING, props MAP<STRING,STRING>)

The nominal/numeric split of the props maps mirrors the reference's
NominalValue/NumericValue dichotomy (`algos/Value.java:20-35` — strings,
bools and chars coerce to nominal strings, every number collapses into one
Gaussian). Array-valued properties take set semantics
(`algos/ConceptNode.java:94-97`) — ``array_distinct`` before explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_from_triples(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """triples(subj, pred, obj) → (nodes, edges).

    Node set = distinct subjects ∪ objects; edges keep the predicate as
    rel_type. Mirrors the MERGE-on-id semantics of the Cypher importer
    (`src/main/cypher/load_yelp.cql`): one node per canonical id.
    """
    nodes = (
        triples.select(F.col("subj").alias("id"))
        .union(triples.select(F.col("obj").alias("id")))
        .distinct()
        .select(
            "id",
            F.array(F.lit("Entity")).alias("labels"),
            F.create_map().cast("map<string,string>").alias("props"),
            F.create_map().cast("map<string,double>").alias("num_props"),
        )
    )
    edges = triples.select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("pred").alias("rel_type"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    return nodes, edges


def node_attributes_long(nodes: DataFrame) -> DataFrame:
    """F1 node→record conversion (`algos/ConceptNode.java:98-145`).

    Long-form attribute rows:
        (instance_id, attr, kind 'nom'|'num', nom_value, num_value)
    Labels become the multi-valued nominal attr "Labels"; props/num_props
    explode via map_entries. Dynamic schema = long form, no StructType churn.
    """
    labels = nodes.select(
        F.col("id").alias("instance_id"),
        F.lit("Labels").alias("attr"),
        F.lit("nom").alias("kind"),
        F.explode(F.array_distinct("labels")).alias("nom_value"),
        F.lit(None).cast("double").alias("num_value"),
    )
    noms = nodes.select(
        F.col("id").alias("instance_id"), F.explode(F.map_entries("props")).alias("e")
    ).select(
        "instance_id",
        F.col("e.key").alias("attr"),
        F.lit("nom").alias("kind"),
        F.col("e.value").alias("nom_value"),
        F.lit(None).cast("double").alias("num_value"),
    )
    nums = nodes.select(
        F.col("id").alias("instance_id"),
        F.explode(F.map_entries("num_props")).alias("e"),
    ).select(
        "instance_id",
        F.col("e.key").alias("attr"),
        F.lit("num").alias("kind"),
        F.lit(None).cast("string").alias("nom_value"),
        F.col("e.value").alias("num_value"),
    )
    return labels.unionByName(noms).unionByName(nums)
