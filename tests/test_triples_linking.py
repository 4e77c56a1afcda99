"""Triple emission (P11 graft of load_yelp.cql) + linking/canonicalization."""

from __future__ import annotations

from concept_hierarchy_formation_in_property_graphs_spark.operators.linking import (
    canonicalize_surfaces,
    connected_components,
)
from concept_hierarchy_formation_in_property_graphs_spark.operators.triples import (
    emit_record_triples,
)


def test_emit_record_triples_null_guards_and_explode(spark):
    biz = spark.createDataFrame(
        [
            ("b1", "Springfield", None, ["Cafe", "Bar"]),
            ("b2", "Shelbyville", "full_bar", []),
            ("b1", "Springfield", None, ["Cafe"]),  # duplicate rows dedup
        ],
        "business_id string, city string, alcohol string, categories array<string>",
    )
    got = set(
        map(
            tuple,
            emit_record_triples(
                biz,
                "business_id",
                relations=[("IN_CITY", "city"), ("HAS_ALCOHOL", "alcohol")],
                explode_relations=[("IN_CATEGORY", "categories")],
            ).collect(),
        )
    )
    assert got == {
        ("b1", "IN_CITY", "Springfield"),
        ("b2", "IN_CITY", "Shelbyville"),
        ("b2", "HAS_ALCOHOL", "full_bar"),  # b1's NULL emits nothing
        ("b1", "IN_CATEGORY", "Cafe"),
        ("b1", "IN_CATEGORY", "Bar"),
    }


def test_connected_components_min_label(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y"), ("y", "z")], "src string, dst string"
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_canonicalize_groups_aliases(spark):
    surfaces = spark.createDataFrame(
        [
            ("University of Konstanz",),
            ("Konstanz University",),
            ("Acme Corporation",),
            ("Acme Corp.",),
            ("Zebra Unrelated Phrase",),
        ],
        "surface string",
    )
    got = {r["surface"]: r["canonical"] for r in canonicalize_surfaces(surfaces, threshold=0.4).collect()}
    assert got["University of Konstanz"] == got["Konstanz University"]
    assert got["Acme Corporation"] == got["Acme Corp."]
    assert got["Zebra Unrelated Phrase"] == "Zebra Unrelated Phrase"
    assert got["Acme Corporation"] != got["University of Konstanz"]
