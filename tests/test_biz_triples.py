"""Yelp-importer graft end-to-end: biz records → typed triples must equal
the expected emission incl. every NULL guard (`load_yelp.cql:1-111`)."""

from __future__ import annotations

from concept_hierarchy_formation_in_property_graphs_spark.fixtures.biz import (
    biz_spark_df,
    biz_triples,
    generate_biz,
)


def test_biz_triples_match_expected_exactly(spark):
    df = biz_spark_df(spark, 120)
    _, expected = generate_biz(120)
    got = set(map(tuple, biz_triples(df).collect()))
    assert got == expected
