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


def test_jsonl_source_roundtrip(spark, tmp_path):
    from concept_hierarchy_formation_in_property_graphs_spark.sources.tables import (
        read_jsonl,
    )

    p = str(tmp_path / "biz.jsonl")
    with open(p, "w") as f:
        f.write('{"business_id": "b1", "city": "Springfield", "stars": 4.5}\n')
        f.write('{"business_id": "b2", "city": "Salem", "stars": 3.0}\n')
    df = read_jsonl(spark, p, "business_id string, city string, stars double")
    rows = sorted(map(tuple, df.select("business_id", "city", "stars").collect()))
    assert rows == [("b1", "Springfield", 4.5), ("b2", "Salem", 3.0)]
