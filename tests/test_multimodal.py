"""Multimodal plumbing: schemas, batch shapes, determinism, unknown-kind
failure — with stubbed codecs (no imaging libs in the sandbox)."""

from __future__ import annotations

import pytest

from concept_hierarchy_formation_in_property_graphs_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_assets,
    extract_features,
    frame_sample,
    generate_assets_df,
)
from concept_hierarchy_formation_in_property_graphs_spark.operators.similarity import (
    cosine_topk_bruteforce,
)


def test_decode_schema_and_determinism(spark):
    assets = generate_assets_df(spark, 30)
    a = sorted(map(tuple, decode_assets(assets).collect()))
    b = sorted(map(tuple, decode_assets(assets.repartition(7)).collect()))
    assert a == b and len(a) == 30
    kinds = {r[1] for r in a}
    assert kinds == {"image", "audio", "video"}
    for r in a:
        if r[1] == "image":
            assert r[2] >= 64 and r[3] >= 64  # width/height populated


def test_features_feed_similarity_search(spark):
    assets = generate_assets_df(spark, 24)
    emb = extract_features(assets).withColumnRenamed("asset_id", "vec_id")
    row = emb.first()
    assert len(row["embedding"]) == FEATURE_DIM
    topk = cosine_topk_bruteforce(emb, [0], k=3)
    assert topk.count() == 3  # multimodal features plug into ANN unchanged


def test_frame_sampling_explodes_videos_only(spark):
    assets = generate_assets_df(spark, 12)
    frames = frame_sample(assets, every_n=50)
    rows = frames.collect()
    video_ids = {r["asset_id"] for r in rows}
    assert video_ids == {i for i in range(12) if i % 3 == 2}
    assert all(r["frame_idx"] % 50 == 0 for r in rows)


def test_unknown_kind_raises(spark):
    bad = spark.createDataFrame(
        [(1, "hologram", b"xx", {})],
        "asset_id long, kind string, data binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="hologram|PythonException"):
        decode_assets(bad).collect()
