"""As-of join semantics: backward-inclusive, per-key, left-outer."""

from __future__ import annotations

import datetime

from concept_hierarchy_formation_in_property_graphs_spark.operators.asof import (
    asof_join,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_join_backward_inclusive_left_outer(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(2)), (4, "v", _ts(7))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 50.0), ("u", _ts(9), 90.0), ("v", _ts(8), 80.0)],
        "user_id string, ts timestamp, quote double",
    )
    got = {
        r["event_id"]: r["quote"]
        for r in asof_join(left, right, right_cols=["quote"]).collect()
    }
    assert got[1] == 50.0      # tie is INCLUSIVE: right@5 visible to left@5
    assert got[2] == 90.0      # latest of the two prior quotes
    assert got[3] is None      # no prior quote → left-outer NULL
    assert got[4] is None      # v's only quote is AFTER the event


def test_range_self_join_equals_bruteforce(spark):
    """Bucketized range join == O(n²) brute force on a crafted stream,
    including pairs that straddle a bucket boundary."""
    from concept_hierarchy_formation_in_property_graphs_spark.operators.asof import (
        range_self_join,
    )

    rows = [(i, _ts(0) + datetime.timedelta(seconds=s))
            for i, s in enumerate([0, 50, 119, 121, 400, 430, 900])]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {(r["id_a"], r["id_b"]) for r in
           range_self_join(df, window_sec=120).collect()}
    want = {
        (a, b)
        for ai, (a, ta) in enumerate(rows)
        for b, tb in rows[ai + 1:]
        if abs((ta - tb).total_seconds()) <= 120
    }
    assert got == want and (2, 3) in got  # 119 vs 121 straddles the boundary
