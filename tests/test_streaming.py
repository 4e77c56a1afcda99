"""Streaming windowed aggregation == batch aggregation on the same files
(AvailableNow exactly-once semantics)."""

from __future__ import annotations

import shutil
import tempfile

from concept_hierarchy_formation_in_property_graphs_spark.operators.streaming import (
    read_events_stream,
    run_stream_available_now,
    windowed_event_counts,
)


def test_stream_equals_batch_hourly_counts(spark):
    # the file stream source requires a directory — stage the table file
    src_dir = tempfile.mkdtemp(prefix="chf_stream_src_")
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                src_dir + "/part-0.parquet")
    src = src_dir
    ck = tempfile.mkdtemp(prefix="chf_stream_ck_")
    try:
        stream = read_events_stream(spark, src)
        assert stream.isStreaming
        res = windowed_event_counts(stream)
        q = run_stream_available_now(res, "hourly_counts", ck)
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.table("hourly_counts").collect()
        }
        batch = windowed_event_counts(spark.read.parquet(src))
        exp = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in batch.collect()
        }
        assert got == exp and len(got) > 0
        q.stop()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
