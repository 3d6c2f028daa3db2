"""Structured Streaming: availableNow replay of the events parquet must
equal the batch query (batch-equivalence is the defined semantics,
SURVEY.md §7)."""

from __future__ import annotations

import shutil

import pytest

from usgs_lidar_spark.plans.queries import QUERIES
from usgs_lidar_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    tumbling_counts,
)
from tests.conftest import SF_SMALL
from tests.parity import canonical_rows


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    # readStream needs a directory source; stage the single parquet file.
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", events_dir / "part-0.parquet")

    stream = read_events_stream(spark, str(events_dir))
    assert stream.isStreaming
    result = run_available_now(tumbling_counts(stream), "t_tumbling")

    batch = QUERIES["r1_tumbling_window"](spark, SF_SMALL)
    s_cols, s_rows = canonical_rows(result.toPandas())
    b_cols, b_rows = canonical_rows(batch.toPandas())
    assert s_cols == b_cols
    assert s_rows == b_rows


def test_streaming_session_window_runs(spark, tmp_path):
    """Session windows under watermark in streaming mode (availableNow):
    row counts must match the batch session query's session count."""
    import shutil
    from usgs_lidar_spark.streaming.events import session_counts

    events_dir = tmp_path / "events_stream2"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", events_dir / "part-0.parquet")
    stream = read_events_stream(spark, str(events_dir))
    result = run_available_now(session_counts(stream), "t_sessions")
    batch_sessions = QUERIES["r1_session_window"](spark, SF_SMALL).count()
    assert result.count() == batch_sessions


def test_stateful_tracker_matches_batch(spark, tmp_path):
    """applyInPandasWithState per-user totals after one availableNow pass
    must equal the batch groupBy (exact cents arithmetic both sides)."""
    import shutil
    from pyspark.sql import functions as F
    from usgs_lidar_spark.catalog import load_table
    from usgs_lidar_spark.streaming.stateful import track_user_activity

    events_dir = tmp_path / "events_stream3"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", events_dir / "part-0.parquet")
    stream = read_events_stream(spark, str(events_dir))

    q = (
        track_user_activity(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }

    batch = load_table(spark, SF_SMALL, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("s"),
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
