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
