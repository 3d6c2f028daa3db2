"""Exactly-once file sink for streams: idempotent foreachBatch writes.

Structured Streaming's checkpoint guarantees each micro-batch is
delivered to foreachBatch AT LEAST once (a crash between sink write and
checkpoint commit replays the batch). End-to-end exactly-once therefore
needs the sink write itself to be idempotent. The standard pattern,
implemented here: key the output location by batchId and overwrite —
replaying batch N rewrites batch_id=N with identical content instead of
appending duplicates.

Scale notes: each batch writes through the normal distributed parquet
writer (no driver funnel); the batch_id=N directories are hive
partitions, so readers get a `batch_id` column and partition pruning for
free, and a compaction job can rewrite old batch dirs without touching
the stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_parquet_writer(path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback writing each micro-batch to
    ``path/batch_id=<n>`` with overwrite semantics — replay-safe."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write_batch


def run_stream_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain all available input into the idempotent parquet sink
    (availableNow trigger) and wait for completion. Restarting with the
    same checkpoint resumes after the last committed batch; a crash
    mid-batch replays into the same batch_id directory."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_writer(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
