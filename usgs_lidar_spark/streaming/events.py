"""Event-time streaming over the events table.

The batch-equivalent forms of these aggregations are oracle-checked in
plans/queries.py (r1_tumbling_window / r1_sliding_window /
r1_session_window); this module provides the actual readStream ->
withWatermark -> window -> writeStream pipelines, exercised in tests with
the availableNow trigger (process-everything-then-stop), which replays the
same parquet and must produce the same rows as the batch query.

Scale notes: watermarks bound state (late data beyond the watermark is
dropped); the shuffle is keyed by (window, keys) exactly as in batch; state
lives in the state store (RocksDB on a real cluster) — nothing here is
driver-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """Streaming source schema with the on-disk type of ``ts`` plugged in.

    The driver's parquet has carried ``ts`` as TIMESTAMP(NANOS) (read as raw
    int64 under nanosAsLong) in some generations and TIMESTAMP(MICROS) in
    others, so the reader probes rather than assumes — see
    ``read_events_stream``."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: The raw-int64-nanos form, used by tests that synthesize nanos parquet.
EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events parquet directory, ts normalized to
    TimestampNTZ with integer nano->micro division (see catalog.load_table
    for why float division would corrupt it).

    ``max_files_per_trigger`` bounds each micro-batch to N source files
    (oldest modification time first). Production use: throttle a large
    backfill so state/watermark advance incrementally instead of one giant
    batch; tests use it to replay files in separate micro-batches and
    exercise watermark progression between them."""
    # readStream needs an explicit schema, but the on-disk ts type varies
    # across testdata generations (TIMESTAMP(NANOS) -> bigint under
    # nanosAsLong vs native TIMESTAMP(MICROS)). Probe once with a batch
    # footer read — a driver-side metadata operation — and match it.
    disk_ts = spark.read.parquet(events_dir).schema["ts"].dataType
    reader = spark.readStream.schema(_events_raw_schema(disk_ts)).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(events_dir)
    # Normalize to LTZ (not NTZ): withWatermark requires TIMESTAMP; with the
    # session in UTC the wall-clock values match the batch loader's NTZ
    # exactly. Integer division for the nanos form — see catalog.load_table
    # for why float division would corrupt the microsecond digit.
    if isinstance(disk_ts, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, width: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    twin of r1_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "value_sum"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked session windows per user — the streaming twin of
    r1_session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def run_available_now(stream_df: DataFrame, table_name: str) -> DataFrame:
    """Run a streaming query with the availableNow trigger into an
    in-memory sink, wait for completion, and return the result table.
    Test harness: processes every available file then stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {table_name}")


def dedup_events_stream(
    events: DataFrame, id_cols: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact deduplication: drop repeated deliveries of the same
    event within the watermark horizon — the streaming twin of
    operators/dedup.exact_dedup for at-least-once sources (Kafka
    redeliveries, retried webhooks).

    ``dropDuplicatesWithinWatermark`` keys state by ``id_cols``; a
    duplicate arriving within the event-time watermark of the first copy
    is dropped, and state for an id is evicted once the watermark passes
    it — so per-key state is BOUNDED by the watermark horizon, the
    property that keeps an infinite stream's dedup state finite. (Plain
    dropDuplicates on a stream would keep every id forever.)
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )

def click_purchase_join_stream(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval self-join: match each click with the same
    user's purchases inside ``[click_ts, click_ts + horizon]`` — the
    streaming twin of the batch ``events_click_purchase_pairs`` query.

    Why this shape is the hard one in streaming: both sides are
    unbounded, so the engine must BUFFER rows waiting for future matches.
    Two things bound that state, and both are required: each side carries
    an event-time watermark (how late its rows can be), and the join
    condition constrains the two event times to a finite interval — from
    these Spark derives, per side, the oldest row that could still match
    a future row, and evicts everything older from the state store. With
    only an equi-key (no time bound) the state would grow forever.

    The join key is user_id (hash-partitioned state, spreads across
    executors); the time range is the residual predicate that enables
    eviction. ``how="inner"`` (default) emits each match exactly once in
    append mode. ``how="leftOuter"`` additionally emits a NULL-purchase
    row for a click once the watermark proves no future purchase can
    match it (click_ts + horizon < watermark) — i.e., the null row is
    emitted AT EVICTION TIME, so clicks near the head of the stream
    never produce one until enough event time passes (the semantics
    test_stream_stream_left_join_eviction pins).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    j = clicks.join(
        purchases,
        (clicks["user_id"] == purchases["p_user"])
        & (purchases["p_ts"] >= clicks["c_ts"])
        & (purchases["p_ts"] <= clicks["c_ts"] + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    return j.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
    )
