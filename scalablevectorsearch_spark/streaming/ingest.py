"""Structured Streaming ingest — continuous vector upserts and
event-time windowed aggregation.

Parity note: the reference has NO streaming (SURVEY §2.10 — its
"streaming-adjacent" surface is the dynamic index mutation API). This
module is the Spark-native continuation of that surface: a vector
stream lands via ``foreachBatch`` as the add_points/delete_entries
analog (micro-batch = the reference's mutation batch), and event-time
windowing covers the late-data semantics the LLM-pipeline extension
needs (SURVEY §7 Phase 5).

Scale shape: foreachBatch appends sequenced micro-batches to a Parquet
log — an upsert LOG, compacted on read by ``latest_view`` (id ->
newest record wins, tombstones dropped). On a real deployment the same
``foreachBatch`` body would MERGE into Delta/Iceberg; the log+compact
form keeps the semantics identical with plain Parquet."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ``seq`` is the producer-side version: micro-batch boundaries are not a
# reliable order (availableNow may drain several files into one batch),
# so upsert resolution must come from the records themselves
VECTOR_STREAM_SCHEMA = "id long, vector array<float>, is_delete boolean, seq long"


def stream_vectors(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of vector upserts: (id, vector, is_delete)."""
    return spark.readStream.schema(VECTOR_STREAM_SCHEMA).parquet(src_dir)


def ingest_vectors(
    stream: DataFrame, target_dir: str, checkpoint_dir: str, await_done: bool = True
):
    """foreachBatch upsert-log writer: each micro-batch is stamped with
    its batch id (the mutation sequence) and appended. Runs with
    availableNow (drain-and-stop) — swap the trigger for continuous
    ingest in production."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch", F.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(target_dir)
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_done:
        q.awaitTermination()
    return q


def latest_view(spark: SparkSession, target_dir: str) -> DataFrame:
    """Compact the upsert log: newest record per id wins; tombstoned ids
    (is_delete) drop out — the dynamic-index read view."""
    log = spark.read.parquet(target_dir)
    w = Window.partitionBy("id").orderBy(F.col("seq").desc(), F.col("__batch").desc())
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (~F.col("is_delete")))
        .select("id", "vector")
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark:
    (window_start, event_type, n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_events(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
):
    """Drain a parquet event stream through the windowed aggregation
    into an output sink (append mode — windows emit once the watermark
    passes; availableNow flushes all)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = windowed_event_counts(stream, window_duration, watermark)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
