"""Watermarked event-time window aggregation (Structured Streaming).

The reference has no streams (one-shot batch import, main.go:24-29); this
is the standard Spark-first shape a production metrics/rollup pipeline
pairs with the incremental indexer: readStream -> withWatermark ->
window groupBy -> append-mode sink. Append mode emits a window exactly
once, when the watermark passes its end — late rows behind the watermark
are DROPPED, which is the at-scale contract (state is bounded by
watermark horizon, not by stream length).

Batch equivalence: the same groupBy(F.window(...)) expression over a
static frame is the driver-checked `window_agg` query — identical
windows, so the streaming path is testable against SQL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def windowed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    stream = spark.readStream.schema(EVENTS_DDL).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


def run_to_parquet(agg: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain the current backlog (availableNow) into a parquet APPEND sink
    (finalized windows only). The file sink is the recoverable one — each
    drain resumes from the shared checkpoint, exactly like a production
    rollup job waking on a schedule."""
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
