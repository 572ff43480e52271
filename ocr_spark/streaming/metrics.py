"""Streaming metrics — the reference's progress/rate machinery
re-expressed as Structured Streaming over durable tables.

The reference runs an in-process loop every 2 s that samples
progress, keeps the last 10 ≥5 s-apart deltas, and averages them into
a pages/sec rate (core/progress_tracker.py:129-245, W1); plus
periodic scan jobs (main.py:392-421, W4).  In the new engine the same
information lives in *tables* (the lineage/metrics checkpoint table,
an events table), so "live rates" are a streaming windowed
aggregation over a file source:

    readStream(parquet dir) -> withWatermark -> groupBy(window(...))
      -> aggregate -> sink

Everything here runs with ``trigger(availableNow=True)`` in tests and
the driver contract — process-all-then-stop, which is also how a
production backfill over a static table runs; swap the trigger for a
continuous one and the same query monitors a live ingest.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Schema of the driver testdata `events` table (file sources must
# declare their schema — streaming reads cannot infer).
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

from ..plans.lineage import LINEAGE_SCHEMA  # noqa: E402


def _file_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Streaming parquet source over a directory; a single-file path
    (the driver testdata layout) is read via its parent directory with
    a glob filter, since file sources require a directory basePath."""
    import os

    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.load(path)


def windowed_event_counts_stream(
    spark: SparkSession, events_path: str, window: str = "1 minute"
) -> DataFrame:
    """Streaming windowed histogram (W1/W4 analog): events per
    (event_type, tumbling window).  Watermark bounds state so a
    continuous run evicts closed windows instead of growing forever."""
    stream = _file_stream(spark, events_path, EVENTS_SCHEMA)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )


def lineage_rates_stream(
    spark: SparkSession, lineage_path: str, window: str = "1 minute"
) -> DataFrame:
    """Extraction-rate monitor over the lineage checkpoint table: as
    buckets finish, emit docs/sec per window — the reference's
    processing_rate estimator (progress_tracker.py:174-199) computed
    from durable lineage rows instead of an in-process sampler."""
    stream = _file_stream(spark, lineage_path, LINEAGE_SCHEMA)
    win = F.window("finished_at", window)
    return (
        stream.withWatermark("finished_at", "10 minutes")
        .groupBy(win.alias("w"), "run_id")
        .agg(
            F.sum("n_docs").alias("docs"),
            F.sum("n_failed").alias("failed"),
            F.sum("bytes_in").alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "run_id",
            "docs",
            "failed",
            "bytes_in",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str | None = None) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory sink; return the finished result as a batch DataFrame.

    This is how streaming queries appear in the driver contract:
    the *query definition* is a real streaming plan, the materialized
    answer is an ordinary DataFrame an oracle can check.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)
