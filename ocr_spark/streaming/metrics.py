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


SESSION_GAP_MIN = 30


def session_window_stream(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = SESSION_GAP_MIN,
) -> DataFrame:
    """Gap sessionization as a NATIVE streaming operator: Spark's
    ``session_window`` merges per-key sessions inside the state store,
    so a continuous ingest emits finalized sessions as the watermark
    passes them — the streaming twin of the batch ``events.sessionize``
    (T38), which needs the whole history per key.

    Boundary semantics match the batch op: Spark merges an event into
    the open session when it is at most ``gap`` after the previous
    event (inclusive — an event exactly ``gap`` later still merges;
    empirically pinned by a test), i.e. a new session starts only when
    the gap is strictly greater.  Session end = last event + gap.

    State is one open session per active key, evicted at the
    watermark — bounded regardless of history length."""
    stream = _file_stream(spark, events_path, EVENTS_SCHEMA)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            # window end = last event + gap (exclusive)
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
    )


def sql_session_window(gap_minutes: int = SESSION_GAP_MIN) -> str:
    """Batch restatement of the streaming session-window semantics:
    islands split where the gap is STRICTLY greater than
    ``gap_minutes`` (an exact-gap event merges — pinned by
    test_session_window_exact_gap_merges), session_end = max(ts) + gap."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
        WITH tagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        ids AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM tagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL {gap_minutes} MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM ids
        GROUP BY user_id, sid
    """


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


# ---------------------------------------------------------------------------
# T133 — streaming HyperLogLog (mergeable sketch over an unbounded stream)
# ---------------------------------------------------------------------------
#
# Mergeability is the POINT of the HLL sketch: max() over registers is
# associative, commutative, and idempotent, so the streaming state is
# exactly the 1024-row-per-group register table — bounded forever, no
# watermark needed, and replay-safe (re-seeing a document cannot move
# a register down).  The streaming query IS the batch register merge
# in complete mode; the estimator then runs as an ordinary batch agg
# over the materialized registers.  The oracle is the BATCH HLL SQL
# over the same data — streamed merge == batch merge, the equivalence
# that proves the sketch streams.

def hll_register_stream(
    spark: SparkSession,
    docs_path: str,
    group_col: str = "lang",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (g, j, m_j) register table over a growing documents
    directory — groupBy(g, j).max(rho) in complete mode; state is
    bounded at n_groups x 1024 rows regardless of stream length."""
    import os

    from ocr_spark.operators.dedup import shingles_col
    from ocr_spark.operators.sketches import hll_rho_cols

    schema = f"doc_id bigint, text string, {group_col} string"
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(docs_path):
        reader = reader.option(
            "pathGlobFilter", os.path.basename(docs_path)
        )
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    return (
        stream.select(
            F.col(group_col).alias("g"),
            F.explode(shingles_col(F.col("text"))).alias("sh"),
        )
        .select(*hll_rho_cols())
        .groupBy("g", "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_stream_estimate(
    spark: SparkSession,
    docs_path: str,
    group_col: str = "lang",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the register stream (availableNow), then run the batch
    estimator over the materialized registers: (lang, v_empty,
    z_scaled, est) — hash-identical to the batch HLL over the same
    rows."""
    from ocr_spark.operators.sketches import hll_estimate

    regs = run_stream_to_memory(
        hll_register_stream(
            spark,
            docs_path,
            group_col=group_col,
            max_files_per_trigger=max_files_per_trigger,
        )
    )
    return hll_estimate(regs, group_col=group_col)
