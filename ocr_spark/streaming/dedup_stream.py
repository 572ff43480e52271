"""Streaming exact deduplication — keep-one-per-content-hash across
an unbounded arrival stream.

A continuously-ingesting crawl sees the same page again and again
(re-crawls, mirrors, aggregators). The batch answer (`dedup_exact`'s
hash groupBy) needs the whole corpus present; the streaming answer is
stateful: the state store remembers every content hash seen so far and
each micro-batch emits only first sightings. The reference has no
analog (its only uniqueness is per-task `INSERT OR REPLACE`,
models/database.py:860-869); this is the standard front gate of a
streaming training-data pipeline.

Two state regimes, chosen by the caller:

* ``event_time=None`` — `dropDuplicates` on the hash: state grows with
  the number of *distinct* documents ever seen. Right for bounded
  backfills (availableNow drains) where the distinct-hash set fits the
  state store (RocksDB-backed on a real cluster).
* ``event_time="ts"`` — `dropDuplicatesWithinWatermark`: re-sightings
  are suppressed only within the watermark delay, and state older than
  the watermark is evicted. Right for the 10^12-row continuous case:
  bounded state, at the cost of re-admitting a duplicate that
  resurfaces after the horizon (which a periodic batch `dedup_exact`
  compaction then catches — the standard lambda split).

Plan shape per micro-batch: scan -> project(md5) -> one exchange on
the hash into the state store partitions. The shuffle carries (hash,
key columns), never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Input schema of the streamed documents directory (file streams
# cannot infer).
DOCS_SCHEMA = "doc_id bigint, text string"


def dedup_stream(
    spark: SparkSession,
    docs_path: str,
    schema: str = DOCS_SCHEMA,
    event_time: str | None = None,
    delay: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of first-sighting rows: input columns plus
    ``content_hash``, one row per distinct hash (per watermark horizon
    when ``event_time`` is set). ``max_files_per_trigger`` bounds
    micro-batch size (and forces multi-batch runs in tests, proving
    the dedup state crosses batch boundaries)."""
    import os

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(docs_path):
        reader = reader.option(
            "pathGlobFilter", os.path.basename(docs_path)
        )
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    hashed = stream.withColumn("content_hash", F.md5("text"))
    if event_time is not None:
        return hashed.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
