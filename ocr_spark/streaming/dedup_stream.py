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


# ---------------------------------------------------------------------------
# T56 — streaming NEAR-dup suppression (LSH index probe per micro-batch)
# ---------------------------------------------------------------------------


def neardup_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    out_path: str,
    batch_id: int,
    max_bucket: int | None = None,
) -> None:
    """One foreachBatch step of streaming near-dup suppression:

    1. drop batch docs with an LSH candidate partner of LOWER doc_id
       inside the batch (``minhash_candidate_pairs`` — the greedy
       keep-first rule batch dedup uses);
    2. drop batch docs with ANY candidate partner already in the
       persisted signature index (``incremental_neardup_pairs`` — the
       per-ingest O(batch) probe, never a corpus recompute);
    3. append the survivors to ``out_path`` and ALL batch signatures
       (survivors and dropped alike) to the index — indexing dropped
       docs too keeps the pair semantics identical to batch LSH, so
       with id-ordered arrival the drained output equals the batch
       rule "keep docs with no lower-id candidate partner" (the SQL
       oracle's statement).

    Both writes overwrite a ``batch=<id>`` subdirectory, and the index
    probe excludes the current batch's own partition (a failed attempt
    may have written it already), so a retried micro-batch is
    idempotent (exactly-once output without a transactional sink). At 10^12-row scale the index is stored
    bucketed on the band key (``plans.bucketed.save_bucketed``) so the
    probe shuffles only the batch side — plan-asserted for the batch
    analog in test_incremental_probe_is_exchange_free_on_index.
    """
    from ocr_spark.operators import dedup

    mb = max_bucket if max_bucket is not None else dedup.MAX_MINHASH_BUCKET
    batch = batch.select("doc_id", "text")
    pairs = dedup.minhash_candidate_pairs(batch, mb)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    try:
        old = spark.read.parquet(index_path)
        # A retried micro-batch must NOT see its own prior attempt's
        # signatures: the index includes a batch=<id> dir from the
        # failed attempt, and probing it would pair batch docs against
        # their own batch-mates (dropping the pair's survivor as well —
        # the keep-first rule already handled in-batch pairs above).
        # Excluding the current batch partition restores idempotence;
        # partition pruning makes the filter free.
        if "batch" in old.columns:
            old = old.filter(F.col("batch") != batch_id)
        old = old.select("doc_id", "band", "key")
    except Exception:  # first batch: no index yet
        old = None
    if old is not None:
        hits = dedup.incremental_neardup_pairs(batch, old)
        drops = drops.unionByName(
            hits.select(F.col("doc_new").alias("doc_id")).distinct()
        ).distinct()
    survivors = batch.join(drops, "doc_id", "left_anti")
    survivors.write.mode("overwrite").parquet(
        f"{out_path}/batch={batch_id}"
    )
    dedup.signature_table(batch, mb).write.mode("overwrite").parquet(
        f"{index_path}/batch={batch_id}"
    )


def run_neardup_stream(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    schema: str = DOCS_SCHEMA,
    max_files_per_trigger: int | None = None,
    max_bucket: int | None = None,
) -> None:
    """Drain ``docs_path`` (availableNow) through per-micro-batch
    near-dup suppression; survivors land under ``out_path/batch=*``,
    the growing LSH signature index under ``index_path/batch=*``.
    ``max_files_per_trigger=1`` forces one batch per input file,
    proving suppression crosses batch boundaries in tests."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(docs_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        neardup_batch_step(
            spark, batch_df, index_path, out_path, batch_id, max_bucket
        )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact_signature_index(
    spark: SparkSession,
    index_path: str,
    table_name: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Fold the streaming index's ``batch=<id>`` parquet dirs into the
    bucketed-and-sorted signature table that makes every future probe
    join exchange-free on the indexed side
    (``plans.bucketed.save_bucketed`` on the band key — the same
    layout T31's incremental probe is plan-asserted against).  The
    periodic maintenance job between streaming ingests: many small
    per-batch files become one bucket-pruned table, and (doc_id, band,
    key) rows are deduped across batches (a replayed batch writes
    identical rows, so compaction is idempotent too)."""
    from ocr_spark.plans import save_bucketed

    sigs = (
        spark.read.parquet(index_path)
        .select("doc_id", "band", "key")
        .distinct()
    )
    save_bucketed(sigs, table_name, n_buckets, key=("band", "key"))
    return spark.table(table_name)
