"""Custom stateful streaming operator: cumulative per-run progress.

The reference's ProgressTracker keeps in-process mutable state per
task — cumulative processed pages, a rate estimate, an ETA — updated
by a 2 s sampler loop (core/progress_tracker.py:129-245).  That state
machine maps to Structured Streaming's arbitrary stateful processing:
``applyInPandasWithState`` keyed by run_id, where the managed GroupState
carries (docs_done, bytes_in, batches_seen) across micro-batches and
each batch emits one progress row per run — the W1/W2 "latest
progress" surface computed incrementally instead of by re-scanning
the lineage table.

State is explicit, bounded (one tuple per active run) and evicted via
processing-time timeout, so the operator survives unbounded streams —
the property the reference's in-memory dicts (task_queue.py:40-44)
lack across restarts.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .metrics import _file_stream

PROGRESS_OUTPUT_SCHEMA = (
    "run_id string, docs_done bigint, bytes_in bigint, n_failed bigint, "
    "batches_seen int"
)
PROGRESS_STATE_SCHEMA = "docs bigint, bytes bigint, failed bigint, batches int"


def _make_update_progress(evict_idle: bool):
    """Build the state-update function; ``evict_idle`` is captured in
    the closure so it ships to executors with the serialized UDF."""

    def update_progress(
        key: Tuple[str],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        docs, bytes_in, failed, n_batches = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        for pdf_batch in batches:
            docs += int(pdf_batch["n_docs"].sum())
            bytes_in += int(pdf_batch["bytes_in"].sum())
            failed += int(pdf_batch["n_failed"].sum())
        n_batches += 1
        state.update((docs, bytes_in, failed, n_batches))
        if evict_idle:
            # evict runs idle for an hour (bounds state on long streams)
            state.setTimeoutDuration(3600 * 1000)
        yield pd.DataFrame(
            {
                "run_id": [key[0]],
                "docs_done": pd.array([docs], dtype="int64"),
                "bytes_in": pd.array([bytes_in], dtype="int64"),
                "n_failed": pd.array([failed], dtype="int64"),
                "batches_seen": pd.array([n_batches], dtype="int32"),
            }
        )

    return update_progress


def cumulative_progress_stream(
    spark: SparkSession, lineage_path: str, evict_idle: bool = False
) -> DataFrame:
    """Streaming cumulative progress per run over the lineage table.

    ``evict_idle=True`` turns on processing-time state timeouts (the
    continuous-deployment mode: idle runs evicted after an hour).
    Off by default because a ProcessingTimeTimeout query under
    ``trigger(availableNow)`` stays alive waiting to fire timeouts
    instead of terminating — batch-style finite runs use NoTimeout.
    """
    from ..plans.lineage import LINEAGE_SCHEMA

    stream = _file_stream(spark, lineage_path, LINEAGE_SCHEMA)
    return stream.groupBy("run_id").applyInPandasWithState(
        _make_update_progress(evict_idle),
        outputStructType=PROGRESS_OUTPUT_SCHEMA,
        stateStructType=PROGRESS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout,
    )


def run_progress_to_memory(stream_df: DataFrame, name: str | None = None) -> Any:
    """availableNow run into a memory sink (update mode)."""
    import uuid

    name = name or f"prog_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
