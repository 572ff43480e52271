"""The extraction operator — the engine's flagship map stage.

Replaces the reference's queue/worker/per-page-HTTP pipeline
(/root/reference/core/page_processor.py:502-626, task_queue.py:546-635)
with one Arrow-batched ``mapInPandas`` over the documents table:

    scan(parquet/iceberg) -> admission filter (columnar, pushed down)
      -> repartition by xxhash64(url) (skew defused, north rule)
      -> mapInPandas(extract_batch)  # the only Python on the hot path
      -> per-doc rows (url, status, text, hash, metrics, partition_id)

Per-document failures become (status='failed', error_message) rows —
the reference's R2 semantics (poison rows never kill the job,
core/error_handler.py:87-193) — instead of task retries.

Two output shapes:
  * extract_documents: one row per document, text fully assembled
    inside the UDF (pages joined '\\n\\n').
  * extract_pages: one row per page (PDF fan-out, reference X1
    page_processor.py:393-400), for the built-in Spark assembly path
    ``assemble_documents`` (reference A1, task_manager.py:514-546).
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import MAX_PDF_PAGES, admission_ok, payload_kind, salted_key
from ..html_extract import html_extract
from ..pdf_extract import pdf_extract, pdf_extract_pages
from ..textops import MODERATION_BLOCKED_MESSAGE, sha256_text, sniff_kind

EXTRACT_SCHEMA = (
    "url string, kind string, status string, error_message string, "
    "n_pages int, text string, content_hash string, "
    "bytes_in bigint, chars_out bigint, partition_id int, elapsed_us bigint"
)

PAGES_SCHEMA = (
    "url string, page_number int, status string, error_message string, "
    "content string, content_length bigint, partition_id int"
)

SPANS_SCHEMA = (
    "url string, span_idx int, page int, start bigint, length bigint, "
    "span_kind string, span_text string, partition_id int"
)


def _extract_one(
    payload: Optional[bytes], max_pages: int = MAX_PDF_PAGES
) -> tuple:
    """(kind, status, error, n_pages, text) for one payload; never raises."""
    kind = sniff_kind(payload)
    try:
        if kind == "pdf":
            pages = pdf_extract_pages(payload)
            if len(pages) > max_pages:
                return kind, "failed", f"page count {len(pages)} exceeds limit", len(pages), None
            text = "\n\n".join(p for p in pages if p)
            return kind, "completed", None, len(pages), text
        if kind == "html":
            out = html_extract(payload)
            return kind, "completed", None, 1, out.text
        return kind, "failed", "unsupported payload type", 0, None
    except Exception as exc:  # pragma: no cover - defensive, R2 semantics
        return kind, "failed", f"{type(exc).__name__}: {exc}", 0, None


def make_extract_batch(max_pages: int = MAX_PDF_PAGES):
    """Build the mapInPandas payload for document-level extraction with
    the F2 page-count admission limit bound in (reference
    main.py:829-832: configurable max page count per document)."""

    def extract_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf_batch in batches:
            t0 = time.monotonic_ns()
            urls = pdf_batch["url"].tolist()
            payloads = pdf_batch["html"].tolist()
            n = len(urls)
            kinds, statuses, errors, n_pages_list, texts = [], [], [], [], []
            hashes, bytes_in, chars_out, elapsed = [], [], [], []
            for payload in payloads:
                d0 = time.monotonic_ns()
                kind, status, error, n_pages, text = _extract_one(
                    payload, max_pages
                )
                kinds.append(kind)
                statuses.append(status)
                errors.append(error)
                n_pages_list.append(n_pages)
                texts.append(text)
                hashes.append(sha256_text(text) if text is not None else None)
                bytes_in.append(len(payload) if payload is not None else 0)
                chars_out.append(len(text) if text is not None else 0)
                elapsed.append((time.monotonic_ns() - d0) // 1000)
            del t0
            yield pd.DataFrame(
                {
                    "url": urls,
                    "kind": kinds,
                    "status": statuses,
                    "error_message": errors,
                    "n_pages": pd.array(n_pages_list, dtype="int32"),
                    "text": texts,
                    "content_hash": hashes,
                    "bytes_in": pd.array(bytes_in, dtype="int64"),
                    "chars_out": pd.array(chars_out, dtype="int64"),
                    "partition_id": pd.array([pid] * n, dtype="int32"),
                    "elapsed_us": pd.array(elapsed, dtype="int64"),
                }
            )

    return extract_batch


# Default-limit instance (the shape most callers and tests use).
extract_batch = make_extract_batch()


def extract_pages_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas payload: page-level fan-out (reference X1).

    PDFs emit one row per page; HTML emits a single page-1 row (the
    reference's image tasks are single-page, task_manager.py:500-512).
    Empty pages keep status 'completed' with empty content, exactly the
    rows the assembly filter F8 later drops.
    """
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf_batch in batches:
        out_url, out_page, out_status, out_err, out_content = [], [], [], [], []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            kind = sniff_kind(payload)
            try:
                if kind == "pdf":
                    pages = pdf_extract_pages(payload)
                    for i, page_text in enumerate(pages):
                        out_url.append(url)
                        out_page.append(i + 1)
                        out_status.append("completed")
                        out_err.append(None)
                        out_content.append(page_text)
                elif kind == "html":
                    out_url.append(url)
                    out_page.append(1)
                    out_status.append("completed")
                    out_err.append(None)
                    out_content.append(html_extract(payload).text)
                else:
                    out_url.append(url)
                    out_page.append(1)
                    out_status.append("failed")
                    out_err.append("unsupported payload type")
                    out_content.append(None)
            except Exception as exc:  # pragma: no cover
                out_url.append(url)
                out_page.append(1)
                out_status.append("failed")
                out_err.append(f"{type(exc).__name__}: {exc}")
                out_content.append(None)
        yield pd.DataFrame(
            {
                "url": out_url,
                "page_number": pd.array(out_page, dtype="int32"),
                "status": out_status,
                "error_message": out_err,
                "content": out_content,
                "content_length": pd.array(
                    [len(c) if c is not None else 0 for c in out_content],
                    dtype="int64",
                ),
                "partition_id": pd.array([pid] * len(out_url), dtype="int32"),
            }
        )


def extract_spans_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas payload: span-level extraction output — one row per
    content block (HTML) / non-empty page (PDF), carrying byte offsets
    into the assembled document text (the north rule's "extracted
    text/spans"; reference result shape core/page_processor.py:1088+
    returns per-page content the reference UI re-slices client-side —
    here spans are a first-class table).

    ``span_text`` is sliced FROM the assembled text by
    ``text[start : start + length]`` — NOT taken from the block object
    — so the offsets themselves are what any downstream roundtrip
    (and the DuckDB oracle) exercises: a wrong start/length yields a
    wrong slice and a hash mismatch. Failed/unsupported docs emit no
    span rows; their status lives in the document-level output (R2).
    """
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf_batch in batches:
        url_o, idx_o, page_o, start_o, len_o, kind_o, text_o = (
            [], [], [], [], [], [], [],
        )
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            kind = sniff_kind(payload)
            try:
                if kind == "pdf":
                    out = pdf_extract(payload)
                elif kind == "html":
                    out = html_extract(payload)
                else:
                    continue
            except Exception:  # pragma: no cover - defensive, R2
                continue
            for i, sp in enumerate(out.spans):
                url_o.append(url)
                idx_o.append(i)
                page_o.append(sp["page"])
                start_o.append(sp["start"])
                len_o.append(sp["length"])
                kind_o.append(sp["kind"])
                text_o.append(out.text[sp["start"] : sp["start"] + sp["length"]])
        yield pd.DataFrame(
            {
                "url": url_o,
                "span_idx": pd.array(idx_o, dtype="int32"),
                "page": pd.array(page_o, dtype="int32"),
                "start": pd.array(start_o, dtype="int64"),
                "length": pd.array(len_o, dtype="int64"),
                "span_kind": kind_o,
                "span_text": text_o,
                "partition_id": pd.array([pid] * len(url_o), dtype="int32"),
            }
        )


def extract_spans(
    df: DataFrame,
    n_partitions: Optional[int] = None,
    salt: int = 0,
    strategy: str = "scan",
) -> DataFrame:
    """Span-level variant of :func:`extract_documents` — same admission
    and balance strategies, output fan-out is one row per span. Scale
    shape is identical to the document path (the span fan-out happens
    inside the Arrow batch, no extra shuffle)."""
    admitted = admit(df).select("url", "html")
    if strategy == "scan":
        parts = n_partitions or (
            SCAN_OVERSUB * df.sparkSession.sparkContext.defaultParallelism
        )
        return admitted.coalesce(parts).mapInPandas(
            extract_spans_batch, schema=SPANS_SCHEMA
        )
    if n_partitions:
        admitted = admitted.repartition(n_partitions, salted_key(salt))
    else:
        admitted = admitted.repartition(salted_key(salt))
    return admitted.mapInPandas(extract_spans_batch, schema=SPANS_SCHEMA)


def admit(df: DataFrame) -> DataFrame:
    """Admission control (reference F1/F3): sniff kind columnar-ly,
    drop oversize/unknown payloads. The length predicate is a plain
    expression Catalyst can evaluate at the scan."""
    return df.withColumn("kind", payload_kind()).filter(
        admission_ok("kind", "html")
    )


# Payloads above this size are the ones the size-aware mode exists
# for: multi-MB rows that skew task byte-load. Per-batch MEMORY is
# bounded engine-side regardless (session.py caps Arrow batches by
# bytes, spark.sql.execution.arrow.maxBytesPerBatch), so routing only
# has to smooth task duration, not protect RSS.
LARGE_PAYLOAD_BYTES = 1 * 1024 * 1024
# size_aware over-partitioning factor: more, smaller tasks per core so
# wave scheduling rebalances byte-skewed partitions (a straggler task
# holds one slice, not 1/n_cores of the input).
SIZE_AWARE_OVERSUB = 4
# scan-strategy task oversubscription: ~4 coalesced tasks per core so
# wave scheduling absorbs residual per-file byte variance without any
# payload exchange.
SCAN_OVERSUB = 4


def extract_documents(
    df: DataFrame,
    n_partitions: Optional[int] = None,
    salt: int = 0,
    size_aware: bool = False,
    max_pages: int = MAX_PDF_PAGES,
    strategy: str = "scan",
) -> DataFrame:
    """Admission -> partition-balance -> Arrow-batched extraction.

    Two balance strategies; pick by input shape:

    * ``strategy='scan'`` (default) — NO payload exchange: scan
      partitions (already byte-balanced by
      ``spark.sql.files.maxPartitionBytes``) are ``coalesce``d (a
      narrow, shuffle-free merge) to ``n_partitions`` or
      SCAN_OVERSUB x defaultParallelism chunky tasks. Extraction runs
      where the bytes already are. Right whenever the source table's
      files are size-balanced — which a crawl table written by any
      sane ingest is. Measured (BASELINE.md round 3): shipping the
      payload through a url-hash exchange cost 23% of the hi-width
      run and capped 8->32 scaling at ~0.52; the scan strategy holds
      ~0.72-0.78 — at 100 TB, shuffling the corpus to fix skew that
      scan-granular splitting already bounds is pure waste.
    * ``strategy='shuffle'`` — salted url-hash repartition
      (xxhash64(url, salt)) before extraction. Right when the INPUT
      itself is pathologically skewed (one giant file per hot host, a
      single unsplittable row group) or when the downstream stage
      needs url-hash co-location in the same job (the lineage
      pipeline's bucket-partitioned write, plans/lineage.py). This is
      the north-rule salting path; it trades one full payload shuffle
      for placement control.

    ``size_aware=True`` (implies shuffle) handles corpora mixing 2 KB
    pages with 100 MB PDFs (SURVEY §4, replacing the reference's
    file-size strategy heuristics, page_processor.py:88-153) with a
    SINGLE scan and a SINGLE shuffle: per-batch memory is already
    bounded engine-side (Arrow batches are byte-capped via
    spark.sql.execution.arrow.maxBytesPerBatch, session.py), so the
    only remaining hazard is task-duration skew — addressed by
    over-partitioning SIZE_AWARE_OVERSUB x. Output is row-identical
    under every strategy.
    """
    batch_fn = (
        extract_batch if max_pages == MAX_PDF_PAGES else make_extract_batch(max_pages)
    )
    admitted = admit(df).select("url", "html")
    if size_aware:
        strategy = "shuffle"
    if strategy == "scan":
        parts = n_partitions or (
            SCAN_OVERSUB * df.sparkSession.sparkContext.defaultParallelism
        )
        return admitted.coalesce(parts).mapInPandas(
            batch_fn, schema=EXTRACT_SCHEMA
        )
    parts = n_partitions
    if size_aware:
        base = n_partitions or int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        parts = base * SIZE_AWARE_OVERSUB
    if parts:
        admitted = admitted.repartition(parts, salted_key(salt))
    else:
        admitted = admitted.repartition(salted_key(salt))
    return admitted.mapInPandas(batch_fn, schema=EXTRACT_SCHEMA)


def extract_pages(
    df: DataFrame, n_partitions: Optional[int] = None, salt: int = 0
) -> DataFrame:
    """Page-level variant feeding the built-in assembly (A1)."""
    admitted = admit(df).select("url", "html")
    if n_partitions:
        admitted = admitted.repartition(n_partitions, salted_key(salt))
    else:
        admitted = admitted.repartition(salted_key(salt))
    return admitted.mapInPandas(extract_pages_batch, schema=PAGES_SCHEMA)


def moderation_keep(status_col: Column, error_col: Column) -> Column:
    """Assembly filter F7 (task_manager.py:527-530): drop pages that
    are cancelled with the moderation sentinel; keep everything else."""
    return ~(
        (status_col == F.lit("cancelled"))
        & (F.coalesce(error_col, F.lit("")) == F.lit(MODERATION_BLOCKED_MESSAGE))
    )


def assemble_documents(pages: DataFrame) -> DataFrame:
    """Document assembly with built-in functions only (reference A1).

    ORDER BY page_number inside each url without a global sort:
    sort_array over collected (page_number, content) structs — struct
    ordering is field-by-field, so page_number drives it — then
    concat_ws('\\n\\n'). Filters F7 (moderation) and F8 (empty) applied
    as columnar predicates before the aggregation, so the shuffle only
    carries surviving pages.
    """
    kept = pages.filter(
        moderation_keep(F.col("status"), F.col("error_message"))
    ).filter(F.length(F.coalesce(F.col("content"), F.lit(""))) > 0)
    collected = kept.groupBy("url").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("page_number", "content"))),
                lambda x: x["content"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_pages_kept"),
        F.sum("content_length").alias("chars_out"),
    )
    return collected
