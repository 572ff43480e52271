#!/usr/bin/env python3
"""WARC ingestion job — `spark-submit` entrypoint.

Turns a directory of Common-Crawl-style ``.warc`` archives into the
engine's input table shape ``(url, warc_ts, html)`` and optionally runs
extraction in the same job, so a crawl dump becomes extracted text in
one submit:

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/warc_ingest.py \
        --warc-dir s3://bucket/crawl/segments/ \
        --output   s3://bucket/crawl/documents/ \
        [--extract --extracted s3://bucket/crawl/extracted/]

Scale shape: the ``binaryFile`` source parallelizes at file granularity
(one Common-Crawl segment file per task), record splitting is local to
each blob (no exchange), and malformed records land in the output as
``status != 'ok'`` rows instead of failing the job (R2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warc-dir", required=True, help=".warc directory")
    ap.add_argument("--output", required=True, help="documents table path")
    ap.add_argument(
        "--extract",
        action="store_true",
        help="also run extraction on the ingested pages",
    )
    ap.add_argument("--extracted", default=None, help="extracted output path")
    ap.add_argument(
        "--partitions", type=int, default=None, help="shuffle width override"
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.session import get_spark
    from ocr_spark.sources.warc import WARC_DATE, read_warc_dir

    spark = get_spark(app_name="ocr_spark-warc-ingest")
    records = read_warc_dir(spark, args.warc_dir)
    docs = records.select(
        "url",
        F.lit(WARC_DATE).cast("timestamp").alias("warc_ts"),
        "html",
        "status",
    )
    docs.write.mode("overwrite").parquet(args.output)

    ok = spark.read.parquet(args.output).filter(F.col("status") == "ok")
    summary = {
        "records": spark.read.parquet(args.output).count(),
        "ok": ok.count(),
    }

    if args.extract:
        from ocr_spark.operators import extract_documents

        out_path = args.extracted or args.output.rstrip("/") + "_extracted"
        extract_documents(
            ok.select("url", "html"), n_partitions=args.partitions
        ).write.mode("overwrite").parquet(out_path)
        summary["extracted"] = spark.read.parquet(out_path).count()

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
