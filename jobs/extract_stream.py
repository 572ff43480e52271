#!/usr/bin/env python3
"""The streaming extraction job — `spark-submit` entrypoint.

Usage (cluster):

    spark-submit --py-files ocr_spark.zip jobs/extract_stream.py \
        --payloads s3://bucket/crawl/payloads/ \
        --output   s3://bucket/crawl/extracted/ \
        --checkpoint s3://bucket/crawl/ckpt/ \
        [--continuous]

Usage (sandbox smoke):

    python3 jobs/extract_stream.py --payloads /tmp/payloads \
        --output /tmp/out --checkpoint /tmp/ckpt

Default trigger is ``availableNow`` — drain everything currently in
the payload directory, commit, exit; re-running with the same
checkpoint processes only files that landed since (exactly-once).
``--continuous`` keeps the query running and picks up new files as
they land — the production "crawl keeps writing, extraction keeps
up" mode.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--payloads", required=True, help="payload table dir")
    ap.add_argument("--output", required=True, help="extracted output path")
    ap.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ap.add_argument(
        "--continuous",
        action="store_true",
        help="run until killed instead of draining once (availableNow)",
    )
    args = ap.parse_args()

    from ocr_spark.session import get_spark
    from ocr_spark.streaming import extraction_stream

    spark = get_spark(app_name="ocr_spark-extract-stream")
    stream = extraction_stream(spark, args.payloads)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )
    if args.continuous:
        q = writer.trigger(processingTime="10 seconds").start()
    else:
        q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
