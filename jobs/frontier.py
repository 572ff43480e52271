#!/usr/bin/env python3
"""Crawl-frontier planning job — `spark-submit` entrypoint that turns
the current corpus snapshot into the NEXT crawl's fetch plan:

    URL admission (T83) → robots.txt rules (T65) →
    [per-host quota (T44)] → [recrawl tiers (T85), needs --prev-input]
    → politeness schedule (T123) → fetch plan partitioned by worker

Every stage is the corresponding library operator; the job only
chains them and writes the audit trail.  The output fetch plan is
partitioned by ``worker`` so each crawl worker reads exactly its own
partition directory — and because the politeness schedule pins every
host to one worker, a worker's partition is self-contained: its slot
sequence per host IS the crawl-delay contract, no cross-worker
coordination needed.

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/frontier.py \
        --input  s3://bucket/crawl/extracted/ \
        --output s3://bucket/crawl/fetch-plan/ \
        --report s3://bucket/crawl/frontier-report/ \
        --host-cap 100000 --prev-input s3://bucket/crawl/prev/

Usage (sandbox smoke):

    python3 jobs/frontier.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/fetch-plan --report /tmp/frontier-report

Scale shape: admission and robots are codegen'd column filters plus
one broadcast rule join (no corpus shuffle); the host quota is the
salted two-stage rank; the only per-host serialization is the
politeness window — inherent to politeness — carrying (doc_id, host,
hash) rows only.
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
    from pyspark.sql import functions as F

    from ocr_spark.operators.webcorpus import (
        canonicalize_url,
        host_cap,
        plant_url_col,
        politeness_schedule,
        recrawl_priority,
        robots_filter,
        url_filter,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--prev-input", default=None,
                    help="previous snapshot for recrawl tiers (T85)")
    ap.add_argument("--host-cap", type=int, default=0,
                    help="max URLs per host (0 = uncapped)")
    ap.add_argument("--delay-ms", type=int, default=1000)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    from ocr_spark.session import get_spark

    spark = get_spark(
        app_name="frontier",
        cores=args.cores or None,
    )

    docs = spark.read.parquet(args.input)
    stages = [("input", docs.count())]

    # 1. URL admission: pure column arithmetic, no payload read
    admitted_ids = url_filter(docs).filter(F.col("admitted")).select("doc_id")
    docs = docs.join(admitted_ids, "doc_id", "left_semi")
    stages.append(("url_admission", docs.count()))

    # 2. robots.txt longest-prefix rules: broadcast rule table
    allowed_ids = (
        robots_filter(docs).filter(F.col("allowed")).select("doc_id")
    )
    docs = docs.join(allowed_ids, "doc_id", "left_semi")
    stages.append(("robots", docs.count()))

    # 3. optional per-host quota (salted two-stage rank)
    if args.host_cap:
        kept = host_cap(docs, cap=args.host_cap).select("doc_id")
        docs = docs.join(kept, "doc_id", "left_semi")
        stages.append((f"host_cap_{args.host_cap}", docs.count()))

    # 4. politeness schedule: slots, per-host worker pinning
    plan = politeness_schedule(
        docs, delay_ms=args.delay_ms, n_workers=args.workers
    )

    # 5. optional recrawl tiers from the previous snapshot.  The tier
    # table must be keyed on the SAME host derivation the politeness
    # plan uses (canonicalize_url over the planted URL), not the raw
    # ``source`` column — otherwise the left join never matches and
    # every host silently falls back to 'hot'.
    if args.prev_input:

        def _with_canon_host(df):
            url = plant_url_col(F.col("doc_id"), F.col("source"))
            return df.select(
                "doc_id", "text", canonicalize_url(url)["host"].alias("host")
            )

        prev = spark.read.parquet(args.prev_input)
        tiers = recrawl_priority(
            _with_canon_host(prev),
            _with_canon_host(docs.select("doc_id", "text", "source")),
            host_col="host",
        )
        plan = plan.join(
            F.broadcast(tiers.select("host", "tier")), "host", "left"
        ).withColumn("tier", F.coalesce("tier", F.lit("hot")))

    plan.write.mode("overwrite").partitionBy("worker").parquet(args.output)
    stages.append(("fetch_plan", spark.read.parquet(args.output).count()))

    spark.createDataFrame(
        [(i, name, n) for i, (name, n) in enumerate(stages)],
        ["stage_idx", "stage", "rows"],
    ).coalesce(1).write.mode("overwrite").parquet(args.report)
    print(json.dumps({"stages": stages}))


if __name__ == "__main__":
    main()
