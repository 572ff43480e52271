#!/usr/bin/env python3
"""Corpus deduplication job — `spark-submit` entrypoint chaining the
full near-dup stack over an extracted-documents table:

    exact dedup (md5 groupBy, keep-min winner)
    → MinHash-LSH candidate pairs (banded signatures, bucket shuffle)
    → n-gram Jaccard verification of candidates (optional threshold)
    → connected components (alternating Large-Star/Small-Star)
    → cluster annotation: cluster_id + is_canonical per doc

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/dedup.py \\
        --input  s3://bucket/crawl/extracted/ \\
        --output s3://bucket/crawl/deduped/ \\
        --report s3://bucket/crawl/dedup-report/ \\
        --jaccard 0.8 --drop-duplicates

Usage (sandbox smoke):

    python3 jobs/dedup.py --input /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/deduped --report /tmp/dedup-report

Scale shape: the only wide operations are the exact-dedup winner agg
(16 bytes per doc through the shuffle), the LSH bucket agg (n_docs ×
16 bigint minhashes — never shingles), the per-candidate-pair text
join (bounded by candidate count, not n²), and the star rounds (one
groupBy each, O(log² n) rounds). Nothing graph- or corpus-shaped
reaches the driver. Output keeps every input column and appends
`cluster_id` and `is_canonical`; with --drop-duplicates only cluster
canonicals (plus exact-dup winners) survive.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_spark.operators import dedup
    from ocr_spark.operators.cluster import connected_components
    from ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--jaccard",
        type=float,
        default=0.8,
        help="shingle-Jaccard threshold for verifying LSH candidate "
        "pairs; 0 disables verification (trust the bands)",
    )
    ap.add_argument(
        "--max-bucket",
        type=int,
        default=dedup.MAX_MINHASH_BUCKET,
        help="skip LSH buckets above this size (degenerate band keys)",
    )
    ap.add_argument(
        "--drop-duplicates",
        action="store_true",
        help="write only canonical docs instead of annotating all",
    )
    ap.add_argument(
        "--band-stats",
        default=None,
        help="also write the per-band LSH bucket census (T182: sizes, "
        "singleton share, candidate-pair mass, over-cap counts) to "
        "this path — the table the bucket cap is reviewed against",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ocr_spark-dedup")
    # spread a narrow scan before the tokenize-heavy stages
    # (ocr_spark/plans/width.py) — integer/hash math only here,
    # so the round-robin exchange is partition-order safe
    from ocr_spark.plans import spread_cpu

    docs = spread_cpu(spark.read.parquet(args.input))
    key, text = args.key_col, args.text_col

    stages = []

    def audit(name, n):
        stages.append((name, int(n)))

    audit("input", docs.count())

    # 1. exact dedup: one winner (min key) per identical text
    winners = (
        docs.groupBy(F.md5(F.col(text)).alias("_h"))
        .agg(F.min(key).alias(key))
        .select(key)
    )
    docs = docs.join(winners, key, "left_semi")
    audit("exact_unique", docs.count())

    # 2. LSH candidate pairs over the exact-unique survivors
    corpus = docs.select(
        F.col(key).alias("doc_id"), F.col(text).alias("text")
    )
    pairs = dedup.minhash_candidate_pairs(corpus, args.max_bucket)
    audit("candidate_pairs", pairs.count())

    # 3. verify candidates with exact shingle Jaccard (text joined
    # back only for the bounded candidate set)
    if args.jaccard > 0:
        sh = corpus.select(
            "doc_id", dedup.shingles_col(F.col("text")).alias("sh")
        )
        pairs = (
            pairs.join(
                sh.select(
                    F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")
                ),
                "doc_a",
            )
            .join(
                sh.select(
                    F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")
                ),
                "doc_b",
            )
            .filter(
                dedup.jaccard_col(F.col("sa"), F.col("sb")) >= args.jaccard
            )
            .select("doc_a", "doc_b")
        )
        audit("verified_pairs", pairs.count())

    # 4. transitive closure → clusters
    cc = connected_components(
        corpus.select(F.col("doc_id").alias("node")),
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
    )

    # 5. annotate and write
    out = docs.join(
        cc.select(
            F.col("node").alias(key),
            F.col("component").alias("cluster_id"),
            (F.col("node") == F.col("component"))
            .cast("int")
            .alias("is_canonical"),
        ),
        key,
    )
    if args.drop_duplicates:
        out = out.filter(F.col("is_canonical") == 1)
    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    audit("output", written.count())
    audit(
        "clusters", written.select("cluster_id").distinct().count()
    )

    spark.createDataFrame(
        [(n, c) for n, c in stages], "stage string, n_docs long"
    ).coalesce(1).write.mode("overwrite").parquet(args.report)
    if args.band_stats:
        from ocr_spark.operators.dedup import minhash_band_stats

        minhash_band_stats(
            docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text")),
            max_bucket=args.max_bucket,
        ).coalesce(1).write.mode("overwrite").parquet(args.band_stats)
    for n, c in stages:
        print(f"{n}: {c}")


if __name__ == "__main__":
    main()
