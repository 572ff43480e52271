#!/usr/bin/env python3
"""IVF-PQ index job — `spark-submit` entrypoint that trains the coarse
and product codebooks, writes a centroid-partitioned code table, and
(optionally) smoke-probes it:

    coarse k-means (Lloyd; zero-shuffle assignment, mapInPandas
        partial sums, bounded driver merge)
    → product codebooks, one per embedding slice (Jegou et al. 2011)
    → index write: (vec_id, codes array<int>) PARTITIONED BY centroid
      — one zero-shuffle projection; each inverted list IS a partition
      directory, so a probe's cell filter is partition pruning
    → optional probe: ADC top-k of --query-vec-id over --n-probe cells

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/ann_index.py \\
        --input  s3://bucket/crawl/embeddings/ \\
        --output s3://bucket/crawl/ivfpq-index/ \\
        --query-vec-id 0 --k 10 --n-probe 2

Usage (sandbox smoke):

    python3 jobs/ann_index.py \\
        --input /root/testdata/sf0.01/embeddings.parquet \\
        --output /tmp/ivfpq --report /tmp/ivfpq-topk --query-vec-id 0

Scale shape: nothing corpus-sized reaches the driver (codebooks are
k_coarse + m*k bounded rows); the only wide op is the partitioned
write's shuffle-free file fan-out; the probe reads ~n_probe/k_coarse
of the index bytes and scores 4-byte codes, not 256-byte vectors.
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

    from ocr_spark.operators import ann
    from ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", default=None, help="parquet path for probe top-k")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--emb-col", default="embedding")
    ap.add_argument("--k-coarse", type=int, default=ann.IVF_CENTROIDS)
    ap.add_argument("--n-iter", type=int, default=2)
    ap.add_argument("--query-vec-id", type=int, default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark(app_name="ocr_spark-ann-index")
    emb = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("vec_id"),
        F.col(args.emb_col).alias("embedding"),
    )
    meta = ann.build_ivfpq_index(
        emb, args.output, k_coarse=args.k_coarse, n_iter=args.n_iter
    )
    n = spark.read.parquet(args.output).count()
    print(f"index: {n} vectors, {len(meta['coarse'])} cells, "
          f"{len(meta['books'])} subspaces -> {args.output}")

    if args.query_vec_id is not None:
        q = (
            emb.filter(F.col("vec_id") == args.query_vec_id)
            .select("embedding")
            .collect()[0]
            .embedding
        )
        top = ann.ivfpq_probe(
            spark,
            args.output,
            [float(x) for x in q],
            k=args.k,
            n_probe=args.n_probe,
            exclude_vec_id=args.query_vec_id,
        )
        if args.report:
            top.write.mode("overwrite").parquet(args.report)
        for r in top.collect():
            print(f"probe vec_id={r.vec_id} adc_cos={r.adc_cos}")

    spark.stop()


if __name__ == "__main__":
    main()
