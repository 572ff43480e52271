#!/usr/bin/env python3
"""Tokenization job — `spark-submit` entrypoint for the last pipeline
stage before training: learn a BPE merge table on the (curated) corpus,
encode every doc with it, assign hash-deterministic train/val/test
splits, and emit the packing + epoch-shuffle manifests a trainer
consumes.

    train BPE merges → encode (true-BPE token counts) →
    dataset split → sequence-packing manifest → epoch-shuffle manifest

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/tokenize_corpus.py \
        --input  s3://bucket/crawl/curated/ \
        --output s3://bucket/crawl/tokenized/ \
        --merges 4096 --shard-tokens 2000000 --epochs 3

Usage (sandbox smoke):

    python3 jobs/tokenize_corpus.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/tokenized --merges 8 --shard-tokens 2000 --epochs 2

Scale notes: BPE training touches the corpus once (the word count);
every merge round runs over the word-type dictionary with a single
collected argmax row (ocr_spark/operators/bpe.py) — below
DICT_LOCAL_TYPES word types the loop finishes driver-local (the
production-trainer shape), so --merges 4096 costs no extra Spark jobs;
above it each merge is 2 distributed jobs, so keep large-K training to
the local-dictionary regime or budget ~2K jobs.  Encoding compiles
small merge tables (<= ENCODE_COMPILE_MAX = 64) into K narrow codegen'd
projections and switches to one Arrow-batched rank-table-lookup UDF
above that — constant plan size at production vocabulary scale.  Splits are
pure per-row hash expressions; manifests are one window each.  The job
writes:

  <output>/merges/     the learned merge table (rank, lhs, rhs, ...)
  <output>/encoded/    per doc: split, n_words, n_subwords
  <output>/manifest/   per train doc: shard + (start_token, end_token)
  <output>/epochs/     per (train doc, epoch): shard + position
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

    from ocr_spark.operators.bpe import encode_bpe, train_bpe
    from ocr_spark.operators.corpus_ops import (
        dataset_split,
        epoch_shuffle,
        pack_manifest,
    )
    from ocr_spark.plans import spread_cpu
    from ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--shard-tokens", type=int, default=50_000)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="ocr_spark-tokenize")
    docs = spread_cpu(spark.read.parquet(args.input))
    key, text = args.key_col, args.text_col
    out = args.output.rstrip("/")

    # 1. learn the merge table (K collected argmax rows; corpus
    #    shuffles once for the word count)
    merges_df = train_bpe(docs, n_merges=args.merges, text_col=text)
    merges_df.write.mode("overwrite").parquet(f"{out}/merges")
    merges = [
        (r.lhs, r.rhs)
        for r in spark.read.parquet(f"{out}/merges")
        .orderBy("merge_rank")
        .collect()
    ]

    # 2. encode + 3. hash-deterministic split (both narrow)
    enc = encode_bpe(docs, merges=merges, text_col=text, key_col=key)
    split = dataset_split(
        docs.withColumn("lang", F.coalesce(F.col("lang"), F.lit("und")))
        if "lang" in docs.columns
        else docs.withColumn("lang", F.lit("und")),
        key_col=key,
    )
    encoded = enc.join(split.select(F.col(key).alias("doc_id"), "split"), "doc_id")
    encoded.write.mode("overwrite").parquet(f"{out}/encoded")

    # 4. packing manifest over the train split only
    train_ids = spark.read.parquet(f"{out}/encoded").filter(
        F.col("split") == "train"
    ).select("doc_id")
    train_docs = docs.join(
        train_ids.withColumnRenamed("doc_id", key), key, "left_semi"
    ).withColumn("_part", F.lit("all"))
    manifest = pack_manifest(
        train_docs,
        args.shard_tokens,
        partition_col="_part",
        key_col=key,
        text_col=text,
    ).drop("_part")
    manifest.write.mode("overwrite").parquet(f"{out}/manifest")

    # 5. epoch-shuffle manifests for the train split
    epochs = epoch_shuffle(
        train_docs, n_epochs=args.epochs, key_col=key
    )
    epochs.write.mode("overwrite").parquet(f"{out}/epochs")

    summary = {
        "merges": len(merges),
        "docs": spark.read.parquet(f"{out}/encoded").count(),
        "train_docs": train_ids.count(),
        "shards": spark.read.parquet(f"{out}/manifest")
        .agg(F.countDistinct("shard"))
        .first()[0],
        "epochs": args.epochs,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
