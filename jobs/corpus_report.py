#!/usr/bin/env python3
"""Corpus governance report — `spark-submit` entrypoint that publishes
the release-review tables for a (curated) documents table in one pass:

  <report>/card/           per-language datasheet (T103 dataset_card)
  <report>/survivorship/   input -> exact -> near-dup funnel (T98)
  <report>/cluster_sizes/  near-dup cluster size histogram (T107)
  <report>/balance/        shard token-skew audit (T95)
  <report>/quality/        quality-ensemble vote rollup (T97)
  <report>/vocab/          per-language HLL distinct-shingle estimate (T117)
  <report>/length/         doc-length quantile sketch p50/p75/p90/p99 (T118)
  <report>/drift/          per-language share drift vs --old-input (T111)
  <report>/concentration/  host token Gini + diversity row (T162/T143)
  <report>/host_langs/     per-host language entropy, mixed flag (T158)
  <report>/residue/        per-host extraction-residue rates (T166)
  <report>/context_fit/    context-window fit + truncation loss (T167)
  <report>/mirrors/        cross-host mirror candidates (T169)
  <report>/pii/            per-host PII prevalence (T185)
  <report>/growth/         Heaps'-law vocabulary growth curve (T161)
  <report>/quality_deciles/ per-language quality decile bands (T177)
  <report>/affinity/       source x language PMI lift cells (T178)

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/corpus_report.py \
        --input  s3://bucket/crawl/curated/ \
        --report s3://bucket/crawl/release-report/ \
        --old-input s3://bucket/crawl/curated-prev/

Usage (sandbox smoke):

    python3 jobs/corpus_report.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --report /tmp/corpus-report

Every table is a bounded aggregation (per-language, per-cluster-size,
per-vote rows); the only corpus-heavy stage is the near-dup CC pass,
which runs once and feeds both the funnel and the histogram.
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

    from ocr_spark.operators.cluster import (
        cluster_size_histogram,
        dedup_survivorship,
        neardup_clusters,
    )
    from ocr_spark.operators.corpus_ops import dataset_card, shard_balance
    from ocr_spark.operators.sketches import hll_distinct, quantile_sketch
    from ocr_spark.operators.webcorpus import lang_drift, quality_ensemble
    from ocr_spark.plans import spread_cpu
    from ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shard-tokens", type=int, default=50_000)
    ap.add_argument(
        "--old-input",
        default=None,
        help="previous snapshot for the language-drift table (T111)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ocr_spark-corpus-report")
    docs = spread_cpu(spark.read.parquet(args.input))
    key, text = args.key_col, args.text_col
    written = {}

    def emit(name, df):
        path = os.path.join(args.report, name)
        df.write.mode("overwrite").parquet(path)
        written[name] = spark.read.parquet(path).count()

    if "lang" in docs.columns:
        emit("card", dataset_card(docs, text_col=text))
        emit(
            "balance",
            shard_balance(
                docs, args.shard_tokens, key_col=key, text_col=text
            ),
        )
        # vote rollup: (votes, n_docs, n_kept) — the ensemble's
        # decision distribution, not half a million per-doc rows
        ens = quality_ensemble(docs, key_col=key, text_col=text)
        emit(
            "quality",
            ens.groupBy("votes").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.col("keep").cast("bigint"))
                .cast("bigint")
                .alias("n_kept"),
            ),
        )

    if "lang" in docs.columns:
        emit("vocab", hll_distinct(docs, text_col=text))
        from ocr_spark.operators.corpus_ops import lang_quality_deciles

        emit(
            "quality_deciles",
            lang_quality_deciles(docs, lang_col="lang", text_col=text),
        )
    if "n_chars" in docs.columns:
        emit("length", quantile_sketch(docs))

    from ocr_spark.operators.corpus_ops import vocab_growth

    if "source" in docs.columns:
        from ocr_spark.operators.corpus_ops import context_fit
        from ocr_spark.operators.curation import residue_audit
        from ocr_spark.operators.webcorpus import (
            host_diversity,
            host_lang_entropy,
            mirror_detect,
            source_gini,
        )

        emit(
            "concentration",
            source_gini(docs, text_col=text).crossJoin(
                F.broadcast(host_diversity(docs).drop("n_hosts"))
            ),
        )
        if "lang" in docs.columns:
            emit("host_langs", host_lang_entropy(docs))
            from ocr_spark.operators.corpus_ops import src_lang_affinity

            emit("affinity", src_lang_affinity(docs))
        emit("residue", residue_audit(docs, text_col=text))
        emit("context_fit", context_fit(docs, text_col=text))
        emit("mirrors", mirror_detect(docs, text_col=text))
        from ocr_spark.operators.curation import pii_prevalence

        emit(
            "pii",
            pii_prevalence(docs, key_col=key, text_col=text),
        )
    emit("growth", vocab_growth(docs, key_col=key, text_col=text))

    corpus = docs.select(
        F.col(key).alias("doc_id"), F.col(text).alias("text")
    )
    cc = neardup_clusters(corpus)
    emit("survivorship", dedup_survivorship(corpus, cc))
    emit("cluster_sizes", cluster_size_histogram(cc))

    if args.old_input and "lang" in docs.columns:
        old = spark.read.parquet(args.old_input)
        emit(
            "drift",
            lang_drift(
                old.select(key, "lang"), docs.select(key, "lang")
            ),
        )

    print(json.dumps(written))


if __name__ == "__main__":
    main()
