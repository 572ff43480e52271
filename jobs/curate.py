#!/usr/bin/env python3
"""Corpus-curation job — `spark-submit` entrypoint chaining the
post-extraction cleaning stack over an extracted-documents table:

    [mojibake repair] → [line rules] → [URL admission] →
    blocklist filter → Gopher quality rules → repetition rules →
    chunk-level global dedup → [naive-Bayes quality floor] →
    [exact-gram + fuzzy eval decontamination] → stratified sampling →
    shard packing

Bracketed stages are opt-in: ``--fix-mojibake`` repairs encoding
damage before anything hashes the text (T87), ``--line-rules`` runs
C4's local line filters (T86), ``--url-filter`` applies the URL
admission rules (T83), ``--min-logodds`` turns on the trained
classifier floor (T79), ``--decontaminate`` turns on the benchmark
screens (T45 exact-gram + T80 MinHash-fuzzy, both against the
``--eval-mod`` slice). ``--rewrite-chunks`` swaps the chunk-dedup
stage's whole-doc filter for the C4-authentic rewrite (T82): each doc
keeps only its corpus-wide-first chunks.

Usage (cluster):

    zip -r ocr_spark.zip ocr_spark
    spark-submit --py-files ocr_spark.zip jobs/curate.py \
        --input  s3://bucket/crawl/extracted/ \
        --output s3://bucket/crawl/curated/ \
        --report s3://bucket/crawl/curation-report/ \
        --shard-tokens 2000000

Usage (sandbox smoke):

    python3 jobs/curate.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated --report /tmp/curation-report

Each stage is a row-level predicate or a 16-byte-per-unit shuffle
(see ocr_spark/operators/curation.py scale notes); the only wide
operations are the chunk-dedup winner agg and the per-stratum shard
windows, both keyed to spread. The job writes:

  <output>/           curated docs + per-doc curation columns + shard
  <report>/           one row per stage with in/out counts (audit)
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

    from ocr_spark.operators.corpus_ops import (
        langid_script,
        quality_features,
        quality_keep,
    )
    from ocr_spark.operators.curation import (
        MAX_DUP_3GRAM_FRAC,
        MAX_TOP_2GRAM_FRAC,
        blocklist_filter,
        chunk_dedup_stats,
        repetition_stats,
    )
    from ocr_spark.operators.corpus_ops import pack_shards, sample_stratified
    from ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--max-chunk-dup-frac", type=float, default=0.5)
    ap.add_argument("--shard-tokens", type=int, default=50_000)
    ap.add_argument(
        "--sample-rates",
        default='{"en": 1.0, "zh": 1.0, "other": 0.5}',
        help="JSON lang→keep-rate for the mixing stage",
    )
    ap.add_argument(
        "--min-logodds",
        type=float,
        default=None,
        help="naive-Bayes quality floor (T79): drop docs whose "
        "reference-class log-odds falls below this (off by default; "
        "needs a lang column for the training labels)",
    )
    ap.add_argument(
        "--rewrite-chunks",
        action="store_true",
        help="C4-authentic chunk stage (T82): rewrite each doc to only "
        "its corpus-wide-first chunks instead of dropping mostly-dup "
        "docs (whole-doc filter is the default)",
    )
    ap.add_argument(
        "--decontaminate",
        action="store_true",
        help="benchmark screens (T45 exact 8-gram + T80 MinHash "
        "fuzzy): drop corpus docs overlapping the eval slice",
    )
    ap.add_argument(
        "--eval-mod",
        type=int,
        default=101,
        help="doc_id %% this == 0 marks the eval slice for "
        "--decontaminate",
    )
    ap.add_argument(
        "--fix-mojibake",
        action="store_true",
        help="repair UTF-8-as-cp1252 mojibake (T140 full repertoire, "
        "two passes so double-mangled text heals) before any "
        "text-keyed stage — pure chained replaces, costs a scan",
    )
    ap.add_argument(
        "--line-rules",
        action="store_true",
        help="C4 local line filters (T86): drop short/policy/markup "
        "lines per doc before the corpus-wide stages",
    )
    ap.add_argument(
        "--url-filter",
        action="store_true",
        help="URL admission rules (T83): drop docs whose planted URL "
        "fails the extension/depth/params/host screens (needs a "
        "source column)",
    )
    ap.add_argument(
        "--resume",
        action="store_true",
        help="if the hygiene staging dir (<output>.stage0) exists and "
        "is complete (_SUCCESS), skip recomputing the 0-block and "
        "resume the corpus-wide stages from the staged copy — the "
        "same partition-granular recovery contract as plans.lineage "
        "(trusts the staging dir to match the current hygiene flags)",
    )
    ap.add_argument(
        "--audit",
        action="store_true",
        help="count survivors after every stage (recomputes the chain "
        "per stage — fine at sandbox scale, use Spark task metrics or "
        "accumulators on a real run)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ocr_spark-curate")
    # spread a narrow scan before the tokenize-heavy stages
    # (ocr_spark/plans/width.py) — integer/hash math only here,
    # so the round-robin exchange is partition-order safe
    from ocr_spark.plans import spread_cpu

    docs = spread_cpu(spark.read.parquet(args.input))
    key, text = args.key_col, args.text_col

    stages = []

    def audit(name, df):
        if args.audit or name in ("input", "output"):
            stages.append((name, df.count()))

    audit("input", docs)

    # 0a-0c are deliberately JOIN-FREE (withColumn/filter on column
    # expressions): rewriting a stage as a self-join back onto its own
    # source doubles the plan subtree, and a chain of such self-joins
    # ahead of the corpus-wide stages grows the lineage exponentially.
    #
    # The 0-block's result is staged to parquet and re-read before the
    # corpus-wide stages.  The downstream chain contains several
    # self-joins (repetition, chunk-dedup, nb floor, decontamination),
    # each of which duplicates its source subtree on both sides; with
    # the 0-block's large rewrite/regex expressions inlined into every
    # copy, analysis + codegen time grows multiplicatively (observed:
    # 87 s -> 9+ min at sf0.01).  One write/read of the corpus is the
    # standard materialization point a production pipeline puts after
    # a whole-text rewrite/admission phase; it also makes the 0-block
    # resumable on its own: --resume picks up from a complete staging
    # dir after a mid-run kill (the job-level form of the
    # plans.lineage partition-granular recovery contract).
    # The staging path is a SIBLING of the output dir, never inside it:
    # the final write's overwrite mode deletes the whole output path
    # before its job runs, and a staging dir underneath it would be
    # deleted out from under the plan that still reads it.
    hygiene = args.fix_mojibake or args.line_rules or args.url_filter
    stage0 = args.output.rstrip("/") + ".stage0" if hygiene else None
    resumed0 = (
        args.resume
        and stage0 is not None
        and os.path.exists(os.path.join(stage0, "_SUCCESS"))
    )
    if resumed0:
        docs = spread_cpu(spark.read.parquet(stage0))
        audit("stage0_resumed", docs)
    else:
        # 0a. encoding repair (opt-in): fix text BEFORE any stage that
        # hashes or tokenizes it, so a mojibake variant can't evade
        # dedup
        if args.fix_mojibake:
            from ocr_spark.operators.curation import repair_encoding_col

            docs = docs.withColumn(
                text, repair_encoding_col(repair_encoding_col(F.col(text)))
            )
            audit("fix_mojibake", docs)

        # 0b. local line rules (opt-in): the cheapest text scrub —
        # purely in-row, so it runs before everything corpus-wide
        if args.line_rules:
            from ocr_spark.operators.curation import clean_lines_col

            docs = docs.withColumn(
                text, clean_lines_col(F.col(text))
            ).filter(F.length(F.col(text)) > 0)
            audit("line_rules", docs)

        # 0c. URL admission (opt-in): reject on the URL alone
        if args.url_filter and "source" in docs.columns:
            from ocr_spark.operators.webcorpus import url_filter_cols

            docs = docs.filter(
                url_filter_cols(F.col(key), F.col("source"))["admitted"]
            )
            audit("url_filter", docs)

        if stage0 is not None:
            docs.write.mode("overwrite").parquet(stage0)
            docs = spread_cpu(spark.read.parquet(stage0))

    # test seam for the kill-during-curate recovery pytest: die at the
    # barrier between hygiene staging and the corpus-wide stages, the
    # exact point --resume recovers from
    if os.environ.get("OCR_SPARK_CURATE_KILL_AFTER") == "stage0":
        print(json.dumps({"killed_after": "stage0"}))
        raise SystemExit(17)

    # 1. blocklist (broadcast anti)
    if "source" in docs.columns:
        docs = blocklist_filter(spark, docs)
        audit("blocklist", docs)

    # 2. Gopher quality rules (row-level)
    feats = quality_features(F.col(text))
    docs = docs.withColumn("_keep_q", quality_keep(feats)).filter(
        F.col("_keep_q")
    ).drop("_keep_q")
    audit("quality", docs)

    # 3. repetition rules (linear explode→count, join back on key)
    rep = repetition_stats(docs, key_col=key, text_col=text).filter(
        (F.col("top_2gram_frac") <= MAX_TOP_2GRAM_FRAC)
        & (F.col("dup_3gram_frac") <= MAX_DUP_3GRAM_FRAC)
    ).select(F.col("doc_id").alias(key))
    docs = docs.join(rep, key, "left_semi")
    audit("repetition", docs)

    # 4. chunk-level global dedup. Default: drop docs that are mostly
    # dupes (stats + threshold). --rewrite-chunks instead runs the C4
    # rewrite — every doc keeps only its corpus-wide-first chunks and
    # all-dup docs vanish (keep-set decoded from packed winner keys;
    # text shuffles once, in the rewrite join).
    if args.rewrite_chunks:
        from ocr_spark.operators.curation import chunk_dedup_rewrite

        rw = chunk_dedup_rewrite(docs, key_col=key, text_col=text).select(
            F.col("doc_id").alias(key), F.col("clean_text")
        )
        docs = (
            docs.drop(text)
            .join(rw, key)
            .withColumnRenamed("clean_text", text)
        )
        audit("chunk_dedup", docs)
    else:
        cd = chunk_dedup_stats(docs, key_col=key, text_col=text).filter(
            F.col("dup_frac") <= args.max_chunk_dup_frac
        ).select(F.col("doc_id").alias(key))
        docs = docs.join(cd, key, "left_semi")
        audit("chunk_dedup", docs)

    # 5. trained quality floor (T79, opt-in): broadcast-model scoring,
    # shuffles only the per-doc agg
    if args.min_logodds is not None and "lang" in docs.columns:
        from ocr_spark.operators.webcorpus import nb_quality

        scored = nb_quality(docs, key_col=key, text_col=text)
        # Degenerate training (one-class slice) yields NULL logodds for
        # EVERY doc; the >= filter would then silently empty the corpus.
        # Fail fast instead — this is a labeling bug, not a quality floor.
        if scored.filter(F.col("logodds").isNull()).limit(1).count() > 0:
            raise SystemExit(
                "nb_quality: NULL logodds — the training slice contains a "
                "single class (check the lang labels / train_mod); refusing "
                "to apply --min-logodds, which would drop every document"
            )
        nb = scored.filter(
            F.col("logodds") >= args.min_logodds
        ).select(F.col("doc_id").alias(key))
        docs = docs.join(nb, key, "left_semi")
        audit("nb_quality", docs)

    # 6. benchmark decontamination (opt-in): exact 8-gram hits plus
    # the MinHash fuzzy screen; both treat doc_id % eval_mod == 0 as
    # the eval slice and drop flagged corpus docs (eval docs pass —
    # they are not training rows downstream of the split stage)
    if args.decontaminate:
        from ocr_spark.operators.webcorpus import (
            contamination,
            fuzzy_contamination,
        )

        exact_bad = contamination(
            docs, eval_mod=args.eval_mod, key_col=key, text_col=text
        ).filter(F.col("contaminated") & ~F.col("in_eval")).select(
            F.col("doc_id").alias(key)
        )
        fuzzy_bad = fuzzy_contamination(
            docs, eval_mod=args.eval_mod, key_col=key, text_col=text
        ).filter(F.col("contaminated")).select(F.col("doc_id").alias(key))
        docs = docs.join(
            exact_bad.unionByName(fuzzy_bad).distinct(), key, "left_anti"
        )
        audit("decontaminate", docs)

    # 7. language id + stratified mixing rates
    docs = docs.withColumn("lang_guess", langid_script(F.col(text)))
    rates = json.loads(args.sample_rates)
    docs = sample_stratified(
        docs, rates, strata_col="lang_guess", key_col=key
    )
    audit("sampling", docs)

    # 8. shard packing
    shards = pack_shards(
        docs,
        args.shard_tokens,
        partition_col="lang_guess",
        key_col=key,
        text_col=text,
    ).select(F.col(key), "n_tokens", "shard")
    out = docs.join(shards, key)
    out.write.mode("overwrite").parquet(args.output)
    audit("output", spark.read.parquet(args.output))

    report = spark.createDataFrame(
        [(i, name, n) for i, (name, n) in enumerate(stages)],
        "stage_idx int, stage string, n_docs long",
    )
    report.write.mode("overwrite").parquet(args.report)
    if stage0 is not None:
        # the output is durable now; the hygiene staging copy is scratch
        import shutil

        shutil.rmtree(stage0, ignore_errors=True)
    print(json.dumps({name: n for name, n in stages}))


if __name__ == "__main__":
    main()
