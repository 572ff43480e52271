"""Benchmark harness — prints ONE JSON line.

Times the flagship extraction pipeline (docs/sec, the BASELINE.json
primary metric) over a deterministic synthetic corpus, plus a set of
headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), on local[$SPARK_GRAFT_CPUS].

Environment knobs:
  SPARK_GRAFT_SF_DIR      testdata dir          (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] cores        (default all)
  SPARK_GRAFT_BENCH_DOCS  extraction corpus size (default 12000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "12000"))

HEADLINE_QUERIES = [
    "extract_html_roundtrip",
    "extract_pdf_roundtrip",
    "assembly",
    "broadcast_join",
    "sliding_rate",
    "group_concat",
    "embedding_topk",
    "dedup_exact",
    "quality_score",
    "latest_per_key",
]


def _bench_corpus_path() -> str:
    """Deterministic synthetic full-shape corpus, cached across runs."""
    from ocr_spark.corpus import write_corpus

    cache_dir = "/tmp/ocr_spark_bench"
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"documents_{N_BENCH_DOCS}.parquet")
    if not os.path.exists(path):
        write_corpus(path, N_BENCH_DOCS, seed=42)
    return path


def main() -> None:
    from ocr_spark.session import get_spark
    from ocr_spark.operators import extract_documents

    import __spark_entry__ as entry_mod

    corpus_path = _bench_corpus_path()

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cores = int(cpus_env) if cpus_env else (os.cpu_count() or 4)
    spark = get_spark(app_name="ocr_spark-bench", cores=cores)

    timings: dict[str, float] = {}

    # --- flagship: extraction throughput -----------------------------------
    docs = spark.read.parquet(corpus_path)
    # warm-up: JVM + python workers + parquet footer caches
    extract_documents(docs.limit(256), n_partitions=cores).count()

    t0 = time.monotonic()
    n_extracted = extract_documents(docs, n_partitions=2 * cores).count()
    extract_sec = time.monotonic() - t0
    timings["extract_corpus"] = round(extract_sec, 3)
    docs_per_sec = n_extracted / extract_sec if extract_sec else 0.0

    # --- headline operator queries at SF_DIR -------------------------------
    registry = entry_mod.queries()
    for name in HEADLINE_QUERIES:
        fn = registry[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        # count() forces full evaluation without driver-side data pull
        df.count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extraction": {
            "docs": n_extracted,
            "docs_per_sec": round(docs_per_sec, 1),
            "cores": cores,
            "corpus_docs": N_BENCH_DOCS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
