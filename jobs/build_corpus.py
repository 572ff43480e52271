#!/usr/bin/env python3
"""One-command corpus build: raw crawl pages → packed training corpus.

Chains the stage entrypoints in order, each as its own application run
(= its own `spark-submit` on a cluster — per-stage sessions, per-stage
resource sizing, and a failure boundary between stages):

    extract   jobs/extract.py            pages → extracted (+lineage,
                                         +per-host yield report T179)
    prepare   jobs/prepare_documents.py  extracted → documents table
    curate    jobs/curate.py             hygiene/quality/chunk-dedup/
                                         sampling/shard funnel
    dedup     jobs/dedup.py              MinHash-LSH near-dup clusters,
                                         canonical docs only
    tokenize  jobs/tokenize_corpus.py    BPE train/encode + splits +
                                         packed shards + epoch manifests
    report    jobs/corpus_report.py      release governance tables

The build is resumable at STAGE granularity on top of each stage's own
finer-grained recovery (extract resumes per url-hash bucket via its
lineage table; curate resumes its hygiene staging dir): a manifest row
is written after every stage completes, and ``--resume`` skips stages
whose manifest row is ``done`` and whose outputs still exist.  This is
the job-level form of the reference's restore-on-boot contract
(recovery_manager.py:460-573) — rerunning the whole build after a kill
re-executes only the stages that had not finished.

The orchestrator itself never opens a Spark session: stages run as
subprocesses, so a stage crash (OOM, executor loss) cannot take the
build driver down with it, and the manifest stays truthful.

Usage (sandbox smoke):

    python3 jobs/build_corpus.py --input /tmp/pages.parquet \
        --workdir /tmp/build

Usage (cluster): swap PYTHON for spark-submit via --launcher, e.g.
    --launcher "spark-submit --py-files ocr_spark.zip"
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

STAGE_ORDER = ["extract", "prepare", "curate", "dedup", "tokenize", "report"]


def _stage_plan(args) -> dict[str, dict]:
    w = args.workdir.rstrip("/")
    p = {
        "extract": {
            "script": "extract.py",
            "argv": [
                "--input", args.input,
                "--output", f"{w}/extracted",
                "--lineage", f"{w}/lineage",
                "--buckets", str(args.buckets),
                "--yield-report", f"{w}/yield_report",
            ],
            "outputs": [f"{w}/extracted", f"{w}/yield_report"],
        },
        "prepare": {
            "script": "prepare_documents.py",
            "argv": [
                "--input", f"{w}/extracted",
                "--output", f"{w}/documents",
            ],
            "outputs": [f"{w}/documents"],
        },
        "curate": {
            "script": "curate.py",
            "argv": [
                "--input", f"{w}/documents",
                "--output", f"{w}/curated",
                "--report", f"{w}/curation_report",
                "--shard-tokens", str(args.shard_tokens),
                # hygiene stages that act on REAL text; --url-filter is
                # deliberately absent: it demos the admission rules over
                # a planted URL shape (url_filter_cols), which would
                # judge real docs by a synthetic url
                "--fix-mojibake", "--line-rules",
            ],
            "outputs": [f"{w}/curated", f"{w}/curation_report"],
        },
        "dedup": {
            "script": "dedup.py",
            "argv": [
                "--input", f"{w}/curated",
                "--output", f"{w}/deduped",
                "--report", f"{w}/dedup_report",
                "--drop-duplicates",
            ],
            "outputs": [f"{w}/deduped", f"{w}/dedup_report"],
        },
        "tokenize": {
            "script": "tokenize_corpus.py",
            "argv": [
                "--input", f"{w}/deduped",
                "--output", f"{w}/tokenized",
                "--shard-tokens", str(args.shard_tokens),
            ],
            "outputs": [f"{w}/tokenized"],
        },
        "report": {
            "script": "corpus_report.py",
            "argv": [
                "--input", f"{w}/deduped",
                "--report", f"{w}/report",
                "--shard-tokens", str(args.shard_tokens),
            ],
            "outputs": [f"{w}/report"],
        },
    }
    return p


def _load_manifest(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"stages": {}}


def _save_manifest(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="raw pages table (url, html)")
    ap.add_argument("--workdir", required=True, help="root for stage outputs")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--shard-tokens", type=int, default=50_000)
    ap.add_argument(
        "--resume",
        action="store_true",
        help="skip stages whose manifest row is done and whose outputs exist",
    )
    ap.add_argument(
        "--stop-after",
        choices=STAGE_ORDER,
        default=None,
        help="run the chain only through this stage",
    )
    ap.add_argument(
        "--launcher",
        default=None,
        help="command prefix launching each stage script (default: this "
        "python; on a cluster pass e.g. 'spark-submit --py-files ocr_spark.zip')",
    )
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    manifest_path = os.path.join(args.workdir, "manifest.json")
    manifest = _load_manifest(manifest_path)
    plan = _stage_plan(args)
    launcher = (
        shlex.split(args.launcher) if args.launcher else [sys.executable]
    )

    for name in STAGE_ORDER:
        spec = plan[name]
        row = manifest["stages"].get(name, {})
        if (
            args.resume
            and row.get("status") == "done"
            and all(os.path.exists(p) for p in spec["outputs"])
        ):
            print(f"[build] {name}: resume — already done, skipping")
            if name == args.stop_after:
                break
            continue
        cmd = launcher + [os.path.join(HERE, spec["script"])] + spec["argv"]
        print(f"[build] {name}: {' '.join(cmd)}", flush=True)
        t0 = time.monotonic()
        r = subprocess.run(cmd, capture_output=True, text=True)
        elapsed = round(time.monotonic() - t0, 1)
        summary = None
        for line in reversed(r.stdout.strip().splitlines() or [""]):
            try:
                summary = json.loads(line)
                break
            except ValueError:
                continue
        manifest["stages"][name] = {
            "status": "done" if r.returncode == 0 else "failed",
            "returncode": r.returncode,
            "elapsed_s": elapsed,
            "argv": spec["argv"],
            "outputs": spec["outputs"],
            "summary": summary,
        }
        _save_manifest(manifest_path, manifest)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            print(
                json.dumps({"build": "failed", "stage": name, "manifest": manifest_path})
            )
            sys.exit(1)
        if name == args.stop_after:
            break

    print(json.dumps({"build": "ok", "manifest": manifest_path}))


if __name__ == "__main__":
    main()
