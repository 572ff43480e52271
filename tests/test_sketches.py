"""Behavioral and plan tests for the round-4 sketch/graph/frontier
operators (T117-T133): HLL accuracy + streaming bit-identity,
quantile-sketch bounds, JL distance preservation, triangle and
graph-health closed forms, chunk coverage, planted bursts, politeness
invariants, PCA numpy parity, containment asymmetry, line-dedup exact
recovery, the frontier job end-to-end — plus the shuffle-shape plan
guarantees each op claims."""

import datetime

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_hll_within_five_pct_of_exact(spark):
    from ocr_spark.operators.dedup import shingles_col
    from ocr_spark.operators.sketches import hll_distinct

    docs = _docs(spark)
    exact = {
        r["lang"]: r["n"]
        for r in docs.select(
            "lang", F.explode(F.array_distinct(shingles_col(F.col("text")))).alias("sh")
        )
        .groupBy("lang")
        .agg(F.countDistinct("sh").alias("n"))
        .collect()
    }
    est = {r["lang"]: r["est"] for r in hll_distinct(docs).collect()}
    assert set(est) == set(exact)
    for lang, n in exact.items():
        # 1024 registers -> ~3.25% relative standard error
        assert abs(est[lang] - n) / n < 0.05, (lang, est[lang], n)


def test_quantile_sketch_bounds_contain_exact(spark):
    from ocr_spark.operators.sketches import quantile_sketch

    docs = _docs(spark)
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    rows = quantile_sketch(docs).collect()
    assert len(rows) == 4
    for r in rows:
        exact = vals[int(r["rank"]) - 1]  # rank = ceil(q*n), 1-based
        assert r["est_lo"] <= exact <= r["est_hi"], (r, exact)
        # bounded relative error: one sub-bucket of the octave
        assert r["est_hi"] <= r["est_lo"] * (1 + 1 / 8), r


def test_random_projection_is_narrow_and_preserves_distance(spark):
    from ocr_spark.operators.sketches import RP_DIM, random_projection

    proj = random_projection(_emb(spark))
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = proj.limit(40).collect()
    assert len(rows[0]) == RP_DIM + 1
    # JL with +-1 signs preserves E[||x||^2]; check the projected
    # norms are within a loose factor of each other's spread, i.e.
    # the projection did not collapse (all-zero) or blow up
    norms = [sum(r[f"p{j}"] ** 2 for j in range(RP_DIM)) for r in rows]
    assert min(norms) > 0
    assert max(norms) / min(norms) < 100


def test_chunk_windows_cover_text_without_gaps(spark):
    from ocr_spark.operators.curation import CHUNK_S, CHUNK_W, chunk_windows

    full = _docs(spark)
    plan = chunk_windows(full)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    docs = full.limit(50)
    lens = {r["doc_id"]: len(r["text"]) for r in docs.collect()}
    rows = chunk_windows(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = lens[doc_id]
        # consecutive starts differ by the stride; last chunk reaches EOF
        for i, c in enumerate(chunks):
            assert c["start"] == i * CHUNK_S
            assert c["chunk_len"] == min(CHUNK_W, n - c["start"])
        last = chunks[-1]
        assert last["start"] + last["chunk_len"] == n
        # one chunk for short docs, overlap otherwise
        if n <= CHUNK_W:
            assert len(chunks) == 1


def test_burst_detection_flags_planted_burst(spark):
    from ocr_spark.operators.events import burst_detection

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 10 quiet hours of 2 events, one hour with 30 -> burst
    for h in range(10):
        for i in range(30 if h == 7 else 2):
            rows.append((1, base + datetime.timedelta(hours=h, minutes=i)))
    # user 2: perfectly flat -> variance 0, never flagged
    for h in range(5):
        rows.append((2, base + datetime.timedelta(hours=h)))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = burst_detection(df).collect()
    assert [(r["user_id"], r["hour_s"]) for r in out] == [
        (1, "2024-01-01 07:00:00")
    ]
    assert out[0]["n_events"] == 30
    assert out[0]["z"] > 2


def test_triangle_stats_closed_form(spark):
    from ocr_spark.operators.graph import triangle_stats

    # K3 triangle (1,2,3) + pendant (3,4); duplicate + reversed +
    # self-loop edges must be ignored
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 3), (3, 4), (4, 3)],
        ["src", "dst"],
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    # degrees: 1:2, 2:2, 3:3, 4:1 -> wedges = 1+1+3+0 = 5
    assert row["n_wedges"] == 5
    assert row["n_triangles"] == 1
    assert row["clustering"] == pytest.approx(3.0 / 5.0)


def test_politeness_schedule_invariants(spark):
    from ocr_spark.operators.webcorpus import (
        CRAWL_DELAY_MS,
        N_CRAWL_WORKERS,
        politeness_schedule,
    )

    rows = politeness_schedule(_docs(spark)).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        # one worker per host; dense slots 0..n-1; delay honored
        assert len({r["worker"] for r in hr}) == 1, host
        slots = sorted(r["slot"] for r in hr)
        assert slots == list(range(len(hr))), host
        for r in hr:
            assert r["fetch_ms"] == r["slot"] * CRAWL_DELAY_MS
            assert 0 <= r["worker"] < N_CRAWL_WORKERS


def test_transition_matrix_row_stochastic(spark):
    from ocr_spark.operators.events import transition_matrix

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = transition_matrix(ev).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["from_type"], []).append(r)
    for src, rs in by_src.items():
        assert sum(r["p"] for r in rs) == pytest.approx(1.0, abs=1e-4), src
        assert all(r["n"] > 0 for r in rs)


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from ocr_spark.operators.sketches import GRAM_SCALE, gram_matrix

    emb = _emb(spark)
    mat = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    q = np.rint(mat * GRAM_SCALE)
    expected = q.T @ q
    for r in gram_matrix(emb).collect():
        assert r["s_scaled"] == int(expected[r["i"], r["j"]]), (r["i"], r["j"])


def test_hits_star_graph_closed_form(spark):
    from ocr_spark.operators.graph import hits_scores

    # star: 1,2,3 all point at 0 -> node 0 is the sole authority,
    # nodes 1-3 are the (equal) hubs, node 0 has hub 0
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], ["src", "dst"]
    )
    got = {r["node"]: r for r in hits_scores(edges, 4).collect()}
    assert got[0]["authority"] == pytest.approx(1.0)
    assert got[0]["hub"] == 0.0
    for n in (1, 2, 3):
        assert got[n]["hub"] == pytest.approx(1.0)
        assert got[n]["authority"] == 0.0


def test_url_templates_collapse(spark):
    from ocr_spark.operators.webcorpus import url_templates

    rows = url_templates(_docs(spark)).collect()
    assert sum(r["n_urls"] for r in rows) == _docs(spark).count()
    templates = {r["template"] for r in rows}
    # numeric article ids all collapse to one template; roots stay
    assert "/Articles/{n}" in templates
    assert "/" in templates
    assert not any(
        any(c.isdigit() for c in t.replace("{n}", "")) for t in templates
    )


def test_frontier_job_end_to_end(spark, tmp_path):
    """The frontier job chains admission -> robots -> host cap ->
    politeness into a worker-partitioned fetch plan whose per-host
    invariants hold (one worker per host, dense slots, monotone
    funnel)."""
    import subprocess
    import sys

    out = str(tmp_path / "plan")
    rep = str(tmp_path / "report")
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/jobs/frontier.py",
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--report", rep,
            "--host-cap", "40",
            "--workers", "4",
            "--cores", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    plan = spark.read.parquet(out)
    rows = plan.collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        assert len({r["worker"] for r in hr}) == 1, host
        assert sorted(r["slot"] for r in hr) == list(range(len(hr))), host
        assert len(hr) <= 40, host
    report = {
        r["stage"]: r["rows"] for r in spark.read.parquet(rep).collect()
    }
    assert report["input"] >= report["url_admission"] >= report["robots"]
    assert report["robots"] >= report["host_cap_40"] == report["fetch_plan"]
    # worker partitioning on disk: each worker dir self-contained
    import os as _os

    dirs = [d for d in _os.listdir(out) if d.startswith("worker=")]
    assert 1 <= len(dirs) <= 4

    # --prev-input: tier table must join on the plan's canonical host
    # derivation (round-4 ADVICE: raw `source` never matched, every
    # host silently fell back to 'hot').  prev == exactly the surviving
    # docs, so change_frac is 0 for every host -> all tiers 'cold';
    # any 'hot' row would mean the join missed again.
    prev_path = str(tmp_path / "prev")
    survivors = plan.select("doc_id")
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .join(survivors, "doc_id", "left_semi")
        .write.mode("overwrite")
        .parquet(prev_path)
    )
    out2 = str(tmp_path / "plan2")
    rep2 = str(tmp_path / "report2")
    proc2 = subprocess.run(
        [
            sys.executable,
            "/root/repo/jobs/frontier.py",
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out2,
            "--report", rep2,
            "--host-cap", "40",
            "--workers", "4",
            "--cores", "4",
            "--prev-input", prev_path,
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    plan2 = spark.read.parquet(out2)
    assert "tier" in plan2.columns
    tiers_seen = {r["tier"] for r in plan2.select("tier").distinct().collect()}
    assert tiers_seen == {"cold"}, tiers_seen


def test_pca_project_matches_numpy_reference(spark):
    """The Spark projection must equal the numpy replication of the
    SAME quantized pipeline: integer-milli covariance -> eigh ->
    fixed-sign components -> raw-float projection minus the quantized
    mean."""
    import numpy as np

    from ocr_spark.operators.sketches import (
        GRAM_SCALE,
        PCA_K,
        pca_project,
        pca_variance,
    )

    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    # same HALF_UP quantization as the kernel (matches F.round/DuckDB)
    _s = mat * GRAM_SCALE
    q = np.where(_s >= 0, np.floor(_s + 0.5), np.ceil(_s - 0.5))
    n = len(rows)
    s = q.sum(axis=0)
    cov = (q.T @ q) / (n * GRAM_SCALE**2) - np.outer(s, s) / (
        n * n * GRAM_SCALE**2
    )
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:PCA_K]
    comps = vecs[:, order].T
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    mean = s / (n * GRAM_SCALE)
    expected = (mat - mean) @ comps.T
    got = {r["vec_id"]: r for r in pca_project(emb).collect()}
    for idx, vid in enumerate(ids):
        for ki in range(PCA_K):
            assert got[vid][f"pc{ki}"] == pytest.approx(
                expected[idx, ki], abs=2e-6
            ), (vid, ki)
    # variance shares: descending, in (0, 1], nonincreasing
    ratios = [
        r["explained_ratio"]
        for r in sorted(
            pca_variance(emb).collect(), key=lambda r: r["component"]
        )
    ]
    assert all(0 < x <= 1 for x in ratios)
    assert ratios == sorted(ratios, reverse=True)
    # component means are ~0 (centered)
    for ki in range(PCA_K):
        m = sum(got[v][f"pc{ki}"] for v in ids) / n
        assert abs(m) < 1e-3


def test_compression_ratio_separates_templated_from_prose(spark):
    import zlib

    from ocr_spark.operators.curation import (
        COMPRESS_LEVEL,
        compression_ratio,
    )

    spam = "buy now click here " * 200
    # high-entropy stand-in for organic text (hash words): the signal
    # under test is REPETITION, and hashes are maximally unrepetitive
    import hashlib

    prose = " ".join(
        hashlib.md5(f"w{i}".encode()).hexdigest() for i in range(150)
    )
    df = spark.createDataFrame(
        [(1, spam), (2, prose), (3, "")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    # exact agreement with local zlib at the same level
    for doc_id, text in [(1, spam), (2, prose)]:
        expected = len(zlib.compress(text.encode(), COMPRESS_LEVEL))
        assert got[doc_id]["n_compressed"] == expected
    assert got[1]["templated"] and got[1]["ratio"] < 0.1
    assert not got[2]["templated"]
    assert got[3]["ratio"] == 1.0 and got[3]["n_bytes"] == 0
    plan = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_quote_containment_catches_what_jaccard_misses(spark):
    from ocr_spark.operators.dedup import quote_containment

    rows = quote_containment(_docs(spark)).collect()
    assert rows
    n_contain = sum(1 for r in rows if r["containment_flag"])
    n_jaccard = sum(1 for r in rows if r["jaccard_flag"])
    # every planted quote is a true inclusion; containment must catch
    # a large majority while symmetric jaccard (diluted by the host
    # page) catches almost none
    assert n_contain > 0.5 * len(rows)
    assert n_jaccard < 0.05 * len(rows)
    for r in rows:
        assert 0.0 <= r["containment"] <= 1.0
        assert r["jaccard"] <= r["containment"] + 1e-9


def test_line_dedup_scrub_recovers_original_text(spark):
    """The planted nav/footer lines are EXACTLY what the corpus-wide
    rule removes, so each doc's cleaned text must hash back to its
    original (pre-planting) text — and nothing organic is lost."""
    import hashlib

    from ocr_spark.operators.curation import line_dedup_scrub

    docs = _docs(spark)
    orig = {
        r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest()
        for r in docs.collect()
    }
    rows = line_dedup_scrub(docs).collect()
    assert len(rows) == len(orig)
    for r in rows:
        assert r["n_removed"] == 2, r["doc_id"]
        assert r["clean_md5"] == orig[r["doc_id"]], r["doc_id"]


def test_graph_health_closed_form(spark):
    from ocr_spark.operators.graph import graph_health

    # 2-cycle (1<->2) + pendant (2->3): reciprocity 2/3; the
    # undirected path 1-2-3 is perfectly disassortative (r = -1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], ["src", "dst"]
    )
    row = graph_health(edges).collect()[0]
    assert row["n_edges"] == 3
    assert row["n_reciprocal"] == 2
    assert row["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["assortativity"] == pytest.approx(-1.0)
    # uniform-degree graph (a pure cycle): degenerate variance -> NULL
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    row2 = graph_health(cyc).collect()[0]
    assert row2["assortativity"] is None
    assert row2["reciprocity"] == 0.0


def test_stream_hll_merges_across_batches(spark, tmp_path):
    """Split the corpus into 4 parquet files, drain them 1 file per
    micro-batch: the streamed register merge must reproduce the batch
    HLL bit-for-bit (max is associative/commutative/idempotent)."""
    from ocr_spark.operators.sketches import hll_distinct
    from ocr_spark.streaming.metrics import hll_stream_estimate

    docs = _docs(spark)
    stream_dir = str(tmp_path / "stream_docs")
    docs.select("doc_id", "text", "lang").repartition(4).write.parquet(
        stream_dir
    )
    streamed = {
        r["lang"]: tuple(r)
        for r in hll_stream_estimate(
            spark, stream_dir, max_files_per_trigger=1
        ).collect()
    }
    batch = {
        r["lang"]: tuple(r) for r in hll_distinct(docs).collect()
    }
    assert streamed == batch


def test_hll_plan_is_two_hash_exchanges(spark):
    """The mergeable-sketch shape: register max then per-group
    estimator — exactly two hash exchanges, all aggregates
    hash-aggregable (bigint state), never SortAggregate."""
    from ocr_spark.operators.sketches import hll_distinct

    plan = (
        hll_distinct(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "SortAggregate" not in plan, plan


def test_politeness_shuffles_only_narrow_columns(spark):
    """The per-host window is the politeness contract itself; the
    exchange must carry (doc_id, host, ord hash) — never text."""
    from ocr_spark.operators.webcorpus import politeness_schedule

    plan = (
        politeness_schedule(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning(host#") == 1, plan
    assert "text#" not in plan.split("Exchange", 1)[1].split("Scan")[0], plan


def test_transition_matrix_two_exchanges(spark):
    """One user-window pass + one pair-count agg; the per-source
    probability rides the pair table's own window."""
    from ocr_spark.operators.events import transition_matrix

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (
        transition_matrix(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_gram_matrix_arrow_explode_bit_identical(spark):
    """The Arrow matmul path and the pure-column explode path must
    agree EXACTLY (integer partials make summation order irrelevant)
    — and the arrow plan must contain no explode."""
    from ocr_spark.operators.sketches import gram_matrix

    emb = _emb(spark)
    arrow = {
        (r["i"], r["j"]): r["s_scaled"]
        for r in gram_matrix(emb, impl="arrow").collect()
    }
    explode = {
        (r["i"], r["j"]): r["s_scaled"]
        for r in gram_matrix(emb, impl="explode").collect()
    }
    assert arrow == explode
    plan = (
        gram_matrix(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan, plan  # no explode
    assert "MapInPandas" in plan


def test_gram_matrix_half_up_tie_identity(spark):
    """Embedding components whose milli value lands EXACTLY on .5 are
    where np.rint (half-to-even) and F.round/DuckDB (half away from
    zero) diverge — the arrow kernel must round HALF_UP so both impls
    stay bit-identical on ties too (round-4 ADVICE)."""
    from ocr_spark.operators.sketches import gram_matrix

    # 12.5/1000 and -11.5/1000 are exactly representable products:
    # x * 1000 reproduces the .5 tie in float64.
    ties = [12.5 / 1000.0, -11.5 / 1000.0, 0.5 / 1000.0, -0.5 / 1000.0]
    assert all(abs(x * 1000.0 % 1.0) == 0.5 for x in ties)
    vecs = [
        (i, [ties[(i + j) % len(ties)] for j in range(4)])
        for i in range(6)
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    arrow = {
        (r["i"], r["j"]): r["s_scaled"]
        for r in gram_matrix(emb, dim=4, impl="arrow").collect()
    }
    explode = {
        (r["i"], r["j"]): r["s_scaled"]
        for r in gram_matrix(emb, dim=4, impl="explode").collect()
    }
    assert arrow == explode
    # and HALF_UP really fired: 12.5 -> 13 (not 12), -11.5 -> -12
    # per-row term for (0,0) of vec 0: 13*13; sum over the 6 rows is
    # determined by the tie layout, so just pin one value exactly.
    import numpy as np

    qrows = np.array(
        [
            [
                np.floor(x * 1000.0 + 0.5)
                if x >= 0
                else np.ceil(x * 1000.0 - 0.5)
                for x in v
            ]
            for _, v in vecs
        ]
    )
    g = qrows.T @ qrows
    assert arrow[(0, 0)] == int(g[0, 0])
    assert {13.0, -12.0, 1.0, -1.0} == set(np.unique(qrows))


def test_hits_scores_rejects_zero_iterations(spark):
    from ocr_spark.operators.graph import hits_scores, sql_hits_scores

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    with pytest.raises(ValueError, match="n_iter >= 1"):
        hits_scores(edges, n_nodes=2, n_iter=0)
    with pytest.raises(ValueError, match="n_iter >= 1"):
        sql_hits_scores(0)


def test_pca_variance_degenerate_corpus(spark):
    """Constant embeddings -> zero covariance -> all eigenvalues 0:
    ratios must come back 0.0, not ZeroDivisionError; and on the real
    corpus no ratio may exceed 1 even with negative-noise eigenvalues
    in the spectrum (round-4 ADVICE: clamp before summing)."""
    from ocr_spark.operators.sketches import pca_variance

    const = spark.createDataFrame(
        [(i, [0.25] * 8) for i in range(5)], ["vec_id", "embedding"]
    )
    rows = pca_variance(const, k=3, dim=8).collect()
    assert [r["explained_ratio"] for r in rows] == [0.0, 0.0, 0.0]
    real = [
        r["explained_ratio"] for r in pca_variance(_emb(spark)).collect()
    ]
    assert all(0.0 <= x <= 1.0 for x in real)
    assert sum(real) <= 1.0 + 1e-9


def test_kmv_overlap_exact_regime_and_estimate_agreement(spark):
    """T174: with fewer than k distinct shingles per side the sketch
    IS the exact answer — jaccard_kmv must equal jaccard_exact and the
    union estimate must equal the true union size."""
    from ocr_spark.operators.sketches import kmv_overlap

    # even ids = side A, odd = side B; doc 0/1 share text verbatim,
    # others are disjoint
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "red green blue cyan magenta yellow"),
        ],
        "doc_id bigint, text string",
    )
    r = kmv_overlap(docs, k=256).collect()[0]
    assert r.m_union == r.union_kmv  # sub-k regime: estimate == exact
    assert r.jaccard_kmv == r.jaccard_exact
    # shared shingles: docs 0/1 contribute identical 3-shingle sets
    assert 0.0 < r.jaccard_exact < 1.0
    assert r.inter_kmv >= 1


def test_kmv_overlap_estimator_regime_tracks_exact(spark):
    """With >k distinct shingles per side the KMV estimate must land
    within a loose relative band of the exact Jaccard (k=64 -> stderr
    ~1/8; band is 4 sigma)."""
    import random

    from ocr_spark.operators.sketches import kmv_overlap

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(400)]
    rows = []
    for d in range(40):
        # both sides draw from the same vocabulary -> substantial overlap
        words = rng.sample(vocab, 60)
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    r = kmv_overlap(docs, k=64).collect()[0]
    assert r.m_union == 64  # estimator branch exercised
    assert abs(r.jaccard_kmv - r.jaccard_exact) < 0.5
    assert r.union_kmv > 64


def test_minhash_band_stats_census_consistency(spark):
    """T182: per-band bucket census — doc mass conserved per band,
    pair mass matches the brute-force per-bucket formula, identical
    docs collide in every band."""
    from ocr_spark.operators.dedup import (
        MINHASH_BANDS,
        minhash_band_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words in this document here now"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.band: r for r in minhash_band_stats(docs).collect()}
    assert set(got) == set(range(MINHASH_BANDS))
    for r in got.values():
        assert r.n_docs == 3
        # docs 1 and 2 are identical -> they share a bucket in EVERY
        # band, so each band has exactly one pair and <= 2 buckets
        assert r.n_pairs == 1 and r.max_bucket == 2
        assert r.n_buckets == 2 and r.n_singleton == 1
        assert r.n_over_cap == 0
