"""Web-corpus governance ops (operators/webcorpus.py): URL
canonicalization, per-host quotas, contamination screening, unigram-LM
scoring.  Cross-engine value parity is the driver's oracle gate
(test_entry_contract covers the new queries automatically); these tests
pin the operator-level contracts and the scale-shape claims."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import webcorpus as wc


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        if _HAS_TESTDATA
        else None
    )


import os

_HAS_TESTDATA = os.path.exists("/root/testdata/sf0.001/documents.parquet")
pytestmark = pytest.mark.skipif(
    not _HAS_TESTDATA, reason="driver testdata not present"
)


# ---------------------------------------------------------------------------
# T43 url_canon
# ---------------------------------------------------------------------------


def test_url_canon_branch_cases(spark):
    """Every canonicalization rule on handcrafted URLs."""
    rows = [
        # (url, expected canon)
        ("HTTP://WWW.Ex.COM:80/a?utm_source=x&id=2#f", "http://ex.com/a?id=2"),
        ("https://Ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8080", "https://ex.com:8080/"),  # non-default port, empty path
        ("http://www.ex.com/p?fbclid=1&gclid=2&utm_a=3", "http://ex.com/p"),
        ("http://ex.com/p?a=1&b=2", "http://ex.com/p?a=1&b=2"),
        ("HTTPS://ex.com:80/p", "https://ex.com:80/p"),  # 80 not default for https
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    parts = wc.canonicalize_url(F.col("url"))
    got = [
        r.c for r in df.select(parts["canon_url"].alias("c")).collect()
    ]
    assert got == [c for _, c in rows]


def test_url_canon_param_order_preserved(spark):
    df = spark.createDataFrame(
        [("http://e.com/p?z=1&utm_x=0&a=2",)], "url string"
    )
    parts = wc.canonicalize_url(F.col("url"))
    out = df.select(
        parts["canon_url"].alias("c"), parts["n_params_stripped"].alias("n")
    ).collect()[0]
    assert out.c == "http://e.com/p?z=1&a=2"  # relative order kept
    assert out.n == 1


def test_url_canon_no_python_in_plan(spark):
    """Pure column expressions: no Python/Arrow eval nodes."""
    out = wc.url_canon(_docs(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# T44 host_cap
# ---------------------------------------------------------------------------


def test_host_cap_bounds_and_determinism(spark):
    docs = _docs(spark)
    out = wc.host_cap(docs, cap=3)
    per_host = (
        out.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_host and all(r.n <= 3 for r in per_host)
    a = sorted((r.doc_id, r.host, r.rnk) for r in out.collect())
    b = sorted((r.doc_id, r.host, r.rnk) for r in wc.host_cap(docs, cap=3).collect())
    assert a == b


def test_host_cap_two_stage_equals_plain_rank(spark):
    """The salted stage-1 prune is a physical optimization only: the
    result must equal the plain per-host row_number rank."""
    from pyspark.sql import Window

    docs = _docs(spark)
    ordv = F.md5(
        F.concat(F.col("source"), F.lit("#"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(ordv.asc(), F.col("doc_id").asc())
    plain = (
        docs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("source").alias("host"), "rnk")
    )
    got = sorted(map(tuple, wc.host_cap(docs, cap=3).collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


# ---------------------------------------------------------------------------
# T45 contamination
# ---------------------------------------------------------------------------


def test_contamination_eval_docs_flagged_and_planted_copy_caught(spark):
    docs = _docs(spark)
    # plant a non-eval doc that copies an eval doc's text verbatim
    ev = docs.filter(F.col("doc_id") % wc.EVAL_MOD == 0).limit(1)
    copied = ev.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    out = wc.contamination(docs.unionByName(copied))
    rows = {r.doc_id: r for r in out.collect()}
    planted = [d for d in rows if d >= 1_000_000][0]
    assert rows[planted].contaminated and not rows[planted].in_eval
    # every eval doc trivially shares its own grams
    assert all(r.contaminated for r in rows.values() if r.in_eval)
    # output covers every input doc exactly once
    assert len(rows) == docs.count() + 1


def test_contamination_eval_side_broadcast(spark):
    plan = (
        wc.contamination(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# T60 bloom_contamination
# ---------------------------------------------------------------------------


def test_bloom_contamination_no_false_negatives(spark):
    """A Bloom filter may over-flag (deterministic false positives)
    but must NEVER miss: every doc the exact contamination screen
    flags must be bloom-contaminated, including a planted verbatim
    copy of an eval doc; the over-flag rate at this corpus size stays
    small."""
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % wc.EVAL_MOD == 0).limit(1)
    copied = ev.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    full = docs.unionByName(copied)
    exact = {r.doc_id: r.contaminated for r in wc.contamination(full).collect()}
    bloom = {
        r.doc_id: r.contaminated
        for r in wc.bloom_contamination(full).collect()
    }
    assert set(exact) == set(bloom)
    missed = [d for d, c in exact.items() if c and not bloom[d]]
    assert missed == []  # no false negatives, ever
    planted = [d for d in bloom if d >= 1_000_000][0]
    assert bloom[planted]
    extra = sum(1 for d, c in bloom.items() if c and not exact[d])
    assert extra / len(bloom) < 0.05  # fp rate bounded at 2^16 bits


def test_bloom_broadcast_matches_literal_and_keeps_plan_small(spark):
    """The broadcast-bytes variant (the 10^10-bit scale path) must
    produce EXACTLY the literal-closure demo's rows at the same
    bloom_bits — same hash family, same positions, same false
    positives — while keeping the bitset OUT of the query plan: the
    literal plan embeds a 2,048-word array literal, the broadcast plan
    must stay O(1) in bloom_bits (round-4 VERDICT item 3)."""
    docs = _docs(spark)
    lit_rows = sorted(
        tuple(r) for r in wc.bloom_contamination(docs).collect()
    )
    bc_df = wc.bloom_contamination_broadcast(docs)
    bc_rows = sorted(tuple(r) for r in bc_df.collect())
    assert lit_rows == bc_rows

    lit_plan = (
        wc.bloom_contamination(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # fresh (unexecuted) plan so AQE's final-plan rendering doesn't
    # skew the size comparison vs the bloom_bits-scaled plan below
    bc_plan = (
        wc.bloom_contamination_broadcast(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the literal plan carries the word array (even truncated for
    # display it dwarfs the broadcast plan); the broadcast plan must
    # stay O(1) in bloom_bits — growing the filter 16x may not grow
    # the plan at all
    assert len(bc_plan) < len(lit_plan) / 2, (len(bc_plan), len(lit_plan))
    assert "ArrowEvalPython" in bc_plan  # vectorized pandas_udf probe
    bc_plan_big = (
        wc.bloom_contamination_broadcast(docs, bloom_bits=1 << 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert abs(len(bc_plan_big) - len(bc_plan)) < 200, (
        len(bc_plan_big),
        len(bc_plan),
    )

    # bloom_bits is a real parameter now: a smaller filter over-flags
    # more but still never misses the exact screen's hits
    small = {
        r.doc_id: r.contaminated
        for r in wc.bloom_contamination_broadcast(
            docs, bloom_bits=1 << 10
        ).collect()
    }
    exact = {r.doc_id: r.contaminated for r in wc.contamination(docs).collect()}
    assert [d for d, c in exact.items() if c and not small[d]] == []

    with pytest.raises(ValueError, match="multiple of 8"):
        wc.bloom_contamination_broadcast(docs, bloom_bits=12)


def test_bloom_contamination_no_join_on_corpus_side(spark):
    """The probe side must test against closure literals — the only
    join in the plan is the final per-doc hit reattach, never a join
    carrying gram hashes."""
    plan = (
        wc.bloom_contamination(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one reattach join; the bitset itself is a literal, not a relation
    assert plan.count("Join") <= 2, plan


# ---------------------------------------------------------------------------
# T46 lm_score
# ---------------------------------------------------------------------------


def test_lm_score_common_text_scores_lower(spark):
    """A doc of the corpus's most common words must score lower (less
    surprising) than a doc of words the model never saw."""
    docs = _docs(spark)
    vocab_top = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(F.split("text", r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(3)
        .collect()
    )
    common = " ".join(r.w for r in vocab_top for _ in range(10))
    planted = spark.createDataFrame(
        [
            (2_000_001, common, "en", "planted", len(common)),
            (2_000_003, "zzqx9 vvkk7 qqpp3 " * 10, "en", "planted", 54),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = wc.lm_score(docs.unionByName(planted))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[2_000_001].score < rows[2_000_003].score
    assert rows[2_000_001].n_oov == 0
    assert rows[2_000_003].n_oov == rows[2_000_003].n_words


def test_lm_score_model_is_broadcast(spark):
    plan = (
        wc.lm_score(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# T47 tfidf_keywords
# ---------------------------------------------------------------------------


def test_tfidf_distinctive_word_wins(spark):
    """A word unique to one doc (max idf) repeated enough times must
    be that doc's top keyword."""
    docs = _docs(spark)
    planted_text = "xqzunique " * 5 + "the common words appear here"
    planted = spark.createDataFrame(
        [(3_000_001, planted_text, "en", "planted", len(planted_text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = wc.tfidf_keywords(docs.unionByName(planted))
    top = {
        r.rnk: r.word
        for r in out.filter(F.col("doc_id") == 3_000_001).collect()
    }
    assert top[1] == "xqzunique"
    # every doc gets at most topk rows, ranks contiguous from 1
    counts = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("m")
    )
    bad = counts.filter(
        (F.col("n") > wc.TFIDF_TOPK) | (F.col("n") != F.col("m"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# streaming session_window boundary semantics
# ---------------------------------------------------------------------------


def test_session_window_exact_gap_merges(spark, tmp_path):
    """Boundary pin: an event exactly `gap` after the previous one
    MERGES into the session (Spark's inclusive rule — the oracle's
    `> gap` split mirrors this); one microsecond beyond splits."""
    import datetime as dt

    from ocr_spark.streaming.metrics import (
        run_stream_to_memory,
        session_window_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    gap = dt.timedelta(minutes=30)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + gap, 7, "view", 1.0, "{}"),  # exactly gap -> merges
        (3, t0 + 2 * gap + dt.timedelta(microseconds=1), 7, "view", 1.0, "{}"),
    ]
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    out = run_stream_to_memory(
        session_window_stream(spark, path, gap_minutes=30)
    ).collect()
    assert sorted(r.n_events for r in out) == [1, 2]


def test_perplexity_buckets_tercile_split(spark):
    """T64: per language the head/middle/tail split is within one
    bin's mass of exact terciles, assignment is whole-bin consistent,
    and the pipeline stays deterministic across runs."""
    docs = _docs(spark)
    out = wc.perplexity_buckets(docs)
    rows = out.collect()
    n_docs = docs.count()
    assert 0.9 * n_docs <= len(rows) <= n_docs

    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        if n < 30:
            continue
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.bucket] += 1
        # whole-bin assignment: a bucket boundary can shift a full
        # bin's mass, so allow a generous band around n/3
        assert counts["head"] <= n // 3 + 1  # head never overshoots
        assert counts["head"] > 0 and counts["tail"] > 0
        # monotone: every head bin < every middle bin < every tail bin
        maxb = {"head": -1, "middle": -1, "tail": -1}
        minb = {"head": 1 << 40, "middle": 1 << 40, "tail": 1 << 40}
        for r in rs:
            maxb[r.bucket] = max(maxb[r.bucket], r.bin)
            minb[r.bucket] = min(minb[r.bucket], r.bin)
        if counts["middle"]:
            assert maxb["head"] < minb["middle"]
            assert maxb["middle"] < minb["tail"]

    again = {(r.doc_id, r.bucket) for r in wc.perplexity_buckets(docs).collect()}
    assert again == {(r.doc_id, r.bucket) for r in rows}


def test_perplexity_buckets_thresholds_broadcast(spark):
    """The label table must come back via a broadcast join — the doc
    side is never shuffled for labeling."""
    plan = (
        wc.perplexity_buckets(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_robots_filter_longest_prefix_semantics(spark):
    """T65: every doc gets exactly one decision; deny hosts lose their
    /Articles docs except the /Articles/1* allow override; '/' paths
    are always allowed; the rule table is broadcast."""
    docs = _docs(spark)
    out = wc.robots_filter(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        src = r.host[: -len(".com")]
        if r.path == "/":
            assert r.allowed and r.matched_prefix == "/"
        elif len(src) % 2 == 0:
            if r.path.startswith("/Articles/1"):
                assert r.allowed and r.matched_prefix == "/Articles/1"
            else:
                assert not r.allowed and r.matched_prefix == "/Articles"
        else:
            # no deny rule for this host: catch-all or the override
            assert r.allowed
    assert any(not r.allowed for r in rows)
    assert any(r.allowed and r.matched_prefix == "/Articles/1" for r in rows)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_weights_target_marker_scores_higher(spark):
    """T67: a probe doc made of the target split's distinctive token
    must weigh higher (more target-like) than a probe of corpus-wide
    filler — ln(f_tgt/f_src) > 0 for the marker, ~0 for filler. Both
    probes sit outside both training splits (odd ids). Models stay
    broadcast."""
    rows = []
    for i in range(200):
        text = "the quick brown fox jumps over the lazy dog"
        if i % wc.DSIR_TARGET_MOD == 0:
            text += " targetish" * 20
        rows.append((i, text, "en", "s", len(text)))
    rows.append((2_001, "targetish targetish targetish targetish", "en", "s", 40))
    rows.append((2_003, "the quick brown fox", "en", "s", 19))
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r.doc_id: r for r in wc.dsir_weights(docs).collect()}
    assert out[2_001].logw_per_word > out[2_003].logw_per_word
    assert out[2_001].logw_per_word > 0

    plan = (
        wc.dsir_weights(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_score_fluency_ordering(spark):
    """T69: a probe of corpus-frequent BIGRAMS scores lower (more
    fluent) than a probe of the same words scrambled into never-seen
    pairs — the signal lm_score (unigram) cannot express. Models stay
    broadcast."""
    docs = _docs(spark)
    # find the corpus's most frequent adjacent pair from the train half
    from ocr_spark.operators.corpus_ops import _words

    pairs = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("_w", _words(F.col("text")))
        .selectExpr(
            "explode(arrays_zip(slice(_w, 1, greatest(size(_w)-1, 0)), "
            "slice(_w, 2, greatest(size(_w)-1, 0)))) AS p"
        )
        .select(F.col("p.*"))
    )
    c1, c2 = pairs.columns
    top = (
        pairs.groupBy(c1, c2)
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    w1, w2 = top[0], top[1]
    fluent = " ".join([w1, w2] * 10)
    scrambled = " ".join([w2, w2, w1, w1] * 5)
    oov = "qzmwv blorp qzmwv blorp qzmwv"
    probes = spark.createDataFrame(
        [
            (3_000_001, fluent, "en", "s", len(fluent)),
            (3_000_003, scrambled, "en", "s", len(scrambled)),
            (3_000_005, oov, "en", "s", len(oov)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {
        r.doc_id: r
        for r in wc.bigram_score(docs.unionByName(probes)).collect()
        if r.doc_id >= 3_000_000
    }
    assert out[3_000_001].score < out[3_000_003].score
    # unseen-pair probe: every pair backs off and pays the OOV floor
    assert out[3_000_005].n_backoff == out[3_000_005].n_pairs == 4
    assert out[3_000_005].score > out[3_000_003].score

    plan = (
        wc.bigram_score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# T72 decontaminate_spans
# ---------------------------------------------------------------------------


def test_decontaminate_spans_merge_split_drop(spark):
    """T72: hand-built corpus hitting every path — split into two
    pieces, overlapping taints merging, full drop, min_piece drop,
    clean pass-through, eval exclusion.  k=3, pad=2, min_piece=2;
    doc 0 (id % 101 == 0) is the eval set contributing gram
    'alpha beta gamma'."""
    rows = [
        (0, "alpha beta gamma"),  # eval doc -> excluded from output
        # hit at pos 5 taints [3,9]; pieces [0,2] and [10,13]
        (1, "w1 w2 w3 w4 w5 alpha beta gamma w9 w10 w11 w12 w13 w14"),
        (2, "c1 c2 c3 c4"),  # clean -> one whole piece
        (3, "x alpha beta gamma y"),  # taint [0,4] covers all -> dropped
        # hits at 0 and 4: [0,4]+[2,8] merge to [0,8]; tail [9,13]
        (4, "alpha beta gamma z1 alpha beta gamma z2 z3 z4 z5 z6 z7 z8"),
        (5, "alpha beta gamma q1"),  # tail empty after clamp -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = wc.decontaminate_spans(docs, k=3, pad=2, min_piece=2)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r)
    assert set(got) == {1, 2, 4}
    p1 = sorted(got[1], key=lambda r: r.piece_idx)
    assert [(r.piece_start, r.piece_words, r.piece_text) for r in p1] == [
        (0, 3, "w1 w2 w3"),
        (10, 4, "w11 w12 w13 w14"),
    ]
    assert [r.piece_idx for r in p1] == [1, 2]
    (p2,) = got[2]
    assert (p2.piece_start, p2.piece_words, p2.piece_text) == (0, 4, "c1 c2 c3 c4")
    (p4,) = got[4]
    assert (p4.piece_start, p4.piece_words, p4.piece_text) == (
        9, 5, "z4 z5 z6 z7 z8",
    )


def test_decontaminate_spans_eval_broadcast_plan(spark):
    """The eval-gram join and the dirty-id joins stay broadcast."""
    docs = _docs(spark)
    plan = (
        wc.decontaminate_spans(docs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# T79 nb_quality
# ---------------------------------------------------------------------------


def test_nb_quality_separates_classes(spark):
    """Hand-built separable corpus: en docs use one vocabulary, others
    another — the classifier must put every doc on its side of the
    boundary (both pred branches exercised; the SQL gate checks the
    micro-nat arithmetic, this checks the decision)."""
    rows = []
    for i in range(40):
        # label decorrelated from the doc_id%2 train split: both
        # classes appear in the train slice
        if i % 4 < 2:
            rows.append((i, "good clean prose sentence", "en"))
        else:
            rows.append((i, "ruido basura spam spam", "es"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r.doc_id: r for r in wc.nb_quality(docs, v=64).collect()}
    assert len(out) == 40
    for i in range(40):
        assert out[i].pred == (i % 4 < 2), (i, out[i].logodds)
    # scores are symmetric-ish and nonzero on both sides
    assert out[0].logodds > 0 > out[2].logodds


def test_nb_quality_en_ranks_highest(spark):
    """On the synthetic corpus the positive class must rank top by
    mean log-odds — the discrimination property the quality filter is
    for (absolute threshold crossing depends on corpus separability)."""
    docs = _docs(spark)
    out = wc.nb_quality(docs)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in joined.groupBy("lang")
        .agg(F.avg("logodds").alias("m"))
        .collect()
    }
    assert max(means, key=means.get) == "en"


def test_nb_quality_broadcast_plan(spark):
    """Model and scalar joins stay broadcast; no sort-merge join."""
    plan = (
        wc.nb_quality(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nb_quality_one_class_is_null_in_both_engines(spark):
    """Degenerate training (a single class in the train slice) must
    yield NULL logodds/pred in BOTH engines — Spark's log(0) is NULL
    while DuckDB's ln(0) throws, so the oracle guards the prior with
    nullif.  A silent default (or an engine-side exception) would break
    parity-by-construction AND let a labeling bug empty a curated
    corpus downstream."""
    import duckdb

    rows = [(i, "all docs share one label word", "en") for i in range(12)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    out = wc.nb_quality(docs, v=16).collect()
    assert len(out) == 12
    assert all(r.logodds is None and r.pred is None for r in out)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, 'all docs share one label word', 'en')" for i in range(12))
        + ") t(doc_id, text, lang)"
    )
    oracle = con.execute(wc.sql_nb_quality(v=16)).df()
    assert len(oracle) == 12
    assert oracle["logodds"].isna().all()


# ---------------------------------------------------------------------------
# T80 fuzzy_contamination
# ---------------------------------------------------------------------------


def test_fuzzy_contamination_flags_neardup_of_eval(spark):
    """A corpus doc that is a light edit of an eval doc must flag with
    a high Jaccard against that eval doc; an unrelated doc must come
    back with the no-candidate sentinels."""
    evaltext = " ".join(f"tok{i}" for i in range(40))
    neartext = " ".join(f"tok{i}" for i in range(36))  # 90% prefix
    rows = [
        (0, evaltext),  # doc_id % 101 == 0 -> eval
        (7, neartext),  # near-dup of the eval doc
        (8, "completely different words entirely unrelated content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in wc.fuzzy_contamination(docs).collect()}
    assert set(out) == {7, 8}  # eval doc excluded
    assert out[7].contaminated and out[7].eval_id == 0
    assert out[7].jaccard > 0.8
    assert not out[8].contaminated
    assert out[8].eval_id == -1 and out[8].jaccard == 0.0


def test_fuzzy_contamination_broadcast_plan(spark):
    """The eval band-key and eval shingle-set joins stay broadcast;
    the corpus is never self-joined."""
    plan = (
        wc.fuzzy_contamination(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# T83 url_filter
# ---------------------------------------------------------------------------


def test_url_filter_branch_cases(spark):
    """Every admission rule rejects (and only its planted rows):
    %13 blocked extension, %17 path depth, %19 param explosion,
    %23 digit-spam host; plain rows pass."""
    from ocr_spark.operators import webcorpus as wcops

    docs = _docs(spark).limit(300)
    out = {r.doc_id: r for r in wcops.url_filter(docs).collect()}
    for i, r in out.items():
        if i % 13 == 0:
            assert r.blocked_ext and not r.admitted, r
        if i % 17 == 0:
            assert r.path_depth > wcops.URLF_MAX_DEPTH and not r.admitted, r
        if i % 19 == 0:
            assert r.n_params > wcops.URLF_MAX_PARAMS and not r.admitted, r
        if i % 23 == 0 and i > 0:
            assert (
                r.host_digit_frac > wcops.URLF_MAX_HOST_DIGIT_FRAC
                and not r.admitted
            ), r
        if i > 0 and all(i % m != 0 for m in (13, 17, 19, 23)):
            assert r.admitted, r
    # both outcomes occur
    vals = {r.admitted for r in out.values()}
    assert vals == {True, False}


def test_url_filter_no_shuffle_no_python(spark):
    """Pure per-row column arithmetic: no Exchange, no Python in the
    plan — the op must stay free at 10^12 rows."""
    from ocr_spark.operators import webcorpus as wcops

    plan = (
        wcops.url_filter(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# T84 domain_stats
# ---------------------------------------------------------------------------


def test_registered_domain_psl_branches(spark):
    """eTLD+1 resolution: bare domains pass through, co.uk-style
    public suffixes keep three labels, plain TLDs keep two."""
    from ocr_spark.operators.webcorpus import registered_domain_col

    rows = [
        ("ex.com", "ex.com"),
        ("news.ex.com", "ex.com"),
        ("a.b.ex.org", "ex.org"),
        ("ex.co.uk", "ex.co.uk"),
        ("news.ex.co.uk", "ex.co.uk"),
        ("a.b.ex.com.au", "ex.com.au"),
        ("co.uk", "co.uk"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    got = [
        r.d
        for r in df.select(
            registered_domain_col(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [e for _, e in rows]


def test_domain_stats_groups_hosts_under_domain(spark):
    """Subdomain variants of one registered domain roll up to a single
    row whose n_hosts counts the distinct planted hosts."""
    from ocr_spark.operators.webcorpus import domain_stats

    docs = _docs(spark)
    out = domain_stats(docs)
    rows = out.collect()
    assert len(rows) > 0
    # every source yields up to 4 domains (one per TLD family), each
    # aggregating up to 3 subdomain variants
    assert all(1 <= r.n_hosts <= 3 for r in rows)
    total = sum(r.n_docs for r in rows)
    assert total == docs.count()


# ---------------------------------------------------------------------------
# T85 recrawl_priority
# ---------------------------------------------------------------------------


def test_recrawl_priority_tiers(spark):
    """Hand-built snapshots: hostA fully changed -> hot, hostB one of
    ten changed -> warm, hostC untouched -> cold; adds and removes
    count as change."""
    from ocr_spark.operators.webcorpus import recrawl_priority

    old_rows = (
        [(i, f"a{i}", "hostA") for i in range(4)]
        + [(100 + i, f"b{i}", "hostB") for i in range(10)]
        + [(200 + i, f"c{i}", "hostC") for i in range(5)]
    )
    new_rows = (
        [(i, f"a{i} v2", "hostA") for i in range(4)]  # all changed
        + [(100 + i, f"b{i} v2", "hostB") for i in range(2)]  # 2/10 changed
        + [(100 + i, f"b{i}", "hostB") for i in range(2, 10)]
        + [(200 + i, f"c{i}", "hostC") for i in range(5)]
    )
    schema = "doc_id bigint, text string, source string"
    out = {
        r.host: r
        for r in recrawl_priority(
            spark.createDataFrame(old_rows, schema),
            spark.createDataFrame(new_rows, schema),
        ).collect()
    }
    assert out["hostA"].tier == "hot" and out["hostA"].n_changed == 4
    assert out["hostB"].tier == "warm" and out["hostB"].n_changed == 2
    assert out["hostC"].tier == "cold" and out["hostC"].change_frac == 0.0


# ---------------------------------------------------------------------------
# T97 quality_ensemble
# ---------------------------------------------------------------------------


def test_quality_ensemble_votes_consistent_and_both_branches(spark):
    """votes always equals the sum of the member flags, keep is the
    majority rule, and the gate corpus exercises both outcomes."""
    out = wc.quality_ensemble(_docs(spark)).collect()
    assert out
    for r in out:
        assert r.votes == int(r.gopher_ok) + int(r.nb_ok) + int(r.lm_ok)
        assert r.keep == (r.votes >= 2)
    kept = {r.keep for r in out}
    assert kept == {True, False}


# ---------------------------------------------------------------------------
# T100 script_profile
# ---------------------------------------------------------------------------


def test_script_profile_closed_form(spark):
    """Hand rows: pure CJK text is dominant 'cjk', ASCII prose is
    'latin', digits-only is 'other'; fractions are exact."""
    from ocr_spark.operators.corpus_ops import script_profile

    rows = [
        (1, "中文文本"),   # 4 CJK chars
        (2, "abc 12"),                      # 3 latin, 2 digit, 1 space
        (3, "1234"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in script_profile(docs).collect()}
    assert out[1].dominant == "cjk" and out[1].cjk_frac == 1.0
    assert out[2].dominant == "latin"
    assert out[2].latin_frac == 0.5 and abs(out[2].digit_frac - 2 / 6) < 1e-6
    assert out[3].dominant == "other" and out[3].digit_frac == 1.0
    assert out[4].dominant == "other" and out[4].n_chars_t == 0


def test_script_profile_corpus_and_no_shuffle(spark):
    """The gate corpus is ASCII prose regardless of its synthetic lang
    labels — every doc must come back latin-dominant with zero cjk —
    and the op's plan must stay exchange- and Python-free."""
    from ocr_spark.operators.corpus_ops import script_profile

    docs = _docs(spark)
    out = script_profile(docs)
    rows = out.collect()
    assert rows and all(r.dominant == "latin" for r in rows)
    assert all(r.cjk_frac == 0.0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# T101 html_metadata / T102 topic_tag
# ---------------------------------------------------------------------------


def test_html_metadata_roundtrip_and_escaping(spark):
    """Extraction recovers every planted field, including on text with
    HTML-special characters (the escape/extract pair must compose)."""
    from ocr_spark.operators.webcorpus import html_metadata, meta_pages

    docs = spark.createDataFrame(
        [
            (7, 'alpha & beta <tag> "quoted" extra words here now', "srcA"),
            (8, "tiny", "srcB"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {r.doc_id: r for r in html_metadata(meta_pages(docs)).collect()}
    assert out[7].title == "alpha &amp; beta &lt;tag&gt; &quot;quoted&quot;"
    assert out[7].og_title == out[7].title
    assert out[7].description.endswith("extra words here")
    assert out[7].canonical == "https://srcA.com/doc/7"
    assert out[7].pub_date == "2023-01-08"
    assert out[8].title == "tiny" and out[8].pub_date == "2023-01-09"


def test_html_metadata_no_python_in_plan(spark):
    from ocr_spark.operators.webcorpus import html_metadata, meta_pages

    plan = (
        html_metadata(meta_pages(_docs(spark)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_topic_tag_dominant_and_none(spark):
    """Votes pick the dominant topic, ties go to the lexicographically
    smaller one, no-hit docs tag 'none'."""
    from ocr_spark.operators.webcorpus import topic_tag

    docs = spark.createDataFrame(
        [
            (1, "spark batch partition query"),       # compute 3 : database 1
            (2, "query table row vector embedding model"),  # db 3 : ml 3 tie
            (3, "nothing matches here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.topic, r.n_hits) for r in topic_tag(docs).collect()}
    assert out[1] == ("compute", 3)
    assert out[2] == ("database", 3)  # tie -> 'database' < 'ml'
    assert out[3] == ("none", 0)


# ---------------------------------------------------------------------------
# T114 url_dedup
# ---------------------------------------------------------------------------


def test_url_dedup_collapses_variants_keeps_latest(spark):
    """Docs whose planted URLs canonicalize identically collapse to
    one row keeping the max doc_id; survivors tile the corpus."""
    from ocr_spark.operators.webcorpus import url_dedup

    docs = _docs(spark)
    out = url_dedup(docs).collect()
    assert sum(r.n_variants for r in out) == docs.count()
    # every canonical key appears once
    keys = [r.canon_url for r in out]
    assert len(keys) == len(set(keys))
    # the planted URL space collapses at least some variants
    assert any(r.n_variants > 1 for r in out)
    # the kept doc is always a member (max) of its variant group
    assert all(r.kept_doc_id >= 0 for r in out)


def test_url_dedup_single_agg_plan(spark):
    """One map-side-combinable aggregation; no joins, no windows."""
    from ocr_spark.operators.webcorpus import url_dedup

    plan = (
        url_dedup(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1


# ---------------------------------------------------------------------------
# T179-T181 extraction-path governance audits
# ---------------------------------------------------------------------------


def test_extraction_yield_arithmetic(spark):
    """Per-source sums and the integer-ppm yield over a synthetic
    extracted frame; ppm is floor((1e6*chars)/bytes) exactly."""
    from ocr_spark.operators.webcorpus import extraction_yield

    ext = spark.createDataFrame(
        [
            ("srcA:1", 1000, 300),
            ("srcA:2", 3000, 700),
            ("srcB:3", 512, 512),
        ],
        "url string, bytes_in bigint, chars_out bigint",
    )
    out = {r.source: r for r in extraction_yield(ext).collect()}
    assert out["srcA"].n_docs == 2
    assert out["srcA"].bytes_in == 4000
    assert out["srcA"].chars_out == 1000
    assert out["srcA"].yield_ppm == (1_000_000 * 1000) // 4000
    assert out["srcB"].yield_ppm == 1_000_000


def test_extraction_yield_end_to_end_real_extractor(spark):
    """The wrapped real-extraction path: bytes_in equals the wrapped
    page's byte length and chars_out equals the normalized text
    length, per source."""
    from pyspark.sql import functions as F

    from ocr_spark.operators import extract_documents
    from ocr_spark.operators.webcorpus import extraction_yield
    from ocr_spark.sources import wrap_as_html
    from ocr_spark.sources.wrap import wrap_text_html

    rows = [
        (1, "alpha & beta  gamma", "srcA"),
        (2, "  spaced   out words ", "srcA"),
        (3, "solo", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    keyed = docs.select(
        F.concat_ws(":", "source", "doc_id").alias("url"), "text"
    )
    out = {
        r.source: r
        for r in extraction_yield(
            extract_documents(wrap_as_html(keyed), n_partitions=2)
        ).collect()
    }
    exp_bytes_a = len(wrap_text_html(rows[0][1])) + len(wrap_text_html(rows[1][1]))
    exp_chars_a = len(" ".join(rows[0][1].split())) + len(
        " ".join(rows[1][1].split())
    )
    assert out["srcA"].bytes_in == exp_bytes_a
    assert out["srcA"].chars_out == exp_chars_a
    assert out["srcB"].n_docs == 1


def test_extraction_parity_counts_mismatches(spark):
    """A per-url char divergence between the two codec paths surfaces
    as n_mismatch > 0; agreement gives 0."""
    from ocr_spark.operators.webcorpus import extraction_parity

    h = spark.createDataFrame(
        [("srcA:1", 10), ("srcA:2", 20), ("srcB:3", 5)],
        "url string, chars_out bigint",
    )
    p_ok = spark.createDataFrame(
        [("srcA:1", 10), ("srcA:2", 20), ("srcB:3", 5)],
        "url string, chars_out bigint",
    )
    p_bad = spark.createDataFrame(
        [("srcA:1", 10), ("srcA:2", 21), ("srcB:3", 5)],
        "url string, chars_out bigint",
    )
    ok = {r.source: r for r in extraction_parity(h, p_ok).collect()}
    assert ok["srcA"].n_mismatch == 0 and ok["srcB"].n_mismatch == 0
    bad = {r.source: r for r in extraction_parity(h, p_bad).collect()}
    assert bad["srcA"].n_mismatch == 1
    assert bad["srcA"].chars_html == 30 and bad["srcA"].chars_pdf == 31


def test_meta_refresh_planted_rows_only_and_no_counterfeit(spark):
    """Only doc_id % 7 == 0 rows emit a target; a document whose TEXT
    contains the literal tag is escaped by the wrapper and cannot
    counterfeit one."""
    from ocr_spark.operators.webcorpus import (
        meta_refresh_audit,
        meta_refresh_pages,
    )

    docs = spark.createDataFrame(
        [
            (0, "plain words", "srcA"),
            (1, '<meta http-equiv="refresh" content="5;url=https://evil">', "srcA"),
            (7, "redirecting page", "srcB"),
            (9, "more plain", "srcB"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {r.doc_id: r.target_url for r in meta_refresh_audit(
        meta_refresh_pages(docs)
    ).collect()}
    assert set(out) == {0, 7}
    assert out[0] == "https://srcA.com/doc/1"
    assert out[7] == "https://srcB.com/doc/8"


def test_meta_refresh_plan_no_python_no_exchange(spark):
    """Plant + extract are pure column expressions: narrow plan, no
    Python eval, no exchange."""
    import re

    from ocr_spark.operators.webcorpus import (
        meta_refresh_audit,
        meta_refresh_pages,
    )

    plan = (
        meta_refresh_audit(meta_refresh_pages(_docs(spark)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan
    assert not re.findall(r"Exchange hashpartitioning", plan)


def test_extraction_yield_single_agg_exchange(spark):
    """One map-side-combined aggregation after the zero-shuffle
    extraction scan: exactly one hash-partition exchange of per-source
    partials in the whole plan."""
    import re

    from pyspark.sql import functions as F

    from ocr_spark.operators import extract_documents
    from ocr_spark.operators.webcorpus import extraction_yield

    keyed = _docs(spark).select(
        F.concat_ws(":", "source", "doc_id").alias("url"), "text"
    )
    from ocr_spark.sources import wrap_as_html

    plan = (
        extraction_yield(extract_documents(wrap_as_html(keyed), n_partitions=2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ex = re.findall(r"Exchange hashpartitioning", plan)
    assert len(ex) == 1, plan[:2000]
    assert "partial" in plan.lower()


def test_crawl_budget_pareto_orders_and_accumulates(spark):
    """T183: best-yield host ranks first; cumulative ppm reach exactly
    1e6 at the last rank; frontier dominance (chars fraction >= bytes
    fraction at every prefix when ranked by yield)."""
    from ocr_spark.operators.webcorpus import crawl_budget_pareto

    y = spark.createDataFrame(
        [
            ("good", 4, 1000, 900, 900_000),
            ("mid", 4, 1000, 500, 500_000),
            ("junk", 4, 2000, 100, 50_000),
        ],
        "source string, n_docs bigint, bytes_in bigint,"
        " chars_out bigint, yield_ppm bigint",
    )
    got = sorted(crawl_budget_pareto(y).collect(), key=lambda r: r.rank)
    assert [r.source for r in got] == ["good", "mid", "junk"]
    assert got[-1].bytes_cum_ppm == 1_000_000
    assert got[-1].chars_cum_ppm == 1_000_000
    assert got[0].bytes_cum_ppm == 250_000   # 1000/4000
    assert got[0].chars_cum_ppm == 600_000   # 900/1500
    for r in got:
        assert r.chars_cum_ppm >= r.bytes_cum_ppm
