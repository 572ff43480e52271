"""WARC source/sink, link graph, and event-time operators.

The oracle-gated queries (warc_roundtrip, link_degree, link_pagerank,
asof_join, sessionize) check value parity; these tests cover the
contracts the SQL gate can't see: malformed-input robustness, the
file-based source/sink cycle, and plan shapes.
"""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.warc import (
    build_record,
    read_warc_dir,
    split_records,
    write_warc_files,
)


class TestWarcPure:
    def test_single_record_roundtrip(self):
        payload = b"<html>\xe4\xb8\xad</html>"
        rec = build_record("http://a/x", payload)
        rows = split_records(rec)
        assert rows == [("http://a/x", payload, "ok")]

    def test_multi_record_blob(self):
        blob = b"".join(
            build_record(f"u{i}", bytes([i]) * i) for i in range(1, 6)
        )
        rows = split_records(blob)
        assert [r[0] for r in rows] == [f"u{i}" for i in range(1, 6)]
        assert all(r[2] == "ok" for r in rows)
        assert [len(r[1]) for r in rows] == [1, 2, 3, 4, 5]

    def test_payload_containing_magic_bytes(self):
        """Content-Length framing must win over magic scanning: a
        payload that CONTAINS 'WARC/1.0\\r\\n' must not split."""
        evil = b"xx" + b"WARC/1.0\r\n" + b"yy"
        blob = build_record("u1", evil) + build_record("u2", b"ok")
        rows = split_records(blob)
        assert [(r[0], r[1]) for r in rows] == [("u1", evil), ("u2", b"ok")]

    def test_truncated_final_record(self):
        full = build_record("u1", b"abcdef")
        rows = split_records(full[:-10])  # cut inside the payload
        assert rows[0][0] == "u1"
        assert rows[0][2] == "truncated"

    def test_garbage_prefix_skipped(self):
        blob = b"\x00\x01 not a warc " + build_record("u1", b"p")
        rows = split_records(blob)
        assert rows == [("u1", b"p", "ok")]

    def test_missing_content_length_is_error_row(self):
        bad = b"WARC/1.0\r\nWARC-Target-URI: u9\r\n\r\n"
        rows = split_records(bad + build_record("u1", b"p"))
        assert rows[0] == ("u9", b"", "bad_header")
        assert rows[1] == ("u1", b"p", "ok")

    def test_garbage_only_yields_nothing(self):
        assert split_records(b"complete nonsense") == []


class TestWarcSpark:
    @pytest.fixture(scope="class")
    def payloads(self, spark):
        from ocr_spark.sources import wrap_as_html

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        return wrap_as_html(docs, "doc_id")

    def test_file_sink_source_roundtrip(self, spark, payloads, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("warc") / "dump")
        write_warc_files(payloads, path, n_shards=4)
        files = [f for f in os.listdir(path) if f.endswith(".warc")]
        assert 0 < len(files) <= 4
        back = read_warc_dir(spark, path)
        orig = payloads.select(
            "url", F.md5("html").alias("h")
        )
        got = back.filter(F.col("status") == "ok").select(
            "url", F.md5("html").alias("h")
        )
        assert got.count() == orig.count()
        assert got.exceptAll(orig).count() == 0

    def test_shard_spanning_multiple_arrow_batches(self, spark, payloads, tmp_path_factory):
        """A shard larger than one Arrow batch must still serialize to
        exactly ONE blob (and the file sink must not overwrite earlier
        batches of the same shard — the last-batch-wins data-loss bug).
        """
        from ocr_spark.sources.warc import to_warc_blobs

        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        try:
            n_docs = payloads.count()
            blobs = to_warc_blobs(payloads, n_shards=2).collect()
            # one blob row per shard, even though each shard spans
            # many 16-row Arrow batches
            assert len(blobs) == 2
            assert sum(r["n_records"] for r in blobs) == n_docs
            path = str(tmp_path_factory.mktemp("warc") / "multibatch")
            write_warc_files(payloads, path, n_shards=2)
            back = read_warc_dir(spark, path)
            assert back.filter(F.col("status") == "ok").count() == n_docs
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )

    def test_blob_serialization_single_exchange(self, payloads):
        from ocr_spark.sources.warc import to_warc_blobs

        plan = to_warc_blobs(payloads, n_shards=4)._jdf.queryExecution().executedPlan().toString()
        # one repartition on the shard key; record assembly must not
        # add further exchanges
        assert plan.count("Exchange") == 1, plan


class TestLinkGraph:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def test_edges_match_construction(self, docs):
        from ocr_spark.operators.graph import (
            LINK_STRIDE,
            LINKS_PER_DOC,
            extract_links,
            linked_pages,
        )

        n = docs.count()
        edges = extract_links(linked_pages(docs, n))
        got = {(r.src, r.dst) for r in edges.collect()}
        want = {
            (d, (d * LINK_STRIDE + j) % n)
            for d in range(n)
            for j in range(1, LINKS_PER_DOC + 1)
        }
        assert got == want

    def test_anchor_extraction_matches_construction(self, docs):
        """T62: anchors re-extracted from real html bytes equal the
        construction formula, and the per-target rollup's counts add
        up to the total in-link count."""
        from ocr_spark.operators.graph import (
            ANCHOR_VOCAB,
            LINK_STRIDE,
            LINKS_PER_DOC,
            anchor_stats,
            extract_anchors,
            linked_anchor_pages,
        )

        n = docs.count()
        anchors = extract_anchors(linked_anchor_pages(docs, n))
        got = {(r.src, r.dst, r.anchor) for r in anchors.collect()}
        want = {
            (d, (d * LINK_STRIDE + j) % n, f"w{(d + j - 1) % ANCHOR_VOCAB}")
            for d in range(n)
            for j in range(1, LINKS_PER_DOC + 1)
        }
        assert got == want
        stats = anchor_stats(anchors)
        assert stats.agg(F.sum("n_anchors")).first()[0] == n * LINKS_PER_DOC
        row = stats.orderBy("page").first()
        assert row.top_anchors.startswith("1:")

    def test_pagerank_sums_to_one(self, docs):
        from ocr_spark.operators.graph import extract_links, linked_pages, pagerank

        n = docs.count()
        edges = extract_links(linked_pages(docs, n))
        ranks = pagerank(edges, n_nodes=n, n_iter=3)
        total = ranks.agg(F.sum("rank")).first()[0]
        assert abs(total - 1.0) < 1e-4
        assert ranks.count() == n

    def test_pagerank_no_python_in_plan(self, docs):
        """The whole graph pipeline — page build, href regex, rank
        iterations — must stay JVM-side."""
        from ocr_spark.operators.graph import extract_links, linked_pages, pagerank

        n = docs.count()
        plan = (
            pagerank(extract_links(linked_pages(docs, n)), n_nodes=n, n_iter=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan, plan


class TestAsof:
    def test_no_preceding_right_row_is_null(self, spark):
        from ocr_spark.operators.events import asof_join

        left = spark.createDataFrame(
            [(1, 100, 10.0), (1, 300, 30.0)], "k int, ts int, v double"
        ).select("k", "ts", F.col("v").alias("lv"))
        right = spark.createDataFrame(
            [(1, 200, 99.0)], "k int, ts int, value double"
        )
        out = {
            r.ts: r.asof_value
            for r in asof_join(left, right, "k", "ts", "value").collect()
        }
        assert out[100] is None
        assert out[300] == 99.0

    def test_equal_timestamp_is_inclusive(self, spark):
        from ocr_spark.operators.events import asof_join

        left = spark.createDataFrame([(1, 200)], "k int, ts int")
        right = spark.createDataFrame(
            [(1, 200, 7.0), (1, 200, 9.0)], "k int, ts int, value double"
        )
        row = asof_join(left, right, "k", "ts", "value").first()
        # inclusive match; ties reduced to max(value)
        assert row.asof_value == 9.0

    def test_single_exchange_per_side(self, spark):
        """The union-merge as-of is one hash exchange on the key (plus
        the window sort) — no range-join row blow-up."""
        from ocr_spark.operators.events import asof_join

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        left = events.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        right = events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value"
        )
        plan = (
            asof_join(left, right, "user_id", "ts", "value")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRedirectResolve:
    """T78 pointer doubling — semantics the SQL gate already checks
    value-wise; here: hand-chain correctness, round count, and the
    acyclic/terminal invariants of the synthetic edge map."""

    def test_hand_chain(self, spark):
        # 9 -> 8 -> 5 -> 2 -> 0 (terminals: multiples of 17, and 0)
        from ocr_spark.operators.graph import (
            redirect_edges,
            resolve_redirects,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(10)], "doc_id bigint"
        )
        out = {
            r.doc_id: (r.final_id, r.hops)
            for r in resolve_redirects(redirect_edges(docs)).collect()
        }
        assert 0 not in out  # terminal, not a source
        assert out[9] == (0, 4)
        assert out[8] == (0, 3)
        assert out[1] == (0, 1)

    def test_log_rounds_suffice(self, spark):
        # max chain length for this edge map is 17 at ANY corpus size
        # (exhaustively checked to 10^7), so 5 doubling rounds resolve
        # everything: resolving with max_rounds=5 must equal unlimited.
        from ocr_spark.operators.graph import (
            redirect_edges,
            resolve_redirects,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id bigint"
        )
        edges = redirect_edges(docs)
        capped = sorted(
            map(tuple, resolve_redirects(edges, max_rounds=5).collect())
        )
        free = sorted(map(tuple, resolve_redirects(edges).collect()))
        assert capped == free
        srcs = {s for s, _, _ in capped}
        assert all(f not in srcs for _, f, _ in capped)  # all terminal


# ---------------------------------------------------------------------------
# T93 link_spam_score
# ---------------------------------------------------------------------------


def test_link_spam_flags_planted_farms_only(spark):
    """Planted %29 pages carry 15 links (12 duplicated) -> spam; every
    other page has 3 distinct links -> clean.  Counts come from the
    real regex extraction, not the plant's arithmetic."""
    from ocr_spark.operators.graph import (
        SPAM_EXTRA_LINKS,
        SPAM_MOD,
        link_spam_score,
        spam_linked_pages,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    out = {
        r.doc_id: r
        for r in link_spam_score(
            spam_linked_pages(docs, 120), docs
        ).collect()
    }
    assert len(out) == 120
    for i, r in out.items():
        if i % SPAM_MOD == 0:
            assert r.n_links == 3 + SPAM_EXTRA_LINKS and r.spam, r
            assert r.n_distinct == 3
        else:
            assert r.n_links == 3 and not r.spam, r


# ---------------------------------------------------------------------------
# T94 retention_cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_closed_form(spark):
    """Two users, two cohorts: day offsets and distinct-user counts on
    a hand-built stream."""
    import datetime as dt

    from ocr_spark.operators.events import retention_cohorts

    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 10),
        (2, dt.datetime(2024, 1, 1, 12), 10),   # same user, same day
        (3, dt.datetime(2024, 1, 3, 9), 10),    # user 10, offset 2
        (4, dt.datetime(2024, 1, 2, 9), 20),    # user 20 cohort 01-02
        (5, dt.datetime(2024, 1, 3, 9), 20),    # offset 1
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    )
    out = {
        (r.cohort_day, r.offset_days): (r.n_users, r.n_events)
        for r in retention_cohorts(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (1, 2)
    assert out[("2024-01-01", 2)] == (1, 1)
    assert out[("2024-01-02", 0)] == (1, 1)
    assert out[("2024-01-02", 1)] == (1, 1)
    assert len(out) == 4


def test_pagerank_edges_derived_once(spark):
    """The degree-annotated edge list is loop-invariant: the final
    plan must NOT contain one page-scan + regex-extraction subtree per
    iteration (it reads the once-materialized edges instead)."""
    from ocr_spark.operators.graph import (
        extract_links,
        linked_pages,
        pagerank,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    pr = pagerank(extract_links(linked_pages(docs, 100)), 100, n_iter=5)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 2, plan.count("FileScan")


def test_lpa_communities_mode_vote_and_tiebreak(spark):
    """T172: two triangles bridged by one edge.  After 2 synchronous
    rounds the mode-vote (count DESC, label ASC) yields communities of
    sizes {1, 2, 3} — a MIN-label (connected-components) rule would
    collapse everything toward label 0 instead, so the histogram
    proves the argmax is frequency-first."""
    import pytest as _pytest

    from ocr_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        "src bigint, dst bigint",
    )
    got = {
        r.community_size: r.n_communities
        for r in lpa_communities(edges, 6, n_iter=2).collect()
    }
    # hand-traced: labels after round 2 are [0,0,0,3,2,2]
    assert got == {1: 1, 2: 1, 3: 1}
    with _pytest.raises(ValueError):
        lpa_communities(edges, 6, n_iter=0)


def test_lpa_communities_isolated_node_keeps_own_label(spark):
    """A node with no edges must survive with its own label (one
    singleton community), not vanish."""
    from ocr_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    got = {
        r.community_size: r.n_communities
        for r in lpa_communities(edges, 3, n_iter=2).collect()
    }
    # the 0-1 pair label-swaps each synchronous round (the classic
    # bipartite oscillation — labels are [1,0] then [0,1]), and node 2
    # keeps its own label: three singleton communities, all 3 nodes
    # accounted for
    assert got == {1: 3}
