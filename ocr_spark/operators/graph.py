"""Web link graph: href extraction, degree stats, PageRank.

A crawl corpus is a graph, and the standard curation signals on it
(in-degree as a popularity prior, PageRank as a quality prior — the
original use case of the algorithm) are first-class pipeline
operators here:

* ``linked_pages`` — deterministic page builder: each document gets
  the same boilerplate-wrapped HTML as ``sources.wrap`` plus
  ``LINKS_PER_DOC`` in-corpus ``/doc/<id>`` anchors derived from its
  doc_id.  Built entirely with column expressions (concat + escape
  chain) — the whole page body is whole-stage-codegen, zero Python.
* ``extract_links`` — href scan via ``regexp_extract_all`` on the
  decoded page (JVM regex, no UDF), explode to an edge list.
* ``degree_stats`` — in/out degree per page: two map-side-combined
  aggs joined on the page id.
* ``pagerank`` — fixed-iteration PageRank as a loop of
  (join on src → groupBy dst) rounds.  Every iteration is one shuffle
  of (node, rank) pairs — 16 bytes a row, never page bytes.  Ranks
  are rounded to 12 decimals each iteration IN BOTH ENGINES, so
  float-sum association drift cannot accumulate across iterations and
  the DuckDB mirror (the same fixed iterations as chained CTEs)
  hash-matches at 6-decimal output precision.

Scale shape: at 10^12 edges each PageRank iteration is a shuffle on
dst — unavoidable (it IS the computation) — but partial aggregation
collapses each partition's contributions before the exchange, so the
shuffle carries at most n_nodes rows per partition.  For many
iterations you would localCheckpoint every ~5 rounds to truncate the
growing plan; the operator takes ``checkpoint_every`` for exactly
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINKS_PER_DOC = 3
LINK_STRIDE = 7
DAMPING = 0.85
ITER_ROUND = 12


def _escape_col(c):
    # html.escape replacement order: & first, then < > " '
    for src, dst in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#x27;"),
    ]:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def linked_pages(docs: DataFrame, n_docs: int) -> DataFrame:
    """(doc_id, html): boilerplate page whose article body is the
    escaped text plus LINKS_PER_DOC anchors to
    ``(doc_id * LINK_STRIDE + j + 1) % n_docs``.  Pure column
    expressions — the page assembles inside codegen."""
    from ..sources.wrap import _HTML_TEMPLATE_HEAD, _HTML_TEMPLATE_TAIL

    anchors = [
        F.concat(
            F.lit('<a href="/doc/'),
            ((F.col("doc_id") * LINK_STRIDE + F.lit(j + 1)) % n_docs).cast(
                "string"
            ),
            F.lit('">ref</a>'),
        )
        for j in range(LINKS_PER_DOC)
    ]
    page = F.concat(
        F.lit(_HTML_TEMPLATE_HEAD),
        F.lit("<p>"),
        _escape_col(F.col("text")),
        F.lit("</p>"),
        *anchors,
        F.lit(_HTML_TEMPLATE_TAIL),
    )
    return docs.select("doc_id", F.encode(page, "utf-8").alias("html"))


ANCHOR_VOCAB = 13  # deterministic anchor-text vocabulary size


def linked_anchor_pages(docs: DataFrame, n_docs: int) -> DataFrame:
    """Like :func:`linked_pages` but each anchor carries deterministic
    text ``w<(src + j) % ANCHOR_VOCAB>`` — the input shape for
    anchor-text aggregation (T62). Pure column expressions."""
    from ..sources.wrap import _HTML_TEMPLATE_HEAD, _HTML_TEMPLATE_TAIL

    anchors = [
        F.concat(
            F.lit('<a href="/doc/'),
            ((F.col("doc_id") * LINK_STRIDE + F.lit(j + 1)) % n_docs).cast(
                "string"
            ),
            F.lit('">w'),
            ((F.col("doc_id") + F.lit(j)) % ANCHOR_VOCAB).cast("string"),
            F.lit("</a>"),
        )
        for j in range(LINKS_PER_DOC)
    ]
    page = F.concat(
        F.lit(_HTML_TEMPLATE_HEAD),
        F.lit("<p>"),
        _escape_col(F.col("text")),
        F.lit("</p>"),
        *anchors,
        F.lit(_HTML_TEMPLATE_TAIL),
    )
    return docs.select("doc_id", F.encode(page, "utf-8").alias("html"))


def extract_anchors(pages: DataFrame) -> DataFrame:
    """(src, dst, anchor) from ``<a href="/doc/<id>">text</a>`` — two
    JVM ``regexp_extract_all`` passes over the same pattern zipped and
    exploded; no Python touches the bytes."""
    body = F.decode(F.col("html"), "utf-8")
    pat = F.lit('<a href="/doc/(\\d+)">([^<]*)</a>')
    pairs = F.arrays_zip(
        F.regexp_extract_all(body, pat, 1).alias("dst"),
        F.regexp_extract_all(body, pat, 2).alias("anchor"),
    )
    return pages.select(
        F.col("doc_id").alias("src"), F.explode(pairs).alias("p")
    ).select(
        "src",
        F.col("p.dst").cast("bigint").alias("dst"),
        F.col("p.anchor").alias("anchor"),
    )


def anchor_stats(anchors: DataFrame, topk: int = 3) -> DataFrame:
    """(page, n_anchors, top_anchors): per-target anchor-text profile —
    the classic web-search signal (anchor text describes the TARGET
    page; Brin & Page 1998 §2.2).

    Scale shape: groupBy (dst, anchor) is map-side combined, so a hub
    page with 10^8 in-links contributes at most ``n_partitions x
    n_distinct_texts`` rows to the shuffle; the per-target top-k window
    then ranks only the distinct texts of each page, never the raw
    in-links. No all-anchor list ever materializes."""
    from pyspark.sql import Window

    per_text = anchors.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    ranked = per_text.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("dst").alias("page"))
        .agg(
            F.sum("n").alias("n_anchors"),
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rk") <= topk,
                            F.concat_ws(":", "rk", "anchor"),
                        )
                    )
                ),
            ).alias("top_anchors"),
        )
        .select("page", "n_anchors", "top_anchors")
    )


def sql_anchor_stats(topk: int = 3) -> str:
    """The same aggregation with the anchor text stated by
    construction (``w<(src + j) % ANCHOR_VOCAB>``) — the Spark side
    re-extracts it from real html bytes; agreement is the check."""
    return f"""
        WITH edges AS (
            SELECT doc_id AS src,
                   (doc_id * {LINK_STRIDE} + j.j) % (SELECT count(*) FROM documents) AS dst,
                   'w' || CAST((doc_id + j.j - 1) % {ANCHOR_VOCAB} AS VARCHAR) AS anchor
            FROM documents,
                 (SELECT unnest(range(1, {LINKS_PER_DOC + 1})) AS j) j
        ),
        per_text AS (
            SELECT dst, anchor, count(*) AS n
            FROM edges GROUP BY dst, anchor
        ),
        ranked AS (
            SELECT dst, anchor, n,
                   row_number() OVER (
                       PARTITION BY dst ORDER BY n DESC, anchor ASC
                   ) AS rk
            FROM per_text
        )
        SELECT dst AS page,
               CAST(sum(n) AS BIGINT) AS n_anchors,
               string_agg(
                   CASE WHEN rk <= {topk}
                        THEN CAST(rk AS VARCHAR) || ':' || anchor END,
                   ',' ORDER BY CAST(rk AS VARCHAR) || ':' || anchor
               ) AS top_anchors
        FROM ranked
        GROUP BY dst
    """


def extract_links(pages: DataFrame) -> DataFrame:
    """(src, dst) edge list from ``/doc/<id>`` hrefs — JVM regex over
    the decoded page, exploded; no Python touches the bytes."""
    hrefs = F.regexp_extract_all(
        F.decode(F.col("html"), "utf-8"), F.lit('href="/doc/(\\d+)"'), 1
    )
    return pages.select(
        F.col("doc_id").alias("src"), F.explode(hrefs).alias("dst")
    ).select("src", F.col("dst").cast("bigint").alias("dst"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """(page, out_deg, in_deg) — two partial-agg counts, one join."""
    out_d = edges.groupBy(F.col("src").alias("page")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col("dst").alias("page")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "page", "full")
        .select(
            "page",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 5,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank rounds.

    Nodes are 0..n_nodes-1 (the linked_pages construction guarantees
    every node has out-degree LINKS_PER_DOC, so there is no dangling
    mass).  Intermediate ranks round to ITER_ROUND decimals — matched
    by the SQL mirror — so cross-engine float drift cannot compound.
    """
    spark = edges.sparkSession
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # The degree-annotated edge list is loop-INVARIANT but referenced
    # by every iteration: without truncation, each round's join
    # re-derives it from scratch (at crawl scale that is a full page
    # re-scan + regex re-extraction per iteration — 2 scans x n_iter
    # in the plan).  A lazy localCheckpoint materializes it once on
    # first use; every later round reads the materialized edges.  At
    # production scale, write the edge table to storage once instead
    # (the jobs/ pattern) — the loop shape is identical.
    contrib_edges = edges.join(out_deg, "src").localCheckpoint(eager=False)
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    ranks = nodes.withColumn(
        "rank", F.round(F.lit(1.0 / n_nodes), ITER_ROUND)
    )
    base = (1.0 - damping) / n_nodes
    for i in range(n_iter):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inbound"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping) * F.coalesce("inbound", F.lit(0.0)),
                ITER_ROUND,
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            # truncate the growing lineage so the plan (and the DAG
            # scheduler's work) stays bounded over many iterations
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------


def sql_edges(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    """Edge list stated by construction (the Spark side extracts the
    SAME edges back out of real html bytes with a regex — the two
    derivations agreeing is the point of the check)."""
    return f"""
        SELECT doc_id AS src,
               (doc_id * {LINK_STRIDE} + j.j) % {n_docs_expr} AS dst
        FROM documents,
             (SELECT unnest(range(1, {LINKS_PER_DOC + 1})) AS j) j
    """


def sql_degree_stats() -> str:
    return f"""
        WITH edges AS ({sql_edges()}),
        o AS (SELECT src AS page, count(*) AS out_deg FROM edges GROUP BY src),
        i AS (SELECT dst AS page, count(*) AS in_deg FROM edges GROUP BY dst)
        SELECT COALESCE(o.page, i.page) AS page,
               COALESCE(out_deg, 0) AS out_deg,
               COALESCE(in_deg, 0) AS in_deg
        FROM o FULL OUTER JOIN i ON o.page = i.page
    """


def sql_pagerank(n_iter: int = 5, damping: float = DAMPING) -> str:
    """The same fixed iterations as chained CTEs (r0..r{n_iter}), each
    rounded to ITER_ROUND decimals like the Spark loop."""
    n = "(SELECT count(*) FROM documents)"
    parts = [
        f"WITH edges AS ({sql_edges()}),",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        f"r0 AS (SELECT node, round(CAST(1.0 AS DOUBLE) / {n}, "
        f"{ITER_ROUND}) AS rank FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f""", r{i + 1} AS (
                SELECT n.node,
                       round(CAST({(1.0 - damping)!r} AS DOUBLE) / {n}
                             + CAST({damping!r} AS DOUBLE) *
                             COALESCE(c.inbound, CAST(0.0 AS DOUBLE)),
                             {ITER_ROUND}) AS rank
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS node,
                           sum(r.rank / d.out_deg) AS inbound
                    FROM edges e
                    JOIN deg d ON e.src = d.src
                    JOIN r{i} r ON e.src = r.node
                    GROUP BY e.dst
                ) c ON n.node = c.node
            )"""
        )
    parts.append(
        f"SELECT node, round(rank, 6) AS rank FROM r{n_iter}"
    )
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# T78 — redirect-chain resolution (pointer doubling)
# ---------------------------------------------------------------------------

# A crawl's URL space is full of redirect chains (http->https, slash
# canonicalization, moved hosts); fetch dedup and link-graph
# construction both need every URL mapped to its final target.  A
# sequential walk is O(max chain length) *dependent* passes over the
# whole table; pointer doubling squares the resolved hop distance per
# round, so L-hop chains resolve in ceil(log2 L) self-joins.

REDIRECT_TERM_MOD = 17  # doc_id % this == 0  ->  page is a terminal
REDIRECT_HOP_MOD = 3  # hop size 1..3, derived from the id


def redirect_edges(docs: DataFrame) -> DataFrame:
    """Deterministic redirect map (src, dst) over the corpus: every
    non-terminal page redirects ``1 + doc_id % REDIRECT_HOP_MOD`` ids
    down (clamped at 0).  Strictly decreasing ids -> acyclic; within
    any window a multiple of REDIRECT_TERM_MOD terminates the chain,
    so the max chain length is a small constant (17, by exhaustive
    check to 10^7) *independent of corpus size*."""
    did = F.col("doc_id")
    return docs.filter(did % REDIRECT_TERM_MOD != 0).select(
        did.alias("src"),
        F.greatest(
            did - (F.lit(1) + did % REDIRECT_HOP_MOD), F.lit(0)
        ).alias("dst"),
    )


def resolve_redirects(edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """(doc_id, final_id, hops): the terminal target and true hop count
    of every redirect source, via pointer doubling.

    Scale shape: each round is ONE self-join of the (src, dst, hops)
    map on dst==src — 24-byte rows, never page bytes — and the mapped
    hop distance doubles per round, so rounds = ceil(log2(max chain)),
    NOT log(corpus size).  The per-round convergence probe (count of
    still-movable rows) is the same single-action pattern as the CC
    star loop; lazy localCheckpoint truncates the doubling plan.  At
    10^12 urls each round shuffles the map once — the minimum possible
    for a chain-following computation without an external index."""
    m = edges.select(
        "src", "dst", F.lit(1).cast("bigint").alias("hops")
    ).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        a, b = m.alias("a"), m.alias("b")
        step = a.join(b, F.col("a.dst") == F.col("b.src"), "left").select(
            F.col("a.src").alias("src"),
            F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
            (
                F.col("a.hops") + F.coalesce(F.col("b.hops"), F.lit(0))
            ).alias("hops"),
            F.col("b.src").isNotNull().alias("moved"),
        ).localCheckpoint(eager=False)
        n_moved = step.agg(
            F.sum(F.col("moved").cast("bigint")).alias("n")
        ).collect()[0]["n"]
        m = step.drop("moved")
        if not n_moved:
            break
    return m.select(
        F.col("src").alias("doc_id"),
        F.col("dst").alias("final_id"),
        "hops",
    )


def sql_redirect_resolve() -> str:
    """DuckDB mirror: the same edge map walked by a recursive CTE —
    an independent sequential formulation of the identical semantics."""
    return f"""
        WITH RECURSIVE edges AS (
            SELECT doc_id AS src,
                   greatest(doc_id - (1 + doc_id % {REDIRECT_HOP_MOD}), 0)
                       AS dst
            FROM documents
            WHERE doc_id % {REDIRECT_TERM_MOD} <> 0
        ),
        walk AS (
            SELECT src, dst, 1 AS hops FROM edges
            UNION ALL
            SELECT w.src, e.dst, w.hops + 1
            FROM walk w JOIN edges e ON w.dst = e.src
        )
        SELECT w.src AS doc_id,
               CAST(w.dst AS BIGINT) AS final_id,
               CAST(w.hops AS BIGINT) AS hops
        FROM walk w
        WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.dst)
    """


# ---------------------------------------------------------------------------
# T93 — outlink spam scoring
# ---------------------------------------------------------------------------
#
# Link farms betray themselves in the page's own edge profile: link
# count way out of proportion to the prose, and the same target
# repeated (SEO reciprocal blocks).  Score per page from the extracted
# edge list — (links per 100 words, duplicate-target fraction) — the
# per-PAGE complement of PageRank's whole-graph view.
#
# Scale shape: one regex edge extraction (JVM, zero Python), one
# map-side-combined per-src agg, one hash join back to doc lengths;
# nothing shuffles page bytes.  The planted spam pages make the oracle
# closed-form: it states the edge profile by construction, so the
# regex extraction path must agree with it exactly.

SPAM_MOD = 29
SPAM_EXTRA_LINKS = 12
SPAM_DUP_FRAC = 0.5


def spam_linked_pages(docs: DataFrame, n_docs: int) -> DataFrame:
    """linked_pages plus a planted link farm: every doc_id % SPAM_MOD
    == 0 page appends SPAM_EXTRA_LINKS duplicate anchors to its first
    target.  Pure column expressions."""
    from ..sources.wrap import _HTML_TEMPLATE_HEAD, _HTML_TEMPLATE_TAIL

    anchors = [
        F.concat(
            F.lit('<a href="/doc/'),
            ((F.col("doc_id") * LINK_STRIDE + F.lit(j + 1)) % n_docs).cast(
                "string"
            ),
            F.lit('">ref</a>'),
        )
        for j in range(LINKS_PER_DOC)
    ]
    farm = F.when(
        F.col("doc_id") % SPAM_MOD == 0,
        F.repeat(anchors[0], SPAM_EXTRA_LINKS),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit(_HTML_TEMPLATE_HEAD),
        F.lit("<p>"),
        _escape_col(F.col("text")),
        F.lit("</p>"),
        *anchors,
        farm,
        F.lit(_HTML_TEMPLATE_TAIL),
    )
    return docs.select("doc_id", F.encode(page, "utf-8").alias("html"))


def link_spam_score(pages: DataFrame, docs: DataFrame) -> DataFrame:
    """(doc_id, n_links, n_distinct, dup_frac, links_per_100w, spam):
    per-page outlink profile from the extracted edges; spam = more
    than SPAM_DUP_FRAC of the links repeat a target."""
    from ocr_spark.operators.corpus_ops import _words

    edges = extract_links(pages)
    per = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_links"),
        F.countDistinct("dst").cast("bigint").alias("n_distinct"),
    )
    lens = docs.select(
        F.col("doc_id"),
        F.size(_words(F.col("text"))).cast("bigint").alias("n_words"),
    )
    dup_frac = F.round(
        F.lit(1.0)
        - F.col("n_distinct").cast("double") / F.col("n_links").cast("double"),
        6,
    )
    per100 = F.round(
        F.col("n_links").cast("double") * 100.0 / F.col("n_words").cast("double"),
        6,
    )
    return (
        per.withColumnRenamed("src", "doc_id")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            "n_links",
            "n_distinct",
            dup_frac.alias("dup_frac"),
            per100.alias("links_per_100w"),
            (dup_frac > SPAM_DUP_FRAC).alias("spam"),
        )
    )


def sql_link_spam_score() -> str:
    """Closed-form oracle: the planted pages carry exactly
    LINKS_PER_DOC distinct targets plus SPAM_EXTRA_LINKS duplicates on
    spam rows — a wrong regex, a lost edge, or a bad join breaks the
    hash."""
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    nl = (
        f"CAST({LINKS_PER_DOC} + CASE WHEN doc_id % {SPAM_MOD} = 0 "
        f"THEN {SPAM_EXTRA_LINKS} ELSE 0 END AS BIGINT)"
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {nl} AS n_links,
                   CAST({LINKS_PER_DOC} AS BIGINT) AS n_distinct,
                   CAST(len({w}) AS BIGINT) AS n_words
            FROM documents
        )
        SELECT doc_id, n_links, n_distinct,
               round(1.0 - CAST(n_distinct AS DOUBLE)
                     / CAST(n_links AS DOUBLE), 6) AS dup_frac,
               round(CAST(n_links AS DOUBLE) * 100.0
                     / CAST(n_words AS DOUBLE), 6) AS links_per_100w,
               round(1.0 - CAST(n_distinct AS DOUBLE)
                     / CAST(n_links AS DOUBLE), 6) > {SPAM_DUP_FRAC} AS spam
        FROM base
    """
