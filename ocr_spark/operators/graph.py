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


# ---------------------------------------------------------------------------
# T119 — triangle count / global clustering coefficient
# ---------------------------------------------------------------------------
#
# Triangle density separates organic link neighborhoods from link
# farms and mirror rings (spam subgraphs are near-bipartite — almost
# no triangles for their edge count), and the global clustering
# coefficient is the one-number summary a crawl-graph audit reports.
#
# Scale shape: the Spark side runs the DEGREE-ORDERED node-iterator
# (Schank & Wagner 2005 "forward"; the MapReduce form is Suri &
# Vassilvitskii 2011): orient every undirected edge from the
# lower-(degree, id) endpoint to the higher, build wedges by joining
# the oriented list with itself on the source, then semi-join wedge
# endpoints against the oriented edges.  Orientation bounds every
# node's out-neighborhood by O(sqrt(m)), so the wedge join emits
# O(m^1.5) rows worst-case instead of sum(deg^2) — the difference
# between feasible and not on a power-law web graph.  All three
# shuffles carry (bigint, bigint) pairs only.  The DuckDB oracle
# states the same count with the textbook u<v<w three-way self-join —
# two independent derivations agreeing on exact integers.

def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, n_wedges, n_triangles,
    clustering): triangle census of the undirected simple graph under
    ``edges`` (direction and self-loops dropped, duplicates merged).

    ``n_wedges`` = sum over nodes of C(deg, 2); ``clustering`` =
    3 * triangles / wedges (6dp).
    """
    # und / deg / fwd are each referenced by SEVERAL downstream
    # subtrees; without truncation Catalyst re-derives the edge
    # extraction + distinct once per reference (the T36 PageRank
    # lesson — the audit found 38 exchanges in the naive plan).  A
    # lazy localCheckpoint materializes each once on first use; at
    # production scale you'd write the canonical edge table to
    # storage once instead — the join shape is identical.
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # orient each edge from lower (deg, node) rank to higher
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
        )
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select(
        F.col("e.a").alias("a"), F.col("e.b").alias("b")
    ).localCheckpoint(eager=False)
    # wedges at a: unordered pairs of a's oriented out-neighbors
    lhs = fwd.select(F.col("a"), F.col("b").alias("x"))
    rhs = fwd.select(F.col("a"), F.col("b").alias("y"))
    wedges = lhs.join(rhs, "a").filter(F.col("x") < F.col("y"))
    closing = fwd.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = und.agg(
        F.count(F.lit(1)).alias("n_edges"),
    ).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(
                (F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint")
            ).alias("n_wedges"),
        )
    )
    return counts.crossJoin(n_tri).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.round(
            F.lit(3.0)
            * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
            6,
        ).alias("clustering"),
    )


def sql_triangle_stats() -> str:
    """Textbook u<v<w three-way self-join over the stated edge list —
    an independent derivation of the same exact integers the
    degree-ordered Spark plan produces."""
    return f"""
        WITH raw AS ({sql_edges()}),
        e AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
            ) GROUP BY node
        ),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT)
                FROM deg) AS n_wedges,
               CAST(n_triangles AS BIGINT) AS n_triangles,
               round(3.0 * CAST(n_triangles AS DOUBLE)
                     / (SELECT CAST(sum(deg * (deg - 1) // 2) AS DOUBLE)
                        FROM deg), 6) AS clustering
        FROM tri
    """


# ---------------------------------------------------------------------------
# T127 — HITS hubs & authorities
# ---------------------------------------------------------------------------
#
# Kleinberg's HITS complements PageRank on a crawl graph: authority
# separates linked-TO quality pages from the hub/list pages that link
# to them — a cheap prior for "is this a content page or a directory".
# Same loop discipline as ``pagerank``: each half-iteration is ONE
# shuffle of (node, score) pairs with map-side partial sums; scores
# round to ITER_ROUND decimals every half-iteration IN BOTH ENGINES so
# float-sum association drift cannot accumulate; normalization is by
# max() (order-independent, unlike an L2 norm's float sum), keeping
# the fixed-iteration mirror exact.  The loop-invariant edge list is
# lazily localCheckpoint'd once (the T36 lesson: otherwise every
# round re-derives the regex extraction).

def hits_scores(
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 3,
) -> DataFrame:
    """(node, hub, authority) after ``n_iter`` max-normalized HITS
    iterations over nodes 0..n_nodes-1 (6dp output, ITER_ROUND
    internal).  ``n_iter`` must be >= 1: with zero iterations there is
    no authority vector to report (the SQL mirror has the same
    floor)."""
    if n_iter < 1:
        raise ValueError(f"hits_scores needs n_iter >= 1, got {n_iter}")
    spark = edges.sparkSession
    e = edges.localCheckpoint(eager=False)
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    hubs = nodes.withColumn("h", F.lit(1.0))
    for _ in range(n_iter):
        # authority = normalized inbound hub mass
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.round(F.sum("h"), ITER_ROUND).alias("a_raw"))
        )
        a_max = a_raw.agg(F.max("a_raw").alias("m"))
        auths = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_max))
            .select(
                "node",
                F.round(
                    F.coalesce("a_raw", F.lit(0.0)) / F.col("m"), ITER_ROUND
                ).alias("a"),
            )
        )
        # hub = normalized outbound authority mass
        h_raw = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.round(F.sum("a"), ITER_ROUND).alias("h_raw"))
        )
        h_max = h_raw.agg(F.max("h_raw").alias("m"))
        hubs = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_max))
            .select(
                "node",
                F.round(
                    F.coalesce("h_raw", F.lit(0.0)) / F.col("m"), ITER_ROUND
                ).alias("h"),
            )
        )
        auths_final = auths
    return (
        hubs.join(auths_final, "node")
        .select(
            "node",
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
    )


def sql_hits_scores(n_iter: int = 3) -> str:
    """The same fixed max-normalized iterations as chained CTEs."""
    if n_iter < 1:
        raise ValueError(f"sql_hits_scores needs n_iter >= 1, got {n_iter}")
    parts = [
        f"WITH edges AS ({sql_edges()}),",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes)",
    ]
    prev_h = "h0"
    for i in range(n_iter):
        t = i + 1
        parts.append(f""", a{t}raw AS (
            SELECT e.dst AS node,
                   round(sum(p.h), {ITER_ROUND}) AS a_raw
            FROM edges e JOIN {prev_h} p ON p.node = e.src
            GROUP BY e.dst
        ), a{t} AS (
            SELECT n.node,
                   round(COALESCE(r.a_raw, CAST(0.0 AS DOUBLE))
                         / (SELECT max(a_raw) FROM a{t}raw),
                         {ITER_ROUND}) AS a
            FROM nodes n LEFT JOIN a{t}raw r ON r.node = n.node
        ), h{t}raw AS (
            SELECT e.src AS node,
                   round(sum(p.a), {ITER_ROUND}) AS h_raw
            FROM edges e JOIN a{t} p ON p.node = e.dst
            GROUP BY e.src
        ), h{t} AS (
            SELECT n.node,
                   round(COALESCE(r.h_raw, CAST(0.0 AS DOUBLE))
                         / (SELECT max(h_raw) FROM h{t}raw),
                         {ITER_ROUND}) AS h
            FROM nodes n LEFT JOIN h{t}raw r ON r.node = n.node
        )""")
        prev_h = f"h{t}"
    parts.append(f"""
        SELECT n.node, round(h.h, 6) AS hub, round(a.a, 6) AS authority
        FROM nodes n
        JOIN {prev_h} h ON h.node = n.node
        JOIN a{n_iter} a ON a.node = n.node
    """)
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# T132 — graph health: reciprocity + degree assortativity
# ---------------------------------------------------------------------------
#
# Two one-number audits a crawl-graph release reports next to its
# degree histogram: RECIPROCITY (fraction of directed edges whose
# reverse also exists — organic webs sit low, link-exchange farms
# high) and degree ASSORTATIVITY (Newman 2002: Pearson correlation of
# endpoint degrees over edges — the web is famously disassortative;
# a positive shift flags synthetic link blocks).  Both reduce to
# EXACT bigint sums over the edge list (a left-semi self-join for
# reciprocal pairs, degree joins for the moment sums) followed by one
# fixed-shape float formula — deterministic under any partitioning
# and mirrored verbatim in SQL.

def graph_health(edges: DataFrame) -> DataFrame:
    """One row: (n_edges, n_reciprocal, reciprocity, assortativity)
    over the simple directed graph (self-loops and duplicate edges
    dropped).  Assortativity uses total degree in the undirected
    sense, correlated across both orientations of each edge."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    und = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dy"))
    # both orientations of every undirected edge -> symmetric moments
    pairs = und.join(du, "u").join(dv, "v")
    both = pairs.select(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    ).unionAll(pairs.select(F.col("dy").alias("x"), F.col("dx").alias("y")))
    m = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") / n - sx / n * (sy / n)
    vx = F.col("sxx").cast("double") / n - sx / n * (sx / n)
    vy = F.col("syy").cast("double") / n - sy / n * (sy / n)
    assort = F.when(
        (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
    )
    return (
        n_edges.crossJoin(n_recip)
        .crossJoin(m)
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_reciprocal").cast("bigint").alias("n_reciprocal"),
            F.round(
                F.col("n_reciprocal").cast("double")
                / F.col("n_edges").cast("double"),
                6,
            ).alias("reciprocity"),
            assort.alias("assortativity"),
        )
    )


def sql_graph_health() -> str:
    return f"""
        WITH raw AS ({sql_edges()}),
        e AS (
            SELECT DISTINCT src, dst FROM raw WHERE src <> dst
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM e
        ),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
            ) GROUP BY node
        ),
        pairs AS (
            SELECT x.deg AS dx, y.deg AS dy
            FROM und JOIN deg x ON x.node = und.u
                     JOIN deg y ON y.node = und.v
        ),
        edge_ends AS (
            SELECT dx AS x, dy AS y FROM pairs
            UNION ALL SELECT dy AS x, dx AS y FROM pairs
        ),
        m AS (
            SELECT count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM edge_ends
        ),
        r AS (
            SELECT (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM e a
                    WHERE EXISTS (SELECT 1 FROM e b
                                  WHERE b.src = a.dst AND b.dst = a.src))
                       AS n_reciprocal
        )
        SELECT CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
               round(CAST(n_reciprocal AS DOUBLE)
                     / CAST(n_edges AS DOUBLE), 6) AS reciprocity,
               CASE WHEN (CAST(sxx AS DOUBLE) / n
                          - CAST(sx AS DOUBLE) / n * (CAST(sx AS DOUBLE) / n))
                         > 0
                     AND (CAST(syy AS DOUBLE) / n
                          - CAST(sy AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))
                         > 0
                    THEN round(
                        (CAST(sxy AS DOUBLE) / n
                         - CAST(sx AS DOUBLE) / n * (CAST(sy AS DOUBLE) / n))
                        / sqrt((CAST(sxx AS DOUBLE) / n
                                - CAST(sx AS DOUBLE) / n
                                  * (CAST(sx AS DOUBLE) / n))
                               * (CAST(syy AS DOUBLE) / n
                                  - CAST(sy AS DOUBLE) / n
                                    * (CAST(sy AS DOUBLE) / n))), 6)
               END AS assortativity
        FROM r, m
    """


# ---------------------------------------------------------------------------
# T172 — label-propagation communities (deterministic synchronous LPA)
# ---------------------------------------------------------------------------

# Community structure is the link-graph signal the per-node scores
# (degree, PageRank, HITS) cannot see: an SEO link farm is a *dense
# block*, a mirror network is a *clique*, and a healthy topical web is
# many medium communities.  Classic LPA is order-dependent; this is
# the deterministic synchronous variant: every node simultaneously
# adopts its neighbors' (most frequent, then smallest) label, a fixed
# number of rounds.  The (count DESC, label ASC) argmax is packed into
# ONE decimal(38,0) (Spark) / HUGEINT (DuckDB) — key = n_votes * 2^62
# + (2^62 - 1 - label) — so both vote reduction steps are plain max()
# aggregations with map-side partial combine (16-byte accumulator),
# bit-identical across engines, no window sort.  The pack is 2^62, not
# 2^32: labels are dense node ids (spark.range), so label < 2^62 holds
# for any corpus, while a 2^32 stride silently corrupts the tie-break
# beyond 4.3e9 nodes — the exact regime the op's scale note claims.

LPA_ITERS = 2
_LPA_PACK = 1 << 62


def lpa_communities(edges: DataFrame, n_nodes: int, n_iter: int = LPA_ITERS) -> DataFrame:
    """(community_size, n_communities): size histogram of the label-
    propagation communities after ``n_iter`` synchronous rounds over
    the undirected link graph.

    Scale shape: per round, (1) vote count — groupBy(dst, label) with
    partial agg, one shuffle of 24-byte rows; (2) argmax — groupBy(dst)
    max(packed decimal), partial-combined, 16-byte rows.  Labels and
    votes never carry page bytes; rounds are a fixed constant, and the
    loop-invariant undirected edge list is localCheckpoint-truncated
    exactly like the PageRank loop (at production scale, materialize
    the edge table to storage once instead).  The output is the
    bounded size histogram — at 10^12 nodes the (community, size)
    table itself is data-scale and stays distributed; only the
    histogram (≤ distinct sizes) comes back.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = edges.sparkSession
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(n_iter):
        votes = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        packed = votes.groupBy("node").agg(
            F.max(
                F.col("n").cast("decimal(38,0)") * F.lit(_LPA_PACK)
                + (F.lit(_LPA_PACK - 1) - F.col("label"))
            ).alias("key")
        )
        winner = packed.select(
            "node",
            (F.lit(_LPA_PACK - 1) - F.col("key") % F.lit(_LPA_PACK))
            .cast("bigint")
            .alias("label"),
        )
        # isolated nodes (none under the linked_pages construction,
        # but the operator must not silently drop them) keep their own
        labels = nodes.join(winner, "node", "left").select(
            "node", F.coalesce("label", F.col("node")).alias("label")
        )
        if i + 1 < n_iter:
            labels = labels.localCheckpoint(eager=False)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        sizes.groupBy("community_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
        .orderBy("community_size")
    )


def sql_lpa_communities(n_iter: int = LPA_ITERS) -> str:
    """The same fixed rounds as chained CTEs, same HUGEINT packing."""
    pack = _LPA_PACK
    parts = [
        f"WITH e0 AS ({sql_edges()}),",
        """und AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM e0
                UNION ALL
                SELECT dst AS src, src AS dst FROM e0
            ) WHERE src <> dst
        ),""",
        "nodes AS (SELECT doc_id AS node FROM documents),",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f""", v{i + 1} AS (
                SELECT und.dst AS node, l.label,
                       CAST(count(*) AS BIGINT) AS n
                FROM und JOIN l{i} l ON und.src = l.node
                GROUP BY und.dst, l.label
            ), w{i + 1} AS (
                SELECT node,
                       max(CAST(n AS HUGEINT) * {pack}
                           + ({pack - 1} - label)) AS key
                FROM v{i + 1} GROUP BY node
            ), l{i + 1} AS (
                SELECT n.node,
                       COALESCE(CAST({pack - 1} - (w.key % {pack})
                                     AS BIGINT), n.node)
                           AS label
                FROM nodes n LEFT JOIN w{i + 1} w ON n.node = w.node
            )"""
        )
    parts.append(
        f""", sizes AS (
            SELECT label, CAST(count(*) AS BIGINT) AS community_size
            FROM l{n_iter} GROUP BY label
        )
        SELECT community_size,
               CAST(count(*) AS BIGINT) AS n_communities
        FROM sizes GROUP BY community_size"""
    )
    return "\n".join(parts)
