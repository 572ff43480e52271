"""Connected-components clustering for near-duplicate groups.

LSH candidate *pairs* (``dedup.minhash_candidate_pairs``) are only half
of corpus deduplication: chains of pairwise near-dups (A~B, B~C) must
collapse into one cluster so exactly one canonical document survives.
The reference has no notion of this (its only uniqueness is
`INSERT OR REPLACE` on (task_id, page), models/database.py:860-869);
this is the standard web-corpus step between candidate generation and
"keep one per cluster".

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
shuffle-native CC algorithm. Each round is one groupBy per star
operation (no joins, no driver-side graph), and the edge set converges
to per-component stars centered on the component's minimum node id in
O(log^2 n) rounds regardless of graph diameter — a plain min-label
propagation loop needs O(diameter) rounds, which on a 10^12-row crawl
with long mutation chains is unbounded. Per-round state is
checkpointed (``localCheckpoint``) to truncate the growing lineage;
on a real cluster flip to reliable ``checkpoint`` with a checkpoint
dir.

Scale shape per round: symmetrize (map-only) -> groupBy(u) collecting
neighbor sets -> explode star edges -> distinct. The neighbor-set
collect is the textbook skew point: after the first large-star round,
high-degree hubs are exactly the component minima, and their neighbor
lists are the component membership lists — bounded by component size,
the same bound any CC output must materialize anyway.

DuckDB oracle: a recursive CTE propagating min-reachable-label
(``sql_neardup_clusters``), so Spark's star-convergence and the
oracle's transitive closure must agree bit-for-bit on cluster ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators import dedup

# Alternating star converges in O(log^2 n) rounds; 25 covers n ~ 2^5000.
# The loop exits on the first stable round, so this is a runaway guard,
# not a tuning knob.
MAX_CC_ROUNDS = 25


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: every edge in both orientations, no self loops.

    Deliberately NOT distinct: every consumer is a
    ``groupBy(collect_set)``/``groupBy(min)``, which dedups for free —
    a distinct here would be one extra full shuffle per call for
    nothing (measured ~2x the per-round cost at toy scale, and pure
    shuffle-volume waste at crawl scale)."""
    return (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u}).

    Output is not distinct-ed: it feeds ``_small_star``, whose
    ``collect_set`` dedups. Per round the only shuffles are the two
    star groupBys plus the output distinct in ``_small_star``."""
    grouped = _symmetrize(edges).groupBy("u").agg(
        F.collect_set("v").alias("nbrs")
    )
    m = F.least(F.array_min("nbrs"), F.col("u"))
    return grouped.select(
        F.explode(
            F.filter("nbrs", lambda v: v > F.col("u"))
        ).alias("u"),
        m.alias("v"),
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect u and its smaller neighbors
    to the minimum of that neighborhood."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    grouped = directed.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.array_min("nbrs")  # nbrs are all < u, so min includes the center
    members = F.array_union(
        F.filter("nbrs", lambda v: v != F.array_min("nbrs")),
        F.array(F.col("u")),
    )
    return (
        grouped.select(
            F.explode(members).alias("node"), m.alias("center")
        )
        .select(F.col("node").alias("u"), F.col("center").alias("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple:
    """Convergence probe: (count, sum(xxhash64(u, v))). Star rounds
    only ever re-point edges toward component minima, so a stable
    checksum across one full L+S round means a stable edge set. The
    hash sum is order- and partitioning-independent (integer sum) and
    collision-resistant in practice — unlike the previous
    (sum(u), sum(v)) pair, which two different edge sets could alias."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: a bigint sum of 64-bit hashes overflows
        # under ANSI mode
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_CC_ROUNDS
) -> DataFrame:
    """nodes(node) + edges(u, v) -> (node, component) where component
    is the minimum node id reachable from ``node``.

    Isolated nodes (no incident edge) label themselves. One Spark
    action per round (the convergence checksum); all data movement is
    groupBy shuffles — nothing graph-shaped ever reaches the driver.
    """
    cur = edges.select("u", "v").filter(F.col("u") != F.col("v")).distinct()
    # lazy checkpoint: the convergence checksum is the action that
    # materializes it, so each round costs ONE job, not an eager
    # materialization plus a checksum over it.  No checksum of the
    # INPUT: the first comparison happens after round 1, saving one
    # whole-input job per call (an already-converged input — which a
    # candidate-pair edge set never is — would cost one extra round,
    # the cheaper trade everywhere it matters).
    cur = cur.localCheckpoint(eager=False)
    prev_sig = None
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig = _checksum(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    comp = (
        _symmetrize(cur)
        .groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("nbr_min")).alias("component"),
        )
    )
    return (
        nodes.select("node")
        .distinct()
        .join(comp, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def neardup_clusters(
    corpus: DataFrame, max_bucket: int = dedup.MAX_MINHASH_BUCKET
) -> DataFrame:
    """corpus(doc_id, text) -> (doc_id, cluster_id, is_canonical):
    transitive closure of the MinHash-LSH candidate pairs, cluster id =
    min doc_id of the component, canonical = that minimum (the doc a
    keep-one-per-cluster dedup retains)."""
    pairs = dedup.minhash_candidate_pairs(corpus, max_bucket)
    cc = connected_components(
        corpus.select(F.col("doc_id").alias("node")),
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
    )
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )


def cluster_representatives(
    corpus: DataFrame,
    max_bucket: int = dedup.MAX_MINHASH_BUCKET,
    clusters: DataFrame = None,
) -> DataFrame:
    """(cluster_id, n_docs, rep_doc, rep_len): keep-BEST-per-cluster
    dedup — instead of the min-id canonical, each near-dup cluster
    keeps its highest-quality member (longest text, ties to the lower
    doc_id; the production policy swaps in any scalar quality score).

    Scale shape: one extra map-side-combinable ``max(struct)`` agg on
    top of the CC output — the argmax never materializes a cluster's
    member list.  Pass ``clusters`` (a prior neardup_clusters result)
    to reuse an already-computed CC table instead of re-running the
    minhash + star rounds."""
    if clusters is None:
        clusters = neardup_clusters(corpus, max_bucket)
    scored = clusters.join(
        corpus.select("doc_id", F.length("text").alias("len")), "doc_id"
    )
    best = scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(
            F.struct(
                F.col("len").alias("len"),
                (-F.col("doc_id")).alias("negid"),
            )
        ).alias("b"),
    )
    return best.select(
        "cluster_id",
        "n_docs",
        (-F.col("b.negid")).alias("rep_doc"),
        F.col("b.len").cast("bigint").alias("rep_len"),
    )


def sql_cluster_representatives() -> str:
    return f"""
        WITH RECURSIVE corpus AS ({dedup.sql_neardup_corpus()}),
        shingled AS (
            SELECT doc_id, {dedup.sql_shingles('text')} AS sh FROM corpus
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {dedup.MINHASH_BANDS})) AS band,
                   unnest({dedup.sql_band_keys('sh')}) AS key
            FROM shingled
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM keyed a JOIN keyed b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        walk(node, label) AS (
            SELECT doc_id, doc_id FROM corpus
            UNION
            SELECT e.src, w.label
            FROM edges e JOIN walk w ON w.node = e.dst
        ),
        clusters AS (
            SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
            FROM walk GROUP BY node
        ),
        scored AS (
            SELECT cl.cluster_id, cl.doc_id, length(c.text) AS len
            FROM clusters cl JOIN corpus c ON cl.doc_id = c.doc_id
        ),
        ranked AS (
            SELECT cluster_id, doc_id, len,
                   row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY len DESC, doc_id ASC
                   ) AS rk,
                   count(*) OVER (PARTITION BY cluster_id) AS n_docs
            FROM scored
        )
        SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
               doc_id AS rep_doc, CAST(len AS BIGINT) AS rep_len
        FROM ranked WHERE rk = 1
    """


def sql_neardup_clusters() -> str:
    """DuckDB oracle: min-reachable-label via recursive CTE over the
    same minhash candidate pairs (same shingles, same band keys)."""
    return f"""
        WITH RECURSIVE corpus AS ({dedup.sql_neardup_corpus()}),
        shingled AS (
            SELECT doc_id, {dedup.sql_shingles('text')} AS sh FROM corpus
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {dedup.MINHASH_BANDS})) AS band,
                   unnest({dedup.sql_band_keys('sh')}) AS key
            FROM shingled
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM keyed a JOIN keyed b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        walk(node, label) AS (
            SELECT doc_id, doc_id FROM corpus
            UNION
            SELECT e.src, w.label
            FROM edges e JOIN walk w ON w.node = e.dst
        )
        SELECT node AS doc_id,
               CAST(min(label) AS BIGINT) AS cluster_id,
               CAST(node = min(label) AS INTEGER) AS is_canonical
        FROM walk
        GROUP BY node
    """


# ---------------------------------------------------------------------------
# T98 — dedup survivorship funnel
# ---------------------------------------------------------------------------
#
# The governance report every dedup run ships: how many documents
# entered, how many distinct payloads exact dedup leaves, how many
# near-dup clusters (= keep-one survivors) remain.  Pure composition
# of the existing stages — three bounded aggregations unioned, no new
# shuffle shapes; the oracle recomputes each stage independently, so a
# drifting stage breaks its row.


def dedup_survivorship(corpus: DataFrame, clusters: DataFrame) -> DataFrame:
    """(stage, n_docs) rows: input -> exact -> neardup, computed from
    the planted corpus and its CC table (pass the session-shared one —
    the star rounds don't rerun)."""
    n_input = corpus.agg(
        F.lit("1_input").alias("stage"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    n_exact = corpus.agg(
        F.lit("2_exact").alias("stage"),
        F.countDistinct(F.md5(F.col("text"))).cast("bigint").alias("n_docs"),
    )
    n_near = clusters.agg(
        F.lit("3_neardup").alias("stage"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_docs"),
    )
    return n_input.unionByName(n_exact).unionByName(n_near)


def sql_dedup_survivorship() -> str:
    from ocr_spark.operators import dedup

    return f"""
        SELECT '1_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs
        FROM ({dedup.sql_neardup_corpus()})
        UNION ALL
        SELECT '2_exact', CAST(count(DISTINCT md5(text)) AS BIGINT)
        FROM ({dedup.sql_neardup_corpus()})
        UNION ALL
        SELECT '3_neardup', CAST(count(DISTINCT cluster_id) AS BIGINT)
        FROM ({sql_neardup_clusters()})
    """


# ---------------------------------------------------------------------------
# T107 — near-dup cluster size histogram
# ---------------------------------------------------------------------------
#
# The one-table summary of how duplication is distributed: mostly
# singletons (healthy crawl) vs a few giant clusters (template spam,
# mirror farms) — the governance chart printed next to the
# survivorship funnel.  Two map-side-combined aggs over the CC table;
# nothing but (cluster_id, count) moves.


def cluster_size_histogram(clusters: DataFrame) -> DataFrame:
    """(size, n_clusters, n_docs): how many clusters have each member
    count, and the docs they hold."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("size")).cast("bigint").alias("n_docs"),
    ).select(F.col("size").cast("bigint").alias("size"), "n_clusters", "n_docs")


def sql_cluster_size_histogram() -> str:
    return f"""
        WITH cc AS ({sql_neardup_clusters()}),
        sizes AS (
            SELECT cluster_id, count(*) AS size FROM cc GROUP BY cluster_id
        )
        SELECT CAST(size AS BIGINT) AS size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(count(*) * size AS BIGINT) AS n_docs
        FROM sizes GROUP BY size
    """


# ---------------------------------------------------------------------------
# T116 — duplication mass by host
# ---------------------------------------------------------------------------
#
# "WHERE does the duplication come from" — the question the histogram
# (T107) can't answer: join the CC output back to hosts and report the
# non-canonical (removable) fraction per host.  Mirror farms and
# template sites surface immediately; the output feeds the domain
# blocklist the next crawl uses.  One hash join on doc_id + one
# map-side-combined agg.


def dup_mass_by_host(
    clusters: DataFrame, hosts: DataFrame
) -> DataFrame:
    """clusters(doc_id, cluster_id, is_canonical) x hosts(doc_id, host)
    -> (host, n_docs, n_dups, dup_frac), dup = non-canonical member."""
    return (
        clusters.join(hosts, "doc_id")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("is_canonical") == 0).cast("bigint"))
            .cast("bigint")
            .alias("n_dups"),
        )
        .select(
            "host",
            "n_docs",
            "n_dups",
            F.round(
                F.col("n_dups").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def sql_dup_mass_by_host(hosts_sql: str) -> str:
    return f"""
        WITH cc AS ({sql_neardup_clusters()}),
        h AS ({hosts_sql})
        SELECT h.host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN cc.is_canonical = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dups,
               round(CAST(sum(CASE WHEN cc.is_canonical = 0 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS dup_frac
        FROM cc JOIN h ON cc.doc_id = h.doc_id
        GROUP BY h.host
    """
