"""Similarity search over embedding columns — brute-force baseline,
random-hyperplane LSH near-dup pairing, and an IVF-style probe.

The reference has no vector operations at all; these are the
training-data-pipeline ops that sit next to extraction in a crawl
pipeline (embedding-level near-dup removal, ANN retrieval).

Design for 10^12-row scale:

* **Brute-force top-k** (`__spark_entry__.q_embedding_topk`) — one
  broadcast of the query vector, a single scan, TakeOrderedAndProject;
  the baseline every approximate method is checked against.
* **Hyperplane LSH** (`neardup_pairs`) — sign-of-dot-product against
  deterministic ±1 hyperplanes, 8 planes per band x ``N_BANDS`` bands
  (OR-construction).  Candidates = vectors sharing a (band, bucket);
  the bucket groupBy/self-join shuffles on the bucket key only — no
  O(n²) pair enumeration ever materializes.  Verification recomputes
  exact cosine on the candidates.
* **IVF probe** (`ivf_topk`) — coarse quantizer = the first
  ``IVF_CENTROIDS`` vectors (deterministic stand-in for a k-means
  codebook); every vector is assigned to its nearest centroid by a
  broadcast cross join + ranking window; a query probes only its own
  centroid's inverted list (~n/C of the data).

All math is expressed with built-in higher-order functions
(zip_with / aggregate — left-fold, JVM-side) so the DuckDB oracle can
state the identical computation; hyperplanes are derived from md5 so
both engines see the same literal constants.  At production scale the
same formulas would move into an Arrow-batched pandas UDF over numpy
(`matmul` per batch); the plan shape (broadcast + bucket shuffle)
stays unchanged.

Because the driver's `embeddings` testdata has no near-dup pairs
(max natural cosine ~0.51), `neardup_corpus` plants a deterministic
perturbed copy of every vector at vec_id + ANN_OFFSET with cosine
~0.989 to its original; threshold 0.9 then separates planted pairs
from natural ones exactly.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
PLANES_PER_BAND = 8
N_BANDS = 4
ANN_OFFSET = 1_000_000
PERTURB = 0.15 / 8.0  # per-component magnitude; ~0.989 cosine to original
NEARDUP_THRESHOLD = 0.9
IVF_CENTROIDS = 16


def _sign(seed: str) -> float:
    return 1.0 if hashlib.md5(seed.encode()).digest()[0] & 1 else -1.0


def plane(j: int, dim: int = EMB_DIM) -> List[float]:
    """Deterministic ±1 hyperplane ``j`` (seeded by md5, engine-neutral)."""
    return [_sign(f"plane:{j}:{d}") for d in range(dim)]


def perturb_vector(dim: int = EMB_DIM) -> List[float]:
    """The deterministic offset added to make each planted near-dup."""
    return [PERTURB * _sign(f"perturb:{d}") for d in range(dim)]


def _lit_array(values: List[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def dot_col(vec: Column, other: Column) -> Column:
    """Left-fold dot product in double precision (same association
    order as the SQL mirror, so both engines produce identical bits)."""
    return F.aggregate(
        F.zip_with(vec, other, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (
        F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b))
    )


def bucket_col(vec: Column, band: int) -> Column:
    """LSH bucket id for one band: 8 sign bits packed into an int."""
    out = F.lit(0)
    for j in range(PLANES_PER_BAND):
        p = _lit_array(plane(band * PLANES_PER_BAND + j))
        out = out + F.when(dot_col(vec, p) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return out


def neardup_corpus(emb: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding) + planted perturbed copies."""
    pv = _lit_array(perturb_vector())
    orig = emb.select("vec_id", "embedding")
    mut = emb.select(
        (F.col("vec_id") + F.lit(ANN_OFFSET)).alias("vec_id"),
        F.zip_with(
            F.col("embedding"), pv, lambda x, y: x.cast("double") + y
        ).alias("embedding"),
    )
    return orig.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(mut)


# A single degenerate (band, bucket) key — e.g. near-zero vectors all
# hashing to the same sign pattern — must not blow up one executor row
# with O(m^2) pair structs; buckets above this size are skipped (use
# oversize_lsh_buckets to audit what was dropped).
MAX_LSH_BUCKET = 1024


def _lsh_keyed(corpus: DataFrame) -> DataFrame:
    """(vec_id, band, bucket) — one row per vector per band."""
    buckets = F.array(
        *[bucket_col(F.col("embedding"), b) for b in range(N_BANDS)]
    )
    return corpus.select(
        "vec_id", F.posexplode(buckets).alias("band", "bucket")
    )


def neardup_pairs(
    corpus: DataFrame, max_bucket: int = MAX_LSH_BUCKET
) -> DataFrame:
    """Candidate pairs sharing >=1 LSH band bucket, verified by exact
    cosine >= NEARDUP_THRESHOLD. Returns (vec_a, vec_b, cos_sim).

    Plan shape (the dedup.minhash_candidate_pairs pattern): signatures
    are computed ONCE per vector (a self-join of the keyed relation
    would recompute all 32 hyperplane dot products for its second
    input and shuffle full embeddings x N_BANDS); bucket members are
    collected per (band, bucket) and (a < b) pairs expanded with array
    combinatorics, then embeddings are joined back only for the
    candidate pairs — the shuffle carries (vec_id, band, bucket)
    triples and, for the verify join, one embedding per candidate
    side (AQE broadcasts the candidate side when it is small).
    """
    members = (
        _lsh_keyed(corpus)
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
            ),
        )
    )
    cand = (
        members.select(F.explode(combos).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )
    emb_a = corpus.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    emb_b = corpus.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    cos = cosine_col(F.col("emb_a"), F.col("emb_b"))
    return (
        cand.join(emb_a, "vec_a")
        .join(emb_b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= F.lit(NEARDUP_THRESHOLD))
    )


def oversize_lsh_buckets(
    corpus: DataFrame, max_bucket: int = MAX_LSH_BUCKET
) -> DataFrame:
    """Audit companion to neardup_pairs: the (band, bucket, n_members)
    rows that were skipped by the bucket-size cap — 'logging the drop'
    as data instead of silently truncating coverage."""
    return (
        _lsh_keyed(corpus)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket)
    )


def ivf_assignments(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid): nearest of the IVF_CENTROIDS
    coarse centroids by cosine.

    The codebook (16 vectors) is pulled to the driver — a bounded
    16-row collect, the IVF equivalent of broadcasting a trained
    k-means model — and inlined as literal arrays, so the assignment
    is a single array expression per row: all centroid cosines in one
    array, argmax positionally. Zero shuffle, zero row blow-up (the
    previous cross-join + ranking-window shape pushed 16x the rows
    through an Exchange just to take an argmin — fatal at 10^12 rows).

    Ties break toward the lowest centroid id: array_position returns
    the FIRST index of the max, and the literals are ordered by
    centroid id ascending (same as the ORDER BY ccos DESC, centroid
    ASC of the SQL mirror).
    """
    codebook = sorted(
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < IVF_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    )
    return assign_to_codebook(emb, codebook)


def assign_to_codebook(emb: DataFrame, codebook) -> DataFrame:
    """(vec_id, embedding, centroid): nearest codebook entry by
    rounded cosine — one array expression per row (all centroid
    cosines in one array, argmax positionally), zero shuffle, zero
    blow-up.  ``codebook`` is a bounded list of (id, vector)."""
    coses = F.array(
        *[
            F.round(cosine_col(F.col("embedding"), _lit_array(cvec)), 6)
            for _, cvec in codebook
        ]
    )
    ids = F.array(*[F.lit(int(cid)) for cid, _ in codebook])
    best = F.element_at(ids, F.array_position(coses, F.array_max(coses)).cast("int"))
    return emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
        best.alias("centroid"),
    )


def kmeans_inertia(emb: DataFrame, codebook) -> DataFrame:
    """(centroid, n_vecs, mean_cos, min_cos): the training-quality
    audit every clustering run reports — per-cluster size and cosine
    cohesion against the trained codebook.  A centroid whose mean_cos
    collapses (or whose n_vecs is 1) flags a bad init or a dead
    cluster before the codebook ships to the IVF index.

    Scale shape: the same zero-shuffle literal-codebook argmax as
    assign_to_codebook (cosines to all k centroids in one array
    expression per row), cosine fixed to integer micro-units in-row,
    then ONE map-side-combined agg to <= k rows.  Empty clusters are
    absent in both engines by construction."""
    coses = F.array(
        *[
            F.round(cosine_col(F.col("embedding"), _lit_array(cvec)), 6)
            for _, cvec in codebook
        ]
    )
    raw = F.array(
        *[
            cosine_col(F.col("embedding"), _lit_array(cvec))
            for _, cvec in codebook
        ]
    )
    ids = F.array(*[F.lit(int(cid)) for cid, _ in codebook])
    pos = F.array_position(coses, F.array_max(coses)).cast("int")
    cos_micro = F.round(F.element_at(raw, pos) * 1_000_000).cast("bigint")
    assigned = emb.select(
        F.element_at(ids, pos).alias("centroid"),
        cos_micro.alias("cos_micro"),
    )
    return assigned.groupBy("centroid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(
            F.sum("cos_micro").cast("double")
            / F.count(F.lit(1))
            / F.lit(1_000_000),
            6,
        ).alias("mean_cos"),
        F.round(
            F.min("cos_micro").cast("double") / F.lit(1_000_000), 6
        ).alias("min_cos"),
    )


# Rounding applied to every trained centroid component IN BOTH ENGINES
# each iteration: partial-sum association order (numpy per-partition
# sums merged on the driver vs DuckDB's sequential avg) differs in the
# last float bits, and without per-iteration rounding that drift feeds
# into the next assignment round and compounds.
KMEANS_ROUND = 6


def kmeans_train(
    emb: DataFrame, k: int = IVF_CENTROIDS, n_iter: int = 3
) -> list:
    """Lloyd's k-means over the embedding column — the trained
    codebook the IVF probe should use instead of the first-k stand-in.

    Spark shape per iteration (the MLlib KMeans pattern):

    1. **Assign + partial-reduce in ONE Arrow pass** — the codebook
       rides into a ``mapInPandas`` kernel as a task-closure constant;
       each batch picks per-row argmax-rounded-cosine centroids with
       the fold-exact numpy kernels (bit-identical to the
       ``assign_to_codebook`` expression and the SQL mirror's tie
       rule) and immediately collapses to (centroid, count,
       component-sums): the full corpus reduces to ≤ n_partitions × k
       tiny rows before anything moves — zero shuffle, zero extra
       scan.
    2. **Merge** — those bounded rows come to the driver (the same
       justified collect as a trained-model broadcast) and new means
       are computed and rounded to KMEANS_ROUND decimals.

    Empty clusters keep their previous centroid.  Returns the codebook
    as a sorted list of (centroid_id, vector).
    """
    import numpy as np
    import pandas as pd

    init = sorted(
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    # centroid ids are 0..k-1 in sorted-vec_id order
    codebook = [(i, vec) for i, (_, vec) in enumerate(init)]
    dim = len(codebook[0][1])

    def make_partials(book):
        ids = np.asarray([int(c) for c, _ in book], dtype=np.int64)

        def partials(batches):
            for b in batches:
                if not len(b):
                    continue
                mat = _np_stack(b["embedding"])
                cents = ids[_np_rounded_cos(mat, book).argmax(axis=1)]
                rows = []
                for c in np.unique(cents):
                    sel = mat[cents == c]
                    rows.append(
                        (int(c), len(sel), sel.sum(axis=0).tolist())
                    )
                yield pd.DataFrame(
                    rows, columns=["centroid", "n", "vsum"]
                )

        return partials

    for _ in range(n_iter):
        rows = emb.select("embedding").mapInPandas(
            make_partials(codebook),
            "centroid int, n bigint, vsum array<double>",
        ).collect()
        sums = {cid: (0, np.zeros(dim)) for cid, _ in codebook}
        for r in sorted(rows, key=lambda r: r.centroid):
            n0, v0 = sums[r.centroid]
            sums[r.centroid] = (n0 + r.n, v0 + np.asarray(r.vsum))
        codebook = [
            (
                cid,
                np.round(v / n, KMEANS_ROUND).tolist() if n else prev,
            )
            for (cid, prev), (n, v) in (
                (entry, sums[entry[0]]) for entry in codebook
            )
        ]
    return codebook


def ivf_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, codebook=None
) -> DataFrame:
    """Top-k by cosine among vectors in the query's IVF cell only.
    Returns (vec_id, cos_sim) — the approximate answer whose recall is
    checked against the brute-force baseline in tests.  Pass a
    ``kmeans_train`` codebook to probe trained cells instead of the
    first-k stand-in."""
    assigned = (
        assign_to_codebook(emb, codebook)
        if codebook is not None
        else ivf_assignments(emb)
    )
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("centroid").alias("qcentroid")
    )
    cand = assigned.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(q), F.col("centroid") == F.col("qcentroid")
    )
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    return (
        cand.select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def topk_join(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 10,
    prune_margin: int = 8,
) -> DataFrame:
    """Batch ANN retrieval: exact top-k by cosine for EVERY query in
    one corpus scan — the production retrieval pattern (the per-query
    crossJoin of `q_embedding_topk` is the 1-query special case and
    does not batch).

    Two phases:

    1. **Prune** (numpy, Arrow-batched mapInPandas): the query matrix
       (bounded — collected to the driver like a trained model) is
       broadcast into the workers; each Arrow batch computes all
       query cosines with one matmul and emits its local
       top-(k+prune_margin) ids per query. Any global top-k member is
       in its own batch's local top-k, so the union of local winners
       is a superset of the answer; the margin absorbs self-matches
       and float-ordering jitter at the boundary. Shuffle carries only
       (query_id, vec_id) pairs — n_batches x n_queries x (k+margin)
       rows, never embeddings.
    2. **Re-score** (JVM): candidates join embeddings back, cosine is
       recomputed with the deterministic left-fold (`dot_col`, same
       association order as the SQL mirror), and a ranking window over
       the tiny candidate set takes the exact top-k.
    """
    import numpy as np
    import pandas as pd

    qrows = sorted(
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([qid for qid, _ in qrows], dtype=np.int64)
    qmat = np.array([v for _, v in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    local_k = k + max(1, prune_margin)

    def prune(batches):
        for b in batches:
            ids = b["vec_id"].to_numpy()
            mat = np.array([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            scores = (mat / norms) @ qmat.T  # (n_rows, n_queries)
            m = min(local_k, len(ids))
            out_q, out_v = [], []
            for j in range(len(qids)):
                top = np.argpartition(-scores[:, j], m - 1)[:m]
                out_q.extend([qids[j]] * len(top))
                out_v.extend(ids[top])
            yield pd.DataFrame(
                {
                    "query_id": pd.array(out_q, dtype="int64"),
                    "vec_id": pd.array(out_v, dtype="int64"),
                }
            )

    cand = (
        emb.select("vec_id", "embedding")
        .mapInPandas(prune, schema="query_id bigint, vec_id bigint")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    queries = emb.filter(
        F.col("vec_id").isin([int(q) for q in query_ids])
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    scored = cand.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).join(F.broadcast(queries), "query_id")
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    return (
        scored.withColumn("cos_full", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cos_full", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------


def _sql_lit_list(values: List[float]) -> str:
    return "[" + ", ".join(f"{v!r}" for v in values) + "]"


def _sql_dot(vec_expr: str, lit_list: str) -> str:
    """Left-fold double dot product against a literal list (mirrors
    dot_col's association order via list_reduce over the products)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {EMB_DIM + 1}), "
        f"i -> CAST(({vec_expr})[i] AS DOUBLE) * ({lit_list})[i])), "
        "(acc, x) -> acc + x)"
    )


def _sql_dot_cols(a_expr: str, b_expr: str, dim: int = EMB_DIM) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> CAST(({a_expr})[i] AS DOUBLE) * CAST(({b_expr})[i] AS DOUBLE))), "
        "(acc, x) -> acc + x)"
    )


def _sql_cosine(a_expr: str, b_expr: str, dim: int = EMB_DIM) -> str:
    return (
        f"({_sql_dot_cols(a_expr, b_expr, dim)} / "
        f"(sqrt({_sql_dot_cols(a_expr, a_expr, dim)}) * "
        f"sqrt({_sql_dot_cols(b_expr, b_expr, dim)})))"
    )


def _sql_bucket(vec_expr: str, band: int) -> str:
    terms = []
    for j in range(PLANES_PER_BAND):
        p = _sql_lit_list(plane(band * PLANES_PER_BAND + j))
        terms.append(
            f"(CASE WHEN {_sql_dot(vec_expr, p)} > 0 THEN {2**j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def sql_neardup_corpus() -> str:
    pv = _sql_lit_list(perturb_vector())
    return f"""
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
        FROM embeddings
        UNION ALL
        SELECT vec_id + {ANN_OFFSET} AS vec_id,
               list_transform(range(1, {EMB_DIM + 1}),
                   i -> CAST(embedding[i] AS DOUBLE) + ({pv})[i]) AS embedding
        FROM embeddings
    """


def sql_neardup_pairs(max_bucket: int = MAX_LSH_BUCKET) -> str:
    buckets = "[" + ", ".join(
        _sql_bucket("embedding", b) for b in range(N_BANDS)
    ) + "]"
    # ok_buckets mirrors the Spark side's degenerate-bucket cap
    # (neardup_pairs' size(ids) <= max_bucket): without it the oracle
    # would silently diverge by design on any corpus that produces an
    # oversize bucket.
    return f"""
        WITH corpus AS ({sql_neardup_corpus()}),
        keyed AS (
            SELECT vec_id, embedding,
                   unnest(range(0, {N_BANDS})) AS band,
                   unnest({buckets}) AS bucket
            FROM corpus
        ),
        ok_buckets AS (
            SELECT band, bucket FROM keyed
            GROUP BY band, bucket
            HAVING count(*) > 1 AND count(*) <= {max_bucket}
        )
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_sql_cosine('a.embedding', 'b.embedding')}, 4) AS cos_sim
        FROM keyed a
        JOIN keyed b
          ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN ok_buckets ok
          ON ok.band = a.band AND ok.bucket = a.bucket
        WHERE round({_sql_cosine('a.embedding', 'b.embedding')}, 4)
              >= {NEARDUP_THRESHOLD}
    """


def sql_topk_join(query_ids: List[int], k: int = 10) -> str:
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   {_sql_cosine('e.embedding', 'q.qvec')} AS cos_full,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_sql_cosine('e.embedding', 'q.qvec')} DESC,
                                e.vec_id ASC) AS rn
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, round(cos_full, 4) AS cos_sim
        FROM scored WHERE rn <= {k}
    """


def _sql_kmeans_parts(k: int, n_iter: int) -> list:
    """The shared Lloyd CTE chain (e, c0, a0, c1, ... c{n_iter}) —
    assignment = argmax rounded cosine (rn=1 ordered by cos DESC,
    centroid ASC, the tie rule assign_to_codebook gets from
    array_position), new centroid = per-position avg rounded to
    KMEANS_ROUND like the Spark trainer."""

    def assign(prev: str) -> str:
        cos = _sql_cosine("e.embedding", "c.cvec")
        return f"""(
            SELECT vec_id, embedding, centroid FROM (
                SELECT e.vec_id, e.embedding, c.centroid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({cos}, 6) DESC, c.centroid ASC
                       ) AS rn
                FROM e CROSS JOIN {prev} c)
            WHERE rn = 1
        )"""

    def update(prev: str, asg: str) -> str:
        return f"""(
            SELECT p.centroid, COALESCE(m.cvec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN (
                SELECT centroid,
                       list(round(avgv, {KMEANS_ROUND}) ORDER BY pos) AS cvec
                FROM (
                    SELECT a.centroid, ii.pos, avg(a.embedding[ii.pos]) AS avgv
                    FROM {asg} a,
                         (SELECT unnest(range(1, {EMB_DIM + 1})) AS pos) ii
                    GROUP BY a.centroid, ii.pos)
                GROUP BY centroid
            ) m ON p.centroid = m.centroid
        )"""

    parts = [
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
        "FROM embeddings),",
        f"""c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid,
                   embedding AS cvec
            FROM e WHERE vec_id < {k}
        )""",
    ]
    for i in range(n_iter):
        parts.append(f", a{i} AS {assign(f'c{i}')}")
        parts.append(f", c{i + 1} AS {update(f'c{i}', f'a{i}')}")
    return parts


def sql_kmeans_centroids(k: int = IVF_CENTROIDS, n_iter: int = 3) -> str:
    """The fixed Lloyd iterations as chained CTEs; output =
    (centroid, pos, val) rows of the final codebook."""
    parts = _sql_kmeans_parts(k, n_iter)
    parts.append(
        f"""
        SELECT c.centroid, ii.pos, c.cvec[ii.pos] AS val
        FROM c{n_iter} c,
             (SELECT unnest(range(1, {EMB_DIM + 1})) AS pos) ii
        """
    )
    return "\n".join(parts)


def sql_kmeans_inertia(k: int = IVF_CENTROIDS, n_iter: int = 3) -> str:
    """Training-quality audit: one more assignment pass against the
    final codebook, then per-cluster size and cohesion — the cosine
    fixed to integer micro-units before the sum so the per-cluster
    mean is exact cross-engine."""
    parts = _sql_kmeans_parts(k, n_iter)
    cos = _sql_cosine("e.embedding", "c.cvec")
    parts.append(
        f""", fin AS (
            SELECT centroid, cos_micro FROM (
                SELECT e.vec_id, c.centroid,
                       CAST(round({cos} * 1000000) AS BIGINT) AS cos_micro,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({cos}, 6) DESC, c.centroid ASC
                       ) AS rn
                FROM e CROSS JOIN c{n_iter} c)
            WHERE rn = 1
        )
        SELECT centroid,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(CAST(sum(cos_micro) AS DOUBLE) / count(*) / 1000000, 6)
                   AS mean_cos,
               round(CAST(min(cos_micro) AS DOUBLE) / 1000000, 6) AS min_cos
        FROM fin GROUP BY centroid
        """
    )
    return "\n".join(parts)


def sql_ivf_topk(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
        WITH centroids AS (
            SELECT vec_id AS centroid, embedding AS cvec
            FROM embeddings WHERE vec_id < {IVF_CENTROIDS}
        ),
        assigned AS (
            SELECT vec_id, embedding, centroid FROM (
                SELECT e.vec_id, e.embedding, c.centroid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({_sql_cosine('e.embedding', 'c.cvec')}, 6) DESC,
                                    c.centroid ASC) AS rn
                FROM embeddings e CROSS JOIN centroids c)
            WHERE rn = 1
        ),
        q AS (
            SELECT embedding AS qvec, centroid AS qcentroid
            FROM assigned WHERE vec_id = {query_vec_id}
        )
        SELECT a.vec_id,
               round({_sql_cosine('a.embedding', 'q.qvec')}, 4) AS cos_sim
        FROM assigned a, q
        WHERE a.centroid = q.qcentroid AND a.vec_id <> {query_vec_id}
        ORDER BY cos_sim DESC, a.vec_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T49 — product quantization (PQ)
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace
PQ_ITER = 2  # Lloyd rounds per sub-codebook


def pq_train(
    emb: DataFrame, m: int = PQ_M, k: int = PQ_K, n_iter: int = PQ_ITER
) -> List[list]:
    """Train one k-means codebook per embedding subspace (Jegou et al.
    2011): slice the vector into ``m`` contiguous blocks and run the
    same distributed Lloyd trainer (``kmeans_train``) on each.  A
    64-dim vector compresses to m log2(k) bits = 4 bytes at the
    defaults — the standard memory-bound ANN layout at 10^12 rows.

    Each subspace training is the kmeans_train shape: zero-shuffle
    literal-broadcast assignment, mapInPandas partial sums, bounded
    driver merge — but all m subspaces train in the SAME passes: one
    init collect and one Arrow scan per Lloyd round emit partials for
    every subspace at once (schema ``(sub, centroid, n, vsum)``),
    instead of m independent job chains re-scanning the table.  The
    per-subspace folds see the same rows in the same batch order on
    the same sliced float64 values as the sequential formulation, so
    the codebooks are bit-identical (oracle-verified); wall-clock
    drops ~m×(1+n_iter) jobs to 1+n_iter.  Returns a list of m
    codebooks."""
    import numpy as np
    import pandas as pd

    d = EMB_DIM // m
    init = sorted(
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    books = [
        [(i, vec[s * d : (s + 1) * d]) for i, (_, vec) in enumerate(init)]
        for s in range(m)
    ]

    def make_partials_all(current):
        ids_per_sub = [
            np.asarray([int(c) for c, _ in book], dtype=np.int64)
            for book in current
        ]

        def partials(batches):
            for b in batches:
                if not len(b):
                    continue
                full = _np_stack(b["embedding"])
                rows = []
                for s, book in enumerate(current):
                    mat = full[:, s * d : (s + 1) * d]
                    cents = ids_per_sub[s][
                        _np_rounded_cos(mat, book).argmax(axis=1)
                    ]
                    for c in np.unique(cents):
                        sel = mat[cents == c]
                        rows.append(
                            (s, int(c), len(sel), sel.sum(axis=0).tolist())
                        )
                yield pd.DataFrame(
                    rows, columns=["sub", "centroid", "n", "vsum"]
                )

        return partials

    for _ in range(n_iter):
        rows = emb.select("embedding").mapInPandas(
            make_partials_all(books),
            "sub int, centroid int, n bigint, vsum array<double>",
        ).collect()
        new_books = []
        for s, book in enumerate(books):
            sums = {cid: (0, np.zeros(d)) for cid, _ in book}
            for r in sorted(
                (r for r in rows if r.sub == s), key=lambda r: r.centroid
            ):
                n0, v0 = sums[r.centroid]
                sums[r.centroid] = (n0 + r.n, v0 + np.asarray(r.vsum))
            new_books.append(
                [
                    (
                        cid,
                        np.round(v / n, KMEANS_ROUND).tolist() if n else prev,
                    )
                    for (cid, prev), (n, v) in (
                        (entry, sums[entry[0]]) for entry in book
                    )
                ]
            )
        books = new_books
    return books


def pq_encode(emb: DataFrame, codebooks: List[list]) -> DataFrame:
    """(vec_id, sub, code, sub_cos): each vector's per-subspace nearest
    code (argmax rounded cosine, ties to the lowest code id) plus the
    achieved cosine — the PQ quantization-quality signal.

    All m assignments happen in ONE Arrow-batched pass: the codebooks
    ride into the numpy kernel as task-closure constants (the
    broadcast-a-trained-model pattern), the argmax is fold-exact
    vectorized numpy (see the kernel block above), and the m
    (sub, code) rows per vector are emitted in-batch — zero shuffle,
    zero join.  First-max argmax + code-id-ordered books reproduce the
    'ties to the lowest code id' rule of the SQL mirror."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    d = EMB_DIM // m
    ids_per_sub = [
        np.asarray([int(c) for c, _ in book], dtype=np.int64)
        for book in codebooks
    ]

    def encode(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_stack(b["embedding"])
            vec = b["vec_id"].to_numpy()
            frames = []
            for s, book in enumerate(codebooks):
                C = _np_rounded_cos(X[:, s * d : (s + 1) * d], book)
                pos = C.argmax(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": vec,
                            "sub": np.int64(s),
                            "code": ids_per_sub[s][pos],
                            "sub_cos": C[np.arange(len(X)), pos],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id bigint, sub bigint, code bigint, sub_cos double"
    )


def _sql_pq_parts(m: int, k: int, n_iter: int) -> list:
    """The shared PQ-training CTE list: for each of the m slices, the
    identical Lloyd iterations as sql_kmeans_centroids (argmax rounded
    cosine, per-position avg rounded to KMEANS_ROUND), ending in
    ``fin{s}`` (vec_id, sub, code, sub_cos) with the trained codebook
    left available as ``c{s}_{n_iter}``."""
    d = EMB_DIM // m

    def assign(e: str, prev: str) -> str:
        cos = _sql_cosine("e.embedding", "c.cvec", dim=d)
        return f"""(
            SELECT vec_id, embedding, centroid FROM (
                SELECT e.vec_id, e.embedding, c.centroid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({cos}, 6) DESC, c.centroid ASC
                       ) AS rn
                FROM {e} e CROSS JOIN {prev} c)
            WHERE rn = 1
        )"""

    def update(prev: str, asg: str) -> str:
        return f"""(
            SELECT p.centroid, COALESCE(m.cvec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN (
                SELECT centroid,
                       list(round(avgv, {KMEANS_ROUND}) ORDER BY pos) AS cvec
                FROM (
                    SELECT a.centroid, ii.pos, avg(a.embedding[ii.pos]) AS avgv
                    FROM {asg} a,
                         (SELECT unnest(range(1, {d + 1})) AS pos) ii
                    GROUP BY a.centroid, ii.pos)
                GROUP BY centroid
            ) m ON p.centroid = m.centroid
        )"""

    def final(e: str, prev: str, s: int) -> str:
        cos = _sql_cosine("e.embedding", "c.cvec", dim=d)
        return f"""(
            SELECT vec_id, CAST({s} AS BIGINT) AS sub,
                   CAST(centroid AS BIGINT) AS code, ccos AS sub_cos
            FROM (
                SELECT e.vec_id, c.centroid, round({cos}, 6) AS ccos,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({cos}, 6) DESC, c.centroid ASC
                       ) AS rn
                FROM {e} e CROSS JOIN {prev} c)
            WHERE rn = 1
        )"""

    parts = []
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        e = f"e{s}"
        parts.append(
            f"{e} AS (SELECT vec_id, "
            f"list_transform(embedding[{lo}:{hi}], x -> CAST(x AS DOUBLE)) "
            f"AS embedding FROM embeddings)"
        )
        parts.append(
            f"""c{s}_0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid,
                   embedding AS cvec
            FROM {e} WHERE vec_id < {k}
        )"""
        )
        for i in range(n_iter):
            parts.append(f"a{s}_{i} AS {assign(e, f'c{s}_{i}')}")
            parts.append(f"c{s}_{i + 1} AS {update(f'c{s}_{i}', f'a{s}_{i}')}")
        parts.append(f"fin{s} AS {final(e, f'c{s}_{n_iter}', s)}")
    return parts


def sql_pq_codes(
    m: int = PQ_M, k: int = PQ_K, n_iter: int = PQ_ITER
) -> str:
    """Per-subspace replay of the PQ trainer + encoder (see
    _sql_pq_parts), unioning the m per-slice assignments."""
    parts = _sql_pq_parts(m, k, n_iter)
    sels = "\nUNION ALL\n".join(f"SELECT * FROM fin{s}" for s in range(m))
    return "WITH " + ",\n".join(parts) + "\n" + sels


def _fold_dot(a: List[float], b: List[float]) -> float:
    """Driver-side dot with the SAME left-fold association as dot_col /
    the DuckDB list_reduce mirror, so literals computed here are
    bit-identical to what either engine would compute from data."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


# --- fold-exact numpy kernels -----------------------------------------------
#
# The HOF expressions (zip_with + aggregate) are NOT whole-stage-
# codegen'd — Catalyst interprets each lambda step, which is fine for
# one broadcast query vector but catastrophically slow for per-row ×
# per-code work (PQ encodes 64 sub-cosines per row).  These kernels
# move that loop into Arrow-batched numpy, vectorized ACROSS ROWS but
# accumulated dimension-by-dimension IN ORDER, so every row sees the
# exact IEEE operation sequence of the left-fold — results are
# bit-identical to dot_col / the DuckDB mirror (empirically pinned by
# the oracle-parity tests).


def _np_halfup(a, nd: int = 6):
    """Spark's ROUND_HALF_UP on doubles: away-from-zero at .5.  numpy's
    np.round is banker's; ties at exactly .5e-6 are measure-zero for
    these cosines, but the rule is matched anyway."""
    import numpy as np

    scale = 10.0**nd
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def _np_stack(col) -> "object":
    """(n, dim) float64 matrix from a pandas column of array values
    (float32 -> float64 is exact, same as the expressions' cast)."""
    import numpy as np

    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _np_fold_dot(X, v) -> "object":
    """Per-row left-fold dot of matrix X against vector v."""
    import numpy as np

    acc = np.zeros(len(X))
    for i in range(X.shape[1]):
        acc = acc + X[:, i] * np.float64(v[i])
    return acc


def _np_self_dot(X) -> "object":
    import numpy as np

    acc = np.zeros(len(X))
    for i in range(X.shape[1]):
        acc = acc + X[:, i] * X[:, i]
    return acc


def _np_rounded_cos(X, book) -> "object":
    """(n_rows, n_codes) rounded-cosine matrix of X against a codebook
    (list of (code_id, vector)), fold-exact per entry."""
    import numpy as np

    xn = np.sqrt(_np_self_dot(X))
    out = np.empty((len(X), len(book)))
    for j, (_, v) in enumerate(book):
        cn = _fold_dot(v, v)
        out[:, j] = _np_halfup(
            _np_fold_dot(X, v) / (xn * np.sqrt(cn))
        )
    return out


def assign_codebook_np(emb: DataFrame, codebook: list) -> DataFrame:
    """(vec_id, centroid): the ``assign_to_codebook`` semantics (argmax
    rounded cosine, ties to the lowest centroid id) in one fold-exact
    Arrow pass — same bits, per-batch numpy instead of interpreted HOF
    lambdas.  Zero shuffle, zero blow-up."""
    import numpy as np
    import pandas as pd

    ids = np.asarray([int(c) for c, _ in codebook], dtype=np.int64)

    def assign(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_stack(b["embedding"])
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"].to_numpy(),
                    "centroid": ids[
                        _np_rounded_cos(X, codebook).argmax(axis=1)
                    ],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id bigint, centroid bigint"
    )


def pair_cosine_np(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    emb_a: str,
    emb_b: str,
) -> DataFrame:
    """(id_a, id_b, cos_sim): rounded cosine per candidate pair,
    fold-exact vectorized — the verify kernel for candidate sets whose
    size makes interpreted per-element lambdas the bottleneck."""
    import numpy as np
    import pandas as pd

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            A = _np_stack(b[emb_a])
            B = _np_stack(b[emb_b])
            dot = np.zeros(len(A))
            for i in range(A.shape[1]):
                dot = dot + A[:, i] * B[:, i]
            cos = _np_halfup(
                dot / (np.sqrt(_np_self_dot(A)) * np.sqrt(_np_self_dot(B)))
            )
            yield pd.DataFrame(
                {id_a: b[id_a].to_numpy(), id_b: b[id_b].to_numpy(), "cos_sim": cos}
            )

    return pairs.select(id_a, id_b, emb_a, emb_b).mapInPandas(
        score, f"{id_a} bigint, {id_b} bigint, cos_sim double"
    )




def pq_adc_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    codebooks: List[list] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jegou et al.
    2011): the query stays full-precision, every corpus vector is
    represented by its m sub-codes, and the approximate cosine is a
    lookup-table sum —

        adc_cos(x) = sum_s LUT_d[s][code_s(x)]
                     / (|q| * sqrt(sum_s LUT_n[s][code_s(x)]))

    where LUT_d[s][c] = <q_s, codebook_s[c]> and LUT_n[s][c] =
    |codebook_s[c]|^2 (the reconstruction's norm, summed exactly
    because subspaces are orthogonal slices).

    Scale shape: the LUTs are m*k = 64 doubles shipped as task-closure
    constants (the broadcast-a-trained-model pattern); scoring is ONE
    Arrow-batched fold-exact numpy pass — sub-code argmax + LUT sums,
    zero shuffle, zero join — finished by TakeOrderedAndProject.  At
    10^12 rows the scan reads 4-byte codes instead of 256-byte vectors
    once codes are materialized; compose with the IVF cell filter
    (``ivf_topk``'s assignment) to probe a fraction of the corpus.
    The query fetch and training collects are bounded (1 row / k
    rows).

    Sum association is pinned left-to-right per subspace in both
    engines (see ``sql_pq_adc_topk``) so the rounded scores are
    bit-identical cross-engine.
    """
    import math

    import numpy as np
    import pandas as pd

    books = codebooks if codebooks is not None else pq_train(emb)
    m = len(books)
    d = EMB_DIM // m
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()[0]
        .embedding
    ]
    qn = math.sqrt(_fold_dot(q, q))
    lut_d = [
        np.asarray([_fold_dot(q[s * d : (s + 1) * d], v) for _, v in book])
        for s, book in enumerate(books)
    ]
    lut_n = [
        np.asarray([_fold_dot(v, v) for _, v in book]) for book in books
    ]

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_stack(b["embedding"])
            dsum = np.zeros(len(X))
            nsum = np.zeros(len(X))
            for s, book in enumerate(books):
                pos = _np_rounded_cos(
                    X[:, s * d : (s + 1) * d], book
                ).argmax(axis=1)
                dsum = dsum + lut_d[s][pos]
                nsum = nsum + lut_n[s][pos]
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"].to_numpy(),
                    "adc_cos": _np_halfup(dsum / (qn * np.sqrt(nsum))),
                }
            )

    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "embedding")
        .mapInPandas(score, "vec_id bigint, adc_cos double")
        .orderBy(F.desc("adc_cos"), F.asc("vec_id"))
        .limit(k)
    )


def sql_pq_adc_topk(
    query_vec_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_iter: int = PQ_ITER,
) -> str:
    """DuckDB replay of pq_adc_topk: the shared PQ-training CTEs, plus
    per-subspace LUT CTEs (dot/norm of every trained code vector
    against the query slice) and a left-associated m-term score
    identical bit-for-bit to the Spark expression."""
    d = EMB_DIM // m
    parts = _sql_pq_parts(m, n_codes, n_iter)
    parts.append(
        "qf AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"AS embedding FROM embeddings WHERE vec_id = {query_vec_id})"
    )
    parts.append(
        f"qn AS (SELECT {_sql_dot_cols('embedding', 'embedding')} AS n2 "
        "FROM qf)"
    )
    for s in range(m):
        dv = _sql_dot_cols("q.embedding", "c.cvec", dim=d)
        nv = _sql_dot_cols("c.cvec", "c.cvec", dim=d)
        parts.append(
            f"""lut{s} AS (
            SELECT c.centroid AS code, {dv} AS dv, {nv} AS nv
            FROM c{s}_{n_iter} c,
                 (SELECT embedding FROM e{s} WHERE vec_id = {query_vec_id}) q
        )"""
        )
    joins = " ".join(
        f"JOIN fin{s} f{s} ON f{s}.vec_id = f0.vec_id "
        f"JOIN lut{s} l{s} ON l{s}.code = f{s}.code"
        if s
        else "JOIN lut0 l0 ON l0.code = f0.code"
        for s in range(m)
    )
    dsum = "".join(
        f"l{s}.dv" if s == 0 else f" + l{s}.dv" for s in range(m)
    )
    nsum = "".join(
        f"l{s}.nv" if s == 0 else f" + l{s}.nv" for s in range(m)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT f0.vec_id,
               round(({dsum}) / (sqrt(qn.n2) * sqrt({nsum})), 6) AS adc_cos
        FROM fin0 f0 {joins} CROSS JOIN qn
        WHERE f0.vec_id <> {query_vec_id}
        ORDER BY adc_cos DESC, f0.vec_id ASC LIMIT {k}
    """
    )


# ---------------------------------------------------------------------------
# T51 — semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.95


def semantic_dedup(
    corpus: DataFrame,
    codebook: list | None = None,
    k: int = IVF_CENTROIDS,
    n_iter: int = 2,
    threshold: float = SEMDEDUP_THRESHOLD,
    max_cluster: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then within each cluster mark a vector a duplicate when its cosine
    to some LOWER-id cluster-mate reaches ``threshold``.  Returns
    (vec_id, centroid, dup_of, is_dup) with dup_of = the smallest
    qualifying witness id, -1 for survivors — each near-dup group
    keeps exactly its lowest id.

    Scale shape: assignment is the zero-shuffle codebook argmax in one
    fold-exact Arrow pass (``assign_codebook_np``); candidate
    generation reuses the per-bucket pair expansion (bucket =
    cluster), so the shuffle carries (vec_id, centroid) pairs, never
    embeddings, and the exact cosine is computed only for in-cluster
    candidate pairs — again in Arrow-batched numpy, not interpreted
    HOF lambdas.  The within-cluster pair cost is O(c^2/2) — at
    production scale k is chosen ~ n/2048 so clusters stay small, and
    ``max_cluster`` skips degenerate clusters outright (same audit
    story as the LSH caps).
    """
    books = (
        codebook
        if codebook is not None
        else kmeans_train(corpus, k=k, n_iter=n_iter)
    )
    assigned = assign_codebook_np(corpus, books)
    members = (
        assigned.groupBy("centroid")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_cluster))
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
            ),
        )
    )
    cand = members.select(F.explode(combos).alias("p")).select(
        "p.vec_a", "p.vec_b"
    )
    emb_a = corpus.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    emb_b = corpus.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    dups = (
        pair_cosine_np(
            cand.join(emb_a, "vec_a").join(emb_b, "vec_b"),
            "vec_a",
            "vec_b",
            "emb_a",
            "emb_b",
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("witness"))
        .select(F.col("vec_b").alias("vec_id"), "witness")
    )
    return (
        assigned.select("vec_id", F.col("centroid").cast("bigint").alias("centroid"))
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "centroid",
            F.coalesce("witness", F.lit(-1)).cast("bigint").alias("dup_of"),
            F.col("witness").isNotNull().alias("is_dup"),
        )
    )


def sql_semantic_dedup(
    k: int = IVF_CENTROIDS,
    n_iter: int = 2,
    threshold: float = SEMDEDUP_THRESHOLD,
    max_cluster: int = MAX_LSH_BUCKET,
) -> str:
    """DuckDB replay of semantic_dedup over the planted near-dup
    corpus: the sql_kmeans_centroids Lloyd chain retargeted at the
    corpus CTE, final assignment, then within-cluster pairwise cosine
    with the same rounding/tie rules."""
    asg_cos = _sql_cosine("e.embedding", "c.cvec")

    def assign(prev: str) -> str:
        return f"""(
            SELECT vec_id, embedding, centroid FROM (
                SELECT e.vec_id, e.embedding, c.centroid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round({asg_cos}, 6) DESC, c.centroid ASC
                       ) AS rn
                FROM e CROSS JOIN {prev} c)
            WHERE rn = 1
        )"""

    def update(prev: str, asg: str) -> str:
        return f"""(
            SELECT p.centroid, COALESCE(m.cvec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN (
                SELECT centroid,
                       list(round(avgv, {KMEANS_ROUND}) ORDER BY pos) AS cvec
                FROM (
                    SELECT a.centroid, ii.pos, avg(a.embedding[ii.pos]) AS avgv
                    FROM {asg} a,
                         (SELECT unnest(range(1, {EMB_DIM + 1})) AS pos) ii
                    GROUP BY a.centroid, ii.pos)
                GROUP BY centroid
            ) m ON p.centroid = m.centroid
        )"""

    parts = [
        f"e AS ({sql_neardup_corpus()})",
        f"""c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid,
                   embedding AS cvec
            FROM e WHERE vec_id < {k}
        )""",
    ]
    for i in range(n_iter):
        parts.append(f"a{i} AS {assign(f'c{i}')}")
        parts.append(f"c{i + 1} AS {update(f'c{i}', f'a{i}')}")
    pair_cos = _sql_cosine("a.embedding", "b.embedding")
    parts.append(f"fin AS {assign(f'c{n_iter}')}")
    # ok_clusters mirrors the Spark side's degenerate-cluster cap
    # (semantic_dedup's size(ids) <= max_cluster) so the oracle cannot
    # silently diverge on an oversize cluster.
    parts.append(
        f"""ok_clusters AS (
            SELECT centroid FROM fin
            GROUP BY centroid
            HAVING count(*) > 1 AND count(*) <= {max_cluster}
        )"""
    )
    parts.append(
        f"""dups AS (
            SELECT b.vec_id, min(a.vec_id) AS witness
            FROM fin a
            JOIN fin b
              ON a.centroid = b.centroid AND a.vec_id < b.vec_id
            JOIN ok_clusters ok ON ok.centroid = a.centroid
            WHERE round({pair_cos}, 6) >= {threshold}
            GROUP BY b.vec_id
        )"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
        SELECT f.vec_id, CAST(f.centroid AS BIGINT) AS centroid,
               CAST(COALESCE(d.witness, -1) AS BIGINT) AS dup_of,
               d.witness IS NOT NULL AS is_dup
        FROM fin f LEFT JOIN dups d ON f.vec_id = d.vec_id
    """
    )


# ---------------------------------------------------------------------------
# T52 — persisted IVF-PQ index (centroid-partitioned code table)
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    coarse: list | None = None,
    codebooks: List[list] | None = None,
    k_coarse: int = IVF_CENTROIDS,
    n_iter: int = 2,
) -> dict:
    """Materialize an IVF-PQ index: one parquet table (vec_id, codes)
    PARTITIONED BY centroid, plus a ``_codebooks.json`` sidecar holding
    the trained coarse + product codebooks (underscore-prefixed files
    are invisible to Spark's reader; on a real deployment this is a
    catalog/table-property entry).

    Scale shape: training collects only bounded codebook rows; the
    index write is ONE fold-exact Arrow pass (coarse argmax + m code
    argmaxes per batch, codebooks as task-closure constants) into a
    partitioned write — each inverted list IS a partition directory,
    so a probe's cell filter becomes partition pruning at the source
    (no data read outside the probed cells).  At 10^12 rows the index
    is ~1-2% the corpus bytes.
    """
    import json

    import numpy as np
    import pandas as pd

    coarse = (
        coarse
        if coarse is not None
        else kmeans_train(emb, k=k_coarse, n_iter=n_iter)
    )
    books = codebooks if codebooks is not None else pq_train(emb)
    m = len(books)
    d = EMB_DIM // m
    coarse_ids = np.asarray([int(c) for c, _ in coarse], dtype=np.int32)
    code_ids = [
        np.asarray([int(c) for c, _ in book], dtype=np.int32)
        for book in books
    ]

    def encode(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_stack(b["embedding"])
            cents = coarse_ids[_np_rounded_cos(X, coarse).argmax(axis=1)]
            codes = np.stack(
                [
                    code_ids[s][
                        _np_rounded_cos(
                            X[:, s * d : (s + 1) * d], book
                        ).argmax(axis=1)
                    ]
                    for s, book in enumerate(books)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"].to_numpy(),
                    "codes": list(codes),
                    "centroid": cents,
                }
            )

    idx = emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id bigint, codes array<int>, centroid int"
    )
    idx.write.mode("overwrite").partitionBy("centroid").parquet(path)
    meta = {"coarse": coarse, "books": books}
    # Sidecar goes through the Hadoop FS API (plans.fs): ``path`` is a
    # Spark output path, so s3a://hdfs:// URIs must work the same as
    # local ones — a driver-local open() would only handle the latter.
    from ocr_spark.plans.fs import write_text

    write_text(
        emb.sparkSession, f"{path.rstrip('/')}/_codebooks.json", json.dumps(meta)
    )
    return meta


def ivfpq_probe(
    spark,
    path: str,
    query_vec: List[float],
    k: int = 10,
    n_probe: int = 1,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ADC top-k against a persisted IVF-PQ index: rank the coarse
    centroids against the query DRIVER-SIDE (k_coarse bounded rows),
    read only the ``n_probe`` nearest cells — a partition-pruned scan,
    verified in tests via the plan's PartitionFilters — and score the
    4-byte codes with the same literal-LUT sum as ``pq_adc_topk``."""
    import json
    import math

    from ocr_spark.plans.fs import read_text

    meta = json.loads(read_text(spark, f"{path.rstrip('/')}/_codebooks.json"))
    coarse = meta["coarse"]
    books = meta["books"]
    q = [float(x) for x in query_vec]
    qn = math.sqrt(_fold_dot(q, q))

    def cos_to(cvec: List[float]) -> float:
        return _fold_dot(q, cvec) / (
            qn * math.sqrt(_fold_dot(cvec, cvec))
        )

    ranked = sorted(
        ((round(cos_to(cvec), 6), -int(cid)) for cid, cvec in coarse),
        reverse=True,
    )
    cells = [-neg for _, neg in ranked[:n_probe]]
    m = len(books)
    d = EMB_DIM // m
    idx = spark.read.parquet(path).filter(F.col("centroid").isin(cells))
    dsum, nsum = None, None
    for s, book in enumerate(books):
        qs = q[s * d : (s + 1) * d]
        lut_d = _lit_array([_fold_dot(qs, v) for _, v in book])
        lut_n = _lit_array([_fold_dot(v, v) for _, v in book])
        at = (F.col("codes").getItem(s) + F.lit(1)).cast("int")
        dterm = F.element_at(lut_d, at)
        nterm = F.element_at(lut_n, at)
        dsum = dterm if dsum is None else dsum + dterm
        nsum = nterm if nsum is None else nsum + nterm
    score = F.round(dsum / (F.lit(qn) * F.sqrt(nsum)), 6)
    out = idx
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", score.alias("adc_cos"))
        .orderBy(F.desc("adc_cos"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# T53 — ADC + exact re-rank (the production IVF-PQ retrieval shape)
# ---------------------------------------------------------------------------

ADC_RERANK_FACTOR = 4


def pq_adc_rerank_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    r: int | None = None,
    codebooks: List[list] | None = None,
) -> DataFrame:
    """Two-stage retrieval (Jegou et al. 2011 §V): ADC over PQ codes
    selects a candidate pool of ``r`` (default 4k) — cheap, 4-byte
    codes — then the exact rounded cosine re-ranks ONLY those r
    vectors and keeps the top k.  Returns (vec_id, cos_sim).

    Scale shape: stage 1 is the shuffle-free ``pq_adc_topk`` scan
    (TakeOrdered cutoff, deterministic adc/vec_id tie rule); stage 2
    broadcasts the r-row candidate set against the corpus (a
    broadcast semi-join — the corpus is never shuffled) and computes
    r exact cosines, not n.  Quantization error only costs recall if
    a true neighbor falls outside the ADC top-r."""
    books = codebooks if codebooks is not None else pq_train(emb)
    r = r if r is not None else ADC_RERANK_FACTOR * k
    cand = pq_adc_topk(
        emb, query_vec_id=query_vec_id, k=r, codebooks=books
    ).select("vec_id")
    q = _lit_array(
        [
            float(x)
            for x in emb.filter(F.col("vec_id") == query_vec_id)
            .select("embedding")
            .collect()[0]
            .embedding
        ]
    )
    exact = F.round(
        cosine_col(
            F.transform(F.col("embedding"), lambda x: x.cast("double")), q
        ),
        6,
    )
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .select("vec_id", exact.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def sql_pq_adc_rerank_topk(
    query_vec_id: int = 0,
    k: int = 10,
    r: int | None = None,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_iter: int = PQ_ITER,
) -> str:
    """DuckDB replay: the sql_pq_adc_topk CTE chain cut at top-r, then
    an exact-cosine re-rank join against the raw embeddings."""
    r = r if r is not None else ADC_RERANK_FACTOR * k
    inner = sql_pq_adc_topk(
        query_vec_id=query_vec_id, k=r, m=m, n_codes=n_codes, n_iter=n_iter
    )
    cos = _sql_cosine("ef.embedding", "qq.embedding")
    return f"""
        WITH cand AS ({inner}),
        ef AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE))
                      AS embedding FROM embeddings),
        qq AS (SELECT embedding FROM ef WHERE vec_id = {query_vec_id})
        SELECT ef.vec_id, round({cos}, 6) AS cos_sim
        FROM ef JOIN cand c ON ef.vec_id = c.vec_id, qq
        ORDER BY cos_sim DESC, ef.vec_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T99 — ANN recall audit
# ---------------------------------------------------------------------------
#
# The evaluation harness every approximate index ships with: recall@k
# of the probe against the brute-force answer on the same corpus.  A
# recall regression is how you notice a bad codebook, an over-small
# n_probe, or a broken partition layout BEFORE the index serves
# queries.  Both sides exclude the query vector; both engines compute
# both sides, so the audit itself is oracle-gated.
#
# Scale shape: the IVF side prunes to the query's cell (T7's zero-
# shuffle assignment); the exact side is the one-broadcast top-k scan;
# the overlap join runs on 2k rows.


def ann_recall_audit(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """One row: (k, n_approx, n_overlap, recall) for the IVF probe vs
    exact cosine top-k.  n_approx < k flags an under-filled cell."""
    approx = ivf_topk(emb, query_vec_id=query_vec_id, k=k).select("vec_id")
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    exact = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    n_approx = approx.agg(F.count(F.lit(1)).cast("bigint").alias("n_approx"))
    overlap = approx.join(exact, "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    return n_approx.crossJoin(overlap).select(
        F.lit(k).cast("bigint").alias("k"),
        "n_approx",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def sql_ann_recall_audit(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
        WITH ivf AS ({sql_ivf_topk(query_vec_id=query_vec_id, k=k)}),
        q AS (SELECT embedding AS qvec FROM embeddings
              WHERE vec_id = {query_vec_id}),
        exact AS (
            SELECT vec_id FROM (
                SELECT e.vec_id,
                       round(
                         list_dot_product(e.embedding, q.qvec) /
                         (sqrt(list_dot_product(e.embedding, e.embedding)) *
                          sqrt(list_dot_product(q.qvec, q.qvec))), 4)
                           AS cos_sim
                FROM embeddings e, q WHERE e.vec_id <> {query_vec_id}
                ORDER BY cos_sim DESC, vec_id ASC LIMIT {k})
        )
        SELECT CAST({k} AS BIGINT) AS k,
               (SELECT CAST(count(*) AS BIGINT) FROM ivf) AS n_approx,
               CAST(count(*) AS BIGINT) AS n_overlap,
               round(CAST(count(*) AS DOUBLE) / {float(k)!r}, 6) AS recall
        FROM ivf JOIN exact USING (vec_id)
    """


# ---------------------------------------------------------------------------
# T105 — k-NN label classification
# ---------------------------------------------------------------------------
#
# The standard embedding-quality probe: predict each query's label by
# majority vote among its nearest neighbors and compare to the truth —
# a collapsed embedding space scores at chance, a good one near 1.0.
# Rides on the batched one-scan retrieval (T23), so the corpus is
# scanned once for ALL queries; the vote is one map-side-combined
# count + a partial-agg argmax over <= queries x labels rows.


def knn_classify(
    emb: DataFrame, query_ids: List[int] = (0, 1, 2), k: int = 10
) -> DataFrame:
    """(query_id, predicted, n_votes, true_label, correct): majority
    label among the k nearest (ties to the smaller label id)."""
    hits = topk_join(emb, query_ids=list(query_ids), k=k)
    labels = emb.select("vec_id", F.col("label").cast("bigint").alias("label"))
    votes = (
        hits.join(labels, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = votes.groupBy("query_id").agg(
        F.min(F.struct((-F.col("n")).alias("neg"), F.col("label"))).alias("m")
    )
    truth = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "true_label"
    )
    return (
        best.join(truth, "query_id")
        .select(
            "query_id",
            F.col("m.label").alias("predicted"),
            (-F.col("m.neg")).cast("bigint").alias("n_votes"),
            "true_label",
            (F.col("m.label") == F.col("true_label")).alias("correct"),
        )
    )


def sql_knn_classify(query_ids: List[int] = (0, 1, 2), k: int = 10) -> str:
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
        WITH hits AS ({sql_topk_join(list(query_ids), k=k)}),
        votes AS (
            SELECT h.query_id, CAST(e.label AS BIGINT) AS label,
                   count(*) AS n
            FROM hits h JOIN embeddings e ON h.vec_id = e.vec_id
            GROUP BY h.query_id, e.label
        ),
        best AS (
            SELECT query_id, label, n FROM (
                SELECT query_id, label, n,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY n DESC, label ASC) AS rk
                FROM votes) WHERE rk = 1
        )
        SELECT b.query_id, b.label AS predicted,
               CAST(b.n AS BIGINT) AS n_votes,
               CAST(e.label AS BIGINT) AS true_label,
               b.label = CAST(e.label AS BIGINT) AS correct
        FROM best b JOIN embeddings e ON b.query_id = e.vec_id
    """


# ---------------------------------------------------------------------------
# T106 — embedding norm audit
# ---------------------------------------------------------------------------
#
# Degenerate embeddings (zero rows, exploding norms, a collapsed
# label) show up first in the norm distribution — the QA table an
# embedding ingest job publishes before anything indexes the vectors.
# Norms are fixed to integer micro-units in-row, so the per-label
# aggregation is exact; one map-side-combined agg, no shuffle of
# vectors.


def embedding_norm_stats(emb: DataFrame) -> DataFrame:
    """(label, n_vecs, mean_norm, min_norm, max_norm): L2-norm profile
    per label, 6dp from exact micro-unit sums."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm_micro = F.round(F.sqrt(dot_col(e, e)) * 1_000_000).cast("bigint")
    return (
        emb.select(
            F.col("label").cast("bigint").alias("label"),
            norm_micro.alias("nm"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum("nm").cast("double") / F.count(F.lit(1)) / 1_000_000, 6
            ).alias("mean_norm"),
            F.round(F.min("nm").cast("double") / 1_000_000, 6).alias(
                "min_norm"
            ),
            F.round(F.max("nm").cast("double") / 1_000_000, 6).alias(
                "max_norm"
            ),
        )
    )


def sql_embedding_norm_stats() -> str:
    dot = _sql_dot_cols("e.embedding", "e.embedding")
    return f"""
        WITH m AS (
            SELECT CAST(e.label AS BIGINT) AS label,
                   CAST(round(sqrt({dot}) * 1000000) AS BIGINT) AS nm
            FROM (SELECT label,
                         list_transform(embedding, x -> CAST(x AS DOUBLE))
                             AS embedding
                  FROM embeddings) e
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(CAST(sum(nm) AS DOUBLE) / count(*) / 1000000, 6)
                   AS mean_norm,
               round(CAST(min(nm) AS DOUBLE) / 1000000, 6) AS min_norm,
               round(CAST(max(nm) AS DOUBLE) / 1000000, 6) AS max_norm
        FROM m GROUP BY label
    """


# ---------------------------------------------------------------------------
# T110 — hard-negative mining
# ---------------------------------------------------------------------------
#
# Contrastive training wants, per anchor, the most similar vectors
# with a DIFFERENT label — the examples that actually move the loss
# (random negatives are trivially separable).  Same shape as the
# brute-force top-k with one broadcast label-exclusion predicate; at
# scale it composes with the IVF cell filter exactly like the positive
# retrieval path.


def hard_negatives(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """(vec_id, label, cos_sim): the k nearest vectors whose label
    differs from the query's."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def sql_hard_negatives(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
        WITH q AS (
            SELECT embedding AS qvec, label AS qlabel
            FROM embeddings WHERE vec_id = {query_vec_id}
        )
        SELECT vec_id, CAST(label AS BIGINT) AS label,
               round({_sql_cosine('e.embedding', 'q.qvec')}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> {query_vec_id} AND e.label <> q.qlabel
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T146 — int8 embedding quantization audit (per-dim absmax scaling)
# ---------------------------------------------------------------------------
#
# Storing 10^12 float32 embeddings is 4× the bytes the retrieval
# quality needs: symmetric per-dimension int8 (q = round(x/s_d),
# s_d = absmax_d/127 — the faiss ScalarQuantizer / ONNX
# QuantizeLinear convention) cuts the table 4× ahead of the coarser
# PQ path (T49).  The audit emits each vector's integer code
# checksums plus its clip count, so a corpus re-quantization can be
# verified shard-by-shard without comparing floats.
#
# Output stays all-bigint (code sum, code square-sum, clip count):
# bit-identical across engines and cluster sizes by construction —
# the same reason gram_matrix (T126) ships integer cells.
#
# Scale shape: the per-dim absmax is one posexplode groupBy to
# EMB_DIM rows (map-side combined, counts only) joined back as ONE
# broadcast array row; quantization is in-row zip_with; no Python,
# no second pass over the corpus.


def int8_quantize(emb: DataFrame) -> DataFrame:
    """(vec_id, n_clipped, q_sum, q_sqsum): int8 code statistics per
    vector under per-dim absmax scaling; all-zero dims quantize to 0."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dims = emb.select(
        F.posexplode(e).alias("dim", "x")
    ).groupBy("dim").agg(F.max(F.abs(F.col("x"))).alias("absmax"))
    scales_row = dims.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("dim"), F.col("absmax")))
            ),
            lambda s: s["absmax"] / F.lit(127.0),
        ).alias("scales")
    )
    q_raw = F.zip_with(
        e,
        F.col("scales"),
        lambda x, s: F.when(s == 0.0, F.lit(0.0)).otherwise(
            F.round(x / s, 0)
        ),
    )
    q = F.transform(
        q_raw,
        lambda v: F.greatest(F.least(v, F.lit(127.0)), F.lit(-127.0)).cast(
            "bigint"
        ),
    )
    n_clipped = F.aggregate(
        q_raw,
        F.lit(0).cast("bigint"),
        lambda acc, v: acc
        + F.when(F.abs(v) > 127.0, F.lit(1)).otherwise(F.lit(0)),
    )
    return emb.crossJoin(F.broadcast(scales_row)).select(
        "vec_id",
        n_clipped.alias("n_clipped"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
        ).alias("q_sqsum"),
    )


def sql_int8_quantize() -> str:
    return """
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        dims AS (
            SELECT i AS dim, max(abs(emb[i])) AS absmax
            FROM e, UNNEST(range(1, len(emb) + 1)) AS t(i)
            GROUP BY i
        ),
        sc AS (
            SELECT list(absmax / 127.0 ORDER BY dim) AS scales FROM dims
        ),
        qr AS (
            SELECT vec_id,
                   list_transform(
                       range(1, len(emb) + 1),
                       i -> CASE WHEN scales[i] = 0.0 THEN 0.0
                                 ELSE round(emb[i] / scales[i], 0) END)
                       AS q_raw
            FROM e CROSS JOIN sc
        ),
        q AS (
            SELECT vec_id, q_raw,
                   list_transform(
                       q_raw,
                       v -> CAST(greatest(least(v, 127.0), -127.0)
                                 AS BIGINT)) AS qq
            FROM qr
        )
        SELECT vec_id,
               CAST(len(list_filter(q_raw, v -> abs(v) > 127.0)) AS BIGINT)
                   AS n_clipped,
               CAST(list_sum(qq) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qq, v -> v * v)) AS BIGINT)
                   AS q_sqsum
        FROM q
    """


# ---------------------------------------------------------------------------
# T157 — embedding centroid-shift audit (old vs new snapshot drift)
# ---------------------------------------------------------------------------
#
# Embedding-space drift is the retraining tripwire for every
# ANN-backed pipeline stage (IVF cells, PQ codebooks, semantic-dedup
# thresholds are all trained against a snapshot's geometry): when a
# refreshed corpus moves a label's centroid, recall quietly decays
# until the index is retrained.  The audit compares per-label
# centroids between two snapshots — planted here as the even/odd
# vec_id split, the same snapshot proxy lang_drift uses — and reports
# the L2 shift and the cosine between the old and new centroid.
#
# Cross-engine exactness: components quantize to micro units
# (floor(x * 1e6) as BIGINT) so the per-(label, dim) conditional sums
# are exact integers; every per-dim double term downstream
# (mean = sa/na, squared diff, dot product) is floor()-quantized
# before the fold adds it, so the per-label reduction is an
# order-free BIGINT sum and the final sqrt/divide is one identically-
# rounded IEEE expression in both engines.
#
# Scale shape: one posexplode scan, map-side-combined
# groupBy(label, dim) — the shuffle carries |labels| × EMB_DIM keyed
# bigint rows, never vectors; the per-label fold runs over a bounded
# collect_list of EMB_DIM structs.  At 10^12 rows nothing else moves.


def centroid_shift(emb: DataFrame) -> DataFrame:
    """(label, n_old, n_new, l2_shift, cos_sim): per-label centroid
    drift between the even-vec_id (old) and odd-vec_id (new) snapshot
    halves; micro-exact sums, 6dp outputs."""
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1_000_000).cast("bigint"),
    )
    is_old = (F.col("vec_id") % 2 == 0).cast("bigint")
    per_dim = (
        emb.select(
            F.col("label").cast("bigint").alias("label"),
            is_old.alias("old"),
            F.posexplode(micro).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(
            F.sum(F.col("x") * F.col("old")).alias("sa"),
            F.sum(F.col("x") * (1 - F.col("old"))).alias("sb"),
            F.sum(F.col("old")).alias("na"),
            F.sum(1 - F.col("old")).alias("nb"),
        )
    )
    folded = per_dim.groupBy("label").agg(
        F.max("na").alias("n_old"),
        F.max("nb").alias("n_new"),
        F.sort_array(
            F.collect_list(F.struct(F.col("dim"), F.col("sa"), F.col("sb")))
        ).alias("terms"),
    )
    ma = lambda t: t["sa"].cast("double") / F.col("n_old").cast("double")  # noqa: E731
    mb = lambda t: t["sb"].cast("double") / F.col("n_new").cast("double")  # noqa: E731

    def fold(term) -> Column:
        return F.aggregate(
            F.col("terms"),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.floor(term(t)).cast("bigint"),
        )

    l2sq = fold(lambda t: (ma(t) - mb(t)) * (ma(t) - mb(t)))
    dot = fold(lambda t: ma(t) * mb(t))
    n2a = fold(lambda t: ma(t) * ma(t))
    n2b = fold(lambda t: mb(t) * mb(t))
    return (
        folded.filter((F.col("n_old") > 0) & (F.col("n_new") > 0))
        .select(
            "label",
            "n_old",
            "n_new",
            F.round(
                F.sqrt(l2sq.cast("double")) / 1_000_000.0, 6
            ).alias("l2_shift"),
            F.round(
                dot.cast("double")
                / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))),
                6,
            ).alias("cos_sim"),
        )
    )


def sql_centroid_shift() -> str:
    ma = "CAST(sa AS DOUBLE) / CAST(n_old AS DOUBLE)"
    mb = "CAST(sb AS DOUBLE) / CAST(n_new AS DOUBLE)"
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS old,
                   list_transform(
                       embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS emb
            FROM embeddings
        ),
        per_dim AS (
            SELECT label, i AS dim,
                   CAST(sum(emb[i] * old) AS BIGINT) AS sa,
                   CAST(sum(emb[i] * (1 - old)) AS BIGINT) AS sb,
                   CAST(sum(old) AS BIGINT) AS na,
                   CAST(sum(1 - old) AS BIGINT) AS nb
            FROM e, UNNEST(range(1, len(emb) + 1)) AS t(i)
            GROUP BY label, i
        ),
        folded AS (
            SELECT label,
                   max(na) AS n_old,
                   max(nb) AS n_new,
                   CAST(sum(CAST(floor(({ma} - {mb}) * ({ma} - {mb}))
                                 AS BIGINT)) AS BIGINT) AS l2sq,
                   CAST(sum(CAST(floor({ma} * {mb}) AS BIGINT))
                        AS BIGINT) AS dot,
                   CAST(sum(CAST(floor({ma} * {ma}) AS BIGINT))
                        AS BIGINT) AS n2a,
                   CAST(sum(CAST(floor({mb} * {mb}) AS BIGINT))
                        AS BIGINT) AS n2b
            FROM (SELECT label, dim, sa, sb,
                         max(na) OVER (PARTITION BY label) AS n_old,
                         max(nb) OVER (PARTITION BY label) AS n_new,
                         na, nb
                  FROM per_dim)
            GROUP BY label
        )
        SELECT label, n_old, n_new,
               round(sqrt(CAST(l2sq AS DOUBLE)) / 1000000.0, 6) AS l2_shift,
               round(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(n2a AS DOUBLE))
                        * sqrt(CAST(n2b AS DOUBLE))), 6) AS cos_sim
        FROM folded
        WHERE n_old > 0 AND n_new > 0
    """


# ---------------------------------------------------------------------------
# T165 — embedding anisotropy audit (deterministic-pair cosine histogram)
# ---------------------------------------------------------------------------
#
# A healthy embedding space puts unrelated documents near cosine 0; a
# collapsed (anisotropic) one squeezes everything into a narrow cone,
# and every cosine-thresholded stage downstream — near-dup (T5),
# SemDeDup (T51), contamination, hard negatives — silently loses its
# discrimination.  The audit histograms the cosine of DETERMINISTIC
# pseudo-random pairs: vector v pairs with v+1 for even v, which is
# id-order "random" (ids carry no geometry), reproducible at any
# cluster size, and exactly one pair per two vectors — no sampling
# RNG, no quadratic blow-up.
#
# Exactness: cosines quantize to micro units before binning and
# averaging (bigint sums, one double division), the T99/T106 idiom.
#
# Scale shape: one self-join on vec_id+1 — with both sides bucketed
# or sorted by vec_id this is a co-located join; the histogram is a
# ≤21-bin rollup.  Nothing quadratic anywhere.

COS_BINS = 20


def cos_histogram(emb: DataFrame) -> DataFrame:
    """(bin, n_pairs, avg_cos): histogram of adjacent-pair cosines in
    COS_BINS bins over [-1, 1]; per-bin mean cosine 6dp."""
    left = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea")
    )
    right = emb.select(
        (F.col("vec_id") - 1).alias("va"), F.col("embedding").alias("eb")
    )
    cosm = F.round(
        cosine_col(F.col("ea"), F.col("eb")) * 1_000_000
    ).cast("bigint")
    width = 2_000_000 // COS_BINS
    bin_ = F.least(
        F.floor((cosm + 1_000_000) / width).cast("int"),
        F.lit(COS_BINS - 1),
    )
    return (
        left.join(right, "va")
        .select(bin_.alias("bin"), cosm.alias("cosm"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("cosm").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1_000_000.0,
                6,
            ).alias("avg_cos"),
        )
    )


def sql_cos_histogram() -> str:
    width = 2_000_000 // COS_BINS
    cos = _sql_cosine("a.embedding", "b.embedding")
    return f"""
        WITH pairs AS (
            SELECT CAST(round({cos} * 1000000) AS BIGINT) AS cosm
            FROM embeddings a JOIN embeddings b
              ON b.vec_id = a.vec_id + 1
            WHERE a.vec_id % 2 = 0
        )
        SELECT CAST(least((cosm + 1000000) // {width}, {COS_BINS - 1})
                    AS INTEGER) AS bin,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(sum(cosm) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     / 1000000.0, 6) AS avg_cos
        FROM pairs
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# T175 — ANN MRR audit (reciprocal rank of the true NN in the probe)
# ---------------------------------------------------------------------------
#
# Recall@k (T99) says whether the true neighbors appear ANYWHERE in
# the probe's k results; retrieval-backed pipelines (hard-negative
# mining, RAG-style selection) consume the TOP of the list, so the
# second standard index metric is MRR — where does the true nearest
# neighbor actually rank.  An index can hold recall@10 = 0.9 while its
# rank-1 quality quietly degrades; MRR is the metric that moves first.
#
# Scale shape: the exact side is ONE corpus scan — candidates join the
# broadcast query rows and the per-query argmax is a partial-combined
# max(struct) (no window over raw scores); the IVF side runs one
# cell-pruned probe per query (bounded query list, each probe a
# TakeOrdered over one cell); the final rank join touches
# n_queries x k rows.

MRR_QUERY_IDS = (0, 1, 2, 3, 4)


def ann_mrr(
    emb: DataFrame, query_ids=MRR_QUERY_IDS, k: int = 10
) -> DataFrame:
    """(query_id, true_nn, ivf_rank, rr): the brute-force nearest
    neighbor of each query and its 1-based rank inside the IVF probe's
    top-k (0 / rr 0.0 when the probe misses it entirely).  Mean of rr
    over the query set is the index's MRR."""
    from pyspark.sql import Window as W

    qlist = [int(q) for q in query_ids]
    queries = emb.filter(F.col("vec_id").isin(qlist)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", F.round(cos, 4).alias("cos_sim")
        )
    )
    truth = (
        scored.groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim").alias("c"),
                    (-F.col("vec_id")).alias("nv"),
                )
            ).alias("m")
        )
        .select("query_id", (-F.col("m.nv")).alias("true_nn"))
    )
    probes = None
    wq = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    for qid in qlist:
        p = ivf_topk(emb, query_vec_id=qid, k=k).select(
            F.lit(qid).cast("bigint").alias("query_id"), "vec_id", "cos_sim"
        )
        probes = p if probes is None else probes.unionByName(p)
    ranked = probes.withColumn("rnk", F.row_number().over(wq))
    return (
        truth.join(
            ranked.select("query_id", "vec_id", "rnk"),
            (truth.query_id == ranked.query_id)
            & (truth.true_nn == ranked.vec_id),
            "left",
        )
        .select(
            truth.query_id,
            "true_nn",
            F.coalesce("rnk", F.lit(0)).cast("bigint").alias("ivf_rank"),
            F.round(
                F.when(
                    F.col("rnk").isNotNull(),
                    F.lit(1.0) / F.col("rnk").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rr"),
        )
        .orderBy("query_id")
    )


def sql_ann_mrr(query_ids=MRR_QUERY_IDS, k: int = 10) -> str:
    qlist = [int(q) for q in query_ids]
    in_list = ", ".join(str(q) for q in qlist)
    ivf_parts = []
    for qid in qlist:
        ivf_parts.append(
            f"""SELECT CAST({qid} AS BIGINT) AS query_id, vec_id,
                       row_number() OVER (
                           ORDER BY cos_sim DESC, vec_id ASC) AS rnk
                FROM ({sql_ivf_topk(query_vec_id=qid, k=k)})"""
        )
    ivf_union = "\nUNION ALL\n".join(ivf_parts)
    return f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, e.vec_id,
                   round(
                     list_dot_product(e.embedding, q.embedding) /
                     (sqrt(list_dot_product(e.embedding, e.embedding)) *
                      sqrt(list_dot_product(q.embedding, q.embedding))),
                     4) AS cos_sim
            FROM embeddings e
            JOIN embeddings q
              ON q.vec_id IN ({in_list}) AND e.vec_id <> q.vec_id
        ),
        truth AS (
            SELECT query_id, vec_id AS true_nn FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cos_sim DESC, vec_id ASC) AS rn
                FROM scored)
            WHERE rn = 1
        ),
        ivf AS ({ivf_union})
        SELECT t.query_id, t.true_nn,
               CAST(COALESCE(i.rnk, 0) AS BIGINT) AS ivf_rank,
               round(CASE WHEN i.rnk IS NULL THEN 0.0
                          ELSE 1.0 / i.rnk END, 6) AS rr
        FROM truth t
        LEFT JOIN ivf i
          ON t.query_id = i.query_id AND t.true_nn = i.vec_id
    """


# ---------------------------------------------------------------------------
# T176 — reciprocal-rank fusion of lexical and semantic retrieval
# ---------------------------------------------------------------------------
#
# Hybrid retrieval is the production norm for training-data mining
# (find documents "about X"): a lexical BM25 list and a dense-embedding
# cosine list, fused by reciprocal rank (Cormack, Clarke & Buettcher,
# SIGIR 2009) — rank-space fusion needs no score calibration between
# the two retrievers, which is exactly why RRF beat score averaging in
# the original evaluation.  Contributions are fixed to integer micro
# units (round(1e6/(K+rank))) so the fused ordering is engine-exact.
#
# Scale shape: the lexical list inherits bm25_topk's single-scan
# conditional-aggregation plan (no (doc, word) shuffle); the semantic
# list is the broadcast-query pattern (the one-row query vector
# broadcasts, corpus embeddings never shuffle, TakeOrderedAndProject
# cuts k).  Fusion itself full-outer-joins two <= list_k-row frames —
# every window in this operator only ever sees a bounded input.

RRF_K = 60
RRF_LIST_K = 20
RRF_TOPN = 15
RRF_QUERY_VEC_ID = 0
_RRF_SCALE = 1_000_000


def rrf_fusion(
    docs: DataFrame,
    emb: DataFrame,
    query: tuple = None,
    query_vec_id: int = RRF_QUERY_VEC_ID,
    list_k: int = RRF_LIST_K,
    rrf_k: int = RRF_K,
    topn: int = RRF_TOPN,
) -> DataFrame:
    """(doc_id, lex_rank, sem_rank, rrf): top-``topn`` docs by
    reciprocal-rank fusion of the BM25 lexical top-``list_k`` (fixed
    term query) and the brute-force cosine top-``list_k`` for the
    embedding of ``query_vec_id``.  A rank of 0 means the doc is
    absent from that list; rrf is the 6dp rendering of the exact
    micro-unit sum."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.corpus_ops import BM25_QUERY, bm25_topk

    if query is None:
        query = BM25_QUERY
    lex_top = bm25_topk(docs, query=query, topk=list_k)
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    qvec = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    cos = cosine_col(F.col("embedding"), F.col("qvec"))
    sem_top = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(list_k)
    )
    sem = sem_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .alias("sem_rank"),
    )

    def contrib(rank_col: str) -> Column:
        return F.when(
            F.col(rank_col) > 0,
            F.round(
                F.lit(float(_RRF_SCALE))
                / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("bigint").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("bigint").alias("sem_rank"),
        )
        .withColumn("rrf_micro", contrib("lex_rank") + contrib("sem_rank"))
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(
                F.col("rrf_micro").cast("double") / F.lit(float(_RRF_SCALE)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(topn)
    )


def sql_rrf_fusion(
    query: tuple = None,
    query_vec_id: int = RRF_QUERY_VEC_ID,
    list_k: int = RRF_LIST_K,
    rrf_k: int = RRF_K,
    topn: int = RRF_TOPN,
) -> str:
    from ocr_spark.operators.corpus_ops import BM25_QUERY, sql_bm25_topk

    if query is None:
        query = BM25_QUERY
    s = _RRF_SCALE
    return f"""
        WITH lex0 AS ({sql_bm25_topk(query=query, topk=list_k)}),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY score DESC, doc_id ASC) AS lex_rank
            FROM lex0
        ),
        q AS (
            SELECT embedding AS qvec FROM embeddings
            WHERE vec_id = {query_vec_id}
        ),
        sem0 AS (
            SELECT e.vec_id AS doc_id,
                   round({_sql_cosine('e.embedding', 'q.qvec')}, 4)
                       AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> {query_vec_id}
            ORDER BY cos_sim DESC, doc_id ASC LIMIT {list_k}
        ),
        sem AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY cos_sim DESC, doc_id ASC) AS sem_rank
            FROM sem0
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, se.doc_id) AS doc_id,
                   CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
                   CAST(COALESCE(se.sem_rank, 0) AS BIGINT) AS sem_rank
            FROM lex l FULL OUTER JOIN sem se ON l.doc_id = se.doc_id
        )
        SELECT doc_id, lex_rank, sem_rank,
               round(CAST(
                   (CASE WHEN lex_rank > 0 THEN CAST(round(
                        {float(s)} / ({float(rrf_k)} + lex_rank)) AS BIGINT)
                        ELSE 0 END
                    + CASE WHEN sem_rank > 0 THEN CAST(round(
                        {float(s)} / ({float(rrf_k)} + sem_rank)) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / {float(s)}, 6) AS rrf
        FROM fused
        ORDER BY rrf DESC, doc_id ASC LIMIT {topn}
    """
