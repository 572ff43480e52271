"""Mergeable sketches: HyperLogLog distinct counts, DDSketch-style
quantiles, and Johnson-Lindenstrauss random projection.

At 10^12 documents, "how many distinct X" and "what is the p99 of Y"
cannot be answered with exact distincts or global sorts — the
production shapes are MERGEABLE sketches whose partial states collapse
inside map-side combine and whose final merge touches a bounded number
of rows.  The reference keeps these as SQLite dashboard counts
(main.py status/stats endpoints); here they are corpus-scale
operators:

* ``hll_distinct`` — per-language distinct-shingle estimate via a
  deterministic HyperLogLog (Flajolet et al. 2007): 60-bit truncated
  md5, ``HLL_P``-bit register index, rank-of-first-one registers.
  The register table is a ``groupBy(lang, j).max(rho)`` — the textbook
  mergeable sketch: every partition collapses to at most ``m`` rows
  per language before the exchange, and the estimator runs on ``m``
  rows per group.  All sketch state is INTEGER (the 2^-M harmonic sum
  is carried as exact ``2^(51-M)`` bigints), so the estimate is
  bit-reproducible regardless of partitioning — and the DuckDB oracle
  replays it exactly.
* ``quantile_sketch`` — log-histogram quantiles (the DDSketch idea,
  Masson et al. 2019, with power-of-two boundaries instead of gamma):
  bucket = (bitlen(x)-1)*S + sub-bucket from the top bits, all integer
  math, relative error bounded by 1/S.  One ``groupBy(bucket).count``
  with map-side combine, a cumulative sum over the ≤ 64*S bucket rows,
  and a constant-size quantile lookup — no global sort at any scale.
* ``random_projection`` — JL sign projection of the 64-dim embedding
  column to ``RP_DIM`` dims: a literal ±1 matrix derived from md5 at
  plan-build time (shared verbatim with the SQL mirror), applied as a
  fixed-order chain of multiply-adds inside whole-stage codegen.
  Zero shuffle, zero Python; the standard cheap first stage before
  LSH / clustering on reduced vectors.
* ``gram_matrix`` / ``pca_project`` / ``pca_variance`` — distributed
  PCA in the RowMatrix shape: a fixed-point (integer-milli) d x d
  Gram aggregation whose partials are exact bigints (default impl:
  one Arrow matmul per batch, bit-identical to the pure-column
  explode mirror the oracle states), a 64x64 numpy eigendecomposition
  on the driver, and a literal-matrix projection back on the cluster.

The HLL register merge also runs as a streaming aggregation with
forever-bounded state (``streaming/metrics.py::hll_register_stream``)
— max over registers is associative, commutative, and idempotent, so
mergeability IS the streaming story.

Reference parity: the reference has no sketch surface; these extend
its stats endpoints (``main.py:3741-3787``) to corpus scale as SURVEY
§2.14 training-data operators.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T117 — HyperLogLog distinct estimate
# ---------------------------------------------------------------------------

HLL_P = 10                      # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
# bits left after the register index is consumed from the 60-bit hash
_HLL_WBITS = 60 - HLL_P         # 50
_HLL_RMAX = _HLL_WBITS + 1      # rho for w == 0
# Flajolet et al. 2007 bias correction for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _rho_col(w: Column) -> Column:
    """Rank of the first 1-bit of the 50-bit suffix ``w``:
    ``51 - bit_length(w)`` (bit_length via the binary-string length,
    exact integer math — no float log2 edge cases)."""
    return (
        F.when(w == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_rho_cols(group_col: str = "g", sh_col: str = "sh") -> list:
    """(g, j, rho) projection columns over a (group, shingle) frame —
    shared by the batch operator and the streaming register merge."""
    from ocr_spark.operators.dedup import _hash60

    h = _hash60(F.concat(F.lit("hll:"), F.col(sh_col)))
    return [
        F.col(group_col).alias("g"),
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("j"),
        _rho_col(F.shiftright(h, HLL_P)).alias("rho"),
    ]


def hll_estimate(regs: DataFrame, group_col: str = "lang") -> DataFrame:
    """(group, v_empty, z_scaled, est) from a register table
    (g, j, m_j) — the merge-then-estimate half, identical for batch
    and streamed registers (mergeability IS the sketch's point)."""
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_j)")
        ).alias("z_present"),
    )
    z_scaled = (
        F.col("z_present")
        + (F.lit(HLL_M) - F.col("n_present"))
        * F.lit(1 << _HLL_RMAX).cast("bigint")
    )
    v_empty = (F.lit(HLL_M) - F.col("n_present")).cast("bigint")
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.pow(F.lit(2.0), F.lit(_HLL_RMAX))
        / z_scaled.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("g").alias(group_col),
        v_empty.alias("v_empty"),
        z_scaled.alias("z_scaled"),
        F.round(est, 4).alias("est"),
    )


def hll_distinct(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, v_empty, z_scaled, est): HLL distinct-shingle estimate
    per language.

    ``z_scaled`` is the harmonic denominator carried exactly:
    ``sum(2^(51 - M_j))`` over all m registers (empty registers
    contribute ``2^51``) — a BIGINT sum, so the merge is
    order-independent and the estimate reproducible bit-for-bit.
    ``est`` applies linear counting below the 2.5m small-range
    threshold (the only branch with a transcendental; rounded to 4dp).
    """
    from ocr_spark.operators.dedup import shingles_col

    regs = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(shingles_col(F.col(text_col))).alias("sh"),
        )
        .select(*hll_rho_cols())
        .groupBy("g", "j")
        .agg(F.max("rho").alias("m_j"))
    )
    return hll_estimate(regs, group_col=group_col)


def sql_hll_distinct(group_col: str = "lang") -> str:
    from ocr_spark.operators.dedup import sql_shingles

    h = "CAST('0x' || substr(md5('hll:' || sh), 1, 15) AS BIGINT)"
    return f"""
        WITH sh AS (
            SELECT {group_col} AS g,
                   unnest({sql_shingles("text")}) AS sh
            FROM documents
        ),
        hashed AS (
            SELECT g, {h} & {HLL_M - 1} AS j,
                   CASE WHEN ({h} >> {HLL_P}) = 0 THEN {_HLL_RMAX}
                        ELSE {_HLL_RMAX}
                             - length(bin({h} >> {HLL_P}))
                   END AS rho
            FROM sh
        ),
        regs AS (
            SELECT g, j, max(rho) AS m_j FROM hashed GROUP BY g, j
        ),
        agg AS (
            SELECT g, count(*) AS n_present,
                   CAST(sum(CAST(1 AS BIGINT) << ({_HLL_RMAX} - m_j))
                        AS BIGINT) AS z_present
            FROM regs GROUP BY g
        ),
        stats AS (
            SELECT g,
                   CAST({HLL_M} - n_present AS BIGINT) AS v_empty,
                   z_present + ({HLL_M} - n_present)
                             * (CAST(1 AS BIGINT) << {_HLL_RMAX})
                       AS z_scaled
            FROM agg
        )
        SELECT g AS {group_col}, v_empty, z_scaled,
               round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M!r}
                               * pow(CAST(2.0 AS DOUBLE), {_HLL_RMAX})
                               / CAST(z_scaled AS DOUBLE)
                               <= {2.5 * HLL_M!r}
                          AND v_empty > 0
                     THEN CAST({float(HLL_M)!r} AS DOUBLE)
                          * ln(CAST({float(HLL_M)!r} AS DOUBLE)
                               / CAST(v_empty AS DOUBLE))
                     ELSE {HLL_ALPHA * HLL_M * HLL_M!r}
                          * pow(CAST(2.0 AS DOUBLE), {_HLL_RMAX})
                          / CAST(z_scaled AS DOUBLE)
                     END, 4) AS est
        FROM stats
    """


# ---------------------------------------------------------------------------
# T118 — log-histogram quantile sketch
# ---------------------------------------------------------------------------

QSK_SUB = 16                    # sub-buckets per octave; rel err <= 1/16
QSK_QUANTILES = (0.5, 0.75, 0.9, 0.99)


def _qsk_bucket() -> Column:
    """Integer bucket id of positive column ``_qx``: octave =
    bit_length(x), sub-bucket = top QSK_SUB-th of the octave — exact
    integer math in both engines (bit_length via binary-string
    length)."""
    x = F.col("_qx")
    e = F.length(F.bin(x))                       # bit_length, x >= 1
    lo = F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(_qx)) - 1)")
    sub = F.floor((x - lo) * QSK_SUB / lo).cast("bigint")
    return (e - 1).cast("bigint") * QSK_SUB + sub


def quantile_sketch(
    docs: DataFrame,
    value_col: str = "n_chars",
    quantiles: tuple = QSK_QUANTILES,
) -> DataFrame:
    """(q, rank, bucket, est_lo, est_hi, n_in_bucket): quantile
    estimates from the bucket histogram.  ``est_lo <= true quantile
    <= est_hi`` with ``est_hi/est_lo <= 1 + 1/QSK_SUB`` per octave.

    rank = ceil(q * n); the answer bucket is the first whose
    cumulative count reaches the rank.  The histogram is one
    map-side-combined count; everything after runs on ≤ 64*QSK_SUB
    rows.
    """
    x = F.col(value_col).cast("bigint")
    hist = (
        docs.filter(x >= 1)
        .select(x.alias("_qx"))
        .select(_qsk_bucket().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_in_bucket"))
    )
    from pyspark.sql import Window as W

    cum = hist.select(
        "bucket",
        "n_in_bucket",
        F.sum("n_in_bucket")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("n_in_bucket").over(
            W.orderBy("bucket").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_total"),
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    ranked = cum.select("*", qs).withColumn(
        "rank", F.ceil(F.col("q") * F.col("n_total"))
    )
    best = (
        ranked.filter(F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank")
        .agg(
            F.min(
                F.struct("bucket", "n_in_bucket")
            ).alias("b")
        )
        .select("q", "rank", F.col("b.bucket").alias("bucket"),
                F.col("b.n_in_bucket").alias("n_in_bucket"))
    )
    bounded = best.withColumn(
        "_e", (F.floor(F.col("bucket") / QSK_SUB) + 1).cast("int")
    ).withColumn(
        "_lo_oct", F.expr("shiftleft(CAST(1 AS BIGINT), _e - 1)")
    ).withColumn("_sub", F.col("bucket") % QSK_SUB)
    est_lo = F.col("_lo_oct") + F.floor(
        F.col("_sub") * F.col("_lo_oct") / QSK_SUB
    ).cast("bigint")
    est_hi = F.col("_lo_oct") + F.floor(
        (F.col("_sub") + 1) * F.col("_lo_oct") / QSK_SUB
    ).cast("bigint")
    return bounded.select(
        F.round("q", 6).alias("q"),
        F.col("rank").cast("bigint").alias("rank"),
        "bucket",
        est_lo.cast("bigint").alias("est_lo"),
        est_hi.cast("bigint").alias("est_hi"),
        "n_in_bucket",
    )


def sql_quantile_sketch(
    value_col: str = "n_chars", quantiles: tuple = QSK_QUANTILES
) -> str:
    qvals = ", ".join(repr(float(q)) for q in quantiles)
    b = (
        f"(length(bin(CAST({value_col} AS BIGINT))) - 1) * {QSK_SUB} + "
        f"CAST(floor((CAST({value_col} AS BIGINT) - "
        f"(CAST(1 AS BIGINT) << (length(bin(CAST({value_col} AS BIGINT))) - 1)))"
        f" * {QSK_SUB} / "
        f"(CAST(1 AS BIGINT) << (length(bin(CAST({value_col} AS BIGINT))) - 1)))"
        f" AS BIGINT)"
    )
    return f"""
        WITH hist AS (
            SELECT {b} AS bucket, count(*) AS n_in_bucket
            FROM documents WHERE {value_col} >= 1 GROUP BY 1
        ),
        cum AS (
            SELECT bucket, n_in_bucket,
                   sum(n_in_bucket) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   sum(n_in_bucket) OVER () AS n_total
            FROM hist
        ),
        ranked AS (
            SELECT cum.*, q.q, ceil(q.q * n_total) AS rank
            FROM cum, (SELECT unnest([{qvals}]) AS q) q
        ),
        best AS (
            SELECT q, rank,
                   min(bucket) AS bucket
            FROM ranked WHERE cum >= rank GROUP BY q, rank
        ),
        found AS (
            SELECT b.q, b.rank, b.bucket, h.n_in_bucket,
                   CAST(floor(b.bucket / {QSK_SUB}) + 1 AS INT) AS e,
                   b.bucket % {QSK_SUB} AS sub
            FROM best b JOIN hist h ON h.bucket = b.bucket
        )
        SELECT round(q, 6) AS q,
               CAST(rank AS BIGINT) AS rank,
               bucket,
               CAST((CAST(1 AS BIGINT) << (e - 1))
                    + floor(sub * (CAST(1 AS BIGINT) << (e - 1))
                            / {QSK_SUB}) AS BIGINT) AS est_lo,
               CAST((CAST(1 AS BIGINT) << (e - 1))
                    + floor((sub + 1) * (CAST(1 AS BIGINT) << (e - 1))
                            / {QSK_SUB}) AS BIGINT) AS est_hi,
               n_in_bucket
        FROM found
    """


# ---------------------------------------------------------------------------
# T122 — Johnson-Lindenstrauss sign projection
# ---------------------------------------------------------------------------

RP_DIM = 8
EMB_DIM = 64


def _rp_sign(i: int, j: int) -> int:
    """±1 from md5 — computed ONCE at plan-build time in Python and
    embedded as literals in BOTH engines' expressions."""
    d = hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()
    return 1 if int(d[:2], 16) % 2 == 0 else -1


_RP_SCALE = 1.0 / float(RP_DIM) ** 0.5


def random_projection(
    emb: DataFrame,
    in_dim: int = EMB_DIM,
    out_dim: int = RP_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, p0..p{out_dim-1}): sign-matrix JL projection
    (Achlioptas 2003 database-friendly variant, ±1 entries).  The
    matrix is literal, the sum is a FIXED-ORDER chain of adds — the
    whole projection is one codegen'd expression per output dim, and
    the SQL mirror states the identical chain, so floats agree
    bit-for-bit."""
    cols = [F.col(id_col)]
    for j in range(out_dim):
        expr = None
        for i in range(in_dim):
            term = F.col(vec_col)[i].cast("double") * F.lit(
                float(_rp_sign(i, j))
            )
            expr = term if expr is None else expr + term
        cols.append(F.round(expr * F.lit(_RP_SCALE), 6).alias(f"p{j}"))
    return emb.select(*cols)


def sql_random_projection(
    in_dim: int = EMB_DIM, out_dim: int = RP_DIM
) -> str:
    outs = []
    for j in range(out_dim):
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * "
            f"CAST({float(_rp_sign(i, j))!r} AS DOUBLE)"
            for i in range(in_dim)
        )
        outs.append(
            f"round(({chain}) * CAST({_RP_SCALE!r} AS DOUBLE), 6) AS p{j}"
        )
    sel = ",\n               ".join(outs)
    return f"""
        SELECT vec_id,
               {sel}
        FROM embeddings
    """


# ---------------------------------------------------------------------------
# T126 — Gram / covariance matrix (the distributed half of PCA)
# ---------------------------------------------------------------------------
#
# PCA over 10^12 embeddings is a d x d Gram matrix aggregation (d
# small) + a driver-side eigendecomposition (numpy on 64x64) — the
# MLlib RowMatrix pattern.  The aggregation here is FIXED-POINT:
# coordinates quantize once to integer millis, products accumulate as
# exact bigints, so the partial aggregation is order-independent and
# the result bit-reproducible under any partitioning (the same trick
# as T46's integer micro-nats).  At larger scales the bigint
# accumulator widens to DECIMAL(38,0); the shape is unchanged.

GRAM_SCALE = 1000  # fixed-point millis per coordinate


def _gram_finish(partials: DataFrame) -> DataFrame:
    """(i, j, t) partials -> the (i, j, s_scaled, value) result."""
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("t").alias("s_scaled"))
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            F.col("s_scaled").cast("bigint").alias("s_scaled"),
            F.round(
                F.col("s_scaled").cast("double")
                / F.lit(float(GRAM_SCALE * GRAM_SCALE)),
                6,
            ).alias("value"),
        )
    )


def gram_matrix(
    emb: DataFrame,
    dim: int = EMB_DIM,
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """(i, j, s_scaled, value) for the upper triangle i <= j:
    s_scaled = sum over rows of round(x_i*1000) * round(x_j*1000)
    (exact bigint); value = s_scaled / 1000^2 rounded to 6dp.

    Two implementations, BIT-IDENTICAL by construction because the
    per-row terms are exact integers (order of summation cannot
    matter):

    * ``impl="arrow"`` (default, the 10^12-row path): one
      ``mapInPandas`` pass emits each Arrow batch's d(d+1)/2 partial
      sums via a numpy matmul — the shuffle carries ~2080 rows PER
      BATCH instead of 2080 rows per document, and the double explode
      disappears entirely.
    * ``impl="explode"`` (the pure-column-expression mirror): double
      explode + map-side-combined sum — what the arrow path is
      verified against in pytest, and the plan the SQL oracle states.
    """
    if impl == "explode":
        q = F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * GRAM_SCALE).cast("bigint"),
        )
        rows = emb.select(q.alias("q"))
        expl = rows.select(
            F.posexplode("q").alias("i", "xi"), F.col("q")
        ).select(
            "i",
            "xi",
            F.explode(F.sequence(F.col("i"), F.lit(dim - 1))).alias("j"),
            F.col("q"),
        )
        terms = expl.select(
            "i", "j", (F.col("xi") * F.col("q")[F.col("j")]).alias("t")
        )
        return _gram_finish(terms)

    iu_i, iu_j = [], []
    for i in range(dim):
        for j in range(i, dim):
            iu_i.append(i)
            iu_j.append(j)

    def _partials(batches):
        import numpy as np
        import pandas as pd

        ii = np.array(iu_i, dtype=np.int32)
        jj = np.array(iu_j, dtype=np.int32)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            # HALF_UP (round half away from zero) to stay bit-identical
            # with the explode mirror's F.round and the oracle's DuckDB
            # round — np.rint is half-to-even and diverges on exact
            # .5 milli values (12.5 -> 12 instead of 13).
            s = mat * GRAM_SCALE
            q = np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(
                np.int64
            )
            g = q.T @ q  # exact: |q| <= ~GRAM_SCALE * |x|, int64 safe
            yield pd.DataFrame(
                {"i": ii, "j": jj, "t": g[ii, jj]}
            )

    partials = emb.select(vec_col).mapInPandas(
        _partials, schema="i int, j int, t bigint"
    )
    return _gram_finish(partials)


def sql_gram_matrix(dim: int = EMB_DIM) -> str:
    return f"""
        WITH q AS (
            SELECT list_transform(
                       embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * {GRAM_SCALE})
                                 AS BIGINT)) AS q
            FROM embeddings
        ),
        pairs AS (
            SELECT i.i AS i, j.j AS j, q.q[i.i + 1] * q.q[j.j + 1] AS t
            FROM q,
                 (SELECT unnest(range(0, {dim})) AS i) i,
                 (SELECT unnest(range(0, {dim})) AS j) j
            WHERE j.j >= i.i
        )
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
               CAST(sum(t) AS BIGINT) AS s_scaled,
               round(CAST(sum(t) AS DOUBLE)
                     / {float(GRAM_SCALE * GRAM_SCALE)!r}, 6) AS value
        FROM pairs GROUP BY i, j
    """


# ---------------------------------------------------------------------------
# T128 — PCA projection (completing the Gram-matrix pattern)
# ---------------------------------------------------------------------------
#
# The second half of distributed PCA: the d x d covariance assembles
# on the driver from T126's exact-bigint partials (d = 64 -> 2080
# bounded rows collected, the SAME shape MLlib's RowMatrix uses), the
# eigendecomposition is a driver-side numpy call on a 64x64 matrix,
# and the projection returns to the cluster as a LITERAL matrix
# applied in fixed-order multiply-add chains — a pure narrow plan,
# like T122.  Eigenvector sign is fixed (largest-|component| positive)
# so the output is deterministic.  Not SQL-expressible (the
# eigendecomposition), so this op is pytest- and rows-gated rather
# than oracle-gated; every numeric input to it IS oracle-gated via
# T126.

PCA_K = 4


def _pca_components(emb: DataFrame, k: int, dim: int):
    """Top-k eigenvectors (rows) of the sample covariance, via the
    exact-integer Gram partials + per-dim sums. Returns (components
    [k x dim], explained_ratio [k], n, milli-sums [dim])."""
    import numpy as np

    gram_rows = gram_matrix(emb, dim=dim).collect()
    n = emb.count()
    sums = (
        emb.select(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * GRAM_SCALE).cast(
                    "bigint"
                ),
            ).alias("q")
        )
        .select(
            *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)]
        )
        .collect()[0]
    )
    s = np.array([sums[f"s{i}"] for i in range(dim)], dtype=np.float64)
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["s_scaled"]
    scale2 = float(GRAM_SCALE * GRAM_SCALE)
    cov = g / (n * scale2) - np.outer(s, s) / (n * n * scale2)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # k x dim
    # deterministic sign: largest-|component| coordinate positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    # Clamp tiny negative eigenvalues (numerical noise in the sample
    # covariance) so ratios never exceed 1; a degenerate corpus
    # (constant embeddings) has total == 0 -> all ratios 0.0.
    vals_c = np.clip(vals, 0.0, None)
    total = float(vals_c.sum())
    ratio = [
        (float(vals_c[i]) / total) if total > 0.0 else 0.0 for i in order
    ]
    return comps, ratio, n, s


def pca_project(
    emb: DataFrame,
    k: int = PCA_K,
    dim: int = EMB_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, pc0..pc{k-1}): mean-centered projection onto the top-k
    principal components (6dp).  Centering is folded into a literal
    per-component offset (the projected mean, derived from the SAME
    exact-integer sums as the covariance), so the per-row expression
    stays one fixed-order dot product — deterministic and narrow."""
    comps, _, n, s = _pca_components(emb, k, dim)

    cols = [F.col(id_col)]
    for ki in range(k):
        # offset = <mean, component>, from exact integer milli-sums
        offset = sum(
            float(comps[ki, i]) * (float(s[i]) / (n * GRAM_SCALE))
            for i in range(dim)
        )
        expr = None
        for i in range(dim):
            term = F.col(vec_col)[i].cast("double") * F.lit(
                float(comps[ki, i])
            )
            expr = term if expr is None else expr + term
        cols.append(F.round(expr - F.lit(offset), 6).alias(f"pc{ki}"))
    return emb.select(*cols)


def pca_variance(emb: DataFrame, k: int = PCA_K, dim: int = EMB_DIM) -> DataFrame:
    """(component, explained_ratio): top-k explained-variance shares
    (6dp) — the scree table a dataset card prints."""
    _, ratio, _, _ = _pca_components(emb, k, dim)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, round(r, 6)) for i, r in enumerate(ratio)],
        ["component", "explained_ratio"],
    )


# ---------------------------------------------------------------------------
# T174 — KMV set-intersection estimate between corpus halves
# ---------------------------------------------------------------------------

# "How much does snapshot B share with snapshot A" drives recrawl
# scheduling and dedup budgeting, but the exact answer requires
# shuffling both snapshots' full distinct-gram sets.  The mergeable
# answer is the K-Minimum-Values union trick (Beyer et al. 2007): keep
# each side's k smallest distinct 60-bit gram hashes, take the k
# smallest of their union, and estimate Jaccard as the fraction of
# union-sketch members present in BOTH side sketches (every union-
# sketch member that belongs to a side is necessarily within that
# side's own k minima, so the membership test is exact on the
# sketches).  Intersection cardinality falls out as jaccard x the
# union's KMV cardinality estimate.  Built on the repo's deterministic
# 60-bit md5 hash, every step is integer- or identically-double-
# deterministic, so the DuckDB oracle reproduces the ESTIMATES
# bit-for-bit — the audit columns carry the exact values the sketch
# exists to avoid (a real run drops them).

KMV_OVERLAP_K = 256


def kmv_overlap(
    docs: DataFrame, k: int = KMV_OVERLAP_K, text_col: str = "text"
) -> DataFrame:
    """One row: (m_union, union_kmv, jaccard_kmv, inter_kmv,
    jaccard_exact) comparing the distinct 3-shingle sets of the two
    deterministic corpus halves (doc_id % 2 — the synthetic stand-in
    for two crawl snapshots).

    Scale shape: per-doc shingle dedup is in-row; the only wide
    exchange carries (side, 8-byte hash) pairs for the distinct; the
    two-stage salted rank (as in ``kmv_vocab_estimate``) prunes each
    side to k*salts rows before any global per-side ordering, and
    everything after operates on <= 2k rows.  The exact-Jaccard audit
    column is the one full-width aggregation — drop it in production.
    """
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60, shingles_col

    n_salts = 8
    hashed = (
        docs.select(
            (F.col("doc_id") % 2).cast("int").alias("side"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col)))
            ).alias("w"),
        )
        .select(
            "side", _hash60(F.concat(F.lit("o:"), F.col("w"))).alias("h")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    w1 = W.partitionBy("side", F.pmod(F.col("h"), F.lit(n_salts))).orderBy(
        "h"
    )
    pruned = (
        hashed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .drop("rn1")
    )
    w2 = W.partitionBy("side").orderBy("h")
    side_sk = (
        pruned.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("side", "h")
    )
    # union sketch: k smallest distinct hashes across both side sketches
    wu = W.partitionBy(F.lit(1)).orderBy("h")
    union_sk = (
        side_sk.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
    )
    flags = union_sk.join(
        side_sk.filter(F.col("side") == 0).select(
            "h", F.lit(1).alias("in_a")
        ),
        "h",
        "left",
    ).join(
        side_sk.filter(F.col("side") == 1).select(
            "h", F.lit(1).alias("in_b")
        ),
        "h",
        "left",
    )
    stats = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_union"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
        F.sum(
            (
                F.coalesce("in_a", F.lit(0)) * F.coalesce("in_b", F.lit(0))
            ).cast("bigint")
        ).alias("n_both"),
    )
    union_est = F.when(
        F.col("m_union") < k, F.col("m_union").cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_H60_SPACE_O)
            / F.col("h_k").cast("double")
        )
    )
    jac = F.round(
        F.col("n_both").cast("double") / F.col("m_union").cast("double"), 6
    )
    # exact audit: full distinct sets, side-count per hash
    exact = (
        hashed.groupBy("h")
        .agg(F.countDistinct("side").alias("ns"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_union_exact"),
            F.sum(F.when(F.col("ns") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inter_exact"),
        )
    )
    return stats.crossJoin(exact).select(
        "m_union",
        union_est.cast("bigint").alias("union_kmv"),
        jac.alias("jaccard_kmv"),
        F.floor(jac * union_est).cast("bigint").alias("inter_kmv"),
        F.round(
            F.col("n_inter_exact").cast("double")
            / F.col("n_union_exact").cast("double"),
            6,
        ).alias("jaccard_exact"),
    )


_H60_SPACE_O = float(1 << 60)


def sql_kmv_overlap(k: int = KMV_OVERLAP_K, text_expr: str = "text") -> str:
    """DuckDB mirror: same hash, same two ranks, same estimator
    arithmetic (exactly-representable doubles, then floor)."""
    from ocr_spark.operators.dedup import sql_shingles

    sh = sql_shingles(text_expr)
    return f"""
        WITH hashed AS (
            SELECT DISTINCT side,
                   CAST('0x' || substr(md5('o:' || w), 1, 15) AS BIGINT)
                       AS h
            FROM (
                SELECT CAST(doc_id % 2 AS INTEGER) AS side,
                       unnest({sh}) AS w
                FROM documents)
        ),
        side_sk AS (
            SELECT side, h FROM (
                SELECT side, h,
                       row_number() OVER (PARTITION BY side ORDER BY h)
                           AS rn
                FROM hashed)
            WHERE rn <= {k}
        ),
        union_sk AS (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM side_sk)
            QUALIFY rn <= {k}
        ),
        flags AS (
            SELECT u.rn, u.h,
                   CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a,
                   CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b
            FROM union_sk u
            LEFT JOIN (SELECT h FROM side_sk WHERE side = 0) a
                   ON u.h = a.h
            LEFT JOIN (SELECT h FROM side_sk WHERE side = 1) b
                   ON u.h = b.h
        ),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS m_union,
                   max(CASE WHEN rn = {k} THEN h END) AS h_k,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_both
            FROM flags
        ),
        exact AS (
            SELECT CAST(count(*) AS BIGINT) AS n_union_exact,
                   CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_inter_exact
            FROM (SELECT h, count(DISTINCT side) AS ns
                  FROM hashed GROUP BY h)
        )
        SELECT m_union,
               CAST(CASE WHEN m_union < {k} THEN CAST(m_union AS DOUBLE)
                    ELSE floor({float(k - 1)} * {_H60_SPACE_O} /
                               CAST(h_k AS DOUBLE)) END AS BIGINT)
                   AS union_kmv,
               round(CAST(n_both AS DOUBLE) / CAST(m_union AS DOUBLE), 6)
                   AS jaccard_kmv,
               CAST(floor(round(CAST(n_both AS DOUBLE)
                                / CAST(m_union AS DOUBLE), 6)
                          * CASE WHEN m_union < {k}
                                 THEN CAST(m_union AS DOUBLE)
                                 ELSE floor({float(k - 1)} * {_H60_SPACE_O}
                                            / CAST(h_k AS DOUBLE)) END)
                    AS BIGINT) AS inter_kmv,
               round(CAST(n_inter_exact AS DOUBLE)
                     / CAST(n_union_exact AS DOUBLE), 6) AS jaccard_exact
        FROM stats, exact
    """
