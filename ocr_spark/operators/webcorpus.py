"""Web-corpus governance ops — the URL/host/eval-set hygiene stages a
crawl-scale training pipeline runs between extraction and tokenization:
URL canonicalization, per-host document quotas, benchmark-contamination
screening, and unigram-LM quality scoring.

The reference (an OCR task-queue web app) has none of these; they are
standard web-corpus practice (RefinedWeb's URL dedup + host caps,
Lee et al.'s eval-decontamination, CCNet's LM filtering) built entirely
from Spark built-ins so everything stays JVM-side and codegen'd, each
with a DuckDB SQL mirror generated from the same constants for the
driver's oracle gate.

Scale notes per op:

* ``url_canon`` — pure per-row column expressions (regexp parse +
  higher-order list filter); free at any scale.
* ``host_cap`` — two-stage ranking: a salted per-(host, salt) partial
  ``row_number`` prunes every salt-slice to the cap BEFORE the global
  per-host rank, so a monster host (crawls are Zipf over hosts) puts at
  most cap x n_salts rows through the final per-host sort instead of
  its entire corpus slice.  Stage 1 is safe: a row's global rank is >=
  its salt-local rank, so nothing beyond the cap survives stage 1 that
  stage 2 would have kept.
* ``contamination`` — the eval set is small by nature (benchmarks are
  thousands of docs, not billions), so its distinct gram hashes
  broadcast; the corpus side is one explode + one map-side-combined
  groupBy, and every shuffled row is an 8-byte gram hash, never text.
* ``lm_score`` — the vocabulary is truncated to top-V words (OOV floor
  handles the tail), so the trained model broadcasts and scoring is a
  broadcast join + one per-doc aggregation; the corpus never shuffles
  words except for the one vocabulary count.  Log-probabilities are
  fixed to integer micro-nats per word (round(-ln p * 1e6)) so the
  cross-engine sum is exact bigint arithmetic, not float association.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ocr_spark.operators.dedup import _hash60, shingles_col, sql_shingles

# ---------------------------------------------------------------------------
# T43 — URL canonicalization
# ---------------------------------------------------------------------------

# One RFC-3986-ish split; group 1 scheme, 2 authority, 3 path,
# 4 ?query, 5 #fragment.  No lookaround/backrefs: valid in BOTH Java
# regex (Spark) and RE2 (DuckDB).
_URL_RE = r"^([^:]+)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$"

# Tracking params stripped during canonicalization (find-anywhere
# anchored at start in both engines).
_TRACKER_RE = r"^(utm_|fbclid|gclid)"


def plant_url_col(doc_id: Column, source: Column) -> Column:
    """Deterministic messy URL per doc — the synthetic corpus has no
    url column, so one is constructed (mixed-case scheme/host, www
    prefixes, default and non-default ports, tracker params, fragments)
    keyed on doc_id so every canonicalization branch gets real work.
    The DuckDB mirror builds the identical string."""
    scheme = F.when(doc_id % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    hostmid = F.when(doc_id % 3 == 0, F.upper(source)).otherwise(source)
    www = F.when(doc_id % 5 == 0, F.lit("")).otherwise(F.lit("WWW."))
    port = (
        F.when(doc_id % 4 == 0, F.lit(":80"))
        .when(doc_id % 4 == 1, F.lit(":443"))
        .when(doc_id % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(doc_id % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/Articles/"), doc_id.cast("string"))
    )
    query = F.when(doc_id % 6 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("?utm_source=feed&id="),
            (doc_id % 97).cast("string"),
            F.lit("&fbclid=x"),
            doc_id.cast("string"),
            F.lit("&ref="),
            source,
        )
    )
    frag = F.when(doc_id % 2 == 1, F.concat(F.lit("#sec-"), (doc_id % 5).cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(
        scheme, F.lit("://"), www, hostmid, F.lit(".com"), port, path, query, frag
    )


def sql_plant_url(doc_id: str = "doc_id", source: str = "source") -> str:
    return f"""(
        CASE WHEN {doc_id} % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://'
        || CASE WHEN {doc_id} % 5 = 0 THEN '' ELSE 'WWW.' END
        || CASE WHEN {doc_id} % 3 = 0 THEN upper({source}) ELSE {source} END
        || '.com'
        || CASE {doc_id} % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                             WHEN 2 THEN ':8080' ELSE '' END
        || CASE WHEN {doc_id} % 7 = 0 THEN ''
                ELSE '/Articles/' || CAST({doc_id} AS VARCHAR) END
        || CASE WHEN {doc_id} % 6 = 0 THEN ''
                ELSE '?utm_source=feed&id=' || CAST({doc_id} % 97 AS VARCHAR)
                     || '&fbclid=x' || CAST({doc_id} AS VARCHAR)
                     || '&ref=' || {source} END
        || CASE WHEN {doc_id} % 2 = 1
                THEN '#sec-' || CAST({doc_id} % 5 AS VARCHAR) ELSE '' END
    )"""


def canonicalize_url(url: Column) -> dict:
    """Canonical form of a URL, all column expressions:
    lowercase scheme+host, strip ``www.``, drop the default port for
    the scheme, empty path -> ``/``, strip tracking params (utm_*,
    fbclid, gclid) preserving the order of the rest, drop the
    fragment.  Returns {'canon_url', 'host', 'n_params_stripped'}."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    authority = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path_raw = F.regexp_extract(url, _URL_RE, 3)
    qs = F.regexp_extract(url, _URL_RE, 4)

    host = F.regexp_replace(
        F.regexp_extract(authority, r"^([^:]+)", 1), r"^www\.", ""
    )
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default_port = (
        (scheme == "http") & (port == "80")
        | (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)

    raw_params = F.when(qs == "", F.array().cast("array<string>")).otherwise(
        F.split(F.substring(qs, 2, 1 << 20), "&")
    )
    kept = F.filter(
        raw_params, lambda p: (p != "") & ~p.rlike(_TRACKER_RE)
    )
    q_part = F.when(F.size(kept) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(kept, "&"))
    )

    return {
        "canon_url": F.concat(
            scheme, F.lit("://"), host, port_part, path, q_part
        ),
        "host": host,
        "n_params_stripped": (F.size(raw_params) - F.size(kept)).cast("bigint"),
    }


def url_canon(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(doc_id, url_raw, canon_url, host, n_params_stripped) — plant a
    messy URL and canonicalize it, per row."""
    url = plant_url_col(F.col(key_col), F.col("source"))
    parts = canonicalize_url(url)
    return docs.select(
        F.col(key_col).alias("doc_id"),
        url.alias("url_raw"),
        parts["canon_url"].alias("canon_url"),
        parts["host"].alias("host"),
        parts["n_params_stripped"].alias("n_params_stripped"),
    )


def sql_url_canon() -> str:
    url = sql_plant_url()
    # DuckDB regexp_extract(s, re, group); RE2 semantics.
    re = _URL_RE.replace("\\", "\\\\").replace("'", "''")
    # NB: keep these expressions textually parallel to canonicalize_url.
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '{re}', 1)) AS scheme,
                   lower(regexp_extract(url, '{re}', 2)) AS authority,
                   regexp_extract(url, '{re}', 3) AS path_raw,
                   regexp_extract(url, '{re}', 4) AS qs
            FROM u
        ),
        comp AS (
            SELECT doc_id, url, scheme, qs,
                   regexp_replace(regexp_extract(authority, '^([^:]+)', 1),
                                  '^www\\.', '') AS host,
                   regexp_extract(authority, ':([0-9]+)$', 1) AS port,
                   CASE WHEN path_raw = '' THEN '/' ELSE path_raw END AS path,
                   CASE WHEN qs = '' THEN []
                        ELSE string_split(substr(qs, 2), '&') END AS raw_params
            FROM parts
        ),
        fin AS (
            SELECT doc_id, url, scheme, host, path,
                   CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                             OR (scheme = 'https' AND port = '443')
                        THEN '' ELSE ':' || port END AS port_part,
                   list_filter(raw_params,
                               p -> p <> '' AND NOT regexp_matches(p, '{_TRACKER_RE}'))
                       AS kept,
                   len(raw_params) AS n_raw
            FROM comp
        )
        SELECT doc_id, url AS url_raw,
               scheme || '://' || host || port_part || path ||
               CASE WHEN len(kept) = 0 THEN ''
                    ELSE '?' || array_to_string(kept, '&') END AS canon_url,
               host,
               CAST(n_raw - len(kept) AS BIGINT) AS n_params_stripped
        FROM fin
    """


# ---------------------------------------------------------------------------
# T44 — per-host document quota (RefinedWeb-style host caps)
# ---------------------------------------------------------------------------

HOST_CAP = 20
HOST_CAP_SALTS = 16


def host_cap(
    docs: DataFrame,
    cap: int = HOST_CAP,
    host_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` docs per host, chosen by a deterministic
    md5 hash order (uniform, reproducible across engines and cluster
    sizes — unlike rand()).  Emits the kept rows with their rank.

    Two-stage rank so one Zipf-hot host can't serialize a reducer:
    stage 1 ranks within (host, salt) and discards beyond the cap —
    correct because a row's global in-host rank is >= its salt-local
    rank — leaving <= cap x n_salts rows per host for the global
    stage-2 rank."""
    from pyspark.sql import Window

    ordv = F.md5(
        F.concat(F.col(host_col), F.lit("#"), F.col(key_col).cast("string"))
    )
    salt = F.col(key_col) % HOST_CAP_SALTS
    w1 = (
        Window.partitionBy(F.col(host_col), salt)
        .orderBy(ordv.asc(), F.col(key_col).asc())
    )
    pruned = (
        docs.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= cap)
        .drop("_rn1")
    )
    w2 = Window.partitionBy(host_col).orderBy(ordv.asc(), F.col(key_col).asc())
    return (
        pruned.withColumn("rnk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rnk") <= cap)
        .select(F.col(key_col).alias("doc_id"), F.col(host_col).alias("host"), "rnk")
    )


def sql_host_cap(cap: int = HOST_CAP) -> str:
    # The salt prefilter is a physical optimization only; the result
    # equals the plain per-host rank, which is what the oracle states.
    return f"""
        SELECT doc_id, host, rnk FROM (
            SELECT doc_id, source AS host,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(source || '#' || CAST(doc_id AS VARCHAR)),
                                doc_id
                   ) AS BIGINT) AS rnk
            FROM documents)
        WHERE rnk <= {cap}
    """


# ---------------------------------------------------------------------------
# T45 — benchmark-contamination screen (Lee et al.-style n-gram overlap)
# ---------------------------------------------------------------------------

CONTAM_K = 8  # words per gram
EVAL_MOD = 101  # doc_id % EVAL_MOD == 0 -> member of the "benchmark"


def contamination(
    docs: DataFrame,
    k: int = CONTAM_K,
    eval_mod: int = EVAL_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus docs sharing any k-word gram with the eval set
    (here: every ``eval_mod``-th doc stands in for a benchmark).
    Emits (doc_id, in_eval, n_shared, contaminated) for every doc.

    Scale shape: gram hashes are 60-bit bigints (8 bytes through every
    shuffle, never text); the eval side is distinct + broadcast (real
    benchmarks are tiny next to the corpus); the corpus side is one
    explode + map-side-combined distinct count."""
    grams = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(
            F.array_distinct(shingles_col(F.col(text_col), k))
        ).alias("s"),
    ).select("doc_id", _hash60(F.col("s")).alias("g"))

    eval_grams = (
        grams.filter(F.col("doc_id") % eval_mod == 0).select("g").distinct()
    )
    shared = (
        grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
    )
    return (
        docs.select(
            F.col(key_col).alias("doc_id"),
            (F.col(key_col) % eval_mod == 0).alias("in_eval"),
        )
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "in_eval",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sql_contamination(k: int = CONTAM_K, eval_mod: int = EVAL_MOD) -> str:
    sh = sql_shingles("text", k)
    return f"""
        WITH grams AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS g
            FROM (SELECT doc_id, unnest(list_distinct({sh})) AS s
                  FROM documents)
        ),
        eval_grams AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % {eval_mod} = 0
        ),
        shared AS (
            SELECT doc_id, count(DISTINCT grams.g) AS n_shared
            FROM grams JOIN eval_grams ON grams.g = eval_grams.g
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               d.doc_id % {eval_mod} = 0 AS in_eval,
               CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
               COALESCE(s.n_shared, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
    """


# ---------------------------------------------------------------------------
# T46 — unigram-LM quality score (CCNet-style LM filtering, unigram model)
# ---------------------------------------------------------------------------

LM_VOCAB = 4096
LM_TRAIN_MOD = 2  # train on doc_id % 2 == 0, score everything

# Per-word log-probs are fixed to integer micro-nats BEFORE summing:
# round(-ln(p) * 1e6) as BIGINT.  The cross-engine doc score is then an
# exact integer sum divided once — no float-association drift between
# Spark's partial aggregation and DuckDB's sequential sum.  (Java
# Math.log and libm log can disagree in the last ulp; at 1e-6
# granularity a flip needs the true value within ~1 ulp of a rounding
# boundary — negligible, and a mismatch would surface in the oracle
# gate immediately.)
_LP_SCALE = 1_000_000


def _lp_col(p: Column) -> Column:
    return F.round(-F.log(p) * _LP_SCALE).cast("bigint")


def lm_score(
    docs: DataFrame,
    v: int = LM_VOCAB,
    train_mod: int = LM_TRAIN_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
    with_raw: bool = False,
) -> DataFrame:
    """Per-doc mean unigram surprisal in nats under a model trained on
    half the corpus, truncated to the top-``v`` words; out-of-vocab
    words get a 0.5/T floor.  Low score = stereotyped/common text,
    high = rare/noisy — the CCNet filtering signal, unigram-order.

    Emits (doc_id, n_words, n_oov, score)."""
    from ocr_spark.operators.corpus_ops import _words

    train_words = (
        docs.filter(F.col(key_col) % train_mod == 0)
        .select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
    )
    tot = train_words.agg(F.count(F.lit(1)).alias("T"))
    vocab = (
        train_words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(v)
    )
    # trained model: bounded (<= v rows) -> broadcast to the scorers
    model = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        _lp_col(F.col("n").cast("double") / F.col("T").cast("double")).alias(
            "lp"
        ),
    )
    oov = tot.select(
        _lp_col(F.lit(0.5) / F.col("T").cast("double")).alias("oov_lp")
    )

    doc_words = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    scored = (
        doc_words.join(F.broadcast(model), "word", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("lp").isNull().cast("bigint")).alias("n_oov"),
            F.sum(F.coalesce("lp", "oov_lp")).alias("lp_sum"),
        )
    )
    out = scored.select(
        "doc_id",
        "n_words",
        "n_oov",
        F.round(
            F.col("lp_sum").cast("double")
            / (F.lit(float(_LP_SCALE)) * F.col("n_words").cast("double")),
            6,
        ).alias("score"),
        "lp_sum",
    )
    return out if with_raw else out.drop("lp_sum")


# ---------------------------------------------------------------------------
# T47 — TF-IDF keyword extraction
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def tfidf_keywords(
    docs: DataFrame,
    topk: int = TFIDF_TOPK,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``topk`` keywords per doc by tf-idf.  idf is fixed to
    integer micro-nats per word — round(ln(N/df) * 1e6) as BIGINT — so
    the per-word score tf x idf is exact bigint arithmetic and ranking
    ties are engine-independent (score desc, word asc).

    Scale shape: one shuffle for (doc, word) tf counts (map-side
    combine collapses each partition's repeats first), one word-keyed
    agg for df, a 1:n join back on word (the Zipf-hot common words are
    exactly the low-idf ones, and the build side is one row per word),
    then a per-doc top-k window.  No floats until the final display
    division.  Emits (doc_id, rnk, word, score)."""
    from pyspark.sql import Window

    from ocr_spark.operators.corpus_ops import _words

    dw = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    tf = dw.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).alias("N")
    )
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "word",
        F.round(
            F.log(F.col("N").cast("double") / F.col("df").cast("double"))
            * _LP_SCALE
        )
        .cast("bigint")
        .alias("idf_u"),
    )
    scored = tf.join(idf, "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.col("idf_u")).alias("score_u"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_u"), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= topk)
        .select(
            "doc_id",
            "rnk",
            "word",
            F.round(F.col("score_u").cast("double") / _LP_SCALE, 6).alias(
                "score"
            ),
        )
    )


def sql_tfidf_keywords(topk: int = TFIDF_TOPK) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    return f"""
        WITH dw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM dw GROUP BY doc_id, word
        ),
        idf AS (
            SELECT word,
                   CAST(round(ln(CAST((SELECT count(*) FROM documents)
                                      AS DOUBLE) / CAST(count(*) AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS idf_u
            FROM tf GROUP BY word
        ),
        scored AS (
            SELECT tf.doc_id, tf.word, tf.tf * idf.idf_u AS score_u
            FROM tf JOIN idf ON tf.word = idf.word
        )
        SELECT doc_id, rnk, word,
               round(CAST(score_u AS DOUBLE) / {_LP_SCALE}, 6) AS score
        FROM (
            SELECT doc_id, word, score_u,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_u DESC, word ASC) AS BIGINT) AS rnk
            FROM scored)
        WHERE rnk <= {topk}
    """


def sql_lm_score(v: int = LM_VOCAB, train_mod: int = LM_TRAIN_MOD) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    return f"""
        WITH train_words AS (
            SELECT w AS word FROM (
                SELECT unnest({w}) AS w FROM documents
                WHERE doc_id % {train_mod} = 0)
            WHERE w <> ''
        ),
        tot AS (SELECT count(*) AS T FROM train_words),
        vocab AS (
            SELECT word, count(*) AS n FROM train_words
            GROUP BY word ORDER BY n DESC, word ASC LIMIT {v}
        ),
        model AS (
            SELECT word,
                   CAST(round(-ln(CAST(n AS DOUBLE) / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS lp
            FROM vocab CROSS JOIN tot
        ),
        oov AS (
            SELECT CAST(round(-ln(0.5 / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS oov_lp
            FROM tot
        ),
        doc_words AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        )
        SELECT doc_id,
               count(*) AS n_words,
               CAST(sum(CASE WHEN m.lp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               round(CAST(sum(COALESCE(m.lp, o.oov_lp)) AS DOUBLE)
                     / ({_LP_SCALE}.0 * count(*)), 6) AS score
        FROM doc_words d
        LEFT JOIN model m ON d.word = m.word
        CROSS JOIN oov o
        GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# T69 — bigram LM scoring with stupid backoff
# ---------------------------------------------------------------------------

BIGRAM_VOCAB = 4096          # bigram table rows kept (bounded, broadcast)
# -ln(0.4) in micro-nats: the stupid-backoff penalty (Brants et al. 2007)
BACKOFF_MICRO = 916_291


def bigram_score(
    docs: DataFrame,
    v: int = LM_VOCAB,
    bv: int = BIGRAM_VOCAB,
    train_mod: int = LM_TRAIN_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_pairs, n_backoff, score): per-doc mean bigram
    surprisal under stupid backoff (Brants et al. 2007) — score(w2|w1)
    = count(w1 w2)/count(w1) when the bigram is in the top-``bv``
    table, else 0.4 x unigram(w2). Closes lm_score's unigram-order
    limitation: repetitive but locally-fluent spam scores differently
    from real prose.

    Scale shape: both model tables are bounded (<= bv / v rows) and
    broadcast; the doc side explodes adjacent word pairs in one pass
    (slice+zip column expressions, no Python) and shuffles only the
    per-doc aggregation. Integer micro-nat log-probs keep the
    cross-engine sum exact."""
    from ocr_spark.operators.corpus_ops import _words

    train = docs.filter(F.col(key_col) % train_mod == 0)

    def pairs_of(side, with_key):
        w = _words(F.col(text_col))
        z = F.arrays_zip(
            F.expr("slice(_w, 1, greatest(size(_w) - 1, 0))").alias("a"),
            F.expr("slice(_w, 2, greatest(size(_w) - 1, 0))").alias("b"),
        )
        cols = [F.col(key_col).alias("doc_id")] if with_key else []
        return (
            side.withColumn("_w", w)
            .select(*cols, F.explode(z).alias("p"))
            .select(
                *(["doc_id"] if with_key else []),
                F.col("p.a").alias("w1"),
                F.col("p.b").alias("w2"),
            )
            .filter((F.col("w1") != "") & (F.col("w2") != ""))
        )

    train_pairs = pairs_of(train, with_key=False)
    train_words = train.select(
        F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")

    uni_counts = train_words.groupBy("word").agg(F.count(F.lit(1)).alias("c1"))
    big_counts = (
        train_pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(bv)
    )
    bigram_model = big_counts.join(
        uni_counts.withColumnRenamed("word", "w1"), "w1"
    ).select(
        "w1",
        "w2",
        _lp_col(F.col("c12").cast("double") / F.col("c1").cast("double")).alias(
            "lp_bi"
        ),
    )

    tot = train_words.agg(F.count(F.lit(1)).alias("T"))
    uni_model = (
        uni_counts.orderBy(F.desc("c1"), F.asc("word"))
        .limit(v)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("word").alias("w2"),
            _lp_col(
                F.col("c1").cast("double") / F.col("T").cast("double")
            ).alias("lp_uni"),
        )
    )
    oov = tot.select(
        _lp_col(F.lit(0.5) / F.col("T").cast("double")).alias("oov_lp")
    )

    doc_pairs = pairs_of(docs, with_key=True)
    scored = (
        doc_pairs.join(F.broadcast(bigram_model), ["w1", "w2"], "left")
        .join(F.broadcast(uni_model), "w2", "left")
        .crossJoin(F.broadcast(oov))
        .withColumn(
            "lp",
            F.coalesce(
                "lp_bi",
                F.coalesce("lp_uni", "oov_lp") + F.lit(BACKOFF_MICRO),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("lp_bi").isNull().cast("bigint")).alias("n_backoff"),
            F.sum("lp").alias("lp_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_pairs",
        "n_backoff",
        F.round(
            F.col("lp_sum").cast("double")
            / (F.lit(float(_LP_SCALE)) * F.col("n_pairs").cast("double")),
            6,
        ).alias("score"),
    )


def sql_bigram_score(
    v: int = LM_VOCAB, bv: int = BIGRAM_VOCAB, train_mod: int = LM_TRAIN_MOD
) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    return f"""
        WITH train_docs AS (
            SELECT doc_id, {w} AS words FROM documents
            WHERE doc_id % {train_mod} = 0
        ),
        train_pairs AS (
            SELECT words[i] AS w1, words[i + 1] AS w2
            FROM train_docs, unnest(range(1, len(words))) AS r(i)
            WHERE words[i] <> '' AND words[i + 1] <> ''
        ),
        train_words AS (
            SELECT w AS word FROM (
                SELECT unnest(words) AS w FROM train_docs)
            WHERE w <> ''
        ),
        uni_counts AS (
            SELECT word, count(*) AS c1 FROM train_words GROUP BY word
        ),
        big_counts AS (
            SELECT w1, w2, count(*) AS c12 FROM train_pairs
            GROUP BY w1, w2 ORDER BY c12 DESC, w1 ASC, w2 ASC LIMIT {bv}
        ),
        bigram_model AS (
            SELECT b.w1, b.w2,
                   CAST(round(-ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS lp_bi
            FROM big_counts b JOIN uni_counts u ON b.w1 = u.word
        ),
        tot AS (SELECT count(*) AS T FROM train_words),
        uni_model AS (
            SELECT word AS w2,
                   CAST(round(-ln(CAST(c1 AS DOUBLE) / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS lp_uni
            FROM (SELECT word, c1 FROM uni_counts
                  ORDER BY c1 DESC, word ASC LIMIT {v})
            CROSS JOIN tot
        ),
        oov AS (
            SELECT CAST(round(-ln(0.5 / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS oov_lp
            FROM tot
        ),
        doc_pairs AS (
            SELECT d.doc_id, words[i] AS w1, words[i + 1] AS w2
            FROM (SELECT doc_id, {w} AS words FROM documents) d,
                 unnest(range(1, len(words))) AS r(i)
            WHERE words[i] <> '' AND words[i + 1] <> ''
        )
        SELECT doc_id,
               count(*) AS n_pairs,
               CAST(sum(CASE WHEN m.lp_bi IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_backoff,
               round(CAST(sum(COALESCE(m.lp_bi,
                              COALESCE(u.lp_uni, o.oov_lp) + {BACKOFF_MICRO}))
                          AS DOUBLE)
                     / ({_LP_SCALE}.0 * count(*)), 6) AS score
        FROM doc_pairs p
        LEFT JOIN bigram_model m ON p.w1 = m.w1 AND p.w2 = m.w2
        LEFT JOIN uni_model u ON p.w2 = u.w2
        CROSS JOIN oov o
        GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# T67 — DSIR importance weights (target/source unigram log-ratio)
# ---------------------------------------------------------------------------

DSIR_TARGET_MOD = 10  # every 10th doc plays the "target domain" sample


def _unigram_model(
    train_words: DataFrame, v: int, tag: str
) -> tuple[DataFrame, DataFrame]:
    """(model, oov): top-``v`` unigram table with integer micro-nat
    surprisals and the 0.5/T OOV floor — the shared trainer for
    lm_score and the DSIR pair."""
    tot = train_words.agg(F.count(F.lit(1)).alias("T"))
    vocab = (
        train_words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(v)
    )
    model = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        _lp_col(F.col("n").cast("double") / F.col("T").cast("double")).alias(
            f"lp_{tag}"
        ),
    )
    oov = tot.select(
        _lp_col(F.lit(0.5) / F.col("T").cast("double")).alias(f"oov_{tag}")
    )
    return model, oov


def dsir_weights(
    docs: DataFrame,
    v: int = LM_VOCAB,
    target_mod: int = DSIR_TARGET_MOD,
    source_mod: int = LM_TRAIN_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, logw_micro, logw_per_word): DSIR importance
    weights (Xie et al. 2023) — per doc, ``ln(p_target/p_source)``
    under two unigram LMs, one trained on the target-domain sample
    (``doc_id % target_mod == 0``) and one on the source half. High
    weight = target-like text; feed into weighted/mixture sampling
    (T54/T55) for importance resampling.

    ``logw_micro = sum(lp_src - lp_tgt)`` stays in integer micro-nats
    until the final per-word division, so the cross-engine sum is
    exact. Both models are bounded (<= v rows) and broadcast; the doc
    side is scanned once and never shuffled beyond the per-doc agg."""
    from ocr_spark.operators.corpus_ops import _words

    def words_of(side):
        return side.select(
            F.explode(_words(F.col(text_col))).alias("word")
        ).filter(F.col("word") != "")

    tgt_model, tgt_oov = _unigram_model(
        words_of(docs.filter(F.col(key_col) % target_mod == 0)), v, "tgt"
    )
    src_model, src_oov = _unigram_model(
        words_of(docs.filter(F.col(key_col) % source_mod == 0)), v, "src"
    )
    doc_words = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    scored = (
        doc_words.join(F.broadcast(tgt_model), "word", "left")
        .join(F.broadcast(src_model), "word", "left")
        .crossJoin(F.broadcast(tgt_oov))
        .crossJoin(F.broadcast(src_oov))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(
                F.coalesce("lp_src", "oov_src")
                - F.coalesce("lp_tgt", "oov_tgt")
            ).alias("logw_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_words",
        "logw_micro",
        F.round(
            F.col("logw_micro").cast("double")
            / (F.lit(float(_LP_SCALE)) * F.col("n_words").cast("double")),
            6,
        ).alias("logw_per_word"),
    )


def sql_dsir_weights(
    v: int = LM_VOCAB,
    target_mod: int = DSIR_TARGET_MOD,
    source_mod: int = LM_TRAIN_MOD,
) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")

    def model_cte(tag: str, mod: int) -> str:
        return f"""
        {tag}_words AS (
            SELECT w AS word FROM (
                SELECT unnest({w}) AS w FROM documents
                WHERE doc_id % {mod} = 0)
            WHERE w <> ''
        ),
        {tag}_tot AS (SELECT count(*) AS T FROM {tag}_words),
        {tag}_vocab AS (
            SELECT word, count(*) AS n FROM {tag}_words
            GROUP BY word ORDER BY n DESC, word ASC LIMIT {v}
        ),
        {tag}_model AS (
            SELECT word,
                   CAST(round(-ln(CAST(n AS DOUBLE) / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS lp_{tag}
            FROM {tag}_vocab CROSS JOIN {tag}_tot
        ),
        {tag}_oov AS (
            SELECT CAST(round(-ln(0.5 / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS oov_{tag}
            FROM {tag}_tot
        )"""

    return f"""
        WITH {model_cte("tgt", target_mod)},
        {model_cte("src", source_mod)},
        doc_words AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        )
        SELECT doc_id,
               count(*) AS n_words,
               CAST(sum(COALESCE(s.lp_src, so.oov_src)
                        - COALESCE(t.lp_tgt, to_.oov_tgt)) AS BIGINT)
                   AS logw_micro,
               round(CAST(sum(COALESCE(s.lp_src, so.oov_src)
                              - COALESCE(t.lp_tgt, to_.oov_tgt)) AS DOUBLE)
                     / ({_LP_SCALE}.0 * count(*)), 6) AS logw_per_word
        FROM doc_words d
        LEFT JOIN tgt_model t ON d.word = t.word
        LEFT JOIN src_model s ON d.word = s.word
        CROSS JOIN tgt_oov to_
        CROSS JOIN src_oov so
        GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# T65 — robots-style longest-prefix URL filter
# ---------------------------------------------------------------------------


def robots_rules(docs: DataFrame) -> DataFrame:
    """(host, prefix, allow): deterministic per-host rule set derived
    from the corpus's hosts — a catch-all allow, a parity-keyed
    ``/Articles`` deny, and a longer ``/Articles/1`` allow override so
    the longest-prefix-match branch gets real work. The DuckDB mirror
    states the identical rules."""
    hosts = docs.select(
        F.concat(F.lower(F.col("source")), F.lit(".com")).alias("host"),
        F.length(F.col("source")).alias("slen"),
    ).distinct()
    rules = F.array(
        F.struct(F.lit("/").alias("prefix"), F.lit(True).alias("allow")),
        F.when(
            F.col("slen") % 2 == 0,
            F.struct(F.lit("/Articles").alias("prefix"), F.lit(False).alias("allow")),
        ),
        F.when(
            F.col("slen") % 2 == 0,
            F.struct(F.lit("/Articles/1").alias("prefix"), F.lit(True).alias("allow")),
        ),
    )
    return (
        hosts.select("host", F.explode(rules).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("host", F.col("r.prefix").alias("prefix"), F.col("r.allow").alias("allow"))
    )


def robots_filter(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, path, matched_prefix, allowed): robots.txt-style
    admission — longest matching prefix wins, allow wins length ties
    (Google's robots spec, RFC 9309 §2.2.2).

    Scale shape: the rule table is one row per (host, rule) —
    broadcast; the corpus side joins on host and never shuffles. The
    per-doc best-rule pick is a ``max(struct(len, allow, prefix))``
    aggregation, map-side combinable, with fan-out bounded by
    rules-per-host (here <= 3)."""
    url = plant_url_col(F.col(key_col), F.col("source"))
    parts = canonicalize_url(url)
    paths = docs.select(
        F.col(key_col).alias("doc_id"),
        parts["host"].alias("host"),
        F.regexp_extract(parts["canon_url"], r"^[^:]+://[^/]+(/[^?#]*)", 1).alias(
            "path"
        ),
    )
    joined = paths.join(F.broadcast(robots_rules(docs)), "host").filter(
        F.col("path").startswith(F.col("prefix"))
    )
    best = joined.groupBy("doc_id", "host", "path").agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").alias("allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("b")
    )
    return best.select(
        "doc_id",
        "host",
        "path",
        F.col("b.prefix").alias("matched_prefix"),
        F.col("b.allow").alias("allowed"),
    )


def sql_robots_filter() -> str:
    url = sql_plant_url()
    return f"""
        WITH urls AS (
            SELECT doc_id, lower(source) || '.com' AS host,
                   length(source) AS slen,
                   CASE WHEN doc_id % 7 = 0 THEN '/'
                        ELSE '/Articles/' || CAST(doc_id AS VARCHAR) END AS path
            FROM documents
        ),
        rules AS (
            SELECT DISTINCT host, '/' AS prefix, TRUE AS allow FROM urls
            UNION ALL
            SELECT DISTINCT host, '/Articles', FALSE FROM urls WHERE slen % 2 = 0
            UNION ALL
            SELECT DISTINCT host, '/Articles/1', TRUE FROM urls WHERE slen % 2 = 0
        ),
        matched AS (
            SELECT u.doc_id, u.host, u.path, r.prefix, r.allow,
                   row_number() OVER (
                       PARTITION BY u.doc_id
                       ORDER BY length(r.prefix) DESC, r.allow DESC,
                                r.prefix DESC
                   ) AS rk
            FROM urls u JOIN rules r
              ON u.host = r.host AND starts_with(u.path, r.prefix)
        )
        SELECT doc_id, host, path,
               prefix AS matched_prefix, allow AS allowed
        FROM matched WHERE rk = 1
    """


# ---------------------------------------------------------------------------
# T64 — CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------

PPL_BIN_SCALE = 100  # centinat bins: bounded range, broadcastable histogram


def perplexity_buckets(
    docs: DataFrame,
    v: int = LM_VOCAB,
    train_mod: int = LM_TRAIN_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang, bin, bucket): CCNet's language-model filtering
    split (Wenzek et al. 2020) — per language, docs are bucketed
    head/middle/tail by unigram surprisal terciles.

    Scale shape: NO per-language global sort (an ntile window would
    push each language's 10^12 docs through one reducer). Instead the
    doc score is floored to an integer centinat bin — pure integer
    arithmetic ``(lp_sum * 100) div (1e6 * n_words)``, hash-exact
    cross-engine — the per-(lang, bin) histogram is a map-side-combined
    count over a BOUNDED key space (~2000 bins x languages), tercile
    thresholds fall out of a window over that tiny table, and labels
    come back via a broadcast join. Whole-bin assignment at the
    boundaries (every doc in one bin gets one label) keeps the split
    deterministic."""
    from pyspark.sql import Window as W

    scored = lm_score(
        docs, v=v, train_mod=train_mod, key_col=key_col,
        text_col=text_col, with_raw=True,
    )
    langd = docs.select(F.col(key_col).alias("doc_id"), "lang")
    binned = scored.join(langd, "doc_id").select(
        "doc_id",
        "lang",
        F.expr(
            f"(lp_sum * {PPL_BIN_SCALE}) div ({_LP_SCALE}L * n_words)"
        ).alias("bin"),
    )
    hist = binned.groupBy("lang", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        W.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("lang")
    labels = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wall))
        .select(
            "lang",
            "bin",
            F.when(F.col("cum") * 3 <= F.col("n"), F.lit("head"))
            .when(F.col("cum") * 3 <= 2 * F.col("n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
    return binned.join(F.broadcast(labels), ["lang", "bin"]).select(
        "doc_id", "lang", "bin", "bucket"
    )


def sql_perplexity_buckets(
    v: int = LM_VOCAB, train_mod: int = LM_TRAIN_MOD
) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    return f"""
        WITH train_words AS (
            SELECT w AS word FROM (
                SELECT unnest({w}) AS w FROM documents
                WHERE doc_id % {train_mod} = 0)
            WHERE w <> ''
        ),
        tot AS (SELECT count(*) AS T FROM train_words),
        vocab AS (
            SELECT word, count(*) AS n FROM train_words
            GROUP BY word ORDER BY n DESC, word ASC LIMIT {v}
        ),
        model AS (
            SELECT word,
                   CAST(round(-ln(CAST(n AS DOUBLE) / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS lp
            FROM vocab CROSS JOIN tot
        ),
        oov AS (
            SELECT CAST(round(-ln(0.5 / CAST(T AS DOUBLE))
                              * {_LP_SCALE}) AS BIGINT) AS oov_lp
            FROM tot
        ),
        doc_words AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        scored AS (
            SELECT doc_id, count(*) AS n_words,
                   CAST(sum(COALESCE(m.lp, o.oov_lp)) AS BIGINT) AS lp_sum
            FROM doc_words d
            LEFT JOIN model m ON d.word = m.word
            CROSS JOIN oov o
            GROUP BY doc_id
        ),
        binned AS (
            SELECT s.doc_id, dd.lang,
                   CAST((lp_sum * {PPL_BIN_SCALE})
                        // ({_LP_SCALE} * n_words) AS BIGINT) AS bin
            FROM scored s JOIN documents dd ON s.doc_id = dd.doc_id
        ),
        hist AS (
            SELECT lang, bin, count(*) AS cnt FROM binned GROUP BY lang, bin
        ),
        labels AS (
            SELECT lang, bin,
                   CASE WHEN sum(cnt) OVER (
                            PARTITION BY lang ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) * 3
                        <= sum(cnt) OVER (PARTITION BY lang) THEN 'head'
                        WHEN sum(cnt) OVER (
                            PARTITION BY lang ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) * 3
                        <= 2 * sum(cnt) OVER (PARTITION BY lang) THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM hist
        )
        SELECT b.doc_id, b.lang, b.bin, l.bucket
        FROM binned b JOIN labels l ON b.lang = l.lang AND b.bin = l.bin
    """


# ---------------------------------------------------------------------------
# T57 — cross-snapshot crawl diff
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl delta between two corpus snapshots, keyed by document:
    (key, change, old_hash, new_hash) with change in
    added | removed | changed | unchanged.  This is the front gate of
    incremental processing — only 'added'/'changed' rows re-enter
    extraction/dedup, which is what makes a weekly 10^12-row recrawl
    a fraction of a full run.

    Scale shape: ONE full outer hash join on the key, both sides
    pre-projected to (key, md5) — 40 bytes/row through the shuffle,
    never text; at production scale both snapshots are bucketed on
    url-hash so the join is exchange-free (plans.bucketed)."""
    o = old.select(
        F.col(key_col).alias("k"), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(key_col).alias("k"), F.md5(F.col(text_col)).alias("new_hash")
    )
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col),
        change.alias("change"),
        "old_hash",
        "new_hash",
    )


def sql_snapshot_diff(
    old_sql: str, new_sql: str, key: str = "doc_id", text: str = "text"
) -> str:
    return f"""
        SELECT COALESCE(o.k, n.k) AS {key},
               CASE WHEN o.old_hash IS NULL THEN 'added'
                    WHEN n.new_hash IS NULL THEN 'removed'
                    WHEN o.old_hash = n.new_hash THEN 'unchanged'
                    ELSE 'changed' END AS change,
               o.old_hash, n.new_hash
        FROM (SELECT {key} AS k, md5({text}) AS old_hash FROM ({old_sql})) o
        FULL OUTER JOIN
             (SELECT {key} AS k, md5({text}) AS new_hash FROM ({new_sql})) n
          ON o.k = n.k
    """


# ---------------------------------------------------------------------------
# T60 — Bloom-filter decontamination (constant-size membership screen)
# ---------------------------------------------------------------------------
#
# ``contamination`` broadcasts the eval set's distinct gram hashes —
# right when the eval set is benchmark-sized.  A decontamination pass
# against a HUGE reference corpus (e.g. "drop anything seen in an
# earlier training run", the Dolma/BFF shape) cannot broadcast the
# gram table; the production tool is a Bloom filter: a constant-size
# bitset every executor holds, at the cost of a deterministic
# false-positive rate.  This Bloom is engine-exact by construction —
# j=3 probe positions are integer shifts of the same 60-bit md5 gram
# hash, the bitset is OR-folded 32-bit words, and the membership test
# is pure integer ops — so the Spark pass and the DuckDB oracle agree
# bit-for-bit INCLUDING false positives.

BLOOM_BITS = 1 << 16  # 65,536 bits = 2,048 x 32-bit words
BLOOM_WORDS = BLOOM_BITS // 32
_BLOOM_SHIFTS = (0, 16, 32)  # three 16-bit slices of the 60-bit hash


def _doc_grams(docs: DataFrame, k: int, key_col: str, text_col: str) -> DataFrame:
    """(doc_id, g): distinct 60-bit gram hashes per doc."""
    return (
        docs.select(
            F.col(key_col).alias("doc_id"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col), k))
            ).alias("s"),
        )
        .select("doc_id", _hash60(F.col("s")).alias("g"))
        .distinct()
    )


def bloom_contamination(
    docs: DataFrame,
    k: int = CONTAM_K,
    eval_mod: int = EVAL_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, in_eval, bloom_hits, contaminated): per-doc count of
    grams whose three Bloom probes all hit the eval-set bitset.

    Build side: the eval grams' probe positions collapse to <=
    BLOOM_BITS distinct values — collected once (bounded driver
    traffic, the train-then-broadcast pattern lm_score uses) and
    OR-folded into BLOOM_WORDS literal 32-bit words shipped in the
    task closure. Probe side: one explode + three element_at/AND
    integer tests per gram, one map-side-combined count per doc —
    the corpus never joins anything.
    """
    grams = _doc_grams(docs, k, key_col, text_col)
    eval_pos = (
        grams.filter(F.col("doc_id") % eval_mod == 0)
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.shiftright("g", s), F.lit(BLOOM_BITS))
                        for s in _BLOOM_SHIFTS
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )
    words = [0] * BLOOM_WORDS
    for r in eval_pos.collect():  # bounded: <= BLOOM_BITS rows
        p = int(r.p)
        words[p >> 5] |= 1 << (p & 31)
    wlit = F.lit(words)
    pow2 = F.lit([1 << b for b in range(32)])

    def _bit_set(pos: Column) -> Column:
        word = F.element_at(wlit, (pos / 32).cast("int") + 1)
        mask = F.element_at(pow2, F.pmod(pos, F.lit(32)).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    allset = None
    for s in _BLOOM_SHIFTS:
        t = _bit_set(F.pmod(F.shiftright("g", s), F.lit(BLOOM_BITS)))
        allset = t if allset is None else (allset & t)
    hits = (
        grams.filter(allset)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
    )
    return (
        docs.select(F.col(key_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("doc_id") % eval_mod == 0).alias("in_eval"),
            F.coalesce("bloom_hits", F.lit(0)).cast("bigint").alias(
                "bloom_hits"
            ),
            (F.coalesce("bloom_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bloom_contamination_broadcast(
    docs: DataFrame,
    k: int = CONTAM_K,
    eval_mod: int = EVAL_MOD,
    bloom_bits: int = BLOOM_BITS,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scale-path variant of :func:`bloom_contamination` — identical
    output, different bitset transport.

    The literal-closure path ships the bitset as a plan literal and
    ``collect()``s set-bit positions, both of which die at the op's own
    motivating scale (Dolma/BFF eval filters run 10^9–10^10 bits; a
    2^16-bit demo is the most a plan literal tolerates).  This variant:

    * **builds** the bitset with a per-partition OR-fold
      ``mapInPandas`` (each partition emits ONE packed ``bloom_bits/8``
      byte row — no driver bit loop, no per-position rows), then a
      single-partition OR-combine, so exactly one bitset crosses to the
      driver regardless of eval-set size;
    * **ships** it as a ``SparkContext.broadcast`` (torrent transport,
      off-plan — the query plan stays O(1) no matter ``bloom_bits``);
    * **probes** it inside an Arrow ``pandas_udf`` with vectorized
      numpy bit tests — no per-row Python, no join.

    ``bloom_bits`` must be a multiple of 8.  Sizing: a broadcast is
    bounded by executor memory, so 2^33 bits (1 GiB) is the practical
    per-filter ceiling; beyond that, shard the filter by gram-hash
    prefix into B broadcasts probed in one pass (positions are
    hash-derived, so the shard is a bit-slice, not a data change).
    """
    if bloom_bits % 8:
        raise ValueError(f"bloom_bits must be a multiple of 8: {bloom_bits}")
    import numpy as np

    grams = _doc_grams(docs, k, key_col, text_col)
    eval_pos = (
        grams.filter(F.col("doc_id") % eval_mod == 0)
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.shiftright("g", s), F.lit(bloom_bits))
                        for s in _BLOOM_SHIFTS
                    ]
                )
            ).alias("p")
        )
    )
    n_bytes = bloom_bits // 8

    def _or_fold(batches):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            pos = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    def _or_combine(batches):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            for b in pdf["bits"]:
                bits |= np.frombuffer(b, dtype=np.uint8)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = eval_pos.mapInPandas(_or_fold, schema="bits binary")
    final = (
        partials.coalesce(1)
        .mapInPandas(_or_combine, schema="bits binary")
        .collect()
    )
    payload = final[0]["bits"] if final else bytes(n_bytes)
    spark = docs.sparkSession
    bcast = spark.sparkContext.broadcast(payload)
    shifts = _BLOOM_SHIFTS

    @pandas_udf("boolean")
    def _probe(g: pd.Series) -> pd.Series:
        arr = np.frombuffer(bcast.value, dtype=np.uint8)
        gv = g.to_numpy(dtype=np.int64)
        ok = np.ones(len(gv), dtype=bool)
        for s in shifts:
            pos = (gv >> s) % bloom_bits
            ok &= (arr[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(ok)

    hits = (
        grams.filter(_probe(F.col("g")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
    )
    return (
        docs.select(F.col(key_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("doc_id") % eval_mod == 0).alias("in_eval"),
            F.coalesce("bloom_hits", F.lit(0)).cast("bigint").alias(
                "bloom_hits"
            ),
            (F.coalesce("bloom_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sql_bloom_contamination(k: int = CONTAM_K, eval_mod: int = EVAL_MOD) -> str:
    """DuckDB mirror: rebuilds the bitset from the eval set IN SQL
    (bit-or-folded words) and replays the same integer probes, so the
    oracle independently reproduces the filter — false positives and
    all."""
    sh = sql_shingles("text", k)
    shifts = ", ".join(str(s) for s in _BLOOM_SHIFTS)
    return f"""
        WITH grams AS (
            SELECT DISTINCT doc_id,
                   CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS g
            FROM (SELECT doc_id, unnest(list_distinct({sh})) AS s
                  FROM documents)
        ),
        eval_pos AS (
            SELECT DISTINCT ((g >> s) % {BLOOM_BITS}) AS p
            FROM grams, (SELECT unnest([{shifts}]) AS s)
            WHERE doc_id % {eval_mod} = 0
        ),
        bitset AS (
            SELECT CAST(p // 32 AS INTEGER) AS wi,
                   bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS wrd
            FROM eval_pos GROUP BY 1
        ),
        probes AS (
            SELECT doc_id, g, ((g >> s) % {BLOOM_BITS}) AS p
            FROM grams, (SELECT unnest([{shifts}]) AS s)
        ),
        allset AS (
            SELECT doc_id, g
            FROM probes JOIN bitset b ON b.wi = CAST(p // 32 AS INTEGER)
            WHERE (b.wrd & (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))) <> 0
            GROUP BY doc_id, g HAVING count(*) = {len(_BLOOM_SHIFTS)}
        ),
        hits AS (
            SELECT doc_id, count(*) AS bloom_hits FROM allset GROUP BY doc_id
        )
        SELECT d.doc_id,
               d.doc_id % {eval_mod} = 0 AS in_eval,
               CAST(COALESCE(h.bloom_hits, 0) AS BIGINT) AS bloom_hits,
               COALESCE(h.bloom_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """


# ---------------------------------------------------------------------------
# T72 — span-level eval decontamination (GPT-3 Appendix C-style)
# ---------------------------------------------------------------------------

# ``contamination`` (T45) and ``bloom_contamination`` (T60) *flag* docs
# sharing a k-gram with the eval set; this op performs the repair the
# GPT-3 / Lee et al. decontamination actually ships: every eval-gram hit
# taints a padded word window around it, overlapping tainted windows
# merge, and the doc is rewritten as its clean residual pieces (fully
# tainted docs drop out; split fragments shorter than a floor drop too).

DECON_PAD = 10  # words of padding either side of a hit gram
DECON_MIN_PIECE = 5  # split fragments shorter than this are discarded


def decontaminate_spans(
    docs: DataFrame,
    k: int = CONTAM_K,
    eval_mod: int = EVAL_MOD,
    pad: int = DECON_PAD,
    min_piece: int = DECON_MIN_PIECE,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite corpus docs as their clean pieces after excising every
    padded window around an eval-set k-gram hit.

    Emits (doc_id, piece_idx, piece_start, piece_words, piece_text):
    one row per surviving piece, word-granular offsets into the
    whitespace-normalized doc.  Eval docs (doc_id % eval_mod == 0) are
    excluded from the output; clean corpus docs pass through as one
    whole piece; contaminated docs yield their >= min_piece fragments
    (possibly none).

    Scale shape: gram hashes (8-byte bigints) are the only thing the
    corpus-wide stages shuffle — the gram array is built inside the row
    and posexploded WITHOUT the words array travelling.  The eval side
    is distinct + broadcast (benchmarks are tiny).  Interval merging /
    piece windows run only over hit rows (one 16-byte row per hit).
    Only the contaminated docs — the ones whose bytes must be rewritten
    anyway — take a join against their piece intervals; clean docs pass
    through behind a broadcast anti-join on the contaminated-id set
    (bounded by the eval overlap, ids are 8 bytes each)."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import words_col

    key = F.col(key_col)
    base = docs.select(
        key.alias("doc_id"),
        words_col(F.col(text_col)).alias("words"),
    ).withColumn("nwords", F.size("words"))

    # gram-start positions + 60-bit hashes, built in-row (words stay put)
    idx = F.sequence(
        F.lit(0), F.greatest(F.col("nwords") - F.lit(k), F.lit(0))
    )
    g_arr = F.transform(
        idx, lambda i: _hash60(F.concat_ws(" ", F.slice(F.col("words"), i + 1, k)))
    )
    grams = base.select(
        "doc_id", "nwords", F.posexplode(g_arr).alias("pos", "gh")
    )

    eval_g = (
        grams.filter(F.col("doc_id") % eval_mod == 0).select("gh").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % eval_mod != 0)
        .join(F.broadcast(eval_g), "gh")
        .select("doc_id", "nwords", "pos")
    )

    # padded taint interval per hit, then classic island merge
    iv = hits.select(
        "doc_id",
        "nwords",
        F.greatest(F.col("pos") - pad, F.lit(0)).alias("t0"),
        (F.col("pos") + F.lit(k - 1 + pad)).alias("t1"),
    ).distinct()
    w_prev = (
        W.partitionBy("doc_id")
        .orderBy("t0", "t1")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    iv = iv.withColumn(
        "brk",
        F.when(
            F.max("t1").over(w_prev).isNull()
            | (F.col("t0") > F.max("t1").over(w_prev)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = (
        W.partitionBy("doc_id")
        .orderBy("t0", "t1")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = (
        iv.withColumn("island", F.sum("brk").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("t0").alias("t_start"),
            F.max("t1").alias("t_end"),
            F.max("nwords").alias("nwords"),
        )
        .withColumn("t_end", F.least(F.col("t_end"), F.col("nwords") - 1))
    )

    # clean gaps between merged taints + the tail piece after the last
    w_ord = W.partitionBy("doc_id").orderBy("t_start")
    gaps = merged.select(
        "doc_id",
        (F.coalesce(F.lag("t_end").over(w_ord), F.lit(-1)) + 1).alias(
            "p_start"
        ),
        (F.col("t_start") - 1).alias("p_end"),
    )
    tails = merged.groupBy("doc_id").agg(
        (F.max("t_end") + 1).alias("p_start"),
        (F.max("nwords") - 1).alias("p_end"),
    )
    pieces = (
        gaps.unionByName(tails)
        .filter(F.col("p_end") - F.col("p_start") + 1 >= min_piece)
        .select(
            "doc_id",
            F.col("p_start").cast("bigint").alias("piece_start"),
            (F.col("p_end") - F.col("p_start") + 1)
            .cast("bigint")
            .alias("piece_words"),
        )
    )

    dirty_ids = merged.select("doc_id").distinct()
    dirty = (
        base.join(F.broadcast(dirty_ids), "doc_id")
        .join(pieces, "doc_id")
        .select(
            "doc_id",
            F.row_number()
            .over(W.partitionBy("doc_id").orderBy("piece_start"))
            .cast("bigint")
            .alias("piece_idx"),
            "piece_start",
            "piece_words",
            F.concat_ws(
                " ",
                F.slice(
                    "words",
                    (F.col("piece_start") + 1).cast("int"),
                    F.col("piece_words").cast("int"),
                ),
            ).alias("piece_text"),
        )
    )
    clean = (
        base.filter(F.col("doc_id") % eval_mod != 0)
        .join(F.broadcast(dirty_ids), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(1).cast("bigint").alias("piece_idx"),
            F.lit(0).cast("bigint").alias("piece_start"),
            F.col("nwords").cast("bigint").alias("piece_words"),
            F.concat_ws(" ", "words").alias("piece_text"),
        )
    )
    return dirty.unionByName(clean)


def sql_decontaminate_spans(
    k: int = CONTAM_K,
    eval_mod: int = EVAL_MOD,
    pad: int = DECON_PAD,
    min_piece: int = DECON_MIN_PIECE,
) -> str:
    from ocr_spark.operators.dedup import sql_words

    words = sql_words("text")
    return f"""
        WITH base AS (
            SELECT doc_id, {words} AS words, len({words}) AS nwords
            FROM documents
        ),
        grams AS (
            SELECT doc_id, nwords, i AS pos,
                   CAST('0x' || substr(md5(
                       array_to_string(words[i + 1 : i + {k}], ' ')
                   ), 1, 15) AS BIGINT) AS gh
            FROM base,
                 UNNEST(range(0, greatest(nwords - {k}, 0) + 1)) AS t(i)
        ),
        eval_g AS (
            SELECT DISTINCT gh FROM grams WHERE doc_id % {eval_mod} = 0
        ),
        hits AS (
            SELECT DISTINCT g.doc_id, g.nwords,
                   greatest(g.pos - {pad}, 0) AS t0,
                   g.pos + {k - 1 + pad} AS t1
            FROM grams g JOIN eval_g e ON g.gh = e.gh
            WHERE g.doc_id % {eval_mod} <> 0
        ),
        brks AS (
            SELECT doc_id, nwords, t0, t1,
                   CASE WHEN max(t1) OVER w IS NULL
                             OR t0 > max(t1) OVER w
                        THEN 1 ELSE 0 END AS brk
            FROM hits
            WINDOW w AS (PARTITION BY doc_id ORDER BY t0, t1
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        merged AS (
            SELECT doc_id, island,
                   min(t0) AS t_start,
                   least(max(t1), max(nwords) - 1) AS t_end,
                   max(nwords) AS nwords
            FROM (
                SELECT doc_id, nwords, t0, t1,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY t0, t1
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM brks
            )
            GROUP BY doc_id, island
        ),
        gaps AS (
            SELECT doc_id,
                   coalesce(lag(t_end) OVER (PARTITION BY doc_id
                                             ORDER BY t_start), -1) + 1
                       AS p_start,
                   t_start - 1 AS p_end
            FROM merged
        ),
        tails AS (
            SELECT doc_id, max(t_end) + 1 AS p_start, max(nwords) - 1 AS p_end
            FROM merged GROUP BY doc_id
        ),
        pieces AS (
            SELECT doc_id, p_start, p_end - p_start + 1 AS p_words
            FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tails)
            WHERE p_end - p_start + 1 >= {min_piece}
        ),
        dirty AS (
            SELECT p.doc_id,
                   CAST(row_number() OVER (PARTITION BY p.doc_id
                                           ORDER BY p.p_start) AS BIGINT)
                       AS piece_idx,
                   CAST(p.p_start AS BIGINT) AS piece_start,
                   CAST(p.p_words AS BIGINT) AS piece_words,
                   array_to_string(
                       b.words[p.p_start + 1 : p.p_start + p.p_words], ' '
                   ) AS piece_text
            FROM pieces p JOIN base b ON p.doc_id = b.doc_id
        ),
        clean AS (
            SELECT b.doc_id,
                   CAST(1 AS BIGINT) AS piece_idx,
                   CAST(0 AS BIGINT) AS piece_start,
                   CAST(b.nwords AS BIGINT) AS piece_words,
                   array_to_string(b.words, ' ') AS piece_text
            FROM base b
            WHERE b.doc_id % {eval_mod} <> 0
              AND b.doc_id NOT IN (SELECT doc_id FROM merged)
        )
        SELECT * FROM dirty UNION ALL SELECT * FROM clean
    """


# ---------------------------------------------------------------------------
# T79 — hashed-vocabulary naive-Bayes quality classifier
# ---------------------------------------------------------------------------

# The GPT-3 / CCNet curation step lm_score (T46) and perplexity_buckets
# (T64) approximate with an LM: a *supervised* classifier trained to
# separate a curated reference slice from the raw crawl, scoring every
# document by log-odds.  fastText's linear bag-of-words model reduces,
# for unigram features, to exactly naive Bayes log-odds — which trains
# in two map-side-combined aggregations and scores with one broadcast
# join, no gradient loop.  Positive class here: lang='en' (the corpus's
# stand-in for "reference distribution"); train slice: doc_id % 2 == 0.

NB_VOCAB = 2048


def nb_quality(
    docs: DataFrame,
    v: int = NB_VOCAB,
    train_mod: int = LM_TRAIN_MOD,
    pos_lang: str = "en",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc naive-Bayes log-odds for the reference class.

    Emits (doc_id, n_words, logodds, pred): logodds in nats (rounded
    to 6dp from integer micro-nats, so both engines agree bit-for-bit),
    pred = logodds > 0.

    Scale shape: training is one vocabulary groupBy (map-side combined,
    top-v bounded) + one 1-row conditional agg for the class totals —
    the model is <= v+2 rows and broadcasts; scoring shuffles nothing
    but the per-doc agg.  Laplace (+1) smoothing keeps every log
    finite; all counts stay integers until the final division.  If the
    train slice contains only one class the prior log is undefined and
    logodds/pred come back NULL — the caller's signal to fix the
    labeling, not a silent default."""
    from ocr_spark.operators.corpus_ops import _words

    is_pos = (F.col("lang") == pos_lang).cast("bigint")
    train = docs.filter(F.col(key_col) % train_mod == 0).select(
        F.col(key_col).alias("doc_id"),
        is_pos.alias("pos"),
        _words(F.col(text_col)).alias("words"),
    )
    # class priors (docs) + class word totals, one row each
    priors = train.agg(
        F.sum("pos").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("n_neg"),
    )
    tw = train.select("pos", F.explode("words").alias("word")).filter(
        F.col("word") != ""
    )
    totals = tw.agg(
        F.sum("pos").alias("t_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("t_neg"),
    )
    vocab = (
        tw.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("c_pos"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(v)
    )

    def _w(c_pos, c_neg):
        # micro-nat log-odds weight: ln p(w|pos) - ln p(w|neg),
        # Laplace-smoothed over v vocab slots + 1 OOV slot; evaluated
        # against the t_pos/t_neg columns of the joined totals row
        lpos = _lp_col(
            (c_pos + F.lit(1)).cast("double")
            / (F.col("t_pos") + F.lit(v + 1)).cast("double")
        )
        lneg = _lp_col(
            (c_neg + F.lit(1)).cast("double")
            / (F.col("t_neg") + F.lit(v + 1)).cast("double")
        )
        return lneg - lpos

    model = vocab.crossJoin(F.broadcast(totals)).select(
        "word",
        _w(F.col("c_pos"), F.col("n") - F.col("c_pos")).alias("w"),
    )
    scal = (
        totals.crossJoin(priors)
        .select(
            _w(F.lit(0), F.lit(0)).alias("oov_w"),
            (
                _lp_col(
                    F.col("n_neg").cast("double")
                    / (F.col("n_pos") + F.col("n_neg")).cast("double")
                )
                - _lp_col(
                    F.col("n_pos").cast("double")
                    / (F.col("n_pos") + F.col("n_neg")).cast("double")
                )
            ).alias("prior_w"),
        )
    )

    doc_words = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    return (
        doc_words.join(F.broadcast(model), "word", "left")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            (
                F.sum(F.coalesce("w", "oov_w")) + F.first("prior_w")
            ).alias("lo_micro"),
        )
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.col("lo_micro").cast("double") / F.lit(float(_LP_SCALE)), 6
            ).alias("logodds"),
            (F.col("lo_micro") > 0).alias("pred"),
        )
    )


def sql_nb_quality(
    v: int = NB_VOCAB,
    train_mod: int = LM_TRAIN_MOD,
    pos_lang: str = "en",
) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    s = _LP_SCALE
    return f"""
        WITH train AS (
            SELECT doc_id,
                   CASE WHEN lang = '{pos_lang}' THEN 1 ELSE 0 END AS pos,
                   {w} AS words
            FROM documents WHERE doc_id % {train_mod} = 0
        ),
        priors AS (
            SELECT sum(pos) AS n_pos, count(*) - sum(pos) AS n_neg
            FROM train
        ),
        tw AS (
            SELECT pos, w AS word FROM (
                SELECT pos, unnest(words) AS w FROM train)
            WHERE w <> ''
        ),
        totals AS (
            SELECT sum(pos) AS t_pos, count(*) - sum(pos) AS t_neg FROM tw
        ),
        vocab AS (
            SELECT word, count(*) AS n, sum(pos) AS c_pos FROM tw
            GROUP BY word ORDER BY n DESC, word ASC LIMIT {v}
        ),
        model AS (
            SELECT word,
                   CAST(round(-ln(CAST(n - c_pos + 1 AS DOUBLE)
                                  / CAST(t_neg + {v + 1} AS DOUBLE))
                              * {s}) AS BIGINT)
                   - CAST(round(-ln(CAST(c_pos + 1 AS DOUBLE)
                                    / CAST(t_pos + {v + 1} AS DOUBLE))
                                * {s}) AS BIGINT) AS w
            FROM vocab CROSS JOIN totals
        ),
        scal AS (
            SELECT CAST(round(-ln(1.0 / CAST(t_neg + {v + 1} AS DOUBLE))
                              * {s}) AS BIGINT)
                   - CAST(round(-ln(1.0 / CAST(t_pos + {v + 1} AS DOUBLE))
                                * {s}) AS BIGINT) AS oov_w,
                   -- nullif guards the one-class train slice: Spark's
                   -- log(0) is NULL while DuckDB's ln(0) throws, so the
                   -- degenerate case must be NULL in BOTH engines (the
                   -- caller's signal to fix the labeling)
                   CAST(round(-ln(CAST(nullif(n_neg, 0) AS DOUBLE)
                                  / CAST(n_pos + n_neg AS DOUBLE))
                              * {s}) AS BIGINT)
                   - CAST(round(-ln(CAST(nullif(n_pos, 0) AS DOUBLE)
                                    / CAST(n_pos + n_neg AS DOUBLE))
                                * {s}) AS BIGINT) AS prior_w
            FROM totals CROSS JOIN priors
        ),
        doc_words AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        )
        SELECT d.doc_id,
               count(*) AS n_words,
               round(CAST(sum(COALESCE(m.w, s.oov_w)) + any_value(s.prior_w)
                          AS DOUBLE) / {s}.0, 6) AS logodds,
               sum(COALESCE(m.w, s.oov_w)) + any_value(s.prior_w) > 0 AS pred
        FROM doc_words d
        LEFT JOIN model m ON d.word = m.word
        CROSS JOIN scal s
        GROUP BY d.doc_id
    """


# ---------------------------------------------------------------------------
# T80 — fuzzy (MinHash) eval decontamination screen
# ---------------------------------------------------------------------------

# ``contamination`` (T45) and ``decon_spans`` (T72) catch *verbatim*
# k-gram overlap; paraphrased or lightly-edited benchmark leakage slips
# both.  The standard complement is a near-dup screen of the corpus
# against the eval set: LSH-bucket corpus docs with eval docs, verify
# candidates with exact Jaccard, flag above a threshold.

FUZZY_CONTAM_THRESHOLD = 0.5


def fuzzy_contamination(
    docs: DataFrame,
    threshold: float = FUZZY_CONTAM_THRESHOLD,
    eval_mod: int = EVAL_MOD,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, jaccard, contaminated) for every corpus doc:
    the best-matching eval doc by exact shingle Jaccard among LSH
    candidates (eval_id=-1 / jaccard=0.0 when no bucket collision —
    explicit sentinels, not NULLs, so nullable-numeric rendering can't
    differ between engines), and the threshold flag.  Ties break to
    the smaller eval_id, deterministically.

    Scale shape: corpus docs shuffle 16 minhash bigints once (the
    shared ``_band_keyed`` pipeline); the eval side is tiny by
    definition, so its band keys AND its shingle sets broadcast —
    candidate generation and Jaccard verification are both map-side
    against broadcast tables, and only corpus docs with a candidate
    ever re-read their text.  No corpus-corpus pairs exist anywhere."""
    from ocr_spark.operators.dedup import (
        _band_keyed,
        jaccard_col,
        shingles_col,
    )

    key = F.col(key_col)
    base = docs.select(
        key.alias("doc_id"), F.col(text_col).alias("text")
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    keyed = _band_keyed(base)
    cand = (
        keyed.filter(~is_eval)
        .join(
            F.broadcast(
                keyed.filter(is_eval).select(
                    F.col("doc_id").alias("eval_id"), "band", "key"
                )
            ),
            ["band", "key"],
        )
        .select("doc_id", "eval_id")
        .distinct()
    )

    sh = F.array_distinct(shingles_col(F.col("text"))).alias("sh")
    eval_sh = base.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), sh
    )
    ver = (
        cand.join(base, "doc_id")
        .join(F.broadcast(eval_sh.withColumnRenamed("sh", "esh")), "eval_id")
        .select(
            "doc_id",
            "eval_id",
            jaccard_col(shingles_col(F.col("text")), F.col("esh")).alias(
                "jaccard"
            ),
        )
    )
    best = ver.groupBy("doc_id").agg(
        F.max(F.struct(F.col("jaccard"), (-F.col("eval_id")).alias("neg")))
        .alias("m")
    )
    return (
        base.filter(~is_eval)
        .select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(-F.col("m.neg"), F.lit(-1)).alias("eval_id"),
            F.coalesce(F.col("m.jaccard"), F.lit(0.0)).alias("jaccard"),
            F.coalesce(
                F.col("m.jaccard") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )


def sql_fuzzy_contamination(
    threshold: float = FUZZY_CONTAM_THRESHOLD,
    eval_mod: int = EVAL_MOD,
    source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    from ocr_spark.operators.dedup import (
        MINHASH_BANDS,
        sql_band_keys,
        sql_shingles,
    )

    return f"""
        WITH src AS ({source_sql}),
        base AS (
            SELECT doc_id, list_distinct({sql_shingles("text")}) AS sh
            FROM src
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys("sh")}) AS key
            FROM base
        ),
        cand AS (
            SELECT DISTINCT c.doc_id, e.doc_id AS eval_id
            FROM keyed c JOIN keyed e USING (band, key)
            WHERE c.doc_id % {eval_mod} <> 0
              AND e.doc_id % {eval_mod} = 0
        ),
        ver AS (
            SELECT v.doc_id, v.eval_id,
                   round(CAST(len(list_intersect(b.sh, e.sh)) AS DOUBLE)
                         / (len(b.sh) + len(e.sh)
                            - len(list_intersect(b.sh, e.sh))),
                         6) AS jaccard
            FROM cand v
            JOIN base b ON v.doc_id = b.doc_id
            JOIN base e ON v.eval_id = e.doc_id
        ),
        best AS (
            SELECT doc_id, jaccard, eval_id FROM (
                SELECT doc_id, jaccard, eval_id,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY jaccard DESC,
                                                   eval_id ASC) AS rk
                FROM ver) WHERE rk = 1
        )
        SELECT d.doc_id,
               COALESCE(b.eval_id, -1) AS eval_id,
               COALESCE(b.jaccard, 0.0) AS jaccard,
               COALESCE(b.jaccard >= {threshold}, FALSE) AS contaminated
        FROM src d
        LEFT JOIN best b ON d.doc_id = b.doc_id
        WHERE d.doc_id % {eval_mod} <> 0
    """


# ---------------------------------------------------------------------------
# T83 — URL-rule admission filter (FineWeb/CCNet-style URL screening)
# ---------------------------------------------------------------------------
#
# The cheapest filter in a crawl pipeline runs BEFORE fetch/extraction:
# admit or reject a document on its URL alone.  Standard rules (FineWeb,
# CCNet, RefinedWeb preprocessing): binary/media file extensions, absurd
# path depth (calendar/faceted-navigation traps), query-parameter
# explosions (session ids, infinite facet crawls), and digit-heavy hosts
# (spam farms).  Pure per-row column expressions — free at any scale,
# and at 10^12 rows it prunes the corpus before any byte of payload is
# read (predicate-pushdown territory when url is a scan column).

URLF_BLOCKED_EXT = (
    "jpg|jpeg|png|gif|webp|svg|ico|css|js|mjs|woff|woff2|ttf|eot|"
    "mp3|mp4|avi|mov|webm|zip|gz|tar|rar|7z|exe|dmg|iso|bin"
)
URLF_MAX_DEPTH = 6
URLF_MAX_PARAMS = 4
URLF_MAX_HOST_DIGIT_FRAC = 0.4


def plant_messy_url_col(doc_id: Column, source: Column) -> Column:
    """Deterministic URL exercising every admission rule: media
    extensions (%13), deep calendar paths (%17), parameter explosions
    (%19), digit-spam hosts (%23).  Mirrored by sql_plant_messy_url."""
    # digit-spam host: always exactly 3+3 digits so the digit fraction
    # is a constant 6/12 = 0.5, strictly above the 0.4 admission bound
    host = F.when(
        doc_id % 23 == 0,
        F.concat(F.lit("h"), (doc_id % 900 + 100).cast("string"),
                 F.lit("x"), (doc_id % 899 + 100).cast("string")),
    ).otherwise(source)
    ext = F.when(doc_id % 13 == 0, F.lit("/img.jpg")).otherwise(
        F.concat(F.lit("/page-"), doc_id.cast("string"))
    )
    depth = F.when(
        doc_id % 17 == 0, F.lit("/a/b/c/d/e/f/g")
    ).otherwise(F.lit("/sec"))
    params = F.when(
        doc_id % 19 == 0,
        F.lit("?a=1&b=2&c=3&d=4&e=5&sid=x"),
    ).when(doc_id % 3 == 0, F.lit("?id=7")).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"), host, F.lit(".com"), depth, ext, params
    )


def sql_plant_messy_url(doc_id: str = "doc_id", source: str = "source") -> str:
    return f"""(
        'https://'
        || CASE WHEN {doc_id} % 23 = 0
                THEN 'h' || CAST({doc_id} % 900 + 100 AS VARCHAR)
                     || 'x' || CAST({doc_id} % 899 + 100 AS VARCHAR)
                ELSE {source} END
        || '.com'
        || CASE WHEN {doc_id} % 17 = 0 THEN '/a/b/c/d/e/f/g' ELSE '/sec' END
        || CASE WHEN {doc_id} % 13 = 0
                THEN '/img.jpg' ELSE '/page-' || CAST({doc_id} AS VARCHAR) END
        || CASE WHEN {doc_id} % 19 = 0 THEN '?a=1&b=2&c=3&d=4&e=5&sid=x'
                WHEN {doc_id} % 3 = 0 THEN '?id=7' ELSE '' END
    )"""


def url_filter_cols(
    key: Column,
    source: Column,
    max_depth: int = URLF_MAX_DEPTH,
    max_params: int = URLF_MAX_PARAMS,
    max_digit_frac: float = URLF_MAX_HOST_DIGIT_FRAC,
) -> dict:
    """The admission decision and its audit columns as expressions —
    for join-free pipeline callers (jobs/curate.py filters on
    ['admitted'] directly; a semi-join back onto the source would
    double the plan subtree)."""
    url = plant_messy_url_col(key, source)
    parts = canonicalize_url(url)
    host, canon = parts["host"], parts["canon_url"]
    path = F.regexp_extract(canon, _URL_RE, 3)
    qs = F.regexp_extract(canon, _URL_RE, 4)
    path_depth = (
        F.length(path) - F.length(F.regexp_replace(path, r"/", ""))
    ).cast("bigint")
    n_params = F.when(qs == "", F.lit(0)).otherwise(
        F.size(F.split(F.substring(qs, 2, 1 << 20), "&"))
    ).cast("bigint")
    blocked_ext = F.lower(path).rlike(r"\.(" + URLF_BLOCKED_EXT + r")$")
    digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    host_digit_frac = F.round(
        digits.cast("double") / F.length(host).cast("double"), 6
    )
    admitted = (
        ~blocked_ext
        & (path_depth <= max_depth)
        & (n_params <= max_params)
        & (host_digit_frac <= max_digit_frac)
    )
    return {
        "url": url,
        "path_depth": path_depth,
        "n_params": n_params,
        "blocked_ext": blocked_ext,
        "host_digit_frac": host_digit_frac,
        "admitted": admitted,
    }


def url_filter(
    docs: DataFrame,
    key_col: str = "doc_id",
    max_depth: int = URLF_MAX_DEPTH,
    max_params: int = URLF_MAX_PARAMS,
    max_digit_frac: float = URLF_MAX_HOST_DIGIT_FRAC,
) -> DataFrame:
    """(doc_id, url, path_depth, n_params, blocked_ext, host_digit_frac,
    admitted) — the pre-fetch URL admission decision with its reasons
    kept as audit columns.  Everything is codegen'd column arithmetic;
    no shuffle, no Python."""
    key = F.col(key_col)
    c = url_filter_cols(
        key,
        F.col("source"),
        max_depth=max_depth,
        max_params=max_params,
        max_digit_frac=max_digit_frac,
    )
    return docs.select(
        key.alias("doc_id"),
        c["url"].alias("url"),
        c["path_depth"].alias("path_depth"),
        c["n_params"].alias("n_params"),
        c["blocked_ext"].alias("blocked_ext"),
        c["host_digit_frac"].alias("host_digit_frac"),
        c["admitted"].alias("admitted"),
    )


def sql_url_filter(
    max_depth: int = URLF_MAX_DEPTH,
    max_params: int = URLF_MAX_PARAMS,
    max_digit_frac: float = URLF_MAX_HOST_DIGIT_FRAC,
) -> str:
    url = sql_plant_messy_url()
    re = _URL_RE.replace("\\", "\\\\").replace("'", "''")
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        parts AS (
            SELECT doc_id, url,
                   regexp_replace(
                       regexp_extract(lower(regexp_extract(url, '{re}', 2)),
                                      '^([^:]+)', 1),
                       '^www\\.', '') AS host,
                   regexp_extract(url, '{re}', 3) AS path,
                   regexp_extract(url, '{re}', 4) AS qs
            FROM u
        ),
        m AS (
            SELECT doc_id, url, host,
                   CAST(len(path) - len(replace(path, '/', '')) AS BIGINT)
                       AS path_depth,
                   CAST(CASE WHEN qs = '' THEN 0
                        ELSE len(string_split(substr(qs, 2), '&')) END
                        AS BIGINT) AS n_params,
                   regexp_matches(lower(path),
                                  '\\.({URLF_BLOCKED_EXT})$') AS blocked_ext,
                   round(CAST(len(regexp_replace(host, '[^0-9]', '', 'g'))
                              AS DOUBLE) / len(host), 6) AS host_digit_frac
            FROM parts
        )
        SELECT doc_id, url, path_depth, n_params, blocked_ext,
               host_digit_frac,
               (NOT blocked_ext AND path_depth <= {max_depth}
                AND n_params <= {max_params}
                AND host_digit_frac <= {max_digit_frac}) AS admitted
        FROM m
    """


# ---------------------------------------------------------------------------
# T84 — registered-domain rollup (the domain-level curation ledger)
# ---------------------------------------------------------------------------
#
# Curation decisions at crawl scale are made per REGISTERED DOMAIN
# (eTLD+1), not per raw host: host caps, domain blocklists, and manual
# audits all key on it.  Real pipelines resolve eTLD+1 against the
# public-suffix list; the shape is identical at any list size — the
# suffix set is bounded (~10^4 rows) and broadcasts, the match is
# longest-suffix (same max(struct) pattern as robots_filter), and the
# rollup is one map-side-combined agg producing a table with one row
# per domain (~10^7 at crawl scale, trivially storable).

# A representative slice of the public-suffix list: multi-label
# suffixes that break the naive "last two labels" rule.
PSL_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp", "com.br")


def registered_domain_col(host: Column) -> Column:
    """eTLD+1 of ``host``: the last two labels, or the last THREE when
    the last two are a public-suffix entry (co.uk-style)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_psl = F.element_at(labels, -2).isNotNull() & last2.isin(
        *PSL_SUFFIXES
    )
    return (
        F.when(n <= 2, host)
        .when(is_psl & (n >= 3), last3)
        .otherwise(last2)
    )


def sql_registered_domain(host: str) -> str:
    suffixes = ", ".join(f"'{s}'" for s in PSL_SUFFIXES)
    return f"""(
        CASE WHEN len(string_split({host}, '.')) <= 2 THEN {host}
             WHEN array_to_string(string_split({host}, '.')[-2:], '.')
                  IN ({suffixes})
                  AND len(string_split({host}, '.')) >= 3
             THEN array_to_string(string_split({host}, '.')[-3:], '.')
             ELSE array_to_string(string_split({host}, '.')[-2:], '.')
        END
    )"""


def plant_host_col(doc_id: Column, source: Column) -> Column:
    """Deterministic host with PSL-suffix cases planted (%4 picks the
    TLD family) and a subdomain depth that varies (%3)."""
    tld = (
        F.when(doc_id % 4 == 0, F.lit("co.uk"))
        .when(doc_id % 4 == 1, F.lit("com.au"))
        .when(doc_id % 4 == 2, F.lit("com"))
        .otherwise(F.lit("org"))
    )
    sub = F.when(doc_id % 3 == 0, F.lit("news.")).when(
        doc_id % 3 == 1, F.lit("a.b.")
    ).otherwise(F.lit(""))
    return F.concat(sub, source, F.lit("."), tld)


def sql_plant_host(doc_id: str = "doc_id", source: str = "source") -> str:
    return f"""(
        CASE {doc_id} % 3 WHEN 0 THEN 'news.' WHEN 1 THEN 'a.b.' ELSE '' END
        || {source} || '.'
        || CASE {doc_id} % 4 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com.au'
                             WHEN 2 THEN 'com' ELSE 'org' END
    )"""


def domain_stats(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(domain, n_docs, n_hosts, total_chars, n_langs) — the per-
    registered-domain ledger every domain-level curation rule reads.
    One map-side-combined agg; the planted host column exercises the
    PSL multi-label branch."""
    key = F.col(key_col)
    host = plant_host_col(key, F.col("source"))
    return (
        docs.select(
            registered_domain_col(host).alias("domain"),
            host.alias("host"),
            "n_chars",
            "lang",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def sql_domain_stats() -> str:
    host = sql_plant_host()
    dom = sql_registered_domain("host")
    return f"""
        WITH h AS (
            SELECT doc_id, {host} AS host, n_chars, lang FROM documents
        ),
        d AS (SELECT {dom} AS domain, host, n_chars, lang FROM h)
        SELECT domain,
               count(*) AS n_docs,
               count(DISTINCT host) AS n_hosts,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(DISTINCT lang) AS n_langs
        FROM d GROUP BY domain
    """


# ---------------------------------------------------------------------------
# T85 — recrawl prioritization (change-rate scheduling)
# ---------------------------------------------------------------------------
#
# The consumer of snapshot_diff (T57): crawl schedulers allocate fetch
# budget by how often a site actually changes (Cho & Garcia-Molina's
# freshness model).  Per host: the observed change fraction between two
# snapshots -> a priority tier (hot/warm/cold) that the next crawl's
# frontier reads.  Scale shape: snapshot_diff's one hash join, then one
# map-side-combined agg to ~n_hosts rows; the tier thresholds are
# constants so the output is pure arithmetic on the agg row.

RECRAWL_HOT = 0.5  # > 50% of docs changed -> crawl hourly
RECRAWL_WARM = 0.1  # > 10% -> daily; else weekly


def recrawl_priority(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
) -> DataFrame:
    """(host, n_docs, n_changed, n_added, n_removed, change_frac, tier)
    per host, from the full snapshot delta.  Hosts arriving only in the
    new snapshot count their docs as added (change by definition)."""
    diff = snapshot_diff(old, new, key_col=key_col, text_col=text_col)
    hosts = (
        old.select(F.col(key_col).alias(key_col), F.col(host_col).alias("host"))
        .unionByName(
            new.select(
                F.col(key_col).alias(key_col), F.col(host_col).alias("host")
            )
        )
        .groupBy(key_col)
        .agg(F.min("host").alias("host"))
    )
    per = (
        diff.join(hosts, key_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("change") == "changed").cast("bigint")).alias(
                "n_changed"
            ),
            F.sum((F.col("change") == "added").cast("bigint")).alias(
                "n_added"
            ),
            F.sum((F.col("change") == "removed").cast("bigint")).alias(
                "n_removed"
            ),
        )
    )
    frac = F.round(
        (F.col("n_changed") + F.col("n_added") + F.col("n_removed")).cast(
            "double"
        )
        / F.col("n_docs").cast("double"),
        6,
    )
    tier = (
        F.when(frac > RECRAWL_HOT, F.lit("hot"))
        .when(frac > RECRAWL_WARM, F.lit("warm"))
        .otherwise(F.lit("cold"))
    )
    return per.select(
        "host", "n_docs", "n_changed", "n_added", "n_removed",
        frac.alias("change_frac"), tier.alias("tier"),
    )


def sql_recrawl_priority(
    old_sql: str,
    new_sql: str,
    key: str = "doc_id",
    text: str = "text",
    host: str = "source",
) -> str:
    diff = sql_snapshot_diff(old_sql, new_sql, key=key, text=text)
    return f"""
        WITH diff AS ({diff}),
        hosts AS (
            SELECT {key}, min(host) AS host FROM (
                SELECT {key}, {host} AS host FROM ({old_sql})
                UNION ALL
                SELECT {key}, {host} AS host FROM ({new_sql})
            ) GROUP BY {key}
        ),
        per AS (
            SELECT h.host,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN change = 'changed' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_changed,
                   CAST(sum(CASE WHEN change = 'added' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_added,
                   CAST(sum(CASE WHEN change = 'removed' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed
            FROM diff d JOIN hosts h ON d.{key} = h.{key}
            GROUP BY h.host
        )
        SELECT host, n_docs, n_changed, n_added, n_removed,
               round(CAST(n_changed + n_added + n_removed AS DOUBLE)
                     / n_docs, 6) AS change_frac,
               CASE WHEN round(CAST(n_changed + n_added + n_removed AS DOUBLE)
                               / n_docs, 6) > {RECRAWL_HOT} THEN 'hot'
                    WHEN round(CAST(n_changed + n_added + n_removed AS DOUBLE)
                               / n_docs, 6) > {RECRAWL_WARM} THEN 'warm'
                    ELSE 'cold' END AS tier
        FROM per
    """


# ---------------------------------------------------------------------------
# T97 — quality-filter ensemble
# ---------------------------------------------------------------------------
#
# Production pipelines rarely trust one quality signal: the shipped
# keep decision is a vote over rule-based (Gopher), supervised
# (naive-Bayes), and LM-surprisal filters (the GPT-3/CCNet/Dolma
# recipe).  The LM vote's cutoff is the corpus mean surprisal in
# integer micro-nats — a deterministic corpus statistic, not a magic
# constant, so both decision branches are exercised on any corpus.
#
# Scale shape: each member filter keeps its own scale story; the
# ensemble adds two doc_id-keyed hash joins and one broadcast 1-row
# cutoff.  Votes are integer arithmetic.


def quality_ensemble(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, gopher_ok, nb_ok, lm_ok, votes, keep): majority vote
    (>= 2 of 3) over the three quality filters."""
    from ocr_spark.operators.corpus_ops import quality_features, quality_keep

    key = F.col(key_col)
    feats = quality_features(F.col(text_col))
    g = docs.select(key.alias("doc_id"), quality_keep(feats).alias("gopher_ok"))
    nb = nb_quality(docs, key_col=key_col, text_col=text_col).select(
        "doc_id", F.col("pred").alias("nb_ok")
    )
    lm = lm_score(docs, key_col=key_col, text_col=text_col).select(
        "doc_id",
        F.round(F.col("score") * 1_000_000).cast("bigint").alias("micro"),
    )
    cut = lm.agg(
        F.floor(
            F.sum("micro").cast("double") / F.count(F.lit(1))
        ).cast("bigint").alias("cut")
    )
    lm_ok = lm.crossJoin(F.broadcast(cut)).select(
        "doc_id", (F.col("micro") <= F.col("cut")).alias("lm_ok")
    )
    votes = (
        F.col("gopher_ok").cast("int")
        + F.col("nb_ok").cast("int")
        + F.col("lm_ok").cast("int")
    ).cast("bigint")
    return (
        g.join(nb, "doc_id")
        .join(lm_ok, "doc_id")
        .select(
            "doc_id", "gopher_ok", "nb_ok", "lm_ok",
            votes.alias("votes"), (votes >= 2).alias("keep"),
        )
    )


def sql_quality_ensemble() -> str:
    from ocr_spark.operators.corpus_ops import sql_quality_query

    return f"""
        WITH g AS ({sql_quality_query()}),
        nb AS ({sql_nb_quality()}),
        lm AS ({sql_lm_score()}),
        lmm AS (
            SELECT doc_id,
                   CAST(round(score * 1000000) AS BIGINT) AS micro
            FROM lm
        ),
        cut AS (
            SELECT CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*))
                        AS BIGINT) AS cut
            FROM lmm
        ),
        v AS (
            SELECT g.doc_id,
                   g.keep AS gopher_ok,
                   nb.pred AS nb_ok,
                   lmm.micro <= cut.cut AS lm_ok
            FROM g
            JOIN nb ON g.doc_id = nb.doc_id
            JOIN lmm ON g.doc_id = lmm.doc_id
            CROSS JOIN cut
        )
        SELECT doc_id, gopher_ok, nb_ok, lm_ok,
               CAST(CAST(gopher_ok AS INTEGER) + CAST(nb_ok AS INTEGER)
                    + CAST(lm_ok AS INTEGER) AS BIGINT) AS votes,
               CAST(gopher_ok AS INTEGER) + CAST(nb_ok AS INTEGER)
                   + CAST(lm_ok AS INTEGER) >= 2 AS keep
        FROM v
    """


# ---------------------------------------------------------------------------
# T101 — HTML metadata extraction
# ---------------------------------------------------------------------------
#
# Crawl pipelines index the page's declared metadata before touching
# the body: <title>, meta description, og:title, the canonical link,
# and the published timestamp (the newsworthiness/freshness signals
# WARC indexers and URL dedup both consume).  Extraction is JVM-regex
# over the decoded page — zero Python — and the planted pages make the
# oracle closed-form: it restates every field from the source row, so
# a regex that drops or mangles a field breaks the hash.

_META_TITLE_WORDS = 5
_META_DESC_WORDS = 8


def _escape_html_col(c: Column) -> Column:
    for src, dst in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#x27;"),
    ]:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _sql_escape_html(expr: str) -> str:
    out = expr
    for src, dst in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("''", "&#x27;"),  # SQL-escaped single quote
    ]:
        out = f"replace({out}, '{src}', '{dst}')"
    return out


def meta_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, html): the boilerplate page with a deterministic
    metadata head — title = first 5 words, description = first 8,
    og:title, canonical URL, published_time derived from doc_id.
    Pure column expressions."""
    from ocr_spark.operators.corpus_ops import _words
    from ocr_spark.sources.wrap import _HTML_TEMPLATE_TAIL

    words = _words(F.col("text"))
    title = _escape_html_col(
        F.array_join(F.slice(words, 1, _META_TITLE_WORDS), " ")
    )
    desc = _escape_html_col(
        F.array_join(F.slice(words, 1, _META_DESC_WORDS), " ")
    )
    canonical = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".com/doc/"),
        F.col("doc_id").cast("string"),
    )
    pub = F.date_format(
        F.date_add(F.to_date(F.lit("2023-01-01")), (F.col("doc_id") % 365).cast("int")),
        "yyyy-MM-dd",
    )
    page = F.concat(
        F.lit("<!DOCTYPE html>\n<html><head><title>"), title,
        F.lit('</title><meta name="description" content="'), desc,
        F.lit('"><meta property="og:title" content="'), title,
        F.lit('"><link rel="canonical" href="'), canonical,
        F.lit('"><meta property="article:published_time" content="'), pub,
        F.lit('"></head>\n<body><main><article><p>'),
        _escape_html_col(F.col("text")),
        F.lit("</p>"),
        F.lit(_HTML_TEMPLATE_TAIL),
    )
    return docs.select("doc_id", F.encode(page, "utf-8").alias("html"))


def html_metadata(pages: DataFrame) -> DataFrame:
    """(doc_id, title, description, og_title, canonical, pub_date)
    extracted from the page head with JVM regexes."""
    body = F.decode(F.col("html"), "utf-8")
    return pages.select(
        "doc_id",
        F.regexp_extract(body, "<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(
            body, '<meta name="description" content="([^"]*)"', 1
        ).alias("description"),
        F.regexp_extract(
            body, '<meta property="og:title" content="([^"]*)"', 1
        ).alias("og_title"),
        F.regexp_extract(
            body, '<link rel="canonical" href="([^"]*)"', 1
        ).alias("canonical"),
        F.regexp_extract(
            body,
            '<meta property="article:published_time" content="([^"]*)"',
            1,
        ).alias("pub_date"),
    )


def sql_html_metadata() -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    title = _sql_escape_html(
        f"array_to_string(({w})[1:{_META_TITLE_WORDS}], ' ')"
    )
    desc = _sql_escape_html(
        f"array_to_string(({w})[1:{_META_DESC_WORDS}], ' ')"
    )
    return f"""
        SELECT doc_id,
               {title} AS title,
               {desc} AS description,
               {title} AS og_title,
               'https://' || source || '.com/doc/'
                   || CAST(doc_id AS VARCHAR) AS canonical,
               strftime(DATE '2023-01-01'
                        + INTERVAL (doc_id % 365) DAY, '%Y-%m-%d')
                   AS pub_date
        FROM documents
    """


# ---------------------------------------------------------------------------
# T102 — keyword topic tagging
# ---------------------------------------------------------------------------
#
# The cheapest corpus-mixing label: a curated keyword -> topic map
# (bounded, broadcast) votes per document, dominant topic wins.  Real
# pipelines use exactly this to build mixture strata before weighted
# sampling (T54/T55 consume the labels).  One explode + broadcast join
# + per-(doc, topic) map-side-combined count + an argmax partial agg —
# no cluster state, no Python.

TOPIC_MAP = [
    ("spark", "compute"), ("batch", "compute"), ("partition", "compute"),
    ("query", "database"), ("table", "database"), ("row", "database"),
    ("scan", "database"),
    ("vector", "ml"), ("embedding", "ml"), ("model", "ml"),
]


def topic_tag(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, topic, n_hits): dominant topic by keyword votes, ties
    to the lexicographically smaller topic; docs with no hits tag
    ('none', 0)."""
    from ocr_spark.operators.corpus_ops import _words

    spark = docs.sparkSession
    key = F.col(key_col)
    kw = spark.createDataFrame(TOPIC_MAP, "word string, topic string")
    hits = (
        docs.select(
            key.alias("doc_id"),
            F.explode(_words(F.col(text_col))).alias("word"),
        )
        .join(F.broadcast(kw), "word")
        .groupBy("doc_id", "topic")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = hits.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("n")).alias("neg"), F.col("topic"))).alias("m")
    )
    return (
        docs.select(key.alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m.topic"), F.lit("none")).alias("topic"),
            F.coalesce(-F.col("m.neg"), F.lit(0)).cast("bigint").alias(
                "n_hits"
            ),
        )
    )


def sql_topic_tag() -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words("text")
    vals = ", ".join(f"('{k}', '{t}')" for k, t in TOPIC_MAP)
    return f"""
        WITH kw(word, topic) AS (SELECT * FROM (VALUES {vals})),
        tw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
        ),
        hits AS (
            SELECT t.doc_id, k.topic, count(*) AS n
            FROM tw t JOIN kw k ON t.word = k.word
            GROUP BY t.doc_id, k.topic
        ),
        best AS (
            SELECT doc_id, topic, n FROM (
                SELECT doc_id, topic, n,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY n DESC, topic ASC) AS rk
                FROM hits) WHERE rk = 1
        )
        SELECT d.doc_id,
               COALESCE(b.topic, 'none') AS topic,
               CAST(COALESCE(b.n, 0) AS BIGINT) AS n_hits
        FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
    """


# ---------------------------------------------------------------------------
# T108 — eval leakage report
# ---------------------------------------------------------------------------
#
# The decontamination stages flag corpus docs; the REVIEW artifact is
# per-EVAL-doc: which benchmark items leak into the corpus, how often,
# and how closely — the table that decides whether an eval stays
# usable.  Pure re-aggregation of the fuzzy screen's output (per-doc
# best matches), one map-side-combined agg to <= |eval| rows.


def eval_leakage_report(docs: DataFrame, eval_mod: int = EVAL_MOD) -> DataFrame:
    """(eval_id, n_candidates, n_contaminated, max_jaccard) for every
    eval doc with at least one LSH candidate in the corpus."""
    fz = fuzzy_contamination(docs, eval_mod=eval_mod).filter(
        F.col("eval_id") >= 0
    )
    return fz.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.col("contaminated").cast("bigint"))
        .cast("bigint")
        .alias("n_contaminated"),
        F.max("jaccard").alias("max_jaccard"),
    )


def sql_eval_leakage_report(
    eval_mod: int = EVAL_MOD,
    source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    fz = sql_fuzzy_contamination(eval_mod=eval_mod, source_sql=source_sql)
    return f"""
        WITH fz AS ({fz})
        SELECT eval_id,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               max(jaccard) AS max_jaccard
        FROM fz WHERE eval_id >= 0
        GROUP BY eval_id
    """


# ---------------------------------------------------------------------------
# T111 — language-mixture drift
# ---------------------------------------------------------------------------
#
# The monitoring table between two crawl snapshots: per-language doc
# share before vs after, with the delta — a mixture that silently
# drifts (a host went down, a filter started over-dropping a script)
# corrupts the training distribution long before anyone reads loss
# curves.  Two map-side-combined aggs + a bounded-key join; the delta
# is exact micro-share integer arithmetic.


def lang_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """(lang, old_docs, new_docs, old_share, new_share, delta_share):
    share in micro-units internally so the 6dp deltas are exact."""

    def shares(df: DataFrame, prefix: str) -> DataFrame:
        per = df.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{prefix}_docs")
        )
        tot = per.agg(F.sum(f"{prefix}_docs").alias("tot"))
        micro = F.floor(
            F.col(f"{prefix}_docs").cast("double")
            / F.col("tot").cast("double")
            * 1_000_000
        ).cast("bigint")
        return per.crossJoin(F.broadcast(tot)).select(
            "lang", f"{prefix}_docs", micro.alias(f"{prefix}_micro")
        )

    o = shares(old, "old")
    n = shares(new, "new")
    return (
        o.join(n, "lang", "full_outer")
        .select(
            "lang",
            F.coalesce("old_docs", F.lit(0)).cast("bigint").alias("old_docs"),
            F.coalesce("new_docs", F.lit(0)).cast("bigint").alias("new_docs"),
            F.round(
                F.coalesce("old_micro", F.lit(0)).cast("double") / 1_000_000,
                6,
            ).alias("old_share"),
            F.round(
                F.coalesce("new_micro", F.lit(0)).cast("double") / 1_000_000,
                6,
            ).alias("new_share"),
            F.round(
                (
                    F.coalesce("new_micro", F.lit(0))
                    - F.coalesce("old_micro", F.lit(0))
                ).cast("double")
                / 1_000_000,
                6,
            ).alias("delta_share"),
        )
    )


def sql_lang_drift(old_sql: str, new_sql: str) -> str:
    def shares(src: str, prefix: str) -> str:
        return f"""(
            SELECT lang, {prefix}_docs,
                   CAST(floor(CAST({prefix}_docs AS DOUBLE)
                              / CAST(tot AS DOUBLE) * 1000000) AS BIGINT)
                       AS {prefix}_micro
            FROM (SELECT lang, CAST(count(*) AS BIGINT) AS {prefix}_docs
                  FROM ({src}) GROUP BY lang)
            CROSS JOIN (SELECT count(*) AS tot FROM ({src}))
        )"""

    return f"""
        SELECT COALESCE(o.lang, n.lang) AS lang,
               COALESCE(o.old_docs, 0) AS old_docs,
               COALESCE(n.new_docs, 0) AS new_docs,
               round(CAST(COALESCE(o.old_micro, 0) AS DOUBLE) / 1000000, 6)
                   AS old_share,
               round(CAST(COALESCE(n.new_micro, 0) AS DOUBLE) / 1000000, 6)
                   AS new_share,
               round(CAST(COALESCE(n.new_micro, 0) - COALESCE(o.old_micro, 0)
                          AS DOUBLE) / 1000000, 6) AS delta_share
        FROM {shares(old_sql, 'old')} o
        FULL OUTER JOIN {shares(new_sql, 'new')} n ON o.lang = n.lang
    """


# ---------------------------------------------------------------------------
# T114 — canonical-URL dedup
# ---------------------------------------------------------------------------
#
# RefinedWeb's FIRST dedup stage, before any content hashing: multiple
# crawls of the same page (tracker params, www/port/fragment variants)
# collapse to one row per CANONICAL url, keeping the most recent
# fetch.  At 10^12 rows this removes the bulk of trivial duplication
# for the cost of one map-side-combinable argmax per canonical key —
# content-level dedup (T1/T2) then runs on what's left.


def url_dedup(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(canon_url, kept_doc_id, n_variants): one survivor per
    canonical URL — the max doc_id (the recency stand-in: ids ascend
    with fetch order), via a single max(struct) partial agg; no
    variant list ever materializes."""
    key = F.col(key_col)
    url = plant_url_col(key, F.col("source"))
    canon = canonicalize_url(url)["canon_url"]
    return (
        docs.select(canon.alias("canon_url"), key.alias("doc_id"))
        .groupBy("canon_url")
        .agg(
            F.max("doc_id").cast("bigint").alias("kept_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        )
    )


def sql_url_dedup() -> str:
    canon = sql_url_canon()
    return f"""
        WITH c AS ({canon})
        SELECT canon_url,
               CAST(max(doc_id) AS BIGINT) AS kept_doc_id,
               CAST(count(*) AS BIGINT) AS n_variants
        FROM c GROUP BY canon_url
    """


# ---------------------------------------------------------------------------
# T123 — politeness schedule (per-host fetch slots)
# ---------------------------------------------------------------------------
#
# A frontier that respects crawl-delay must serialize fetches per
# host: the slot sequence IS the politeness contract.  Per-host
# serialization is inherent to the problem, so the per-host window
# here is not a scalability smell — the shuffle carries (doc_id,
# host, 8-byte order hash) only, giant hosts are bounded upstream by
# the per-host quota (T44), and hosts are spread over workers by a
# stable hash so no worker inherits a head-of-line host by accident.

CRAWL_DELAY_MS = 1000
N_CRAWL_WORKERS = 16


def politeness_schedule(
    docs: DataFrame,
    delay_ms: int = CRAWL_DELAY_MS,
    n_workers: int = N_CRAWL_WORKERS,
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, host, worker, slot, fetch_ms): deterministic fetch
    plan — per-host slots in md5 order (stable, seedable shuffle of
    the host's queue), fetch_ms = slot * delay_ms, worker = stable
    host hash mod n_workers (all of a host's fetches land on ONE
    worker, the invariant politeness needs)."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60

    key = F.col(key_col)
    url = plant_url_col(key, F.col("source"))
    host = canonicalize_url(url)["host"]
    base = docs.select(
        key.alias("doc_id"),
        host.alias("host"),
        F.md5(F.concat(F.lit("pol:"), key.cast("string"))).alias("ord"),
    )
    w = W.partitionBy("host").orderBy("ord", "doc_id")
    return base.select(
        "doc_id",
        "host",
        (_hash60(F.concat(F.lit("w:"), F.col("host"))) % n_workers)
        .cast("bigint")
        .alias("worker"),
        (F.row_number().over(w) - 1).cast("bigint").alias("slot"),
        ((F.row_number().over(w) - 1) * delay_ms)
        .cast("bigint")
        .alias("fetch_ms"),
    )


def sql_politeness_schedule(
    delay_ms: int = CRAWL_DELAY_MS, n_workers: int = N_CRAWL_WORKERS
) -> str:
    url = sql_plant_url()
    re = _URL_RE.replace("\\", "\\\\").replace("'", "''")
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        hosts AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_extract(
                           lower(regexp_extract(url, '{re}', 2)),
                           '^([^:]+)', 1),
                       '^www\\.', '') AS host,
                   md5('pol:' || CAST(doc_id AS VARCHAR)) AS ord
            FROM u
        )
        SELECT doc_id, host,
               CAST(CAST('0x' || substr(md5('w:' || host), 1, 15) AS BIGINT)
                    % {n_workers} AS BIGINT) AS worker,
               CAST(row_number() OVER (PARTITION BY host
                                       ORDER BY ord, doc_id) - 1
                    AS BIGINT) AS slot,
               CAST((row_number() OVER (PARTITION BY host
                                        ORDER BY ord, doc_id) - 1)
                    * {delay_ms} AS BIGINT) AS fetch_ms
        FROM hosts
    """


# ---------------------------------------------------------------------------
# T124 — URL path-template mining
# ---------------------------------------------------------------------------
#
# Collapsing numeric path segments ("/Articles/8231" -> "/Articles/{n}")
# exposes a site's URL structure: which templates dominate a host
# decides crawl budgets (list pages vs article pages) and powers
# pattern-level blocklists.  One narrow regex projection + one
# map-side-combined agg; nothing but (host, template) strings shuffle.

def url_templates(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(host, template, n_urls, min_doc_id): per-host URL path
    templates with numeric runs collapsed to ``{n}``."""
    key = F.col(key_col)
    url = plant_url_col(key, F.col("source"))
    parts = canonicalize_url(url)
    path = F.regexp_extract(parts["canon_url"], _URL_RE, 3)
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    return (
        docs.select(
            parts["host"].alias("host"),
            template.alias("template"),
            key.alias("doc_id"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
    )


def sql_url_templates() -> str:
    url = sql_plant_url()
    re = _URL_RE.replace("\\", "\\\\").replace("'", "''")
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        parts AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_extract(
                           lower(regexp_extract(url, '{re}', 2)),
                           '^([^:]+)', 1),
                       '^www\\.', '') AS host,
                   CASE WHEN regexp_extract(url, '{re}', 3) = ''
                        THEN '/' ELSE regexp_extract(url, '{re}', 3)
                   END AS path
            FROM u
        )
        SELECT host,
               regexp_replace(path, '[0-9]+', '{{n}}', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(min(doc_id) AS BIGINT) AS min_doc_id
        FROM parts GROUP BY host, template
    """


# ---------------------------------------------------------------------------
# T137 — host reputation (Wilson lower bound on per-host quality)
# ---------------------------------------------------------------------------
#
# Crawl schedulers and admission rules need a PER-HOST quality prior,
# but a raw good-doc rate is useless at the tail: a host with 2/2 good
# docs would outrank one with 980/1000.  The standard fix is the
# Wilson score interval's lower bound (the "how to not sort by average
# rating" estimator): rank hosts by the LOWER confidence bound of
# their good rate, which discounts small samples automatically.  The
# per-doc verdict is the Gopher keep rule (T9/T16) the curation
# pipeline already applies, so the reputation table is consistent with
# what curation will actually do to the host's pages.
#
# Scale shape: the verdict is an in-row expression, the rollup is one
# map-side-combined groupBy(host) carrying two bigints; the Wilson
# formula is a fixed-shape double expression over exact (k, n) — no
# joins, no Python, cross-engine bit-identical.

WILSON_Z = 1.96


def host_reputation(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """(host, n_docs, n_good, good_rate, wilson_lb): per-host doc
    count, Gopher-keep count, raw rate and Wilson lower bound (both
    6dp), z = 1.96 (95%)."""
    from ocr_spark.operators.corpus_ops import quality_features, quality_keep

    keep = quality_keep(quality_features(F.col("text")))
    agg = (
        docs.select(F.col(host_col).alias("host"), keep.alias("k"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("k").cast("bigint")).alias("n_good"),
        )
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_good").cast("double") / n
    z = F.lit(float(WILSON_Z))
    z2 = z * z
    center = p + z2 / (F.lit(2.0) * n)
    margin = z * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n
    )
    lb = (center - margin) / (F.lit(1.0) + z2 / n)
    return agg.select(
        "host",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_good").cast("bigint").alias("n_good"),
        F.round(p, 6).alias("good_rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )


def sql_host_reputation(host_expr: str = "source") -> str:
    from ocr_spark.operators.corpus_ops import sql_quality_query

    z = float(WILSON_Z)
    return f"""
        WITH verdicts AS ({sql_quality_query()}),
        agg AS (
            SELECT d.{host_expr} AS host,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN v.keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_good
            FROM documents d JOIN verdicts v ON v.doc_id = d.doc_id
            GROUP BY d.{host_expr}
        ),
        w AS (
            SELECT host, n_docs, n_good,
                   CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p,
                   CAST(n_docs AS DOUBLE) AS n
            FROM agg
        )
        SELECT host,
               CAST(n_docs AS BIGINT) AS n_docs,
               n_good,
               round(p, 6) AS good_rate,
               round(((p + {z!r} * {z!r} / (2.0 * n))
                      - {z!r} * sqrt((p * (1.0 - p)
                                      + {z!r} * {z!r} / (4.0 * n)) / n))
                     / (1.0 + {z!r} * {z!r} / n), 6) AS wilson_lb
        FROM w
    """


# ---------------------------------------------------------------------------
# T142 — per-host URL shape statistics (path depth / param incidence)
# ---------------------------------------------------------------------------
#
# Frontier shaping reads URL SHAPE before it fetches a byte: deep
# paths and param-bearing URLs are where calendar traps, faceted-
# search explosions, and session-id spiders live (the classic crawler-
# trap taxonomy).  Per host this rolls up path-segment depth and the
# fraction of URLs carrying a query string — the two inputs a frontier
# uses to cap per-host depth and to canonicalize-before-enqueue.
# Complements url_templates (T124: which paths repeat) with the
# distributional view (how deep, how parameterized).
#
# Scale shape: parse + depth are in-row expressions on the already-
# planted URL; one map-side-combined groupBy(host); no joins, no
# Python.


def url_depth_stats(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(host, n_urls, max_depth, avg_depth, n_with_params): path-
    segment depth stats and query-string incidence per canonical
    host; avg_depth 6dp."""
    key = F.col(key_col)
    url = plant_url_col(key, F.col("source"))
    host = canonicalize_url(url)["host"]
    path_raw = F.regexp_extract(url, _URL_RE, 3)
    depth = F.size(
        F.filter(F.split(path_raw, "/"), lambda x: x != F.lit(""))
    ).cast("bigint")
    has_params = (F.regexp_extract(url, _URL_RE, 4) != "").cast("bigint")
    return (
        docs.select(
            host.alias("host"),
            depth.alias("depth"),
            has_params.alias("hp"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.max("depth").cast("bigint").alias("max_depth"),
            F.round(
                F.sum("depth").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_depth"),
            F.sum("hp").cast("bigint").alias("n_with_params"),
        )
    )


def sql_url_depth_stats() -> str:
    url = sql_plant_url()
    re = _URL_RE.replace("\\", "\\\\").replace("'", "''")
    return f"""
        WITH u AS (SELECT doc_id, {url} AS url FROM documents),
        parts AS (
            SELECT
                regexp_replace(
                    regexp_extract(lower(regexp_extract(url, '{re}', 2)),
                                   '^([^:]+)', 1),
                    '^www\\.', '') AS host,
                CAST(len(list_filter(
                    string_split(regexp_extract(url, '{re}', 3), '/'),
                    x -> x <> '')) AS BIGINT) AS depth,
                CAST(CASE WHEN regexp_extract(url, '{re}', 4) <> ''
                          THEN 1 ELSE 0 END AS BIGINT) AS hp
            FROM u
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(max(depth) AS BIGINT) AS max_depth,
               round(CAST(sum(depth) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS avg_depth,
               CAST(sum(hp) AS BIGINT) AS n_with_params
        FROM parts GROUP BY host
    """


# ---------------------------------------------------------------------------
# T143 — corpus host-diversity index (effective number of hosts)
# ---------------------------------------------------------------------------
#
# A 10^12-page corpus where three hosts own half the mass trains a
# three-site language model.  The mixture-health number on every
# dataset card is the Shannon diversity of the host distribution,
# reported as the EFFECTIVE number of hosts exp(H) (the ecology
# "Hill number" N1) — directly comparable to the raw host count: if
# n_hosts=10_000 but effective_hosts=40, host capping (T44) has work
# to do.  top_host_share is the worst-case single-host mass.
#
# Integer micro-nat entropy (T88's trick) keeps the cross-engine sum
# exact; exp() is one fixed-shape double call on the exact quotient.
#
# Scale shape: one map-side-combined groupBy(host) to ~n_hosts count
# rows, then a single bounded global agg to ONE row.  No text moves.


def host_diversity(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """One row (n_docs, n_hosts, entropy_nats, effective_hosts,
    top_host_share): Shannon H over host shares (6dp), exp(H) (6dp),
    max single-host share (6dp)."""
    from ocr_spark.operators.corpus_ops import _ENT_SCALE

    hc = (
        docs.select(F.col(host_col).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lnc = F.round(F.log(F.col("c").cast("double")) * _ENT_SCALE).cast(
        "bigint"
    )
    agg = hc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
        F.sum(F.col("c") * lnc).cast("bigint").alias("s"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    lnn = F.round(F.log(F.col("n").cast("double")) * _ENT_SCALE).cast(
        "bigint"
    )
    h = (
        lnn.cast("double") - F.col("s").cast("double") / F.col("n").cast("double")
    ) / F.lit(float(_ENT_SCALE))
    return agg.select(
        F.col("n").alias("n_docs"),
        "n_hosts",
        F.round(h, 6).alias("entropy_nats"),
        F.round(F.exp(h), 6).alias("effective_hosts"),
        F.round(
            F.col("top_c").cast("double") / F.col("n").cast("double"), 6
        ).alias("top_host_share"),
    )


def sql_host_diversity(host_expr: str = "source") -> str:
    from ocr_spark.operators.corpus_ops import _ENT_SCALE

    s = _ENT_SCALE
    h = (
        f"(CAST(CAST(round(ln(CAST(n AS DOUBLE)) * {s}) AS BIGINT) AS DOUBLE)"
        f" - CAST(w_s AS DOUBLE) / CAST(n AS DOUBLE)) / {float(s)!r}"
    )
    return f"""
        WITH hc AS (
            SELECT {host_expr} AS host, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY {host_expr}
        ),
        agg AS (
            SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_hosts,
                   CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * {s})
                                     AS BIGINT)) AS BIGINT) AS w_s,
                   CAST(max(c) AS BIGINT) AS top_c
            FROM hc
        )
        SELECT n AS n_docs,
               n_hosts,
               round({h}, 6) AS entropy_nats,
               round(exp({h}), 6) AS effective_hosts,
               round(CAST(top_c AS DOUBLE) / CAST(n AS DOUBLE), 6)
                   AS top_host_share
        FROM agg
    """


# ---------------------------------------------------------------------------
# T147 — crawl-budget allocation (largest-remainder apportionment)
# ---------------------------------------------------------------------------
#
# A crawl cycle has a global fetch budget B; each host holds a weight
# (here its doc mass — in production any value score, e.g. T137's
# Wilson bound × T85's change rate).  Proportional shares B·w/W are
# fractional; naive floor() under-spends and naive round() can
# over-spend.  The exact classical fix is largest-remainder (Hamilton)
# apportionment: floor everyone, then hand the leftover slots to the
# largest fractional remainders — deterministic, integer-exact, sums
# to B by construction.
#
# All arithmetic stays in bigints ((B·w) div/mod W — no float
# remainder ties), so the allocation is bit-identical across engines
# and cluster sizes.
#
# Scale shape: one map-side-combined groupBy(host) to ~n_hosts weight
# rows; the apportionment window runs over those bounded rows (never
# the corpus); the totals frame is a broadcast one-row cross join.

CRAWL_BUDGET = 1000


def budget_allocate(
    docs: DataFrame, budget: int = CRAWL_BUDGET, host_col: str = "source"
) -> DataFrame:
    """(host, weight, quota): integer fetch quota per host; quotas sum
    exactly to `budget` via largest-remainder apportionment with
    (remainder DESC, host ASC) tie order."""
    from pyspark.sql import Window as W

    hw = (
        docs.select(F.col(host_col).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )
    totals = hw.agg(F.sum("weight").cast("bigint").alias("w_total"))
    b = F.lit(budget).cast("bigint")
    # NB: Spark `/` on bigints is float division — use floor div.
    scored = hw.join(F.broadcast(totals)).select(
        "host",
        "weight",
        F.floor((b * F.col("weight")) / F.col("w_total"))
        .cast("bigint")
        .alias("base"),
        ((b * F.col("weight")) % F.col("w_total")).alias("rem"),
    )
    w = W.orderBy(F.col("rem").desc(), F.col("host").asc())
    ranked = scored.select(
        "host",
        "weight",
        "base",
        F.row_number().over(w).cast("bigint").alias("rk"),
        (b - F.sum("base").over(W.partitionBy())).alias("deficit"),
    )
    return ranked.select(
        "host",
        "weight",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("deficit"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("quota"),
    )


def sql_budget_allocate(
    budget: int = CRAWL_BUDGET, host_expr: str = "source"
) -> str:
    return f"""
        WITH hw AS (
            SELECT {host_expr} AS host, CAST(count(*) AS BIGINT) AS weight
            FROM documents GROUP BY {host_expr}
        ),
        t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM hw),
        scored AS (
            SELECT host, weight,
                   CAST(({budget} * weight) // w_total AS BIGINT) AS base,
                   CAST(({budget} * weight) % w_total AS BIGINT) AS rem
            FROM hw CROSS JOIN t
        ),
        ranked AS (
            SELECT host, weight, base,
                   CAST(row_number() OVER (ORDER BY rem DESC, host ASC)
                        AS BIGINT) AS rk,
                   {budget} - sum(base) OVER () AS deficit
            FROM scored
        )
        SELECT host, weight,
               CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                    AS BIGINT) AS quota
        FROM ranked
    """


# ---------------------------------------------------------------------------
# T158 — per-host language entropy (mixed-language host flag)
# ---------------------------------------------------------------------------
#
# Machine-translation farms and scraped-content spam hosts serve the
# same template in many languages; legitimate hosts are overwhelmingly
# monolingual (or one dominant language plus a small remainder).  The
# per-host language entropy — Shannon H over a host's language shares
# — separates the two populations with one grouped count, and the
# mixed flag (several languages, no 80% majority) is the cheap
# host-level spam signal that complements T93's link-based score.
#
# Exactness: the same micro-nat integer entropy idiom as T143 — ln(c)
# quantized to bigint micro-nats per (host, lang) cell, folded as
# exact integer sums, one double division at the end — so the oracle
# reproduces H bit-for-bit.
#
# Scale shape: groupBy(host, lang) with map-side combine (the shuffle
# carries |hosts|×|langs| keyed counts), then a bounded per-host
# rollup.  Nothing else moves.

MIXED_MAJORITY = 0.8


def host_lang_entropy(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """(host, n_docs, n_langs, entropy_nats, majority_share,
    is_mixed): per-host language profile; mixed = >1 language and no
    MIXED_MAJORITY share."""
    from ocr_spark.operators.corpus_ops import _ENT_SCALE

    cells = (
        docs.select(F.col(host_col).alias("host"), "lang")
        .groupBy("host", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lnc = F.round(F.log(F.col("c").cast("double")) * _ENT_SCALE).cast(
        "bigint"
    )
    per = cells.groupBy("host").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(F.col("c") * lnc).cast("bigint").alias("s"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    lnn = F.round(F.log(F.col("n_docs").cast("double")) * _ENT_SCALE).cast(
        "bigint"
    )
    h = (
        lnn.cast("double")
        - F.col("s").cast("double") / F.col("n_docs").cast("double")
    ) / F.lit(float(_ENT_SCALE))
    maj = F.round(
        F.col("top_c").cast("double") / F.col("n_docs").cast("double"), 6
    )
    return per.select(
        "host",
        "n_docs",
        "n_langs",
        F.round(h, 6).alias("entropy_nats"),
        maj.alias("majority_share"),
        ((F.col("n_langs") > 1) & (maj < MIXED_MAJORITY)).alias("is_mixed"),
    )


def sql_host_lang_entropy(host_expr: str = "source") -> str:
    from ocr_spark.operators.corpus_ops import _ENT_SCALE

    s = _ENT_SCALE
    h = (
        f"(CAST(CAST(round(ln(CAST(n_docs AS DOUBLE)) * {s}) AS BIGINT)"
        f" AS DOUBLE) - CAST(w_s AS DOUBLE) / CAST(n_docs AS DOUBLE))"
        f" / {float(s)!r}"
    )
    return f"""
        WITH cells AS (
            SELECT {host_expr} AS host, lang,
                   CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY {host_expr}, lang
        ),
        per AS (
            SELECT host,
                   CAST(sum(c) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_langs,
                   CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * {s})
                                     AS BIGINT)) AS BIGINT) AS w_s,
                   CAST(max(c) AS BIGINT) AS top_c
            FROM cells GROUP BY host
        )
        SELECT host, n_docs, n_langs,
               round({h}, 6) AS entropy_nats,
               round(CAST(top_c AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                   AS majority_share,
               n_langs > 1
               AND round(CAST(top_c AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                   < {MIXED_MAJORITY} AS is_mixed
        FROM per
    """


# ---------------------------------------------------------------------------
# T162 — host-contribution Gini coefficient
# ---------------------------------------------------------------------------
#
# The dataset card's one-number answer to "how concentrated is this
# corpus?" — a Gini of 0 means every host contributes equally, near 1
# means a handful of hosts dominate (and host capping / rebalancing
# has work to do).  Complements T143's effective-hosts: Gini is the
# standard inequality statistic reviewers ask for, and it weights the
# whole Lorenz curve, not just the entropy summary.
#
# Exactness: with hosts ranked ascending by (tokens, host), the
# numerator 2*sum(i*x_i) - (n+1)*sum(x_i) is pure bigint arithmetic;
# one double division at the end, 6dp.  Deterministic tie-break by
# host name keeps the rank sequence engine-identical (Gini itself is
# tie-invariant, the guard is for the intermediate sums).
#
# Scale shape: one map-side-combined groupBy(host) over in-row token
# counts; the rank window runs over the bounded per-host table only.


def source_gini(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row (n_hosts, total_tokens, gini): token-contribution
    inequality across hosts (Gini, 6dp)."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.corpus_ops import _words

    words = _words(F.col(text_col))
    n_tok = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    per = (
        docs.select(F.col("source").alias("host"), n_tok.alias("n_tok"))
        .groupBy("host")
        .agg(F.sum("n_tok").cast("bigint").alias("x"))
    )
    w = W.orderBy("x", "host")
    ranked = per.select("x", F.row_number().over(w).cast("bigint").alias("i"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
    )
    gini = (
        (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    return m.select(
        F.col("n").alias("n_hosts"),
        F.col("sx").alias("total_tokens"),
        F.round(gini, 6).alias("gini"),
    )


def sql_source_gini(text_expr: str = "text") -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words(text_expr)
    return f"""
        WITH per AS (
            SELECT source AS host,
                   CAST(sum(len(list_filter({w}, x -> x <> '')))
                        AS BIGINT) AS x
            FROM documents GROUP BY source
        ),
        ranked AS (
            SELECT x, CAST(row_number() OVER (ORDER BY x, host) AS BIGINT)
                       AS i
            FROM per
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(i * x) AS BIGINT) AS six
            FROM ranked
        )
        SELECT n AS n_hosts, sx AS total_tokens,
               round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE), 6) AS gini
        FROM m
    """


# ---------------------------------------------------------------------------
# T163 — unigram-distribution drift (Jensen-Shannon divergence)
# ---------------------------------------------------------------------------
#
# T111 watches the language mixture drift between snapshots; this is
# the same tripwire one level deeper — the word distribution itself.
# A refresh that keeps the language mix but swaps topical composition
# (breaking news, a new spam campaign, a crawler trap minting token
# soup) moves unigram JS divergence first.  JSD over KL because it is
# symmetric, bounded by ln 2, and defined when either side has
# exclusive words.
#
# Exactness: the shard_kl idiom — every log term is quantized to
# micro-nats (round(ln(x)*1e6) as BIGINT) before the per-word terms
# (pure bigint products) are summed, so the fold is order-free and
# engine-identical; mixture masses are formed in doubles from exact
# counts (p/m = 2*cp*Nq / (cp*Nq + cq*Np)) to avoid bigint overflow
# at web scale.
#
# Scale shape: ONE corpus scan (the new snapshot is a conditional
# count, not a second read), one map-side-combined groupBy(word), a
# broadcast 1-row totals join.  Only 8-byte counts shuffle.

_JSD_LN2 = 693147  # round(ln(2) * 1e6)


def unigram_drift(
    docs: DataFrame,
    new_pred: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """One row (n_words_old, n_words_new, n_types, jsd_nats): unigram
    Jensen-Shannon divergence between the full corpus (old) and the
    ``new_pred`` subset (default: doc_id % 7 != 0, the snapshot-diff
    planting every drift op here uses)."""
    if new_pred is None:
        new_pred = F.col("doc_id") % 7 != 0
    tw = docs.select(
        new_pred.cast("bigint").alias("kept"),
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    wc = tw.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("cp"),
        F.sum("kept").cast("bigint").alias("cq"),
    )
    # wc feeds BOTH the totals row and the per-word fold; without a
    # barrier Spark re-derives the whole corpus scan + word shuffle for
    # each use (2x the dominant cost at 10^12 rows).  A lazy
    # localCheckpoint materializes the bounded vocab table once — the
    # triangle-count / PageRank lesson applied here.
    wc = wc.localCheckpoint(eager=False)
    totals = wc.agg(
        F.sum("cp").cast("bigint").alias("np"),
        F.sum("cq").cast("bigint").alias("nq"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )

    def _l(x: Column) -> Column:
        return F.round(F.log(x) * 1_000_000).cast("bigint")

    j = wc.join(F.broadcast(totals))
    mix = _l(
        F.col("cp").cast("double") * F.col("nq").cast("double")
        + F.col("cq").cast("double") * F.col("np").cast("double")
    )
    term_p = F.col("cp") * (
        F.lit(_JSD_LN2)
        + _l(F.col("cp").cast("double"))
        + _l(F.col("nq").cast("double"))
        - mix
    )
    term_q = F.when(
        F.col("cq") > 0,
        F.col("cq")
        * (
            F.lit(_JSD_LN2)
            + _l(F.col("cq").cast("double"))
            + _l(F.col("np").cast("double"))
            - mix
        ),
    ).otherwise(F.lit(0))
    agg = j.agg(
        F.max("np").alias("n_words_old"),
        F.max("nq").alias("n_words_new"),
        F.max("n_types").alias("n_types"),
        F.sum(term_p).cast("bigint").alias("klp_unats"),
        F.sum(term_q).cast("bigint").alias("klq_unats"),
    )
    jsd = 0.5 * (
        F.col("klp_unats").cast("double") / F.col("n_words_old").cast("double")
        + F.col("klq_unats").cast("double")
        / F.col("n_words_new").cast("double")
    ) / 1_000_000.0
    return agg.select(
        "n_words_old",
        "n_words_new",
        "n_types",
        F.round(jsd, 6).alias("jsd_nats"),
    )


def sql_unigram_drift(
    new_pred: str = "doc_id % 7 <> 0", text_expr: str = "text"
) -> str:
    from ocr_spark.operators.corpus_ops import _sql_words

    w = _sql_words(text_expr)

    def l(x: str) -> str:  # noqa: E743
        return f"CAST(round(ln({x}) * 1000000) AS BIGINT)"

    mix = l(
        "CAST(cp AS DOUBLE) * CAST(nq AS DOUBLE)"
        " + CAST(cq AS DOUBLE) * CAST(np AS DOUBLE)"
    )
    return f"""
        WITH tw AS (
            SELECT CASE WHEN {new_pred} THEN 1 ELSE 0 END AS kept,
                   wd AS word
            FROM (SELECT doc_id, unnest({w}) AS wd FROM documents)
            WHERE wd <> ''
        ),
        wc AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cp,
                   CAST(sum(kept) AS BIGINT) AS cq
            FROM tw GROUP BY word
        ),
        totals AS (
            SELECT CAST(sum(cp) AS BIGINT) AS np,
                   CAST(sum(cq) AS BIGINT) AS nq,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM wc
        ),
        agg AS (
            SELECT max(np) AS n_words_old, max(nq) AS n_words_new,
                   max(n_types) AS n_types,
                   CAST(sum(cp * ({_JSD_LN2}
                                  + {l('CAST(cp AS DOUBLE)')}
                                  + {l('CAST(nq AS DOUBLE)')}
                                  - {mix})) AS BIGINT) AS klp_unats,
                   CAST(sum(CASE WHEN cq > 0 THEN
                            cq * ({_JSD_LN2}
                                  + {l('CAST(cq AS DOUBLE)')}
                                  + {l('CAST(np AS DOUBLE)')}
                                  - {mix})
                            ELSE 0 END) AS BIGINT) AS klq_unats
            FROM wc, totals
        )
        SELECT n_words_old, n_words_new, n_types,
               round(0.5 * (CAST(klp_unats AS DOUBLE)
                            / CAST(n_words_old AS DOUBLE)
                            + CAST(klq_unats AS DOUBLE)
                            / CAST(n_words_new AS DOUBLE))
                     / 1000000.0, 6) AS jsd_nats
        FROM agg
    """


# ---------------------------------------------------------------------------
# T169 — mirror-host detection (cross-host content overlap)
# ---------------------------------------------------------------------------
#
# Mirrors — www./m./cdn variants, region clones, scraped re-hosts —
# duplicate CONTENT across HOSTS, so host-scoped tools (T44 caps,
# T114 URL dedup, T116 per-host dup mass) never see them and
# corpus-wide pair dedup pays for what one host-level drop would fix.
# The detector: exact content fingerprints grouped by fp, host pairs
# co-occurring on a fingerprint counted, Jaccard over each host's
# distinct-fingerprint sets.
#
# Scale shape: (fp, host) distinct is map-side combined; the pair
# expansion is a self-join ON fp — each fingerprint contributes
# |hosts(fp)| choose 2 pairs, bounded in practice because a fp shared
# by MANY hosts is boilerplate (and the cap parameter drops those the
# way LSH drops oversize buckets).  Only 16-byte hashes shuffle.

MIRROR_MIN_SHARED = 2
MIRROR_MAX_HOSTS_PER_FP = 8


def mirror_detect(
    docs: DataFrame,
    min_shared: int = MIRROR_MIN_SHARED,
    max_hosts: int = MIRROR_MAX_HOSTS_PER_FP,
    text_col: str = "text",
) -> DataFrame:
    """(host_a, host_b, shared, jaccard): host pairs sharing >=
    min_shared exact content fingerprints, with Jaccard over distinct
    fingerprint sets (6dp); fps on > max_hosts hosts are boilerplate
    and dropped."""
    fp = F.md5(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    d = docs.select(fp.alias("fp"), F.col("source").alias("host")).distinct()
    hosts_per_fp = d.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh")
    )
    d2 = d.join(
        hosts_per_fp.filter(F.col("nh") <= max_hosts).select("fp"), "fp"
    )
    totals = d.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("nf")
    )
    a = d2.alias("a")
    b = d2.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    ta = totals.select(
        F.col("host").alias("host_a"), F.col("nf").alias("na")
    )
    tb = totals.select(
        F.col("host").alias("host_b"), F.col("nf").alias("nb")
    )
    return (
        pairs.join(F.broadcast(ta), "host_a")
        .join(F.broadcast(tb), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def sql_mirror_detect(
    min_shared: int = MIRROR_MIN_SHARED,
    max_hosts: int = MIRROR_MAX_HOSTS_PER_FP,
    text_expr: str = "text",
) -> str:
    fp = f"md5(regexp_replace(trim({text_expr}), '\\s+', ' ', 'g'))"
    return f"""
        WITH d AS (
            SELECT DISTINCT {fp} AS fp, source AS host FROM documents
        ),
        keep AS (
            SELECT fp FROM d GROUP BY fp HAVING count(*) <= {max_hosts}
        ),
        d2 AS (SELECT d.* FROM d JOIN keep USING (fp)),
        totals AS (
            SELECT host, CAST(count(*) AS BIGINT) AS nf
            FROM d GROUP BY host
        ),
        pairs AS (
            SELECT a.host AS host_a, b.host AS host_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM d2 a JOIN d2 b ON a.fp = b.fp AND a.host < b.host
            GROUP BY a.host, b.host
            HAVING count(*) >= {min_shared}
        )
        SELECT host_a, host_b, shared,
               round(CAST(shared AS DOUBLE)
                     / CAST(ta.nf + tb.nf - shared AS DOUBLE), 6)
                   AS jaccard
        FROM pairs
        JOIN totals ta ON ta.host = host_a
        JOIN totals tb ON tb.host = host_b
    """


# ---------------------------------------------------------------------------
# T179-T181: extraction-path governance audits
# ---------------------------------------------------------------------------

def extraction_yield(
    extracted: DataFrame, key_col: Optional[Column] = None
) -> DataFrame:
    """T179 (source, n_docs, bytes_in, chars_out, yield_ppm): per-host
    boilerplate-stripping yield of the REAL extraction path — the
    table a crawl-budget review reads to see which hosts pay for their
    bytes (reference: the per-task `bytes_in`/`chars_out` metrics its
    admin dashboard aggregates, main.py task stats).

    Input is ``extract_documents(...)`` output; the extractor's own
    per-doc ``bytes_in`` (payload bytes) and ``chars_out`` (extracted
    chars) feed one partial-agg groupBy — no second scan, no join.
    ``key_col`` picks the grouping key (the production extract job
    passes the canonical host); the default splits the driver
    testdata's planted ``source:doc_id`` url.  ``yield_ppm`` is
    integer ppm (``div``), so the oracle reproduces it exactly.  At
    100 TB: one map-side-combined agg over ~hosts rows; the extraction
    pass itself is the zero-shuffle scan path.
    """
    if key_col is None:
        key_col = F.split_part(F.col("url"), F.lit(":"), F.lit(1))
    return (
        extracted.select(
            key_col.alias("source"),
            "bytes_in",
            "chars_out",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("bytes_in").cast("bigint").alias("bytes_in"),
            F.sum("chars_out").cast("bigint").alias("chars_out"),
        )
        .select(
            "source",
            "n_docs",
            "bytes_in",
            "chars_out",
            F.expr("(1000000 * chars_out) div bytes_in")
            .cast("bigint")
            .alias("yield_ppm"),
        )
    )


def sql_extraction_yield() -> str:
    """Oracle: restate wrapped-page byte length (strlen of the
    byte-exact SQL wrapper) and normalized-text length from the source
    row — a defect anywhere in wrap/admit/extract breaks the hash."""
    from ocr_spark.sources.wrap import sql_wrapped_html

    page = sql_wrapped_html("text")
    norm = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
    return f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(strlen({page})) AS BIGINT) AS bytes_in,
               CAST(sum(length({norm})) AS BIGINT) AS chars_out,
               CAST((1000000 * CAST(sum(length({norm})) AS BIGINT))
                    // CAST(sum(strlen({page})) AS BIGINT) AS BIGINT)
                   AS yield_ppm
        FROM documents
        GROUP BY source
    """


def extraction_parity(
    html_extracted: DataFrame, pdf_extracted: DataFrame
) -> DataFrame:
    """T180 (source, n_docs, chars_html, chars_pdf, n_mismatch): the
    cross-codec parity audit — the SAME corpus pushed through BOTH
    real parsers (HTML boilerplate strip and PDF content-stream parse)
    must extract the identical normalized text per url, so per-source
    char sums agree and ``n_mismatch`` is 0.  This is the regression
    gate a format-router change runs before shipping: any divergence
    between the two extraction stacks surfaces as a non-zero cell.
    One url-keyed join of two extraction outputs (both already
    url-distinct), then one partial-agg groupBy."""
    h = html_extracted.select(
        "url", F.col("chars_out").alias("chars_html")
    )
    p = pdf_extracted.select("url", F.col("chars_out").alias("chars_pdf"))
    return (
        h.join(p, "url")
        .select(
            F.split_part(F.col("url"), F.lit(":"), F.lit(1)).alias("source"),
            "chars_html",
            "chars_pdf",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("chars_html").cast("bigint").alias("chars_html"),
            F.sum("chars_pdf").cast("bigint").alias("chars_pdf"),
            F.sum(
                F.when(F.col("chars_html") != F.col("chars_pdf"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mismatch"),
        )
    )


def sql_extraction_parity() -> str:
    norm = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
    return f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length({norm})) AS BIGINT) AS chars_html,
               CAST(sum(length({norm})) AS BIGINT) AS chars_pdf,
               CAST(0 AS BIGINT) AS n_mismatch
        FROM documents
        GROUP BY source
    """


_META_REFRESH_MOD = 7


def meta_refresh_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, html): head-only page with a deterministic
    ``<meta http-equiv="refresh">`` planted on every
    ``doc_id % 7 == 0`` row, targeting the host's next doc — the
    client-side-redirect shape a frontier must treat as an edge
    (reference: the URL routing its task intake normalizes).  Body
    text is HTML-escaped, so document content can never counterfeit
    the tag.  Pure column expressions."""
    from ocr_spark.sources.wrap import _HTML_TEMPLATE_TAIL

    target = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".com/doc/"),
        (F.col("doc_id") + 1).cast("string"),
    )
    refresh = F.when(
        F.col("doc_id") % _META_REFRESH_MOD == 0,
        F.concat(
            F.lit('<meta http-equiv="refresh" content="5;url='),
            target,
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<!DOCTYPE html>\n<html><head><title>r</title>"),
        refresh,
        F.lit("</head>\n<body><main><article><p>"),
        _escape_html_col(F.col("text")),
        F.lit("</p>"),
        F.lit(_HTML_TEMPLATE_TAIL),
    )
    return docs.select("doc_id", F.encode(page, "utf-8").alias("html"))


def meta_refresh_audit(pages: DataFrame) -> DataFrame:
    """T181 (doc_id, target_url): extract the meta-refresh redirect
    target from each page head with one JVM regex; pages without the
    tag drop out.  Feeds ``redirect_resolve`` (T78) as the
    client-side-redirect edge source."""
    body = F.decode(F.col("html"), "utf-8")
    t = F.regexp_extract(
        body,
        '<meta http-equiv="refresh" content="[0-9]+;url=([^"]*)"',
        1,
    )
    return (
        pages.select("doc_id", t.alias("target_url"))
        .filter(F.col("target_url") != "")
    )


def sql_meta_refresh_audit() -> str:
    return f"""
        SELECT doc_id,
               'https://' || source || '.com/doc/'
                   || CAST(doc_id + 1 AS VARCHAR) AS target_url
        FROM documents
        WHERE doc_id % {_META_REFRESH_MOD} = 0
    """


def crawl_budget_pareto(yield_table: DataFrame) -> DataFrame:
    """T183 (source, rank, yield_ppm, bytes_cum_ppm, chars_cum_ppm):
    the crawl-budget Pareto frontier — hosts ranked by extraction
    yield (best first), with cumulative crawl bytes and extracted
    chars as ppm of corpus totals.  Reading down the table answers
    "what fraction of the crawl budget buys what fraction of the
    useful text" — the curve a recrawl-budget review allocates
    against (composes T179's yield with T85's tiers).

    Scale shape: all windows run over the BOUNDED per-host table
    (same class as budget_allocate/politeness_schedule), never the
    corpus; integer ppm (`div`) end-to-end so the oracle is exact."""
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("yield_ppm"), F.asc("source"))
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    return (
        yield_table.select(
            "source",
            "yield_ppm",
            "bytes_in",
            "chars_out",
        )
        .select(
            "source",
            F.row_number().over(w).cast("int").alias("rank"),
            "yield_ppm",
            F.expr(
                "(1000000 * sum(bytes_in) OVER (ORDER BY yield_ppm DESC,"
                " source ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT"
                " ROW)) div sum(bytes_in) OVER ()"
            )
            .cast("bigint")
            .alias("bytes_cum_ppm"),
            F.expr(
                "(1000000 * sum(chars_out) OVER (ORDER BY yield_ppm DESC,"
                " source ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT"
                " ROW)) div sum(chars_out) OVER ()"
            )
            .cast("bigint")
            .alias("chars_cum_ppm"),
        )
    )


def sql_crawl_budget_pareto() -> str:
    """Oracle: the same frontier restated from the source rows (T179's
    byte/char arithmetic + identical window frames)."""
    from ocr_spark.sources.wrap import sql_wrapped_html

    page = sql_wrapped_html("text")
    norm = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
    return f"""
        WITH y AS (
            SELECT source,
                   CAST(sum(strlen({page})) AS BIGINT) AS bytes_in,
                   CAST(sum(length({norm})) AS BIGINT) AS chars_out,
                   CAST((1000000 * CAST(sum(length({norm})) AS BIGINT))
                        // CAST(sum(strlen({page})) AS BIGINT) AS BIGINT)
                       AS yield_ppm
            FROM documents
            GROUP BY source
        )
        SELECT source,
               CAST(row_number() OVER
                    (ORDER BY yield_ppm DESC, source ASC) AS INTEGER)
                   AS rank,
               yield_ppm,
               CAST((1000000 * sum(bytes_in) OVER
                     (ORDER BY yield_ppm DESC, source ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    // sum(bytes_in) OVER () AS BIGINT) AS bytes_cum_ppm,
               CAST((1000000 * sum(chars_out) OVER
                     (ORDER BY yield_ppm DESC, source ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    // sum(chars_out) OVER () AS BIGINT) AS chars_cum_ppm
        FROM y
    """
