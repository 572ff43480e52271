"""Corpus curation ops — the selection/mixing stages of a training-data
pipeline that sit AFTER extraction and dedup: quality-rule filtering
(Gopher-style), script-aware language ID, deterministic stratified
sampling, and token-budget shard packing.

The reference has none of these (it extracts and returns documents
one task at a time); they are the standard curation stack a 100 TB
crawl needs before tokenization, built entirely from Spark built-ins
(JVM-side, codegen'd), each with a DuckDB SQL mirror generated from
the same constants so the driver's oracle gate covers them.

Scale notes per op:
* quality rules / language ID — pure per-row column expressions; free.
* stratified sampling — a row-level predicate on an md5-derived
  uniform hash: no shuffle, no sampleBy statefulness, reproducible
  across engines and runs (seed in the hash preimage).
* shard packing — a running-sum window per (lang) at demo scale; a
  real run packs within url-hash buckets instead (same expression,
  partitionBy('bucket')) so no single partition serializes a whole
  language's corpus.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, public) — en-centric
# thresholds; zh rows route through the cjk branch of langid instead.
# ---------------------------------------------------------------------------

MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MIN_STOPWORD_HITS = 2
MIN_ALPHA_FRAC = 0.6

STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in"]

# CJK presence threshold for the zh guess.
CJK_FRAC_ZH = 0.25
_CJK_RANGE = "一-鿿"


def _words(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


def quality_features(text: Column) -> Dict[str, Column]:
    """The per-document feature columns the keep-rule reads."""
    words = _words(text)
    n_words = F.size(words)
    total_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(
        total_len.cast("double") / n_words, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]+$")))
    alpha_frac = F.round(alpha_words.cast("double") / n_words, 6)
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "stop_hits": stop_hits,
        "alpha_frac": alpha_frac,
    }


def quality_keep(features: Dict[str, Column]) -> Column:
    """Gopher-style admission verdict over quality_features."""
    return (
        (features["n_words"] >= MIN_WORDS)
        & (features["n_words"] <= MAX_WORDS)
        & (features["mean_word_len"] >= MIN_MEAN_WORD_LEN)
        & (features["mean_word_len"] <= MAX_MEAN_WORD_LEN)
        & (features["stop_hits"] >= MIN_STOPWORD_HITS)
        & (features["alpha_frac"] >= MIN_ALPHA_FRAC)
    )


def langid_script(text: Column) -> Column:
    """Script-aware language guess: CJK-character fraction first
    (the signal marker-word heuristics can't see), then English
    stopword markers, else 'other'."""
    cjk_only = F.regexp_replace(text, f"[^{_CJK_RANGE}]", "")
    cjk_frac = F.length(cjk_only).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    )
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    en_marker = (
        padded.like("% the %") | padded.like("% and %") | padded.like("% a %")
    )
    return (
        F.when(cjk_frac > CJK_FRAC_ZH, "zh")
        .when(en_marker, "en")
        .otherwise("other")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def hash_fraction(key: Column, seed: str = "sample") -> Column:
    """Uniform [0,1) fraction from md5 — reproducible across engines,
    runs, and cluster sizes (unlike rand(), whose draw depends on the
    partitioning). 8 hex chars = 32 bits of the digest."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(2**32))


def sample_stratified(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    fraction < its stratum's rate (unknown strata drop). A pure
    row-level predicate — no shuffle, no state, exact reproducibility;
    this is how mixing weights are applied when blending sources."""
    expr = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        expr = (
            F.when(cond, F.lit(float(r)))
            if expr is None
            else expr.when(cond, F.lit(float(r)))
        )
    rate = expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)
    return df.filter(hash_fraction(F.col(key_col), seed) < rate)


# ---------------------------------------------------------------------------
# Token-budget shard packing
# ---------------------------------------------------------------------------


def pack_shards(
    df: DataFrame,
    budget_tokens: int,
    partition_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training shard so consecutive docs
    (in deterministic key order, within a partition stream) fill
    shards of ~budget_tokens: shard = floor(tokens_before_doc /
    budget). A doc that crosses a boundary belongs to the shard it
    STARTED in — the packer's writer handles the spill.

    The running sum is a window per ``partition_col``; at production
    scale pass the url-hash ``bucket`` column instead of a skewed
    natural key so no partition serializes a whole language.
    """
    from pyspark.sql import Window as W

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (
        W.partitionBy(partition_col)
        .orderBy(key_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum(n_tokens).over(w)
    shard = F.floor((cum - n_tokens) / F.lit(budget_tokens)).cast("int")
    return df.select(
        partition_col,
        key_col,
        n_tokens.alias("n_tokens"),
        shard.alias("shard"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """(word, n) — the corpus's k most frequent whitespace tokens,
    ties broken lexicographically: the input a tokenizer-training or
    stopword-derivation step consumes.

    Scale shape: explode → hash-partitioned count with map-side
    combine (the partial aggregation collapses each partition to its
    distinct words before the shuffle), then a TakeOrdered top-k —
    k rows to the driver, never a global sort of the vocabulary."""
    words = docs.select(
        F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# T63 — inverted index (capped posting lists)
# ---------------------------------------------------------------------------

INVIDX_TOPK = 5        # postings kept per term (tf desc, doc asc)
INVIDX_SALTS = 8       # stage-1 fan-out for hot (stopword) terms


def inverted_index(
    docs: DataFrame,
    topk: int = INVIDX_TOPK,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(word, df, cf, postings): the inverted-index build — per term,
    document frequency, collection frequency, and a capped posting
    list of the ``topk`` highest-tf documents as ``rank:doc_id``
    entries.

    Scale shape: explode → groupBy(word, doc) tf with map-side combine
    (each partition collapses to its distinct (word, doc) pairs before
    the shuffle), then a SALTED two-stage top-k exactly like
    ``host_cap``: a stopword present in 10^12 documents puts at most
    ``topk x INVIDX_SALTS`` rows through the final per-word rank — a
    single-window build would serialize that term's entire posting
    universe through one reducer. Stage 1 is lossless because a row's
    global in-word rank is >= its salt-local rank."""
    from pyspark.sql import Window as W

    key = F.col(key_col)
    tf = (
        docs.select(key.alias("doc"), F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    salt = F.pmod(F.col("doc"), F.lit(INVIDX_SALTS))
    w1 = W.partitionBy("word", salt).orderBy(F.desc("tf"), F.asc("doc"))
    pruned = (
        tf.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= topk)
        .drop("_rn1")
    )
    w2 = W.partitionBy("word").orderBy(F.desc("tf"), F.asc("doc"))
    top = pruned.withColumn("rk", F.row_number().over(w2)).filter(
        F.col("rk") <= topk
    )
    postings = top.groupBy("word").agg(
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(F.concat_ws(":", "rk", "doc"))
            ),
        ).alias("postings")
    )
    return dfreq.join(postings, "word").select("word", "df", "cf", "postings")


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------


def _sql_words(text_expr: str) -> str:
    return (
        "string_split_regex(trim(regexp_replace("
        f"{text_expr}, '\\s+', ' ', 'g')), ' ')"
    )


def sql_quality_query(text_expr: str = "text") -> str:
    """Complete oracle query: doc_id + feature columns + keep flag."""
    words = _sql_words(text_expr)
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    mean_len = (
        "round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)"
        " / len(w), 6)"
    )
    stop_hits = (
        f"len(list_intersect(list_transform(w, x -> lower(x)), {stop_list}))"
    )
    alpha_frac = (
        "round(CAST(len(list_filter(w, x -> regexp_full_match(x, "
        "'[A-Za-z]+'))) AS DOUBLE) / len(w), 6)"
    )
    return f"""
        WITH ww AS (SELECT doc_id, {words} AS w FROM documents)
        SELECT doc_id,
               len(w) AS n_words,
               {mean_len} AS mean_word_len,
               {stop_hits} AS stop_hits,
               {alpha_frac} AS alpha_frac,
               (len(w) >= {MIN_WORDS} AND len(w) <= {MAX_WORDS}
                AND {mean_len} >= {MIN_MEAN_WORD_LEN}
                AND {mean_len} <= {MAX_MEAN_WORD_LEN}
                AND {stop_hits} >= {MIN_STOPWORD_HITS}
                AND {alpha_frac} >= {MIN_ALPHA_FRAC}) AS keep
        FROM ww
    """


def sql_langid_script(text_expr: str = "text") -> str:
    cjk = f"regexp_replace({text_expr}, '[^{_CJK_RANGE}]', '', 'g')"
    frac = (
        f"(CAST(length({cjk}) AS DOUBLE) / greatest(length({text_expr}), 1))"
    )
    padded = f"(' ' || lower({text_expr}) || ' ')"
    return f"""
        CASE WHEN {frac} > {CJK_FRAC_ZH} THEN 'zh'
             WHEN {padded} LIKE '% the %' OR {padded} LIKE '% and %'
                  OR {padded} LIKE '% a %' THEN 'en'
             ELSE 'other' END
    """


def sql_hash_fraction(key_expr: str, seed: str = "sample") -> str:
    return (
        f"(CAST(CAST('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), "
        f"1, 8) AS BIGINT) AS DOUBLE) / {float(2**32)!r})"
    )


def sql_sample_stratified(
    rates: Dict[str, float],
    strata_expr: str = "lang",
    key_expr: str = "doc_id",
    seed: str = "sample",
) -> str:
    """WHERE-clause fragment mirroring sample_stratified."""
    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {float(r)!r}"
        for s, r in sorted(rates.items())
    )
    return f"{sql_hash_fraction(key_expr, seed)} < (CASE {cases} ELSE 0.0 END)"


def sql_pack_shards(
    budget_tokens: int,
    partition_expr: str = "lang",
    key_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    nt = f"len(string_split_regex(trim({text_expr}), '\\s+'))"
    return f"""
        SELECT {partition_expr},
               {key_expr},
               {nt} AS n_tokens,
               CAST(floor(CAST(sum({nt}) OVER (
                        PARTITION BY {partition_expr} ORDER BY {key_expr}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - {nt} AS DOUBLE) / {budget_tokens}) AS INT) AS shard
        FROM documents
    """


def sql_vocab_topk(k: int = 1000, text_expr: str = "text") -> str:
    return f"""
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT unnest({_sql_words(text_expr)}) AS word
            FROM documents
        )
        WHERE word != ''
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T70 — deterministic train/val/test splits
# ---------------------------------------------------------------------------

SPLIT_FRACS = (0.9, 0.05)  # train, val; the rest is test


def dataset_split(
    docs: DataFrame,
    fracs: tuple = SPLIT_FRACS,
    key_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """(doc_id, lang, split): hash-deterministic train/val/test
    assignment — a doc keeps its split across runs, cluster sizes,
    and corpus growth (the property rand() cannot give), so eval
    contamination from reshuffled splits is structurally impossible.

    Pure per-row column expressions: no shuffle at all."""
    f = hash_fraction(F.col(key_col), seed)
    split = (
        F.when(f < fracs[0], F.lit("train"))
        .when(f < fracs[0] + fracs[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(key_col, "lang", split.alias("split"))


def sql_dataset_split(
    fracs: tuple = SPLIT_FRACS, key_expr: str = "doc_id", seed: str = "split"
) -> str:
    h = sql_hash_fraction(key_expr, seed)
    return f"""
        SELECT {key_expr}, lang,
               CASE WHEN {h} < {fracs[0]!r} THEN 'train'
                    WHEN {h} < {fracs[0] + fracs[1]!r} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """


# ---------------------------------------------------------------------------
# T71 — sequence-packing manifest (token offsets per shard)
# ---------------------------------------------------------------------------


def pack_manifest(
    df: DataFrame,
    budget_tokens: int,
    partition_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(partition, shard, doc_id, start_token, end_token): the writer
    manifest for sample packing — each doc's token span inside its
    shard's concatenated stream, the structure an LLM trainer needs to
    mask cross-document attention. Extends ``pack_shards`` with the
    in-shard offset arithmetic (same single window, no extra
    shuffle)."""
    from pyspark.sql import Window as W

    packed = pack_shards(df, budget_tokens, partition_col, key_col, text_col)
    w = (
        W.partitionBy(partition_col)
        .orderBy(key_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")) - (
        F.col("shard").cast("bigint") * F.lit(budget_tokens)
    )
    return packed.select(
        partition_col,
        "shard",
        key_col,
        start.cast("bigint").alias("start_token"),
        (start + F.col("n_tokens")).cast("bigint").alias("end_token"),
    )


def sql_pack_manifest(
    budget_tokens: int,
    partition_expr: str = "lang",
    key_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    nt = f"len(string_split_regex(trim({text_expr}), '\\s+'))"
    return f"""
        WITH packed AS (
            SELECT {partition_expr}, {key_expr},
                   {nt} AS n_tokens,
                   CAST(sum({nt}) OVER (
                        PARTITION BY {partition_expr} ORDER BY {key_expr}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS BIGINT) AS cum
            FROM documents
        )
        SELECT {partition_expr},
               CAST(floor(CAST(cum - n_tokens AS DOUBLE)
                          / {budget_tokens}) AS INT) AS shard,
               {key_expr},
               CAST(cum - n_tokens
                    - CAST(floor(CAST(cum - n_tokens AS DOUBLE)
                                 / {budget_tokens}) AS BIGINT)
                      * {budget_tokens} AS BIGINT) AS start_token,
               CAST(cum
                    - CAST(floor(CAST(cum - n_tokens AS DOUBLE)
                                 / {budget_tokens}) AS BIGINT)
                      * {budget_tokens} AS BIGINT) AS end_token
        FROM packed
    """


# ---------------------------------------------------------------------------
# T66 — count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 3      # independent hash rows
CMS_W = 1024   # counters per row


def cms_heavy_hitters(
    docs: DataFrame,
    topk: int = 50,
    d: int = CMS_D,
    w: int = CMS_W,
    text_col: str = "text",
) -> DataFrame:
    """(word, n_exact, n_cms): count-min-sketch frequency estimates
    (Cormode & Muthukrishnan 2005) for the corpus's ``topk`` most
    frequent words, with the exact count as the audit column (kmv
    pattern — a real run drops it; the CMS guarantee ``n_cms >=
    n_exact`` is what the oracle checks value-exactly, since both
    engines build the identical md5-keyed sketch).

    Scale shape: the sketch update stream maps each token to ``d``
    (row, bucket) increments and partial-aggregates BEFORE the
    shuffle, so the exchange carries at most ``partitions x d x w``
    counter rows regardless of corpus size — this is the op you reach
    for when the full word groupBy (vocab_topk) is too big. The
    counter table (d x w rows) broadcasts back to score candidates."""
    words = docs.select(
        F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")

    from .dedup import _hash60

    def bucket(j):
        return F.pmod(
            _hash60(F.concat(F.lit(f"cms{j}:"), F.col("word"))), F.lit(w)
        )

    incr = words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(j).alias("b")
                    )
                    for j in range(d)
                ]
            )
        ).alias("rb")
    )
    counters = incr.groupBy(
        F.col("rb.j").alias("j"), F.col("rb.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))

    cands = vocab_topk(docs, k=topk, text_col=text_col).withColumnRenamed(
        "n", "n_exact"
    )
    probes = cands.select(
        "word",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("b"))
                    for j in range(d)
                ]
            )
        ).alias("rb"),
    ).select("word", "n_exact", F.col("rb.j").alias("j"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(counters), ["j", "b"])
        .groupBy("word", "n_exact")
        .agg(F.min("c").alias("n_cms"))
        .select("word", "n_exact", "n_cms")
    )


def sql_cms_heavy_hitters(
    topk: int = 50, d: int = CMS_D, w: int = CMS_W, text_expr: str = "text"
) -> str:
    js = ", ".join(str(j) for j in range(d))
    return f"""
        WITH words AS (
            SELECT word FROM (
                SELECT unnest({_sql_words(text_expr)}) AS word FROM documents)
            WHERE word != ''
        ),
        incr AS (
            SELECT j.j AS j,
                   CAST('0x' || substr(
                       md5('cms' || CAST(j.j AS VARCHAR) || ':' || word),
                       1, 15) AS BIGINT) % {w} AS b
            FROM words, (SELECT unnest([{js}]) AS j) j
        ),
        counters AS (
            SELECT j, b, CAST(count(*) AS BIGINT) AS c
            FROM incr GROUP BY j, b
        ),
        cands AS (
            SELECT word, CAST(count(*) AS BIGINT) AS n_exact
            FROM words GROUP BY word
            ORDER BY n_exact DESC, word ASC LIMIT {topk}
        ),
        probes AS (
            SELECT word, n_exact, j.j AS j,
                   CAST('0x' || substr(
                       md5('cms' || CAST(j.j AS VARCHAR) || ':' || word),
                       1, 15) AS BIGINT) % {w} AS b
            FROM cands, (SELECT unnest([{js}]) AS j) j
        )
        SELECT p.word, p.n_exact, CAST(min(c.c) AS BIGINT) AS n_cms
        FROM probes p JOIN counters c ON p.j = c.j AND p.b = c.b
        GROUP BY p.word, p.n_exact
    """


def sql_inverted_index(
    topk: int = INVIDX_TOPK, text_expr: str = "text"
) -> str:
    # The salt prefilter is a physical optimization only; the oracle
    # states the plain per-word rank the two-stage build equals.
    return f"""
        WITH tf AS (
            SELECT word, doc, CAST(count(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id AS doc, unnest({_sql_words(text_expr)}) AS word
                FROM documents
            )
            WHERE word != ''
            GROUP BY word, doc
        ),
        dfreq AS (
            SELECT word, CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(tf) AS BIGINT) AS cf
            FROM tf GROUP BY word
        ),
        ranked AS (
            SELECT word, doc, tf,
                   row_number() OVER (
                       PARTITION BY word ORDER BY tf DESC, doc ASC
                   ) AS rk
            FROM tf
        )
        SELECT d.word, d.df, d.cf,
               string_agg(
                   CAST(rk AS VARCHAR) || ':' || CAST(doc AS VARCHAR),
                   ',' ORDER BY CAST(rk AS VARCHAR) || ':' || CAST(doc AS VARCHAR)
               ) AS postings
        FROM dfreq d JOIN ranked r ON d.word = r.word
        WHERE r.rk <= {topk}
        GROUP BY d.word, d.df, d.cf
    """


# ---------------------------------------------------------------------------
# T54 — deterministic weighted sampling (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

WSAMPLE_ROUND = 9  # priority rounding: kills libm ln() last-ulp drift
                   # between engines; ties break on doc_id in both


def _u_pos(key: Column, seed: str) -> Column:
    """md5-derived uniform in (0, 1] — strictly positive so ln() is
    defined; same 32-bit construction as hash_fraction, shifted by 1."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    return (h + F.lit(1.0)) / F.lit(float(2**32))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic across
    engines, runs, and cluster sizes: the Efraimidis–Spirakis A-Res
    scheme — per row draw u from its md5 hash and take the k largest
    priorities ln(u)/w (equivalent to the textbook u^(1/w) order but
    float-stable).  Heavier rows win proportionally more often; the
    hash seed makes the 'randomness' a pure function of the key.

    Scale shape: one projection + TakeOrderedAndProject — k rows to
    the driver, never a global sort, no shuffle of the corpus.  This
    is the selection primitive for mixture construction when sources
    are weighted by quality/size rather than capped.
    """
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    pri = F.round(F.log(_u_pos(F.col(key_col), seed)) / w, WSAMPLE_ROUND)
    return (
        df.select(
            F.col(key_col).alias("doc_id"),
            F.col(weight_col).cast("bigint").alias("weight"),
            pri.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def sql_weighted_sample(
    k: int,
    weight_expr: str = "n_chars",
    key_expr: str = "doc_id",
    seed: str = "wsample",
) -> str:
    u = (
        f"((CAST(CAST('0x' || substr(md5('{seed}:' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 1.0)"
        f" / {float(2**32)!r})"
    )
    return f"""
        SELECT {key_expr} AS doc_id,
               CAST({weight_expr} AS BIGINT) AS weight,
               round(ln({u}) / greatest(CAST({weight_expr} AS DOUBLE), 1.0),
                     {WSAMPLE_ROUND}) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T55 — token-budget mixture construction
# ---------------------------------------------------------------------------

MIXTURE_SALTS = 16


def mixture_sample(
    df: DataFrame,
    budgets: Dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int = MIXTURE_SALTS,
) -> DataFrame:
    """Build a training mixture: for each stratum (language/source),
    keep documents in deterministic md5-hash order until the stratum's
    token budget is filled.  A doc whose running count STARTS under
    the budget is kept whole (pack_shards' started-in rule); strata
    without a budget drop.  This is the Pile/DoReMi-style mixing step
    — target token counts per source — as one declarative plan.

    Two-stage lossless prune (host_cap's salt trick adapted from ranks
    to running sums): stage 1 computes the running sum within
    (stratum, salt) and discards docs whose salt-local prior-sum
    already reaches the budget — correct because every salt-local
    predecessor is also a global predecessor under the same hash
    order, so global prior-sum >= salt-local prior-sum.  That bounds
    stage 2's exact per-stratum window at ~budget tokens per salt
    instead of a Zipf-dominant language's entire slice.
    """
    from pyspark.sql import Window as W

    expr = None
    for stratum, b in sorted(budgets.items()):
        cond = F.col(strata_col) == stratum
        expr = (
            F.when(cond, F.lit(int(b)))
            if expr is None
            else expr.when(cond, F.lit(int(b)))
        )
    budget = expr.otherwise(F.lit(-1)) if expr is not None else F.lit(-1)

    nt = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    ordv = F.md5(
        F.concat(
            F.col(strata_col), F.lit("@"), F.col(key_col).cast("string")
        )
    )
    base = df.filter(budget >= 0).select(
        F.col(strata_col).alias("stratum"),
        F.col(key_col).alias("doc_id"),
        nt.alias("n_tokens"),
        ordv.alias("_ord"),
        budget.alias("_budget"),
        (F.col(key_col) % n_salts).alias("_salt"),
    )
    w1 = (
        W.partitionBy("stratum", "_salt")
        .orderBy(F.asc("_ord"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pruned = base.withColumn("_cum1", F.sum("n_tokens").over(w1)).filter(
        F.col("_cum1") - F.col("n_tokens") < F.col("_budget")
    )
    w2 = (
        W.partitionBy("stratum")
        .orderBy(F.asc("_ord"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        pruned.withColumn("cum_tokens", F.sum("n_tokens").over(w2))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .select("stratum", "doc_id", "n_tokens", "cum_tokens")
    )


def sql_mixture_sample(
    budgets: Dict[str, int],
    strata_expr: str = "lang",
    key_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    # The salt prefilter is a physical optimization only; the oracle
    # states the plain per-stratum running-sum window.
    nt = f"len(string_split_regex(trim({text_expr}), '\\s+'))"
    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {int(b)}"
        for s, b in sorted(budgets.items())
    )
    langs = ", ".join(f"'{s}'" for s in sorted(budgets))
    return f"""
        SELECT stratum, doc_id, n_tokens, cum_tokens FROM (
            SELECT {strata_expr} AS stratum,
                   {key_expr} AS doc_id,
                   CAST({nt} AS BIGINT) AS n_tokens,
                   CAST(sum({nt}) OVER (
                       PARTITION BY {strata_expr}
                       ORDER BY md5({strata_expr} || '@' ||
                                    CAST({key_expr} AS VARCHAR)),
                                {key_expr}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens,
                   (CASE {cases} ELSE -1 END) AS _budget
            FROM documents
            WHERE {strata_expr} IN ({langs}))
        WHERE cum_tokens - n_tokens < _budget
    """


# ---------------------------------------------------------------------------
# T59 — KMV distinct-cardinality sketch (vocabulary size per group)
# ---------------------------------------------------------------------------
#
# Counting distinct values exactly at 10^12-row scale means shuffling
# every distinct value once (count(DISTINCT ...) or a distinct+count);
# the crawl-stats answer is a bounded sketch.  HLL (Spark's
# approx_count_distinct) is engine-specific and can't be oracle-gated;
# a K-Minimum-Values sketch (Bar-Yossef et al. 2002) built on the
# repo's deterministic 60-bit md5 hash is: both engines keep the k
# smallest distinct hashes per group and estimate
# D ≈ (k-1) * 2^60 / h_(k) — every step integer- or
# identically-double-deterministic, so the sketch estimate itself is
# hash-exact cross-engine.

KMV_K = 256
KMV_SALTS = 8
_H60_SPACE = float(1 << 60)


def kmv_vocab_estimate(
    docs: DataFrame,
    k: int = KMV_K,
    group_col: str = "lang",
    text_col: str = "text",
    n_salts: int = KMV_SALTS,
) -> DataFrame:
    """Per-``group_col`` distinct 3-word-shingle (phrase-vocabulary)
    estimate via a KMV sketch: (group, n_exact, n_kmv).  Shingles, not
    words: the unit must be high-cardinality for the sketch to earn
    its keep (and for the >=k estimator branch to be exercised by the
    gate corpus at all).

    ``n_exact`` is the audit column (a real run drops it — it is the
    exact distinct the sketch exists to avoid). The k-smallest
    selection is the same lossless two-stage rank as ``host_cap``:
    stage 1 keeps k per (group, hash-salt) slice, pruning a hot group
    to k*n_salts rows before the global per-group rank — a row's
    global rank is >= its salt-local rank, so nothing stage 2 would
    keep is dropped. Shuffled rows are (group, 8-byte hash) pairs,
    never words.
    """
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60, shingles_col

    hashed = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col)))
            ).alias("w"),
        )
        .select(
            "grp", _hash60(F.concat(F.lit("v:"), F.col("w"))).alias("h")
        )
        .distinct()
    )
    w1 = W.partitionBy("grp", F.pmod(F.col("h"), F.lit(n_salts))).orderBy("h")
    pruned = (
        hashed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .drop("rn1")
    )
    w2 = W.partitionBy("grp").orderBy("h")
    ranked = pruned.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )
    kth = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
        F.count(F.lit(1)).alias("m"),
    )
    exact = hashed.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    # fewer than k distinct values: the sketch IS the exact answer
    est = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.floor(
            F.lit(float(k - 1))
            * F.lit(_H60_SPACE)
            / F.col("h_k").cast("double")
        )
    )
    return (
        exact.join(kth, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            est.cast("bigint").alias("n_kmv"),
        )
    )


def sql_kmv_vocab_estimate(
    k: int = KMV_K, group_expr: str = "lang", text_expr: str = "text"
) -> str:
    """DuckDB mirror: same hash, same rank, same estimator arithmetic
    (double multiply/divide of exactly-representable operands, then
    floor — identical IEEE results in both engines)."""
    from ocr_spark.operators.dedup import sql_shingles

    words = sql_shingles(text_expr)
    return f"""
        WITH hashed AS (
            SELECT DISTINCT grp,
                   CAST('0x' || substr(md5('v:' || w), 1, 15) AS BIGINT) AS h
            FROM (
                SELECT {group_expr} AS grp, unnest({words}) AS w
                FROM documents)
        ),
        ranked AS (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hashed
        ),
        kth AS (
            SELECT grp, max(CASE WHEN rn = {k} THEN h END) AS h_k,
                   count(*) AS m
            FROM ranked WHERE rn <= {k} GROUP BY grp
        ),
        exact AS (SELECT grp, count(*) AS n_exact FROM hashed GROUP BY grp)
        SELECT e.grp AS {group_expr},
               CAST(e.n_exact AS BIGINT) AS n_exact,
               CAST(CASE WHEN t.m < {k} THEN CAST(t.m AS DOUBLE)
                    ELSE floor({float(k - 1)} * {_H60_SPACE} /
                               CAST(t.h_k AS DOUBLE)) END AS BIGINT) AS n_kmv
        FROM exact e JOIN kth t ON e.grp = t.grp
    """


# ---------------------------------------------------------------------------
# T74 — epoch-shuffle manifest (deterministic per-epoch permutation)
# ---------------------------------------------------------------------------

# Training wants a different document order every epoch, reproducible
# from (seed, epoch) alone.  The scalable shape is hash-to-shard plus
# an independent in-shard order — NOT a global sort: each shard's
# permutation is decided by an md5 draw keyed on (epoch, doc_id), so
# the only exchange is the n_shards-way hash partition and each shard
# sorts only its own slice (the per-file sort a writer pays anyway).

EPOCH_SHARDS = 8
EPOCH_COUNT = 2


def epoch_shuffle(
    docs: DataFrame,
    n_epochs: int = EPOCH_COUNT,
    n_shards: int = EPOCH_SHARDS,
    key_col: str = "doc_id",
    seed: str = "epoch",
) -> DataFrame:
    """(doc_id, epoch, shard, pos): for every epoch, the shard each doc
    lands in and its 1-based position within that shard.  Deterministic
    in (seed, epoch, doc_id) — rerunning, resizing the cluster, or
    replaying a failed epoch reproduces the same order exactly."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60

    e = docs.select(F.col(key_col).alias("doc_id")).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    draw = _hash60(
        F.concat_ws(":", F.lit(seed), F.col("epoch"), F.col("doc_id"))
    )
    e = e.select(
        "doc_id",
        "epoch",
        F.pmod(draw, F.lit(n_shards)).cast("int").alias("shard"),
        draw.alias("draw"),
    )
    w = W.partitionBy("epoch", "shard").orderBy("draw", "doc_id")
    return e.select(
        "doc_id",
        "epoch",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def sql_epoch_shuffle(
    n_epochs: int = EPOCH_COUNT,
    n_shards: int = EPOCH_SHARDS,
    key_expr: str = "doc_id",
    seed: str = "epoch",
) -> str:
    draw = (
        f"CAST('0x' || substr(md5('{seed}' || ':' || CAST(epoch AS VARCHAR)"
        f" || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    return f"""
        WITH e AS (
            SELECT {key_expr} AS doc_id, CAST(epoch AS INTEGER) AS epoch
            FROM documents,
                 UNNEST(range(0, {n_epochs})) AS t(epoch)
        ),
        d AS (
            SELECT doc_id, epoch,
                   CAST({draw} % {n_shards} AS INTEGER) AS shard,
                   {draw} AS draw
            FROM e
        )
        SELECT doc_id, epoch, shard,
               CAST(row_number() OVER (PARTITION BY epoch, shard
                                       ORDER BY draw, doc_id) AS BIGINT)
                   AS pos
        FROM d
    """


# ---------------------------------------------------------------------------
# T88 — per-document unigram entropy (diversity quality signal)
# ---------------------------------------------------------------------------
#
# Shannon entropy of a doc's word distribution: near-zero for looped/
# keyword-stuffed spam, high for natural prose — the information-
# theoretic complement of repetition_stats' rule counters.  Integer
# micro-nat arithmetic makes the cross-engine sum exact: per word type,
# c * round(ln(c)*1e6) is a bigint; the single float step (the final
# normalization) is the identical expression in both engines.
#
# Scale shape: one (doc, word)-keyed count with map-side combine, one
# per-doc agg on its output — no broadcastable state, no text through
# the second shuffle (8-byte counts only).

_ENT_SCALE = 1_000_000


def word_entropy(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_types, entropy): H = ln(n) - sum(c ln c)/n
    in nats, 6dp; empty docs emit (0, 0, 0.0)."""
    from ocr_spark.operators.corpus_ops import _words

    key = F.col(key_col)
    tw = docs.select(
        key.alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    tc = tw.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * _ENT_SCALE).cast(
                "bigint"
            )
        ).cast("bigint").alias("s"),
    )
    lnn = F.round(F.log(F.col("n").cast("double")) * _ENT_SCALE).cast(
        "bigint"
    )
    ent = F.round(
        (lnn.cast("double") - F.col("s").cast("double") / F.col("n").cast("double"))
        / F.lit(float(_ENT_SCALE)),
        6,
    )
    scored = per.select("doc_id", "n", "n_types", ent.alias("entropy"))
    return (
        docs.select(key.alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_types", F.lit(0)).cast("bigint").alias("n_types"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def sql_word_entropy() -> str:
    w = _sql_words("text")
    s = _ENT_SCALE
    return f"""
        WITH tw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        tc AS (
            SELECT doc_id, word, count(*) AS c FROM tw GROUP BY doc_id, word
        ),
        per AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * {s})
                                     AS BIGINT)) AS BIGINT) AS w_s
            FROM tc GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n, 0) AS n_words,
               COALESCE(p.n_types, 0) AS n_types,
               COALESCE(round((CAST(CAST(round(ln(CAST(p.n AS DOUBLE)) * {s})
                                         AS BIGINT) AS DOUBLE)
                               - CAST(p.w_s AS DOUBLE) / CAST(p.n AS DOUBLE))
                              / {float(s)!r}, 6), 0.0) AS entropy
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# T89 — tokenizer-vocabulary OOV rate
# ---------------------------------------------------------------------------
#
# Coverage audit for a fixed top-v vocabulary: the fraction of a doc's
# words outside it.  High OOV flags domain shift (code, tables, other
# scripts) before a tokenizer trained on the mix over-segments it —
# the per-DOC complement of bpe_fertility's per-language view.
#
# Scale shape: the vocabulary is one map-side-combined count + top-v
# (bounded rows, broadcast); scoring is a broadcast left join + one
# per-doc agg — the corpus shuffles words exactly once.

OOV_VOCAB = 16


def oov_rate(
    docs: DataFrame,
    v: int = OOV_VOCAB,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_oov, oov_rate); empty docs emit (0,0,0.0).
    Vocabulary ties break lexicographically (vocab_topk's rule)."""
    from ocr_spark.operators.corpus_ops import _words

    key = F.col(key_col)
    tw = docs.select(
        key.alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    vocab = (
        tw.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(v)
        .select("word", F.lit(1).alias("iv"))
    )
    per = (
        tw.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    rate = F.round(
        F.col("n_oov").cast("double") / F.col("n").cast("double"), 6
    )
    return (
        docs.select(key.alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.coalesce(rate, F.lit(0.0)).alias("oov_rate"),
        )
    )


def sql_oov_rate(v: int = OOV_VOCAB) -> str:
    w = _sql_words("text")
    return f"""
        WITH tw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        vocab AS (
            SELECT word FROM (
                SELECT word, count(*) AS n FROM tw GROUP BY word
                ORDER BY n DESC, word ASC LIMIT {v})
        ),
        per AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN vc.word IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov
            FROM tw t LEFT JOIN vocab vc ON t.word = vc.word
            GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n, 0) AS n_words,
               COALESCE(p.n_oov, 0) AS n_oov,
               COALESCE(round(CAST(p.n_oov AS DOUBLE) / p.n, 6), 0.0)
                   AS oov_rate
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# T90 — BM25 retrieval scoring (Robertson et al.)
# ---------------------------------------------------------------------------
#
# The standard ranking function over the inverted-index statistics
# (T63 builds the index; this is the query-time math): idf x saturated
# tf with length normalization.  Per-term scores are fixed to integer
# micro-units before the per-doc sum, so the only float steps are the
# per-term formula itself — the identical expression in both engines.
#
# Scale shape: the corpus-side term filter runs BEFORE any shuffle
# (query terms are a literal isin pushed to the scan), so the tf agg
# touches only matching rows; doc lengths are one map-side-combined
# agg; N/avgdl is a broadcast 1-row frame; df is per-query-term
# (bounded, broadcast).  TakeOrderedAndProject finishes top-k.

BM25_QUERY = ("spark", "window", "hash")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
_BM25_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    query: tuple = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_terms, score): BM25 top-``topk`` docs for a fixed
    term query, ties broken by doc_id.  Score is the 6dp rendering of
    the exact micro-unit integer sum.

    One-pass shape: because the query terms are a bounded literal
    list, per-doc dl AND every per-term tf come out of a SINGLE
    conditional aggregation over the in-row word array — no explode,
    no (doc, word) shuffle, no joins.  The corpus-level stats (N,
    avgdl, per-term df) are a second aggregation OVER that per-doc
    table, broadcast back as one row.  Total: one corpus scan, two
    map-side-combined aggs, one TakeOrdered."""
    key = F.col(key_col)
    words = _words(F.col(text_col))
    tf_cols = [
        F.size(F.filter(words, lambda w: w == F.lit(t))).cast("bigint").alias(
            f"tf_{i}"
        )
        for i, t in enumerate(query)
    ]
    dl = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    per = docs.select(key.alias("doc"), dl.alias("dl"), *tf_cols)
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(query))
        ],
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df + 0.5) / (df + 0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
        )
        s = idf * (tf * F.lit(k1 + 1.0)) / denom
        return F.when(
            F.col(f"tf_{i}") > 0, F.round(s * _BM25_SCALE).cast("bigint")
        ).otherwise(F.lit(0))

    total = sum(
        (term_score(i) for i in range(len(query))), F.lit(0).cast("bigint")
    )
    hits = sum(
        ((F.col(f"tf_{i}") > 0).cast("bigint") for i in range(len(query))),
        F.lit(0).cast("bigint"),
    )
    return (
        per.crossJoin(F.broadcast(stats))
        .select(
            F.col("doc").alias("doc_id"),
            hits.alias("n_hit_terms"),
            F.round(total.cast("double") / _BM25_SCALE, 6).alias("score"),
        )
        .filter(F.col("n_hit_terms") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(topk)
    )


def sql_bm25_topk(
    query: tuple = BM25_QUERY,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> str:
    w = _sql_words("text")
    qlist = ", ".join(f"'{t}'" for t in query)
    s = _BM25_SCALE
    return f"""
        WITH tw AS (
            SELECT doc_id AS doc, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        dl AS (SELECT doc, count(*) AS dl FROM tw GROUP BY doc),
        stats AS (
            SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
        ),
        qtf AS (
            SELECT doc, word, count(*) AS tf FROM tw
            WHERE word IN ({qlist}) GROUP BY doc, word
        ),
        dfq AS (SELECT word, count(*) AS df FROM qtf GROUP BY word),
        scored AS (
            SELECT q.doc,
                   CAST(round(
                       ln(1.0 + (CAST(st.n_docs AS DOUBLE)
                                 - CAST(f.df AS DOUBLE) + 0.5)
                                / (CAST(f.df AS DOUBLE) + 0.5))
                       * (CAST(q.tf AS DOUBLE) * {k1 + 1.0!r})
                       / (CAST(q.tf AS DOUBLE) + {k1!r} *
                          ({1.0 - b!r} + {b!r} * CAST(d.dl AS DOUBLE)
                           / (CAST(st.sum_dl AS DOUBLE)
                              / CAST(st.n_docs AS DOUBLE))))
                       * {s}) AS BIGINT) AS s_micro
            FROM qtf q
            JOIN dfq f ON q.word = f.word
            JOIN dl d ON q.doc = d.doc
            CROSS JOIN stats st
        )
        SELECT doc AS doc_id,
               CAST(count(*) AS BIGINT) AS n_hit_terms,
               round(CAST(sum(s_micro) AS DOUBLE) / {s}, 6) AS score
        FROM scored GROUP BY doc
        ORDER BY score DESC, doc_id ASC LIMIT {topk}
    """


# ---------------------------------------------------------------------------
# T91 — adjacent-pair PMI collocations
# ---------------------------------------------------------------------------
#
# Pointwise mutual information over adjacent word pairs — the standard
# collocation/phrase-mining statistic (Church & Hanks 1990; word2vec's
# phrase pass).  Marginals come from the pair distribution itself
# (left word, right word), so the probabilities are self-consistent.
# PMI is fixed to integer micro-nats, making the ranking and values
# hash-exact cross-engine.
#
# Scale shape: one slice+zip pair explode (no Python), one map-side-
# combined pair count; the marginals are re-aggregations of the pair
# counts (bounded by vocabulary, broadcast); min-count pruning runs
# before the joins.  TakeOrderedAndProject finishes.

PMI_MIN_COUNT = 5
PMI_TOPK = 20


def pmi_pairs(
    docs: DataFrame,
    min_count: int = PMI_MIN_COUNT,
    topk: int = PMI_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, c_pair, pmi): the ``topk`` adjacent pairs by PMI among
    pairs seen >= ``min_count`` times; ties break lexicographically."""
    z = F.arrays_zip(
        F.expr("slice(_w, 1, greatest(size(_w) - 1, 0))").alias("a"),
        F.expr("slice(_w, 2, greatest(size(_w) - 1, 0))").alias("b"),
    )
    pairs = (
        docs.withColumn("_w", _words(F.col(text_col)))
        .select(F.explode(z).alias("p"))
        .select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    from pyspark.sql import Window as W

    # Marginals come from window sums over the PAIR table, not from
    # re-aggregating the corpus: without this, Catalyst re-derives the
    # pair explode once per marginal (4 corpus scans).  The windows
    # shuffle only (w1, w2, count) rows — bounded by distinct bigrams,
    # orders of magnitude under the corpus.  The scalar total is one
    # extra aggregation branch (the only re-derivation left; persist
    # the pair table at production scale to drop it too).
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    pcw = pc.withColumn(
        "c_left", F.sum("c_pair").over(W.partitionBy("w1"))
    ).withColumn("c_right", F.sum("c_pair").over(W.partitionBy("w2")))
    total = pc.agg(F.sum("c_pair").alias("n_pairs"))
    pmi_micro = F.round(
        F.log(
            (F.col("c_pair").cast("double") * F.col("n_pairs").cast("double"))
            / (F.col("c_left").cast("double") * F.col("c_right").cast("double"))
        )
        * 1_000_000
    ).cast("bigint")
    return (
        pcw.filter(F.col("c_pair") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c_pair").cast("bigint").alias("c_pair"),
            F.round(pmi_micro.cast("double") / 1_000_000, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(topk)
    )


def sql_pmi_pairs(
    min_count: int = PMI_MIN_COUNT, topk: int = PMI_TOPK
) -> str:
    w = _sql_words("text")
    return f"""
        WITH ws AS (SELECT {w} AS ww FROM documents),
        pairs AS (
            SELECT ww[CAST(i AS INTEGER)] AS w1,
                   ww[CAST(i AS INTEGER) + 1] AS w2
            FROM ws, UNNEST(range(1, greatest(len(ww), 1))) AS t(i)
            WHERE ww[CAST(i AS INTEGER)] <> ''
              AND ww[CAST(i AS INTEGER) + 1] <> ''
        ),
        pc AS (
            SELECT w1, w2, count(*) AS c_pair FROM pairs GROUP BY w1, w2
        ),
        lmar AS (SELECT w1, sum(c_pair) AS c_left FROM pc GROUP BY w1),
        rmar AS (SELECT w2, sum(c_pair) AS c_right FROM pc GROUP BY w2),
        tot AS (SELECT sum(c_pair) AS n_pairs FROM pc)
        SELECT p.w1, p.w2, CAST(p.c_pair AS BIGINT) AS c_pair,
               round(CAST(CAST(round(
                   ln((CAST(p.c_pair AS DOUBLE) * CAST(t.n_pairs AS DOUBLE))
                      / (CAST(l.c_left AS DOUBLE)
                         * CAST(r.c_right AS DOUBLE)))
                   * 1000000) AS BIGINT) AS DOUBLE) / 1000000, 6) AS pmi
        FROM pc p
        JOIN lmar l ON p.w1 = l.w1
        JOIN rmar r ON p.w2 = r.w2
        CROSS JOIN tot t
        WHERE p.c_pair >= {min_count}
        ORDER BY pmi DESC, p.w1 ASC, p.w2 ASC LIMIT {topk}
    """


# ---------------------------------------------------------------------------
# T92 — two-corpus overlap estimate (KMV Jaccard sketch)
# ---------------------------------------------------------------------------
#
# "How much does the new crawl overlap the old corpus?" answered
# without an exact set intersection: the k smallest hashes of the
# UNION form a uniform sample of it, so the fraction of them present
# in both sides estimates the Jaccard coefficient (Bar-Yossef et al.;
# the datasketches theta-intersection shape).  Deterministic md5
# hashing makes the whole estimate — sample, flags, ratio — replayable
# by the oracle bit-for-bit.
#
# Scale shape: per-side distinct gram hashes with map-side combine;
# one groupBy(h) to merge membership flags; TakeOrderedAndProject for
# the global k-min (per-partition top-k, k rows to the driver-side
# merge, never a global sort); the final agg runs on k rows.

OVERLAP_K = 512


def corpus_overlap(
    docs: DataFrame,
    k: int = OVERLAP_K,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row: (k, m, n_both, jaccard_est, union_est) comparing the
    shingle vocabularies of the doc_id%2 halves (the 'old/new corpus'
    stand-in).  m < k means the union was smaller than the sketch and
    every number is exact."""
    from ocr_spark.operators.dedup import _hash60, shingles_col

    key = F.col(key_col)
    hashed = (
        docs.select(
            (key % 2 == 0).alias("in_a"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col)))
            ).alias("sh"),
        )
        .select(
            "in_a", _hash60(F.concat(F.lit("o:"), F.col("sh"))).alias("h")
        )
        .groupBy("h")
        .agg(
            F.max(F.col("in_a").cast("int")).alias("a"),
            F.max((~F.col("in_a")).cast("int")).alias("b"),
        )
    )
    kmin = hashed.orderBy(F.asc("h")).limit(k)
    est_union = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_H60_SPACE) / F.col("h_k").cast("double")
        )
    )
    return (
        kmin.agg(
            F.count(F.lit(1)).alias("m"),
            F.sum((F.col("a") + F.col("b") == 2).cast("bigint")).alias(
                "n_both"
            ),
            F.max("h").alias("h_k"),
        )
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.col("m").cast("bigint").alias("m"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(
                F.col("n_both").cast("double") / F.col("m").cast("double"), 6
            ).alias("jaccard_est"),
            est_union.cast("bigint").alias("union_est"),
        )
    )


def sql_corpus_overlap(k: int = OVERLAP_K) -> str:
    from ocr_spark.operators.dedup import sql_shingles

    h = "CAST('0x' || substr(md5('o:' || sh), 1, 15) AS BIGINT)"
    return f"""
        WITH sh AS (
            SELECT doc_id % 2 = 0 AS in_a, sh FROM (
                SELECT doc_id,
                       unnest(list_distinct({sql_shingles("text")})) AS sh
                FROM documents)
        ),
        hashed AS (
            SELECT {h} AS h,
                   max(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
                   max(CASE WHEN in_a THEN 0 ELSE 1 END) AS b
            FROM sh GROUP BY 1
        ),
        kmin AS (SELECT * FROM hashed ORDER BY h ASC LIMIT {k}),
        agg AS (
            SELECT count(*) AS m,
                   CAST(sum(CASE WHEN a + b = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_both,
                   max(h) AS h_k
            FROM kmin
        )
        SELECT CAST({k} AS BIGINT) AS k,
               CAST(m AS BIGINT) AS m,
               n_both,
               round(CAST(n_both AS DOUBLE) / m, 6) AS jaccard_est,
               CAST(CASE WHEN m < {k} THEN CAST(m AS DOUBLE)
                    ELSE floor({float(k - 1)!r} * {_H60_SPACE!r}
                               / CAST(h_k AS DOUBLE)) END
                    AS BIGINT) AS union_est
        FROM agg
    """


# ---------------------------------------------------------------------------
# T95 — shard balance audit
# ---------------------------------------------------------------------------
#
# The packing sanity check a training run does before reading shards:
# token skew across a partition's shards decides whether data loading
# stalls on a straggler shard.  Pure re-aggregation of pack_shards'
# output — one (partition, shard) agg then one per-partition agg, both
# map-side combined; no text moves.

def shard_balance(
    df: DataFrame,
    budget_tokens: int,
    partition_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_shards, n_docs, min_tokens, max_tokens, imbalance):
    imbalance = max shard tokens / mean shard tokens, 6dp (the final
    partial shard included — it is what the loader will read)."""
    packed = pack_shards(
        df,
        budget_tokens,
        partition_col=partition_col,
        key_col=key_col,
        text_col=text_col,
    )
    per_shard = packed.groupBy(partition_col, "shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    )
    return per_shard.groupBy(partition_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.sum("docs").cast("bigint").alias("n_docs"),
        F.min("tokens").cast("bigint").alias("min_tokens"),
        F.max("tokens").cast("bigint").alias("max_tokens"),
        F.round(
            F.max("tokens").cast("double")
            / (F.sum("tokens").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("imbalance"),
    )


def sql_shard_balance(
    budget_tokens: int, partition_col: str = "lang"
) -> str:
    w = _sql_words("text")
    return f"""
        WITH packed AS (
            SELECT {partition_col}, doc_id,
                   len({w}) AS n_tokens,
                   CAST(floor(CAST(sum(len({w})) OVER (
                            PARTITION BY {partition_col} ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - len({w}) AS DOUBLE) / {budget_tokens})
                        AS INTEGER) AS shard
            FROM documents
        ),
        per_shard AS (
            SELECT {partition_col}, shard, count(*) AS docs,
                   sum(n_tokens) AS tokens
            FROM packed GROUP BY {partition_col}, shard
        )
        SELECT {partition_col},
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(docs) AS BIGINT) AS n_docs,
               CAST(min(tokens) AS BIGINT) AS min_tokens,
               CAST(max(tokens) AS BIGINT) AS max_tokens,
               round(CAST(max(tokens) AS DOUBLE)
                     / (CAST(sum(tokens) AS DOUBLE) / count(*)), 6)
                   AS imbalance
        FROM per_shard GROUP BY {partition_col}
    """


# ---------------------------------------------------------------------------
# T100 — Unicode script profile
# ---------------------------------------------------------------------------
#
# Character-class composition per document — the script histogram a
# multilingual pipeline reads before routing text to per-script
# tokenizers/filters (langid_cjk makes one guess; this keeps the whole
# mix).  Counting is codepoint-range regexp_replace arithmetic with
# IDENTICAL explicit ranges in both engines; pure per-row expressions,
# zero shuffle, zero Python.


def script_profile(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars_t, cjk_frac, latin_frac, digit_frac,
    dominant): per-script character fractions (6dp) + the dominant
    label by integer count comparison."""
    from ocr_spark.operators.corpus_ops import _CJK_RANGE

    key = F.col(key_col)
    t = F.col(text_col)
    n = F.length(t).cast("bigint")
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    cjk = F.length(F.regexp_replace(t, f"[^{_CJK_RANGE}]", "")).cast("bigint")
    latin = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("bigint")
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("bigint")
    dominant = (
        F.when(cjk > latin, F.lit("cjk"))
        .when(latin > 0, F.lit("latin"))
        .otherwise(F.lit("other"))
    )
    return docs.select(
        key.alias("doc_id"),
        n.alias("n_chars_t"),
        F.round(cjk.cast("double") / safe_n, 6).alias("cjk_frac"),
        F.round(latin.cast("double") / safe_n, 6).alias("latin_frac"),
        F.round(digit.cast("double") / safe_n, 6).alias("digit_frac"),
        dominant.alias("dominant"),
    )


def sql_script_profile() -> str:
    cjk = f"len(regexp_replace(text, '[^{_CJK_RANGE}]', '', 'g'))"
    latin = "len(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    digit = "len(regexp_replace(text, '[^0-9]', '', 'g'))"
    return f"""
        SELECT doc_id,
               CAST(len(text) AS BIGINT) AS n_chars_t,
               round(CAST({cjk} AS DOUBLE)
                     / greatest(len(text), 1), 6) AS cjk_frac,
               round(CAST({latin} AS DOUBLE)
                     / greatest(len(text), 1), 6) AS latin_frac,
               round(CAST({digit} AS DOUBLE)
                     / greatest(len(text), 1), 6) AS digit_frac,
               CASE WHEN {cjk} > {latin} THEN 'cjk'
                    WHEN {latin} > 0 THEN 'latin'
                    ELSE 'other' END AS dominant
        FROM documents
    """


# ---------------------------------------------------------------------------
# T103 — dataset card rollup
# ---------------------------------------------------------------------------
#
# The datasheet table a released corpus publishes per language: doc
# and token volume, length profile, share of the corpus.  One map-side
# combined agg + a broadcast 1-row total — the terminal reporting step
# of the curation pipeline.


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, n_docs, total_tokens, total_chars, mean_doc_tokens,
    doc_share): per-language datasheet row, 6dp floats."""
    per = docs.select(
        "lang",
        F.size(_words(F.col(text_col))).cast("bigint").alias("toks"),
        F.length(text_col).cast("bigint").alias("chars"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.sum("chars").cast("bigint").alias("total_chars"),
    )
    total = per.agg(F.sum("n_docs").alias("all_docs"))
    return per.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "total_tokens",
        "total_chars",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("mean_doc_tokens"),
        F.round(
            F.col("n_docs").cast("double") / F.col("all_docs").cast("double"),
            6,
        ).alias("doc_share"),
    )


def sql_dataset_card() -> str:
    w = _sql_words("text")
    return f"""
        WITH per AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({w})) AS BIGINT) AS total_tokens,
                   CAST(sum(len(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT sum(n_docs) AS all_docs FROM per)
        SELECT lang, n_docs, total_tokens, total_chars,
               round(CAST(total_tokens AS DOUBLE)
                     / CAST(n_docs AS DOUBLE), 6) AS mean_doc_tokens,
               round(CAST(n_docs AS DOUBLE)
                     / CAST(all_docs AS DOUBLE), 6) AS doc_share
        FROM per CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# T112 — cross-split gram overlap (train->test leakage audit)
# ---------------------------------------------------------------------------
#
# Benchmark decontamination (T45/T60/T72/T80) screens EXTERNAL evals;
# this audits the corpus's OWN held-out split: what fraction of the
# test split's 8-grams already occur in the train split.  A high
# overlap means the held-out loss is memorization, not generalization
# — the number every dataset release should print next to its split
# sizes.
#
# Scale shape: one gram explode per side keyed by the split hash
# (pure per-row assignment, no split shuffle), train grams distinct →
# the join is gram-hash against gram-hash with map-side-combined
# distinct counts; every shuffled row is an 8-byte hash.

OVERLAP_GRAM_K = 8


def split_gram_overlap(
    docs: DataFrame,
    k: int = OVERLAP_GRAM_K,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row: (n_test_grams, n_overlap, overlap_frac) — distinct
    test-split k-grams and how many of them occur in the train
    split."""
    from ocr_spark.operators.dedup import _hash60

    key = F.col(key_col)
    split = dataset_split(
        docs.select(key.alias(key_col), F.lit("x").alias("lang"), text_col),
        key_col=key_col,
    ).select(key_col, "split")
    grams = (
        docs.join(split, key_col)
        .select(
            "split",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.size(_words(F.col(text_col))) - (k - 1),
                            F.lit(1),
                        ),
                    ),
                    lambda i: _hash60(
                        F.concat_ws(
                            " ",
                            F.slice(_words(F.col(text_col)), i, k),
                        )
                    ),
                )
            ).alias("g"),
        )
    )
    train_g = grams.filter(F.col("split") == "train").select("g").distinct()
    test_g = grams.filter(F.col("split") == "test").select("g").distinct()
    joined = test_g.join(train_g, "g", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    totals = test_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_grams")
    )
    return totals.crossJoin(joined).select(
        "n_test_grams",
        "n_overlap",
        F.round(
            F.col("n_overlap").cast("double")
            / F.col("n_test_grams").cast("double"),
            6,
        ).alias("overlap_frac"),
    )


def sql_split_gram_overlap(k: int = OVERLAP_GRAM_K) -> str:
    h = sql_hash_fraction("doc_id", "split")
    w = _sql_words("text")
    g = (
        "CAST('0x' || substr(md5(array_to_string("
        f"({w})[i : i + {k} - 1], ' ')), 1, 15) AS BIGINT)"
    )
    return f"""
        WITH sp AS (
            SELECT doc_id, text,
                   CASE WHEN {h} < {SPLIT_FRACS[0]!r} THEN 'train'
                        WHEN {h} < {SPLIT_FRACS[0] + SPLIT_FRACS[1]!r}
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ),
        grams AS (
            SELECT split, {g} AS g
            FROM sp, UNNEST(range(1, greatest(len({w}) - {k - 1}, 1) + 1))
                     AS t(i)
        ),
        train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
        test_g AS (SELECT DISTINCT g FROM grams WHERE split = 'test'),
        o AS (
            SELECT CAST(count(*) AS BIGINT) AS n_overlap
            FROM test_g WHERE g IN (SELECT g FROM train_g)
        ),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS n_test_grams FROM test_g)
        SELECT n_test_grams, n_overlap,
               round(CAST(n_overlap AS DOUBLE) / n_test_grams, 6)
                   AS overlap_frac
        FROM tt CROSS JOIN o
    """


# ---------------------------------------------------------------------------
# T113 — positional phrase query
# ---------------------------------------------------------------------------
#
# The retrieval feature term indexes can't answer: exact phrase
# matching via word positions (the "positions" half of a positional
# inverted index).  The phrase terms are a bounded literal, so the
# corpus side filters to matching words BEFORE anything shuffles; the
# adjacency check is a chain of len(phrase)-1 equi-joins on
# (doc, pos+offset) — each join's both sides are the pre-filtered
# term postings, never the corpus.

PHRASE_QUERY = ("big", "data")


def phrase_query(
    docs: DataFrame,
    phrase: tuple = PHRASE_QUERY,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matches): documents containing the exact phrase,
    with the occurrence count — start positions where every phrase
    term appears at its offset."""
    key = F.col(key_col)
    tw = docs.select(
        key.alias("doc"),
        F.posexplode(_words(F.col(text_col))).alias("pos", "word"),
    ).filter(F.col("word").isin(*phrase))
    base = tw.filter(F.col("word") == phrase[0]).select(
        "doc", F.col("pos").alias("p0")
    )
    for off, term in enumerate(phrase[1:], start=1):
        nxt = tw.filter(F.col("word") == term).select(
            "doc", (F.col("pos") - off).alias("p0")
        )
        base = base.join(nxt, ["doc", "p0"])
    return (
        base.groupBy("doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
        .select(F.col("doc").alias("doc_id"), "n_matches")
    )


def sql_phrase_query(phrase: tuple = PHRASE_QUERY) -> str:
    w = _sql_words("text")
    terms = ", ".join(f"'{t}'" for t in phrase)
    joins = "\n".join(
        f"JOIN tw t{i} ON t0.doc = t{i}.doc AND t{i}.word = '{t}' "
        f"AND t{i}.pos = t0.pos + {i}"
        for i, t in enumerate(phrase[1:], start=1)
    )
    return f"""
        WITH tw AS (
            SELECT doc_id AS doc, CAST(i - 1 AS BIGINT) AS pos,
                   ({w})[CAST(i AS INTEGER)] AS word
            FROM documents, UNNEST(range(1, len({w}) + 1)) AS t(i)
            WHERE ({w})[CAST(i AS INTEGER)] IN ({terms})
        )
        SELECT t0.doc AS doc_id, CAST(count(*) AS BIGINT) AS n_matches
        FROM tw t0
        {joins}
        WHERE t0.word = '{phrase[0]}'
        GROUP BY t0.doc
    """


# ---------------------------------------------------------------------------
# T135 — Zipf slope (corpus-health power-law fit)
# ---------------------------------------------------------------------------
#
# A healthy natural-language corpus has term frequencies following a
# power law with slope ~ -1 on a log-log rank/frequency plot (Zipf's
# law); machine-generated or templated spam flattens or steepens the
# curve, so dataset cards report the fitted slope next to the vocab
# size.  The fit is ordinary least squares of ln(freq) on ln(rank)
# over the top-N terms.  Determinism across engines: ln values are
# quantized to integer MICRO-NATS (round(ln * 1e6) as bigint) before
# the sums, so the OLS moments are EXACT integer sums (order-free) and
# the slope is one fixed-shape double formula over six bigints —
# bit-identical in Spark and DuckDB.
#
# Scale shape: one map-side-combined word count (the only corpus-scale
# stage), one top-N (bounded at ZIPF_TOP rows after the agg), then a
# single-row closed-form reduce.  Nothing but (word, count) ever
# shuffles.

ZIPF_TOP = 200


def zipf_slope(
    docs: DataFrame, top_n: int = ZIPF_TOP, text_col: str = "text"
) -> DataFrame:
    """(n_terms, slope, intercept): OLS fit of ln(freq) on ln(rank)
    over the corpus's ``top_n`` most frequent terms (ties broken by
    word so the rank sequence is deterministic); intercept in nats,
    both 6dp."""
    from pyspark.sql import Window as W

    counts = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-N via orderBy().limit() compiles to TakeOrderedAndProject —
    # per-partition top-N + a bounded driver merge — NOT a global
    # single-partition sort of the full vocabulary (which at web scale
    # is billions of distinct terms).  The row_number window then runs
    # over <= top_n rows.
    top = counts.orderBy(F.desc("cnt"), F.asc("w")).limit(top_n)
    w = W.orderBy(F.desc("cnt"), F.asc("w"))
    ranked = top.select("cnt", F.row_number().over(w).alias("r"))
    x = F.round(F.log(F.col("r").cast("double")) * 1e6).cast("bigint")
    y = F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast("bigint")
    m = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n / F.lit(1e6)
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def sql_zipf_slope(top_n: int = ZIPF_TOP, text_expr: str = "text") -> str:
    words = _sql_words(text_expr)
    return f"""
        WITH counts AS (
            SELECT w, count(*) AS cnt
            FROM (SELECT unnest({words}) AS w FROM documents)
            WHERE len(w) > 0 GROUP BY w
        ),
        ranked AS (
            SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS r
            FROM counts QUALIFY r <= {top_n}
        ),
        q AS (
            SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                   CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
            FROM ranked
        ),
        m AS (
            SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM q
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx), 6) AS slope,
               round((sy - ((CAST(n AS DOUBLE) * sxy
                             - CAST(sx AS DOUBLE) * sy)
                            / (CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)) * sx)
                     / CAST(n AS DOUBLE) / 1e6, 6) AS intercept
        FROM m
    """


# ---------------------------------------------------------------------------
# T136 — sentence statistics (segmentation-quality audit)
# ---------------------------------------------------------------------------
#
# Extraction quality shows up in sentence shape: boilerplate-heavy or
# badly-segmented pages produce floods of 1-3-word "sentences" (nav
# crumbs) or single 500-word run-ons (stripped punctuation).  The
# per-doc sentence census is the audit a curation report prints and
# the input to rules like "drop docs whose mean sentence length < 3
# words".  Pure in-row column expressions — zero exchanges, zero
# Python; the cheapest kind of 10^12-row scan.


def sentence_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_sentences, avg_sentence_words, max_sentence_words):
    sentences split on [.!?]+ runs, word counts per trimmed non-empty
    sentence; avg 6dp over exact integer sums."""
    sents = F.filter(
        F.transform(F.split(F.col(text_col), r"[.!?]+"), F.trim),
        lambda s: F.length(s) > 0,
    )
    wc = F.transform(
        sents, lambda s: F.size(F.filter(_words(s), lambda t: t != ""))
    )
    n = F.size(wc)
    total = F.aggregate(wc, F.lit(0).cast("bigint"), lambda a, c: a + c)
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_sentences"),
        F.when(n > 0, F.round(total.cast("double") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("avg_sentence_words"),
        F.coalesce(F.array_max(wc), F.lit(0)).cast("bigint").alias(
            "max_sentence_words"
        ),
    )


def sql_sentence_stats(text_expr: str = "text") -> str:
    words_of = _sql_words("s")
    return f"""
        WITH sents AS (
            SELECT doc_id,
                   list_filter(
                       list_transform(
                           string_split_regex({text_expr}, '[.!?]+'),
                           x -> trim(x)),
                       x -> len(x) > 0) AS ss
            FROM documents
        ),
        wc AS (
            SELECT doc_id,
                   list_transform(
                       ss,
                       s -> len(list_filter({words_of}, t -> t <> ''))
                   ) AS wcs
            FROM sents
        )
        SELECT doc_id,
               CAST(len(wcs) AS BIGINT) AS n_sentences,
               CASE WHEN len(wcs) > 0
                    THEN round(CAST(list_sum(wcs) AS DOUBLE) / len(wcs), 6)
                    ELSE 0.0 END AS avg_sentence_words,
               CAST(COALESCE(list_max(wcs), 0) AS BIGINT)
                   AS max_sentence_words
        FROM wc
    """


# ---------------------------------------------------------------------------
# T138 — readability score (Flesch reading ease, vowel-group syllables)
# ---------------------------------------------------------------------------
#
# Readability joins the quality-signal ensemble (Gopher rules, LM
# perplexity, NB class score): reference-grade prose sits in a known
# Flesch band, while OCR damage, keyword stuffing and template spam
# fall far outside it.  The syllable counter is the standard
# vowel-GROUP approximation ([aeiouy]+ runs per lowercased word,
# floored at 1) — deterministic, dictionary-free, and the same regex
# semantics in Java and RE2.  All counts are exact integers; the score
# is one fixed-shape double formula — cross-engine bit-identical.
# In-row only: zero exchanges, zero Python.


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading ease 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words), 6dp; sentence floor 1 so empty-punctuation
    docs stay finite."""
    words = F.filter(_words(F.col(text_col)), lambda t: t != "")
    n_words = F.size(words)
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(F.lower(w), F.lit("[aeiouy]+")), F.lit(1)),
    )
    sents = F.filter(
        F.transform(F.split(F.col(text_col), r"[.!?]+"), F.trim),
        lambda s: F.length(s) > 0,
    )
    n_sents = F.greatest(F.size(sents), F.lit(1))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6)
        * (
            n_syll.cast("double")
            / F.greatest(n_words, F.lit(1)).cast("double")
        )
    )
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sents.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    )


def sql_readability(text_expr: str = "text") -> str:
    words = _sql_words(text_expr)
    return f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter({words}, t -> t <> '') AS ws,
                   greatest(len(list_filter(
                       list_transform(
                           string_split_regex({text_expr}, '[.!?]+'),
                           x -> trim(x)),
                       x -> len(x) > 0)), 1) AS n_sents
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   len(ws) AS n_words,
                   n_sents,
                   list_sum(list_transform(
                       ws,
                       x -> greatest(len(regexp_extract_all(lower(x),
                                                            '[aeiouy]+')),
                                     1))) AS n_syll
            FROM w
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sents AS BIGINT) AS n_sentences,
               CAST(COALESCE(n_syll, 0) AS BIGINT) AS n_syllables,
               round(206.835
                     - 1.015 * (CAST(n_words AS DOUBLE)
                                / CAST(n_sents AS DOUBLE))
                     - 84.6 * (CAST(COALESCE(n_syll, 0) AS DOUBLE)
                               / CAST(greatest(n_words, 1) AS DOUBLE)),
                     6) AS flesch
        FROM c
    """


# ---------------------------------------------------------------------------
# T139 — document length histogram (power-of-two buckets)
# ---------------------------------------------------------------------------
#
# The length distribution is the first chart on any corpus card, and
# the operational input to packing (shard sizing) and filtering (the
# "tiny fragment" and "mega-page" tails).  Buckets are powers of two;
# the bucket index is derived from the BINARY STRING length of
# n_chars+1 (length(bin(x)) - 1 == floor(log2(x))) — pure integer
# arithmetic, immune to the floating-point log2 boundary misrounding
# that plagues floor(log2(2^k)) on some libms.  One map-side-combined
# agg over an integer column the scan already carries; the pct join is
# a window over <= ~40 bucket rows.


def length_histogram(docs: DataFrame, len_col: str = "n_chars") -> DataFrame:
    """(bucket, lo_chars, n_docs, pct): docs per power-of-two length
    bucket — bucket b = floor(log2(n_chars + 1)) holds lengths in
    [2^b - 1, 2^(b+1) - 1), lo_chars = that inclusive lower edge; pct
    6dp of the corpus."""
    from pyspark.sql import Window as W

    b = (F.length(F.bin(F.col(len_col).cast("bigint") + 1)) - 1).cast(
        "bigint"
    )
    agg = docs.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(W.partitionBy())
    return agg.select(
        "bucket",
        (
            F.expr("shiftleft(cast(1 as bigint), cast(bucket as int))")
            - F.lit(1)
        )
        .cast("bigint")
        .alias("lo_chars"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("n_docs").cast("double") / total, 6).alias("pct"),
    )


def sql_length_histogram(len_expr: str = "n_chars") -> str:
    return f"""
        WITH b AS (
            SELECT length(bin(CAST({len_expr} AS BIGINT) + 1)) - 1
                       AS bucket
            FROM documents
        ),
        agg AS (
            SELECT bucket, count(*) AS n_docs FROM b GROUP BY bucket
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST((1 << CAST(bucket AS INTEGER)) - 1 AS BIGINT)
                   AS lo_chars,
               CAST(n_docs AS BIGINT) AS n_docs,
               round(CAST(n_docs AS DOUBLE)
                     / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS pct
        FROM agg
    """


# ---------------------------------------------------------------------------
# T141 — declared-vs-detected language confusion matrix
# ---------------------------------------------------------------------------
#
# Metadata audit: crawl metadata declares a language per page
# (HTTP header / html lang attr — here the corpus `lang` column), but
# declared labels are wrong often enough (~5-10% in CommonCrawl
# studies) that training mixtures sized off them drift.  The audit is
# the confusion matrix between the declared label and the script-aware
# detector (T17), with each cell's share of its declared row — the
# off-diagonal mass is the mislabel rate the mixture planner must
# correct for.
#
# Scale shape: the guess is an in-row expression; the matrix is one
# map-side-combined groupBy over ~|langs|² cells; the row-share window
# runs over those bounded cells, never the corpus.  Reference parity:
# the reference trusts task metadata outright (main.py task intake) —
# this is the audit a 10^12-page corpus needs instead.


def lang_mismatch(docs: DataFrame) -> DataFrame:
    """(lang, guess, n_docs, row_share): confusion matrix of declared
    `lang` vs langid_script guess; row_share = cell / declared total,
    6dp."""
    from pyspark.sql import Window as W

    cells = (
        docs.select("lang", langid_script(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = W.partitionBy("lang")
    return cells.select(
        "lang",
        "guess",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double"),
            6,
        ).alias("row_share"),
    )


def sql_lang_mismatch() -> str:
    guess = sql_langid_script("text")
    return f"""
        WITH cells AS (
            SELECT lang, {guess} AS guess, count(*) AS n_docs
            FROM documents GROUP BY lang, {guess}
        )
        SELECT lang, guess,
               CAST(n_docs AS BIGINT) AS n_docs,
               round(CAST(n_docs AS DOUBLE)
                     / CAST(sum(n_docs) OVER (PARTITION BY lang)
                            AS DOUBLE), 6) AS row_share
        FROM cells
    """


# ---------------------------------------------------------------------------
# T144 — keyword-stuffing detector (top-term share)
# ---------------------------------------------------------------------------
#
# SEO spam's signature is one term (or a tiny set) dominating the
# token stream — invisible to repetition_stats' adjacent-n-gram
# counters when the stuffing is interleaved ("buy pills cheap pills
# best pills ...": no adjacent bigram repeats, but `pills` owns a
# third of the tokens).  The detector is the max single-type share of
# a doc's tokens plus the type/token ratio; the flag trips when a doc
# is long enough to judge AND one type exceeds STUFF_SHARE.
#
# Scale shape: one (doc, word) count with map-side combine, one
# per-doc agg over its output carrying three bigints; the join back to
# the full doc list is key-only (empty docs must surface, flag false).

STUFF_SHARE = 0.20
STUFF_MIN_WORDS = 20


def keyword_stuffing(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_types, top_share, stuffed): max single-type
    token share (6dp) and the stuffing verdict; empty docs emit
    (0, 0, 0.0, false)."""
    key = F.col(key_col)
    tw = docs.select(
        key.alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    tc = tw.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    share = F.round(
        F.col("top_c").cast("double") / F.col("n_words").cast("double"), 6
    )
    scored = per.select(
        "doc_id",
        "n_words",
        "n_types",
        share.alias("top_share"),
        (
            (F.col("n_words") >= STUFF_MIN_WORDS)
            & (share >= STUFF_SHARE)
        ).alias("stuffed"),
    )
    return (
        docs.select(key.alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_types", F.lit(0)).cast("bigint").alias("n_types"),
            F.coalesce("top_share", F.lit(0.0)).alias("top_share"),
            F.coalesce("stuffed", F.lit(False)).alias("stuffed"),
        )
    )


def sql_keyword_stuffing() -> str:
    w = _sql_words("text")
    return f"""
        WITH tw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        tc AS (
            SELECT doc_id, word, count(*) AS c FROM tw GROUP BY doc_id, word
        ),
        per AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(max(c) AS BIGINT) AS top_c
            FROM tc GROUP BY doc_id
        ),
        scored AS (
            SELECT doc_id, n_words, n_types,
                   round(CAST(top_c AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
                       AS top_share
            FROM per
        )
        SELECT d.doc_id,
               COALESCE(s.n_words, 0) AS n_words,
               COALESCE(s.n_types, 0) AS n_types,
               COALESCE(s.top_share, 0.0) AS top_share,
               COALESCE(s.n_words >= {STUFF_MIN_WORDS}
                        AND s.top_share >= {STUFF_SHARE}, FALSE) AS stuffed
        FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """


# ---------------------------------------------------------------------------
# T148 — per-shard KL divergence from the corpus token distribution
# ---------------------------------------------------------------------------
#
# shard_balance (T95) checks shard SIZES; this checks shard CONTENT.
# If sharding correlates with content (e.g. shards assigned by crawl
# order: one crawl batch = one site), every training epoch sees
# non-stationary token statistics.  The audit is KL(shard ‖ corpus)
# over the unigram distribution, per shard — near zero for hash
# sharding, large when a shard over-represents a vocabulary slice.
#
# Integer micro-nat arithmetic (T88's trick) keeps the cross-engine
# sum exact: per (shard, word), c_sw * (ln̂ c_sw − ln̂ n_s − ln̂ c_w +
# ln̂ n) is a bigint with ln̂ = round(ln·1e6); the only float steps are
# the final fixed-shape divisions.
#
# Scale shape: one (shard, word) count with map-side combine; corpus
# word totals re-aggregated FROM the shard counts (the corpus never
# re-shuffles); one word-keyed join between the two (both sides
# counts, no text); per-shard rollup to n_shards rows.

SHARD_KL_SHARDS = 4


def shard_kl(
    docs: DataFrame,
    n_shards: int = SHARD_KL_SHARDS,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_words, kl_nats): shard = md5-hash of the doc key mod
    n_shards (the engine's deterministic shard draw), KL in nats 6dp."""
    key = F.col(key_col)
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("shard:"), key.cast("string"))), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        % n_shards
    ).cast("int")
    tw = docs.select(
        shard.alias("shard"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    sw = tw.groupBy("shard", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sw")
    )
    cw = sw.groupBy("word").agg(F.sum("c_sw").cast("bigint").alias("c_w"))
    totals = sw.groupBy("shard").agg(
        F.sum("c_sw").cast("bigint").alias("n_s")
    )
    n_total = sw.agg(F.sum("c_sw").cast("bigint").alias("n"))

    def _ln_unats(c: Column) -> Column:
        return F.round(F.log(c.cast("double")) * _ENT_SCALE).cast("bigint")

    joined = (
        sw.join(cw, "word")
        .join(F.broadcast(totals), "shard")
        .join(F.broadcast(n_total))
    )
    term = F.col("c_sw") * (
        _ln_unats(F.col("c_sw"))
        - _ln_unats(F.col("n_s"))
        - _ln_unats(F.col("c_w"))
        + _ln_unats(F.col("n"))
    )
    per = joined.groupBy("shard").agg(
        F.max("n_s").alias("n_words"),
        F.sum(term).cast("bigint").alias("kl_unats"),
    )
    return per.select(
        F.col("shard").cast("int").alias("shard"),
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(
            F.col("kl_unats").cast("double")
            / F.col("n_words").cast("double")
            / F.lit(float(_ENT_SCALE)),
            6,
        ).alias("kl_nats"),
    )


def sql_shard_kl(n_shards: int = SHARD_KL_SHARDS) -> str:
    w = _sql_words("text")
    s = _ENT_SCALE

    def ln(expr: str) -> str:
        return f"CAST(round(ln(CAST({expr} AS DOUBLE)) * {s}) AS BIGINT)"

    shard = (
        "CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15) AS BIGINT) % {n_shards} AS INTEGER)"
    )
    return f"""
        WITH tw AS (
            SELECT shard, w AS word FROM (
                SELECT {shard} AS shard, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        sw AS (
            SELECT shard, word, CAST(count(*) AS BIGINT) AS c_sw
            FROM tw GROUP BY shard, word
        ),
        cw AS (
            SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w
            FROM sw GROUP BY word
        ),
        totals AS (
            SELECT shard, CAST(sum(c_sw) AS BIGINT) AS n_s
            FROM sw GROUP BY shard
        ),
        n_total AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n FROM sw),
        per AS (
            SELECT sw.shard,
                   max(t.n_s) AS n_words,
                   CAST(sum(sw.c_sw * ({ln('sw.c_sw')} - {ln('t.n_s')}
                                       - {ln('cw.c_w')} + {ln('nt.n')}))
                        AS BIGINT) AS kl_unats
            FROM sw
            JOIN cw USING (word)
            JOIN totals t ON t.shard = sw.shard
            CROSS JOIN n_total nt
            GROUP BY sw.shard
        )
        SELECT CAST(shard AS INTEGER) AS shard,
               CAST(n_words AS BIGINT) AS n_words,
               round(CAST(kl_unats AS DOUBLE) / CAST(n_words AS DOUBLE)
                     / {float(s)!r}, 6) AS kl_nats
        FROM per
    """


# ---------------------------------------------------------------------------
# T149 — deterministic uniform corpus sample (bottom-k by keyed hash)
# ---------------------------------------------------------------------------
#
# Every eval set, human-audit batch, and quick-look notebook starts
# with "give me k uniform documents" — and at pipeline scale the
# sample must be REPRODUCIBLE (rerunning the job, resizing the
# cluster, or re-reading a reshuffled table yields the same k docs)
# and CHEAP (no full sort, no rand() whose row order leaks into the
# draw).  Bottom-k over a seeded md5 draw gives both: the draw is a
# pure function of (seed, doc_id), and orderBy+limit compiles to
# TakeOrderedAndProject — each task keeps a k-row heap, the driver
# merges per-task heaps, nothing else moves.  Mirrors the reference's
# "recent N tasks" pagination shape (main.py admin queries) turned
# into a statistically uniform draw.
#
# Scale shape: zero shuffles; O(k) rows per task to the driver.  The
# same seeded draw at any cluster size returns byte-identical rows.

SAMPLE_K = 100


def hash_sample(
    docs: DataFrame,
    k: int = SAMPLE_K,
    seed: str = "sample",
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, lang, source, draw): the k docs with the smallest
    seeded 60-bit md5 draw — a uniform, rerun-stable corpus sample."""
    from ocr_spark.operators.dedup import _hash60

    key = F.col(key_col)
    draw = _hash60(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return (
        docs.select(
            key.alias("doc_id"),
            "lang",
            "source",
            draw.alias("draw"),
        )
        .orderBy("draw", "doc_id")
        .limit(k)
    )


def sql_hash_sample(k: int = SAMPLE_K, seed: str = "sample") -> str:
    draw = (
        f"CAST('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)),"
        " 1, 15) AS BIGINT)"
    )
    return f"""
        SELECT doc_id, lang, source, {draw} AS draw
        FROM documents
        ORDER BY draw, doc_id
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T150 — training-sequence packing audit (concat-and-chunk)
# ---------------------------------------------------------------------------
#
# Pretraining consumes documents as fixed-length token sequences: the
# corpus is laid out in a deterministic shuffled order, concatenated,
# and cut every SEQ_BUDGET tokens.  The packing audit answers the
# questions that decide context-length and separator policy — how many
# docs start in each sequence, how many tokens they contribute, and
# how many docs straddle a cut (a straddled doc loses attention
# coherence across the boundary).
#
# Scale shape: the global prefix-sum is the textbook two-pass scan —
# per-BUCKET window cumsum (order = seeded md5 draw, so the layout is
# the epoch-shuffle order, not storage order) plus a bounded
# PACK_BUCKETS-row offset table broadcast back.  No global sort, no
# single-partition window; both passes shuffle 8-byte keyed counts
# only.  The oracle collapses the two passes into one global window —
# integer sums make the two formulations bit-identical.

SEQ_BUDGET = 512
PACK_BUCKETS = 64


def pack_sequences(
    docs: DataFrame,
    budget: int = SEQ_BUDGET,
    n_buckets: int = PACK_BUCKETS,
    seed: str = "pack",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(seq_id, n_docs_started, n_tokens_started, n_straddlers):
    per-training-sequence packing stats under concat-and-chunk at
    `budget` tokens, in the deterministic seeded shuffle order."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60

    key = F.col(key_col)
    words = _words(F.col(text_col))
    n_tok = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    draw = _hash60(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    d = docs.select(
        key.alias("doc_id"),
        n_tok.alias("n_tok"),
        draw.alias("draw"),
        F.pmod(draw, F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    # pass 1: exclusive prefix sum within each bucket
    wl = (
        W.partitionBy("bucket")
        .orderBy("draw", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = d.withColumn(
        "off_local", (F.sum("n_tok").over(wl) - F.col("n_tok"))
    )
    # pass 2: bucket offsets over the bounded bucket-total table
    totals = d.groupBy("bucket").agg(F.sum("n_tok").alias("b_tok"))
    wb = (
        W.orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = totals.select(
        "bucket", (F.sum("b_tok").over(wb) - F.col("b_tok")).alias("b_off")
    )
    placed = d.join(F.broadcast(offs), "bucket").select(
        "doc_id",
        "n_tok",
        (F.col("b_off") + F.col("off_local")).alias("start"),
    )
    seq = F.floor(F.col("start") / budget).cast("bigint")
    straddles = (F.col("n_tok") > 0) & (
        F.floor((F.col("start") + F.col("n_tok") - 1) / budget).cast("bigint")
        > seq
    )
    return (
        placed.select(
            seq.alias("seq_id"),
            F.col("n_tok"),
            straddles.cast("int").alias("straddle"),
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_started"),
            F.sum("n_tok").cast("bigint").alias("n_tokens_started"),
            F.sum("straddle").cast("bigint").alias("n_straddlers"),
        )
    )


def sql_pack_sequences(
    budget: int = SEQ_BUDGET,
    n_buckets: int = PACK_BUCKETS,
    seed: str = "pack",
) -> str:
    w = _sql_words("text")
    draw = (
        f"CAST('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)),"
        " 1, 15) AS BIGINT)"
    )
    return f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(list_filter({w}, x -> x <> '')) AS BIGINT)
                       AS n_tok,
                   {draw} AS draw,
                   CAST({draw} % {n_buckets} AS INTEGER) AS bucket
            FROM documents
        ),
        placed AS (
            SELECT doc_id, n_tok,
                   sum(n_tok) OVER (
                       ORDER BY bucket, draw, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tok AS start
            FROM d
        )
        SELECT CAST(start // {budget} AS BIGINT) AS seq_id,
               CAST(count(*) AS BIGINT) AS n_docs_started,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens_started,
               CAST(sum(CASE WHEN n_tok > 0
                             AND (start + n_tok - 1) // {budget}
                                 > start // {budget}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM placed
        GROUP BY seq_id
    """


# ---------------------------------------------------------------------------
# T151 — data-mixture plan (uniform target, epoch caps)
# ---------------------------------------------------------------------------
#
# Mixture design allocates a token budget across sources and answers
# "how many epochs of each source does that imply, and where does the
# epoch cap bite?"  (Repeating a small source too often measurably
# hurts — pipelines cap epochs per source and accept the deficit.)
# Target here is the uniform mixture over sources with the budget
# equal to the corpus total, quotas made integer-exact by largest
# remainder, so every number is reproducible cross-engine: quotas sum
# to the budget BY CONSTRUCTION, epochs are one double division.
#
# Scale shape: one map-side-combined groupBy(source) over word counts;
# everything after runs on the bounded per-source table (windows over
# |sources| rows, never the corpus).

MIXTURE_MAX_EPOCHS = 4


def mixture_plan(
    docs: DataFrame,
    max_epochs: int = MIXTURE_MAX_EPOCHS,
    text_col: str = "text",
) -> DataFrame:
    """(source, avail_tokens, target_tokens, epochs_needed, capped,
    achieved_tokens, deficit): uniform-mixture token plan with a
    largest-remainder integer target and an epoch cap."""
    from pyspark.sql import Window as W

    words = _words(F.col(text_col))
    n_tok = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    per = docs.select(F.col("source"), n_tok.alias("n_tok")).groupBy(
        "source"
    ).agg(F.sum("n_tok").cast("bigint").alias("avail_tokens"))
    wall = W.partitionBy()
    n_src = F.count(F.lit(1)).over(wall)
    budget = F.sum("avail_tokens").over(wall)
    # exact integer floor division: subtract the remainder first so the
    # double division is of exactly-divisible bigints (no ulp drift vs
    # the oracle's native `//`)
    rem = F.pmod(budget, n_src)
    base = ((budget - rem) / n_src).cast("bigint")
    # largest remainder: every source shares the same remainder
    # (uniform target), so ties break by source order — rank over the
    # bounded per-source table
    wr = W.orderBy("source")
    rank = F.row_number().over(wr)
    per = per.select(
        "source",
        "avail_tokens",
        (base + (rank <= rem).cast("bigint")).alias("target_tokens"),
    )
    epochs = F.round(
        F.col("target_tokens").cast("double")
        / F.col("avail_tokens").cast("double"),
        6,
    )
    achieved = F.least(
        F.col("target_tokens"), F.col("avail_tokens") * max_epochs
    )
    return per.select(
        "source",
        "avail_tokens",
        "target_tokens",
        epochs.alias("epochs_needed"),
        (
            F.col("target_tokens") > F.col("avail_tokens") * max_epochs
        ).alias("capped"),
        achieved.cast("bigint").alias("achieved_tokens"),
        (F.col("target_tokens") - achieved).cast("bigint").alias("deficit"),
    )


def sql_mixture_plan(max_epochs: int = MIXTURE_MAX_EPOCHS) -> str:
    w = _sql_words("text")
    return f"""
        WITH per AS (
            SELECT source,
                   CAST(sum(len(list_filter({w}, x -> x <> '')))
                        AS BIGINT) AS avail_tokens
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT source, avail_tokens,
                   CAST(count(*) OVER () AS BIGINT) AS n_src,
                   CAST(sum(avail_tokens) OVER () AS BIGINT) AS budget,
                   row_number() OVER (ORDER BY source) AS rnk
            FROM per
        ),
        tgt AS (
            SELECT source, avail_tokens,
                   budget // n_src
                   + CASE WHEN rnk <= budget - (budget // n_src) * n_src
                          THEN 1 ELSE 0 END AS target_tokens
            FROM tot
        )
        SELECT source, avail_tokens,
               CAST(target_tokens AS BIGINT) AS target_tokens,
               round(CAST(target_tokens AS DOUBLE)
                     / CAST(avail_tokens AS DOUBLE), 6) AS epochs_needed,
               target_tokens > avail_tokens * {max_epochs} AS capped,
               CAST(least(target_tokens, avail_tokens * {max_epochs})
                    AS BIGINT) AS achieved_tokens,
               CAST(target_tokens
                    - least(target_tokens, avail_tokens * {max_epochs})
                    AS BIGINT) AS deficit
        FROM tgt
    """


# ---------------------------------------------------------------------------
# T152 — language rebalancing (temperature-sampled weights)
# ---------------------------------------------------------------------------
#
# Multilingual corpora are Zipf-skewed by language; training samples
# languages with p_i^alpha / sum p_j^alpha to lift the tail (the
# mBERT/XLM-R exponent trick).  alpha is pinned at 0.5 so the power is
# sqrt — the ONE libm power that IEEE 754 requires correctly rounded,
# which makes the weights reproducible across Spark's JVM and the
# oracle's C library (pow(x, 0.3) carries no such guarantee).  The
# sqrt is quantized to micro units and summed as BIGINT so the
# normalizing constant is exact, not a float-order artifact.
#
# Scale shape: one map-side-combined groupBy(lang); windows run over
# the bounded per-language table only.


def lang_rebalance(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, raw_share, weight, boost): sqrt-temperature
    sampling weights per language (alpha = 0.5), integer-exact
    normalization, all ratios 6dp."""
    from pyspark.sql import Window as W

    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    mu = F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000).cast(
        "bigint"
    )
    per = per.select("lang", "n_docs", mu.alias("mu"))
    wall = W.partitionBy()
    n_total = F.sum("n_docs").over(wall)
    mu_total = F.sum("mu").over(wall)
    raw = F.col("n_docs").cast("double") / n_total.cast("double")
    wgt = F.col("mu").cast("double") / mu_total.cast("double")
    boost = (F.col("mu").cast("double") * n_total.cast("double")) / (
        mu_total.cast("double") * F.col("n_docs").cast("double")
    )
    return per.select(
        "lang",
        "n_docs",
        F.round(raw, 6).alias("raw_share"),
        F.round(wgt, 6).alias("weight"),
        F.round(boost, 6).alias("boost"),
    )


def sql_lang_rebalance() -> str:
    return """
        WITH per AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        q AS (
            SELECT lang, n_docs,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000)
                        AS BIGINT) AS mu
            FROM per
        )
        SELECT lang, n_docs,
               round(CAST(n_docs AS DOUBLE)
                     / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS raw_share,
               round(CAST(mu AS DOUBLE)
                     / CAST(sum(mu) OVER () AS DOUBLE), 6) AS weight,
               round((CAST(mu AS DOUBLE)
                      * CAST(sum(n_docs) OVER () AS DOUBLE))
                     / (CAST(sum(mu) OVER () AS DOUBLE)
                        * CAST(n_docs AS DOUBLE)), 6) AS boost
        FROM q
    """


# ---------------------------------------------------------------------------
# T155 — quality-signal calibration curve (deciles vs duplicate rate)
# ---------------------------------------------------------------------------
#
# Any quality score used as a keep/drop gate needs VALIDATION against
# an independent signal before it filters a corpus; the standard cheap
# audit is the decile calibration curve against exact-duplicate rate
# (boilerplate and templated spam are both low-quality and highly
# duplicated, so a working score shows dup-rate falling monotonically
# across deciles).  The score here is the type/token ratio in exact
# integer micro units; the dup flag is md5 over whitespace-normalized
# text — both already pipeline primitives.
#
# Scale shape: the (doc, word) count is map-side combined; the decile
# assignment is the T177 histogram shape — scores are already exact
# micro units (≤ 1e6 + 1 distinct values), so ONE map-side-combined
# (score_micro) histogram shuffles and the decile boundaries come from
# a cumulative window over that bounded table.  No corpus-wide ntile
# sort exists: a single reducer ordering 10^12 (score, doc) pairs is
# exactly the plan T177 was built to avoid, and this op follows it.

CALIB_BUCKETS = 10


def quality_calibration(
    docs: DataFrame,
    n_buckets: int = CALIB_BUCKETS,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(decile, n_docs, n_dups, dup_rate, mean_score): type/token-ratio
    decile bands vs exact-duplicate incidence; score in exact micro
    units, ratios 6dp.  decile is ceil(cum * n_buckets / n_docs) over
    the score histogram's cumulative count (T177 banding), so every
    document at one score level shares a band and only the bands that
    own documents appear."""
    from pyspark.sql import Window as W

    key = F.col(key_col)
    text = F.col(text_col)
    tw = docs.select(
        key.alias("doc_id"), F.explode(_words(text)).alias("word")
    ).filter(F.col("word") != "")
    per = tw.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c")
    ).groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    num = F.col("n_types") * 1_000_000
    score = ((num - F.pmod(num, F.col("n_words"))) / F.col("n_words")).cast(
        "bigint"
    )
    fp = F.md5(F.regexp_replace(F.trim(text), r"\s+", " "))
    flagged = (
        docs.select(key.alias("doc_id"), fp.alias("fp"))
        .withColumn(
            "dup",
            (F.count(F.lit(1)).over(W.partitionBy("fp")) > 1).cast("int"),
        )
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "dup",
            F.coalesce(score, F.lit(0)).alias("score_micro"),
        )
    )
    hist = flagged.groupBy("score_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dup").cast("bigint").alias("nd"),
    )
    wcum = W.orderBy("score_micro").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = F.sum("n").over(wcum)
    total = F.sum("n").over(W.partitionBy())
    dec_num = cum * F.lit(n_buckets) + total - F.lit(1)
    decile = ((dec_num - F.pmod(dec_num, total)) / total).cast("bigint")
    return (
        hist.select(
            "score_micro", "n", "nd", decile.alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.sum("nd").cast("bigint").alias("n_dups"),
            F.round(
                F.sum("nd").cast("double") / F.sum("n").cast("double"),
                6,
            ).alias("dup_rate"),
            F.round(
                F.sum(F.col("score_micro") * F.col("n")).cast("double")
                / F.sum("n").cast("double")
                / 1_000_000.0,
                6,
            ).alias("mean_score"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "n_dups",
            "dup_rate",
            "mean_score",
        )
    )


def sql_quality_calibration(n_buckets: int = CALIB_BUCKETS) -> str:
    w = _sql_words("text")
    return f"""
        WITH tw AS (
            SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE w <> ''
        ),
        per AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM (SELECT doc_id, word, count(*) AS c
                  FROM tw GROUP BY doc_id, word)
            GROUP BY doc_id
        ),
        flagged AS (
            SELECT d.doc_id,
                   CASE WHEN count(*) OVER (PARTITION BY
                            md5(regexp_replace(trim(d.text), '\\s+', ' ',
                                               'g'))) > 1
                        THEN 1 ELSE 0 END AS dup,
                   COALESCE((p.n_types * 1000000) // p.n_words, 0)
                       AS score_micro
            FROM documents d LEFT JOIN per p USING (doc_id)
        ),
        hist AS (
            SELECT score_micro,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(dup) AS BIGINT) AS nd
            FROM flagged GROUP BY score_micro
        ),
        cumed AS (
            SELECT score_micro, n, nd,
                   sum(n) OVER (ORDER BY score_micro) AS cum,
                   sum(n) OVER () AS tot
            FROM hist
        ),
        bucketed AS (
            SELECT score_micro, n, nd,
                   CAST((cum * {n_buckets} + tot - 1) // tot AS BIGINT)
                       AS decile
            FROM cumed
        )
        SELECT CAST(decile AS INTEGER) AS decile,
               CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(sum(nd) AS BIGINT) AS n_dups,
               round(CAST(sum(nd) AS DOUBLE)
                     / CAST(sum(n) AS DOUBLE), 6) AS dup_rate,
               round(CAST(sum(score_micro * n) AS DOUBLE)
                     / CAST(sum(n) AS DOUBLE) / 1000000.0, 6)
                   AS mean_score
        FROM bucketed
        GROUP BY decile
    """


# ---------------------------------------------------------------------------
# T156 — robust length outliers (median / MAD per source)
# ---------------------------------------------------------------------------
#
# Corpus-hygiene dashboards flag length anomalies per source with the
# median/MAD rule rather than mean/stddev because crawl length
# distributions are heavy-tailed — one concatenated mega-page moves a
# mean arbitrarily but not a median.  Outlier = |len - median| >
# 3 * 1.4826 * MAD (the Gaussian-consistent MAD scale).  Lengths are
# integers, so every median lands on k or k.5 — exact in a double in
# both engines, no interpolation drift.
#
# Scale shape: two grouped exact-percentile passes (a per-group sort of
# one integer column) + a broadcast join of the bounded per-source
# stats table; at real scale the exact percentile swaps for
# approx_percentile with everything else unchanged.

MAD_K = 3.0 * 1.4826


def doc_outliers(docs: DataFrame, len_col: str = "n_chars") -> DataFrame:
    """(source, n_docs, med, mad, n_outliers): per-source robust
    length profile and the |len-med| > 3*1.4826*MAD outlier count."""
    ln = F.col(len_col).cast("double")
    med = docs.groupBy("source").agg(
        F.percentile(ln, F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    dev = docs.join(F.broadcast(med), "source").select(
        "source", "n_docs", "med", F.abs(ln - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("source", "n_docs", "med").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    out = dev.join(
        F.broadcast(mad.select("source", "mad")), "source"
    ).groupBy("source").agg(
        F.sum(
            (F.col("dev") > F.lit(MAD_K) * F.col("mad")).cast("bigint")
        ).alias("n_outliers")
    )
    return mad.join(out, "source").select(
        "source", "n_docs", "med", "mad",
        F.col("n_outliers").cast("bigint").alias("n_outliers"),
    )


def sql_doc_outliers(len_expr: str = "n_chars") -> str:
    return f"""
        WITH med AS (
            SELECT source,
                   quantile_cont(CAST({len_expr} AS DOUBLE), 0.5) AS med,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        dev AS (
            SELECT d.source, m.n_docs, m.med,
                   abs(CAST(d.{len_expr} AS DOUBLE) - m.med) AS dev
            FROM documents d JOIN med m USING (source)
        ),
        mad AS (
            SELECT source, n_docs, med,
                   quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY source, n_docs, med
        )
        SELECT v.source, any_value(m.n_docs) AS n_docs,
               any_value(m.med) AS med, any_value(m.mad) AS mad,
               CAST(sum(CASE WHEN v.dev > {MAD_K!r} * m.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev v JOIN mad m USING (source)
        GROUP BY v.source
    """


# ---------------------------------------------------------------------------
# T159 — numeric-density profile (digit-ratio histogram)
# ---------------------------------------------------------------------------
#
# Price lists, sports tables, sensor dumps, and pagination boilerplate
# are digit-dense; natural prose sits under ~5% digits.  The
# digit-character ratio histogram is the corpus-level view quality
# pipelines use to pick the numeric-density cutoff (C4 drops lines
# that are mostly numbers; Gopher bounds the symbol ratio) — and the
# per-bin averages verify a chosen threshold before it gates.
#
# Exactness: ratio in exact micro units (digits * 1e6 integer-divided
# by chars, both bigint), binned by integer division; per-bin mean is
# one exact bigint sum and a final double division.
#
# Scale shape: per-row length/regexp columns (zero exchange, codegen)
# + one bounded groupBy over <= 11 bins.

DIGIT_BINS = 10


def numeric_density(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bin, n_docs, avg_ratio): documents histogrammed by
    digit-character ratio in DIGIT_BINS 10%-wide bins (bin = floor
    share, capped at the last bin); per-bin mean ratio 6dp."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("bigint")
    n_dig = (
        n_chars - F.length(F.regexp_replace(text, r"[0-9]", "")).cast("bigint")
    )
    num = n_dig * 1_000_000
    micro = F.when(n_chars > 0, (num - F.pmod(num, n_chars)) / n_chars).otherwise(
        F.lit(0)
    ).cast("bigint")
    bin_ = F.least(
        F.floor(micro / (1_000_000 / DIGIT_BINS)).cast("int"),
        F.lit(DIGIT_BINS - 1),
    )
    return (
        docs.select(bin_.alias("bin"), micro.alias("micro"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("micro").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1_000_000.0,
                6,
            ).alias("avg_ratio"),
        )
    )


def sql_numeric_density(text_expr: str = "text") -> str:
    width = 1_000_000 // DIGIT_BINS
    return f"""
        WITH d AS (
            SELECT CASE WHEN length({text_expr}) > 0 THEN
                       (CAST(length({text_expr})
                             - length(regexp_replace({text_expr},
                                                     '[0-9]', '', 'g'))
                             AS BIGINT) * 1000000)
                       // CAST(length({text_expr}) AS BIGINT)
                   ELSE 0 END AS micro
            FROM documents
        )
        SELECT CAST(least(micro // {width}, {DIGIT_BINS - 1}) AS INTEGER)
                   AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(CAST(sum(micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     / 1000000.0, 6) AS avg_ratio
        FROM d
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# T161 — vocabulary growth curve (Heaps'-law checkpoints)
# ---------------------------------------------------------------------------
#
# How fast the vocabulary grows as the corpus grows decides tokenizer
# sizing and dedup health in one picture: Heaps' law says
# types ~ K * tokens^beta with beta ~ 0.4-0.6 for natural text; a
# too-flat curve means heavy duplication (new docs add no new words),
# a too-steep one means noise/mojibake minting junk types.  The curve
# is evaluated at DECILE checkpoints of the corpus in the seeded
# deterministic shuffle order (T74's layout), so "the first ~30% of
# the corpus" means the same documents at any cluster size.
#
# Scale shape: deciles are FIXED equal-width slices of the uniform
# 60-bit draw space (decile = draw div ceil(2^60/n)) — a pure row
# expression, deterministic at any cluster size, populations hash-
# uniform to ±O(sqrt(n)) which a growth curve doesn't care about.  A
# corpus-wide ntile over draw (the obvious alternative) funnels every
# row through ONE reducer's sort; this shape shuffles nothing for the
# assignment at all.  Each word shuffles once for its min-draw (first
# occurrence); the checkpoint probe is a bounded x10 broadcast join of
# 8-byte rows against constant range thresholds — no corpus-sized
# doc->decile join anywhere.

GROWTH_BUCKETS = 10


def vocab_growth(
    docs: DataFrame,
    n_buckets: int = GROWTH_BUCKETS,
    seed: str = "growth",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(decile, docs_cum, tokens_cum, types_cum): cumulative corpus
    size and distinct-word count at seeded-shuffle-order decile
    checkpoints — the Heaps'-law growth curve.  Deciles are fixed
    equal-width slices of the uniform 60-bit draw space (populations
    hash-uniform, not exactly equal), so the assignment is a pure row
    expression and every decile row appears even when empty."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.dedup import _hash60

    width = ((1 << 60) + n_buckets - 1) // n_buckets
    key = F.col(key_col)
    words = _words(F.col(text_col))
    n_tok = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    draw = _hash60(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    d = docs.select(
        key.alias("doc_id"),
        F.col(text_col).alias("text"),
        n_tok.alias("n_tok"),
        draw.alias("draw"),
    )
    deciled = d.withColumn(
        "decile", F.expr(f"CAST(draw div {width} AS INT) + 1")
    )
    per_dec = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_toks"),
    )
    spine = (
        docs.sparkSession.range(1, n_buckets + 1)
        .select(F.col("id").cast("int").alias("decile"))
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = (
        spine.join(per_dec, "decile", "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
        )
        .select(
            "decile",
            F.sum("n_docs").over(wc).cast("bigint").alias("docs_cum"),
            F.sum("n_toks").over(wc).cast("bigint").alias("tokens_cum"),
        )
    )
    first = (
        d.select("draw", F.explode(_words(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.min("draw").alias("min_draw"))
    )
    types = (
        first.join(
            F.broadcast(spine),
            F.col("min_draw")
            < F.col("decile").cast("bigint") * F.lit(width),
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("types_cum"))
    )
    return (
        cum.join(types, "decile", "left")
        .select(
            F.col("decile").cast("int").alias("decile"),
            "docs_cum",
            "tokens_cum",
            F.coalesce("types_cum", F.lit(0)).cast("bigint").alias(
                "types_cum"
            ),
        )
    )


def sql_vocab_growth(
    n_buckets: int = GROWTH_BUCKETS, seed: str = "growth"
) -> str:
    w = _sql_words("text")
    width = ((1 << 60) + n_buckets - 1) // n_buckets
    draw = (
        f"CAST('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)),"
        " 1, 15) AS BIGINT)"
    )
    return f"""
        WITH d AS (
            SELECT doc_id, text,
                   CAST(len(list_filter({w}, x -> x <> '')) AS BIGINT)
                       AS n_tok,
                   {draw} AS draw,
                   CAST({draw} // {width} AS INTEGER) + 1 AS decile
            FROM documents
        ),
        spine AS (
            SELECT CAST(unnest(range(1, {n_buckets + 1})) AS INTEGER)
                AS decile
        ),
        per AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_tok) AS BIGINT) AS t
            FROM d GROUP BY decile
        ),
        cum AS (
            SELECT s.decile,
                   CAST(sum(COALESCE(p.n, 0)) OVER (ORDER BY s.decile)
                        AS BIGINT) AS docs_cum,
                   CAST(sum(COALESCE(p.t, 0)) OVER (ORDER BY s.decile)
                        AS BIGINT) AS tokens_cum
            FROM spine s LEFT JOIN per p USING (decile)
        ),
        first AS (
            SELECT wd AS w, min(draw) AS min_draw
            FROM (SELECT draw, unnest({w}) AS wd FROM d)
            WHERE wd <> '' GROUP BY wd
        ),
        types AS (
            SELECT s.decile, CAST(count(*) AS BIGINT) AS types_cum
            FROM spine s
            JOIN first f
              ON f.min_draw < CAST(s.decile AS BIGINT) * {width}
            GROUP BY s.decile
        )
        SELECT c.decile, c.docs_cum, c.tokens_cum,
               CAST(COALESCE(t.types_cum, 0) AS BIGINT) AS types_cum
        FROM cum c LEFT JOIN types t USING (decile)
    """


# ---------------------------------------------------------------------------
# T164 — quality-signal correlation audit (Pearson r)
# ---------------------------------------------------------------------------
#
# Every ensemble gate (T97) implicitly assumes its member signals add
# information; a pair of signals correlated at |r| ~ 0.9 is one signal
# voting twice.  The audit here correlates the type/token ratio with
# document length — the canonical trap pair, since TTR mechanically
# falls with length (Herdan's law) and a TTR gate silently becomes a
# length gate.  Reported r tells the pipeline whether to residualize
# (use T155's calibration per length band) before gating.
#
# Exactness: both signals quantize to exact integers (TTR in micro
# units via integer division, length is already bigint); the five
# moment sums are pure bigint folds, and r is formed from them in
# doubles (products of sums overflow bigint at web scale, doubles are
# deterministic).
#
# Scale shape: one (doc, word) count with map-side combine for the
# TTR, a key-only join back to lengths, a single 5-sum aggregation.


def signal_correlation(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
) -> DataFrame:
    """One row (n_docs, r): Pearson correlation between per-doc
    type/token ratio (micro-exact) and document length, 6dp."""
    key = F.col(key_col)
    tw = docs.select(
        key.alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    per = (
        tw.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
        )
    )
    num = F.col("n_types") * 1_000_000
    ttr = ((num - F.pmod(num, F.col("n_words"))) / F.col("n_words")).cast(
        "bigint"
    )
    ab = docs.select(key.alias("doc_id"), F.col(len_col).cast("bigint").alias("b")).join(
        per, "doc_id"
    ).select(ttr.alias("a"), "b")
    m = ab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    n = F.col("n").cast("double")
    sa = F.col("sa").cast("double")
    sb = F.col("sb").cast("double")
    cov = n * F.col("sab").cast("double") - sa * sb
    va = n * F.col("saa").cast("double") - sa * sa
    vb = n * F.col("sbb").cast("double") - sb * sb
    r = F.when(
        (va > 0) & (vb > 0), F.round(cov / (F.sqrt(va) * F.sqrt(vb)), 6)
    ).otherwise(F.lit(0.0))
    return m.select(F.col("n").alias("n_docs"), r.alias("r"))


def sql_signal_correlation(
    text_expr: str = "text", len_expr: str = "n_chars"
) -> str:
    w = _sql_words(text_expr)
    return f"""
        WITH tw AS (
            SELECT doc_id, wd AS word
            FROM (SELECT doc_id, unnest({w}) AS wd FROM documents)
            WHERE wd <> ''
        ),
        per AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM (SELECT doc_id, word, count(*) AS c
                  FROM tw GROUP BY doc_id, word)
            GROUP BY doc_id
        ),
        ab AS (
            SELECT (p.n_types * 1000000) // p.n_words AS a,
                   CAST(d.{len_expr} AS BIGINT) AS b
            FROM documents d JOIN per p USING (doc_id)
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(a) AS BIGINT) AS sa,
                   CAST(sum(b) AS BIGINT) AS sb,
                   CAST(sum(a * b) AS BIGINT) AS sab,
                   CAST(sum(a * a) AS BIGINT) AS saa,
                   CAST(sum(b * b) AS BIGINT) AS sbb
            FROM ab
        )
        SELECT n AS n_docs,
               CASE WHEN CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE)
                         * CAST(sa AS DOUBLE) > 0
                     AND CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE)
                         * CAST(sb AS DOUBLE) > 0
                    THEN round((CAST(n AS DOUBLE) * sab
                                - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                               / (sqrt(CAST(n AS DOUBLE) * saa
                                       - CAST(sa AS DOUBLE)
                                         * CAST(sa AS DOUBLE))
                                  * sqrt(CAST(n AS DOUBLE) * sbb
                                         - CAST(sb AS DOUBLE)
                                           * CAST(sb AS DOUBLE))), 6)
                    ELSE 0.0 END AS r
        FROM m
    """


# ---------------------------------------------------------------------------
# T167 — context-window fit profile
# ---------------------------------------------------------------------------
#
# Before committing to a context length (and to T150's packing
# policy), the pipeline wants the one-table answer to "what share of
# each source fits in 1k/4k/16k tokens, and how many tokens would
# truncation at each limit discard?"  Truncation loss is the number
# that matters: a source can be 95% short docs while its token MASS
# lives in the 5% that get cut.
#
# Scale shape: in-row token count (zero exchange) + one map-side-
# combined groupBy(source) of conditional sums — a single scan
# producing every limit's fit share and truncation loss at once.

CONTEXT_LIMITS = (1024, 4096, 16384)


def context_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_docs, total_tokens, fit_1k, fit_4k, fit_16k,
    loss_1k, loss_4k, loss_16k): per-source share of docs within each
    token limit (6dp) and the token share truncation would discard."""
    words = _words(F.col(text_col))
    n_tok = F.size(F.filter(words, lambda w: w != "")).cast("bigint")
    d = docs.select(F.col("source"), n_tok.alias("n_tok"))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    ]
    for lim, tag in zip(CONTEXT_LIMITS, ("1k", "4k", "16k")):
        aggs.append(
            F.sum((F.col("n_tok") <= lim).cast("bigint"))
            .cast("bigint")
            .alias(f"fit_n_{tag}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("n_tok") > lim, F.col("n_tok") - lim).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias(f"loss_n_{tag}")
        )
    per = d.groupBy("source").agg(*aggs)
    cols = [F.col("source"), F.col("n_docs"), F.col("total_tokens")]
    for tag in ("1k", "4k", "16k"):
        cols.append(
            F.round(
                F.col(f"fit_n_{tag}").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias(f"fit_{tag}")
        )
    for tag in ("1k", "4k", "16k"):
        cols.append(
            F.round(
                F.col(f"loss_n_{tag}").cast("double")
                / F.col("total_tokens").cast("double"),
                6,
            ).alias(f"loss_{tag}")
        )
    return per.select(*cols)


def sql_context_fit(text_expr: str = "text") -> str:
    w = _sql_words(text_expr)
    fit_cols, loss_cols = [], []
    for lim, tag in zip(CONTEXT_LIMITS, ("1k", "4k", "16k")):
        fit_cols.append(
            f"round(CAST(sum(CASE WHEN n_tok <= {lim} THEN 1 ELSE 0 END)"
            f" AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fit_{tag}"
        )
        loss_cols.append(
            f"round(CAST(sum(CASE WHEN n_tok > {lim} THEN n_tok - {lim}"
            f" ELSE 0 END) AS DOUBLE)"
            f" / CAST(sum(n_tok) AS DOUBLE), 6) AS loss_{tag}"
        )
    return f"""
        WITH d AS (
            SELECT source,
                   CAST(len(list_filter({w}, x -> x <> '')) AS BIGINT)
                       AS n_tok
            FROM documents
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               {', '.join(fit_cols)},
               {', '.join(loss_cols)}
        FROM d GROUP BY source
    """


# ---------------------------------------------------------------------------
# T170 — word-length histogram (tokenizer byte-budget profile)
# ---------------------------------------------------------------------------
#
# BPE vocabulary sizing starts from the word-length distribution: the
# share of long words bounds how much a merge budget can compress
# (T81 measures fertility AFTER training; this is the pre-training
# view), and a heavy tail of 20+-char "words" is the URL-soup /
# mojibake / CJK-unsegmented signature worth catching before the
# tokenizer ever trains.
#
# Scale shape: one explode + map-side-combined groupBy over ≤ CAP
# integer bins; only (tiny-int, count) pairs shuffle.

WORD_LEN_CAP = 20


def token_len_histogram(
    docs: DataFrame, cap: int = WORD_LEN_CAP, text_col: str = "text"
) -> DataFrame:
    """(len_bin, n_words, share): word-length histogram with lengths
    >= cap collapsed into the cap bin; share 6dp."""
    from pyspark.sql import Window as W

    tw = docs.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    bin_ = F.least(F.length("w"), F.lit(cap)).cast("int")
    per = tw.select(bin_.alias("len_bin")).groupBy("len_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words")
    )
    total = F.sum("n_words").over(W.partitionBy())
    return per.select(
        "len_bin",
        "n_words",
        F.round(
            F.col("n_words").cast("double") / total.cast("double"), 6
        ).alias("share"),
    )


def sql_token_len_histogram(
    cap: int = WORD_LEN_CAP, text_expr: str = "text"
) -> str:
    w = _sql_words(text_expr)
    return f"""
        WITH tw AS (
            SELECT wd FROM (SELECT unnest({w}) AS wd FROM documents)
            WHERE wd <> ''
        ),
        per AS (
            SELECT CAST(least(length(wd), {cap}) AS INTEGER) AS len_bin,
                   CAST(count(*) AS BIGINT) AS n_words
            FROM tw GROUP BY 1
        )
        SELECT len_bin, n_words,
               round(CAST(n_words AS DOUBLE)
                     / CAST(sum(n_words) OVER () AS DOUBLE), 6) AS share
        FROM per
    """


# ---------------------------------------------------------------------------
# T173 — stopword induction (document-frequency ranking)
# ---------------------------------------------------------------------------

# Stopword lists exist for ~100 languages; a web-scale corpus has
# thousands of language/domain mixtures that need their own.  The
# standard induction signal is DOCUMENT frequency, not term frequency:
# a word in 90% of documents carries no retrieval/topical information
# regardless of how often it repeats inside any one page (raw tf —
# vocab_topk's ranking — over-promotes words a few pathological pages
# spam).  Output: the top-k words by df share, each with its df, df
# share, and idf — the exact table BM25 (T90) and tf-idf (T47) would
# consume as a precomputed stopword/idf seed.

STOPWORD_TOPK = 30


def stopword_induction(
    docs: DataFrame, k: int = STOPWORD_TOPK, text_col: str = "text"
) -> DataFrame:
    """(word, df, df_share, idf): top-k words by document frequency.

    Scale shape: the per-document word DEDUP happens in-row
    (array_distinct before the explode), so nothing doc-keyed ever
    shuffles — the only exchange carries (word, partial count) pairs
    after map-side combine, then a TakeOrdered top-k merges k rows per
    partition on the driver.  No global vocabulary sort, no
    (doc_id, word) distinct shuffle.  idf is ln(N/df) from exact
    bigints, 6dp."""
    n_docs = docs.count()
    words = docs.select(
        F.explode(F.array_distinct(_words(F.col(text_col)))).alias("word")
    ).filter(F.col("word") != "")
    df_tab = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    return (
        df_tab.orderBy(F.desc("df"), F.asc("word"))
        .limit(k)
        .select(
            "word",
            "df",
            F.round(
                F.col("df").cast("double") / F.lit(float(n_docs)), 6
            ).alias("df_share"),
            F.round(
                F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
            ).alias("idf"),
        )
    )


def sql_stopword_induction(
    k: int = STOPWORD_TOPK, text_expr: str = "text"
) -> str:
    w = _sql_words(text_expr)
    return f"""
        WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs
                   FROM documents),
        per AS (
            SELECT wd FROM (
                SELECT unnest(list_distinct({w})) AS wd FROM documents
            ) WHERE wd <> ''
        ),
        dft AS (
            SELECT wd AS word, CAST(count(*) AS BIGINT) AS df
            FROM per GROUP BY wd
        )
        SELECT word, df,
               round(CAST(df AS DOUBLE) / n.n_docs, 6) AS df_share,
               round(ln(n.n_docs / CAST(df AS DOUBLE)), 6) AS idf
        FROM dft, n
        ORDER BY df DESC, word ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# T177 — per-language quality deciles WITHOUT a per-document sort
# ---------------------------------------------------------------------------
#
# Quality thresholds must be set PER LANGUAGE (a mean-word-length cut
# tuned on English throws away perfectly good German), which means
# per-language score percentiles over the whole corpus.  The naive
# plan — ntile() partitioned by lang — sorts every document row inside
# each language partition: a full doc-level sort per language, and one
# giant partition for the head language.  This operator instead
# quantizes the score to milli units and aggregates a BOUNDED
# (lang, score_milli) histogram first; the decile boundaries then come
# from a cumulative window over that bounded table only.  Ties (all
# docs at one quantized score level) land in one decile, which is the
# honest semantics for a threshold anyway — a cut can't split docs
# with identical scores.
#
# Scale shape: the per-doc score is a codegen'd in-row expression; the
# only corpus-wide exchange carries (lang, score_milli, partial count)
# after map-side combine (bounded by langs x distinct milli levels);
# the cumulative window and the decile rollup both run over that
# bounded table.  No ntile, no doc-level sort, no skewed head-language
# partition.

DECILES_N = 10


def lang_quality_deciles(
    docs: DataFrame,
    n_buckets: int = DECILES_N,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, decile, n_docs, lo_mwl, hi_mwl): per-language decile
    bands of the mean-word-length quality score.  Scores are exact
    milli units (floor); lo/hi are the band's min/max rendered 3dp;
    decile is ceil(cum * n_buckets / n_lang) over the histogram's
    cumulative count, so every document of one score level shares a
    band."""
    from pyspark.sql import Window as W

    words = F.filter(_words(F.col(text_col)), lambda w: w != "")
    n_words = F.size(words).cast("bigint")
    total_len = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    num = total_len * F.lit(1000)
    score = F.when(n_words > 0, (num - F.pmod(num, n_words)) / n_words).otherwise(
        F.lit(0)
    ).cast("bigint")
    hist = (
        docs.select(F.col(lang_col).alias("lang"), score.alias("mwl_milli"))
        .groupBy("lang", "mwl_milli")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wl = W.partitionBy("lang")
    wcum = (
        W.partitionBy("lang")
        .orderBy("mwl_milli")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n").over(wcum)
    n_lang = F.sum("n").over(wl)
    dec_num = cum * F.lit(n_buckets) + n_lang - F.lit(1)
    decile = ((dec_num - F.pmod(dec_num, n_lang)) / n_lang).cast("bigint")
    return (
        hist.select(
            "lang", "mwl_milli", "n", decile.alias("decile")
        )
        .groupBy("lang", "decile")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.round(F.min("mwl_milli").cast("double") / 1000.0, 3).alias(
                "lo_mwl"
            ),
            F.round(F.max("mwl_milli").cast("double") / 1000.0, 3).alias(
                "hi_mwl"
            ),
        )
        .orderBy("lang", "decile")
    )


def sql_lang_quality_deciles(n_buckets: int = DECILES_N) -> str:
    w = _sql_words("text")
    return f"""
        WITH per AS (
            SELECT lang,
                   CASE WHEN len(list_filter({w}, x -> x <> '')) > 0
                        THEN CAST(
                            (list_sum(list_transform(
                                 list_filter({w}, x -> x <> ''),
                                 x -> length(x))) * 1000)
                            // len(list_filter({w}, x -> x <> ''))
                            AS BIGINT)
                        ELSE 0 END AS mwl_milli
            FROM documents
        ),
        hist AS (
            SELECT lang, mwl_milli, CAST(count(*) AS BIGINT) AS n
            FROM per GROUP BY lang, mwl_milli
        ),
        cumed AS (
            SELECT lang, mwl_milli, n,
                   sum(n) OVER (PARTITION BY lang ORDER BY mwl_milli
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(n) OVER (PARTITION BY lang) AS n_lang
            FROM hist
        )
        SELECT lang,
               CAST((cum * {n_buckets} + n_lang - 1) // n_lang AS BIGINT)
                   AS decile,
               CAST(sum(n) AS BIGINT) AS n_docs,
               round(CAST(min(mwl_milli) AS DOUBLE) / 1000.0, 3) AS lo_mwl,
               round(CAST(max(mwl_milli) AS DOUBLE) / 1000.0, 3) AS hi_mwl
        FROM cumed
        GROUP BY lang, CAST((cum * {n_buckets} + n_lang - 1) // n_lang
                            AS BIGINT)
        ORDER BY lang, decile
    """


# ---------------------------------------------------------------------------
# T178 — source x language affinity (contingency/PMI audit)
# ---------------------------------------------------------------------------
#
# A crawl source that is secretly language-skewed biases every
# source-stratified sample drawn from it; the standard screen is the
# (source, lang) contingency table with observed-vs-expected lift.
# PMI is fixed to integer micro-nats (the repo's transcendental
# contract), so the ranking and values are engine-exact.
#
# Scale shape: ONE map-side-combined (source, lang) count — the
# contingency table is bounded (sources x langs); marginals are
# re-aggregations of that bounded table via windows, never a second
# corpus scan.  At 10^12 rows the wide exchange carries only keyed
# partial counts.

_AFFINITY_SCALE = 1_000_000


def src_lang_affinity(
    docs: DataFrame, source_col: str = "source", lang_col: str = "lang"
) -> DataFrame:
    """(source, lang, n, expected, pmi): observed count, expected
    count under independence (6dp), and ln(observed/expected) in 6dp
    from exact micro-nat integers, per (source, lang) cell."""
    from pyspark.sql import Window as W

    cells = docs.groupBy(
        F.col(source_col).alias("source"), F.col(lang_col).alias("lang")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n_src = F.sum("n").over(W.partitionBy("source"))
    n_lang = F.sum("n").over(W.partitionBy("lang"))
    n_tot = F.sum("n").over(W.partitionBy())
    expected = (
        n_src.cast("double") * n_lang.cast("double") / n_tot.cast("double")
    )
    pmi_micro = F.round(
        F.log(F.col("n").cast("double") / expected)
        * F.lit(float(_AFFINITY_SCALE))
    ).cast("bigint")
    return (
        cells.select(
            "source",
            "lang",
            "n",
            F.round(expected, 6).alias("expected"),
            F.round(
                pmi_micro.cast("double") / F.lit(float(_AFFINITY_SCALE)), 6
            ).alias("pmi"),
        )
        .orderBy("source", "lang")
    )


def sql_src_lang_affinity() -> str:
    s = _AFFINITY_SCALE
    return f"""
        WITH cells AS (
            SELECT source, lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source, lang
        ),
        m AS (
            SELECT source, lang, n,
                   sum(n) OVER (PARTITION BY source) AS n_src,
                   sum(n) OVER (PARTITION BY lang) AS n_lang,
                   sum(n) OVER () AS n_tot
            FROM cells
        )
        SELECT source, lang, n,
               round(CAST(n_src AS DOUBLE) * CAST(n_lang AS DOUBLE)
                     / CAST(n_tot AS DOUBLE), 6) AS expected,
               round(CAST(CAST(round(
                   ln(CAST(n AS DOUBLE)
                      / (CAST(n_src AS DOUBLE) * CAST(n_lang AS DOUBLE)
                         / CAST(n_tot AS DOUBLE))) * {float(s)})
                   AS BIGINT) AS DOUBLE) / {float(s)}, 6) AS pmi
        FROM m
        ORDER BY source, lang
    """


# ---------------------------------------------------------------------------
# T187: pairwise cross-source n-gram containment matrix
# ---------------------------------------------------------------------------
#
# The mixture-governance view of T92's two-way overlap: for every
# ordered source pair (a, b), what fraction of a's distinct shingle
# vocabulary also appears in b?  High containment between two mixture
# components means their token budgets double-count the same text —
# the signal that a cross-source dedup pass (or a weight cut) is
# needed BEFORE training, not after.
#
# Scale shape: one distinct over (source, shingle) bounds the working
# set to vocab x sources; a single groupBy(shingle) collects the
# bounded source set per gram (<= n_sources elements — the documented
# bound: sources are mixture components, dozens at most, NOT hosts);
# pair expansion is therefore <= n_sources^2 per gram and the final
# rollup is map-side combined into <= n_sources^2 rows. The per-source
# totals table is bounded and broadcast. No corpus-wide sort, no
# unbounded state.


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(src_a, src_b, n_both, n_a, containment_ppm) for every ordered
    source pair sharing at least one distinct k-word shingle;
    containment_ppm = floor(1e6 * |grams(a) ∩ grams(b)| / |grams(a)|),
    integer-exact across engines."""
    from ocr_spark.operators.dedup import shingles_col

    g = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col)))
            ).alias("sh"),
        )
        .distinct()
    )
    totals = g.groupBy("src").agg(F.count(F.lit(1)).alias("n_a"))
    pairs = (
        g.groupBy("sh")
        .agg(F.collect_set("src").alias("srcs"))
        .select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a", F.explode("srcs").alias("src_b"))
        .where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(totals.withColumnRenamed("src", "src_a")), "src_a"
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.expr("n_both * 1000000 div n_a").alias("containment_ppm"),
        )
    )


def sql_source_overlap_matrix() -> str:
    from ocr_spark.operators.dedup import sql_shingles

    return f"""
        WITH g AS (
            SELECT DISTINCT src, sh FROM (
                SELECT source AS src,
                       unnest(list_distinct({sql_shingles("text")})) AS sh
                FROM documents)
        ),
        tot AS (SELECT src, count(*) AS n_a FROM g GROUP BY src),
        pair AS (
            SELECT x.src AS src_a, y.src AS src_b, count(*) AS n_both
            FROM g x JOIN g y USING (sh)
            WHERE x.src <> y.src
            GROUP BY 1, 2
        )
        SELECT src_a, src_b,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(n_a AS BIGINT) AS n_a,
               (n_both * 1000000) // n_a AS containment_ppm
        FROM pair JOIN tot ON pair.src_a = tot.src
    """


# ---------------------------------------------------------------------------
# T188: deterministic per-host exemplar sample
# ---------------------------------------------------------------------------
#
# Human-eval / labeling workflows need k exemplar documents per host
# that are (a) stable across reruns and cluster sizes, (b) unbiased
# within the host (no "first k by ingestion order" artifacts). A
# uniform hash order gives both. One hash-partitioned window per
# source; per-host state is the k-row rank counter. At Zipf scale the
# hot host's partition is large but the window carries no buffering
# beyond row_number; AQE skew handling splits it if needed.


def host_exemplars(
    docs: DataFrame,
    k: int = 3,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """(source, rank, doc_id): the k hash-first documents per source
    under a seeded uniform order — rerun-stable and engine-exact."""
    from pyspark.sql import Window

    from ocr_spark.operators.dedup import _hash60

    h = _hash60(F.concat(F.lit("ex:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(F.asc("h"), F.asc(key_col))
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(key_col).alias("doc_id"),
            h.alias("h"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("source", "rank", "doc_id")
    )


def sql_host_exemplars(k: int = 3) -> str:
    h = ("CAST('0x' || substr(md5('ex:' || CAST(doc_id AS VARCHAR)), 1, 15) "
         "AS BIGINT)")
    return f"""
        SELECT source, rank, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source ORDER BY {h} ASC, doc_id ASC
                   ) AS rank
            FROM documents
        ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# T189: referential-integrity audit across warehouse tables
# ---------------------------------------------------------------------------
#
# Every multi-table pipeline needs the FK coverage check before a
# join-dependent stage runs: how many child rows have a parent, how
# many parents have at least one child. One distinct-key projection
# per side, one key-shuffled join per relation, bounded 1-row output
# per relation — the shape survives any scale because only DISTINCT
# keys shuffle (child fan-in collapses map-side).


def referential_integrity(relations) -> "DataFrame":
    """``relations``: list of (name, child_df, child_key, parent_df,
    parent_key). Returns one row per relation: (relation, n_child,
    n_child_matched, child_coverage_ppm, n_parent, n_parent_matched,
    parent_coverage_ppm), counting DISTINCT keys on both sides."""
    outs = []
    for name, child, ckey, parent, pkey in relations:
        # one scan per side: distinct keys flagged, full-outer join,
        # one bounded aggregate. On distinct keys the child-matched
        # and parent-matched counts are both |K_child ∩ K_parent|.
        c = (
            child.select(F.col(ckey).alias("k"))
            .distinct()
            .withColumn("in_c", F.lit(1))
        )
        p = (
            parent.select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("in_p", F.lit(1))
        )
        stats = (
            c.join(p, "k", "full_outer")
            .agg(
                F.count("in_c").alias("n_child"),
                F.sum(
                    (F.col("in_c").isNotNull()
                     & F.col("in_p").isNotNull()).cast("bigint")
                ).alias("n_matched"),
                F.count("in_p").alias("n_parent"),
            )
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                F.col("n_matched").alias("n_child_matched"),
                F.expr(
                    "n_matched * 1000000 div n_child"
                ).alias("child_coverage_ppm"),
                "n_parent",
                F.col("n_matched").alias("n_parent_matched"),
                F.expr(
                    "n_matched * 1000000 div n_parent"
                ).alias("parent_coverage_ppm"),
            )
        )
        outs.append(stats)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_referential_integrity(relations) -> str:
    """DuckDB mirror over the registered table views; ``relations``
    is [(name, child_table, child_key, parent_table, parent_key)]."""
    parts = []
    for name, ct, ck, pt, pk in relations:
        parts.append(f"""
        SELECT '{name}' AS relation,
               (SELECT count(DISTINCT {ck}) FROM {ct}) AS n_child,
               (SELECT count(DISTINCT {ck}) FROM {ct}
                WHERE {ck} IN (SELECT {pk} FROM {pt})) AS n_child_matched,
               ((SELECT count(DISTINCT {ck}) FROM {ct}
                 WHERE {ck} IN (SELECT {pk} FROM {pt})) * 1000000)
                 // (SELECT count(DISTINCT {ck}) FROM {ct})
                 AS child_coverage_ppm,
               (SELECT count(DISTINCT {pk}) FROM {pt}) AS n_parent,
               (SELECT count(DISTINCT {pk}) FROM {pt}
                WHERE {pk} IN (SELECT {ck} FROM {ct})) AS n_parent_matched,
               ((SELECT count(DISTINCT {pk}) FROM {pt}
                 WHERE {pk} IN (SELECT {ck} FROM {ct})) * 1000000)
                 // (SELECT count(DISTINCT {pk}) FROM {pt})
                 AS parent_coverage_ppm
        """)
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# T190: per-column table profile (null / distinct / length bounds)
# ---------------------------------------------------------------------------
#
# The dbt-test / Deequ-style column profile every warehouse runs on
# ingest: null counts, exact distinct cardinality, and value-length
# bounds per column, unpivoted to one governance row per column.
# One scan; the distinct counts are the only shuffled aggregates and
# Spark executes the multi-distinct agg as an expand + single
# exchange — bounded output (n_columns rows).


def table_profile(df: DataFrame, columns) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_len, max_len) per
    requested column; lengths are string lengths of the cast value
    (integer-exact across engines)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.length(s)).alias(f"__mn_{c}"),
            F.max(F.length(s)).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col(f"__nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__mn_{c}").cast("bigint").alias("min_len"),
                F.col(f"__mx_{c}").cast("bigint").alias("max_len"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def sql_table_profile(table: str, columns) -> str:
    parts = []
    for c in columns:
        parts.append(f"""
        SELECT '{c}' AS column,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min(length(CAST({c} AS VARCHAR))) AS BIGINT) AS min_len,
               CAST(max(length(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
        FROM {table}
        """)
    return " UNION ALL ".join(parts)
