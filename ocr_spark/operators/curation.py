"""Post-extraction corpus curation — the C4/Gopher-style cleaning
stages between dedup and tokenization: chunk-level (paragraph-proxy)
global dedup, intra-document repetition rules, PII scrubbing, and
domain-blocklist filtering.

The reference (an OCR task-queue web app) has none of these; they are
the standard curation stack published for web-scale LLM corpora
(C4: Raffel et al. 2020 — sentence/paragraph-level dedup;
Gopher: Rae et al. 2021 — repetition rules; RefinedWeb: Penedo et al.
2023 — URL/domain blocklists, PII handling). Everything here is Spark
built-ins (JVM-side, codegen'd) with a DuckDB SQL mirror generated
from the same constants so the driver's oracle gate covers each op.

Scale notes per op:
* chunk_dedup — the only shuffled payload is (hash60 bigint,
  packed-key bigint): 16 bytes per chunk, never the chunk text, and
  the keep-first winner is a map-side-combinable ``min``. At 10^12
  docs this is the same shape as the minhash signature shuffle that
  dedup.py already proves out.
* repetition_stats — two linear explode→count aggregations keyed by
  (doc_id, gram-hash); no self-join, no O(n²) per-row work, so a
  100k-word doc costs 100k rows, not 10^10 comparisons.
* pii_redact — pure per-row regexp columns; free.
* blocklist_filter — broadcast LEFT ANTI against the blocklist table
  (a real blocklist is millions of domains — still MBs, still
  broadcastable; never a shuffled join).
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import (
    _hash60,
    shingles_col,
    sql_shingles,
    sql_words,
    words_col,
)

# ---------------------------------------------------------------------------
# Chunk-level (paragraph-proxy) global dedup — C4-style keep-first
# ---------------------------------------------------------------------------

CHUNK_WORDS = 20
# doc_id * _PK_STRIDE + chunk_idx packs (doc, idx) into one
# decimal(38,0) (Spark) / HUGEINT (DuckDB) so the keep-first winner is
# a single map-side-combined min(); stride bounds chunks/doc.  The key
# is 16 bytes wide on purpose: a bigint pack overflows for hash-derived
# 63-bit doc_ids (jobs/prepare_documents.py keys docs by
# xxhash64(url)), max doc_id * stride ~ 9.2e23 < 1e38.
_PK_STRIDE = 100_000

# Gopher-style repetition thresholds (count fractions, not char
# fractions — documented deviation; same decision boundary shape).
MAX_TOP_2GRAM_FRAC = 0.20
MAX_DUP_3GRAM_FRAC = 0.30

# RefinedWeb-style domain blocklist (demo list over the synthetic
# `source` column; production swaps in the real million-row table).
BLOCKED_SOURCES = ["src2", "src7", "src13"]

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"

# 60 synthetic boilerplate words (3 exact CHUNK_WORDS-sized chunks)
# prepended to every doc by the demo queries: the shared prefix makes
# chunk-level keep-first dedup discriminating on a corpus whose
# natural text never repeats (mirrors the nav/footer boilerplate every
# real crawl page carries).
BOILERPLATE = " ".join(f"boiler{i}" for i in range(3 * CHUNK_WORDS))


def plant_boilerplate_col(text: Column) -> Column:
    return F.concat(F.lit(BOILERPLATE), F.lit(" "), text)


def sql_plant_boilerplate(text_expr: str = "text") -> str:
    return f"('{BOILERPLATE}' || ' ' || {text_expr})"


def plant_repetition_col(text: Column, key: Column) -> Column:
    """Self-concatenate every 3rd doc so the repetition keep-flag
    fires both ways on the synthetic corpus."""
    return F.when(key % 3 == 0, F.concat(text, F.lit(" "), text)).otherwise(
        text
    )


def sql_plant_repetition(text_expr: str = "text", key_expr: str = "doc_id") -> str:
    return (
        f"(CASE WHEN {key_expr} % 3 = 0 THEN {text_expr} || ' ' || {text_expr} "
        f"ELSE {text_expr} END)"
    )


def chunk_texts_col(text: Column, n: int = CHUNK_WORDS) -> Column:
    """Fixed n-word windows of the doc (the paragraph proxy for a
    corpus with no layout breaks; swap the splitter for
    ``split(text, '\\n\\n')`` when real paragraphs exist)."""
    words = words_col(text)
    n_chunks = F.ceil(F.size(words) / F.lit(float(n))).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - F.lit(1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * n + 1, n))
    )


def chunk_dedup_stats(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = CHUNK_WORDS,
) -> DataFrame:
    """Global keep-first chunk dedup, reported per document:
    (doc_id, n_chunks, n_kept, dup_frac). A chunk is kept iff this
    doc/position is its first occurrence corpus-wide (minimum packed
    (doc_id, idx) key over all rows sharing the chunk's hash60).

    The full C4 pipeline reassembles kept chunks into cleaned text;
    this op returns the per-doc bookkeeping (what a curation run logs
    and thresholds on) while shuffling only 16 bytes per chunk.
    """
    chunks = docs.select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        F.posexplode(chunk_texts_col(F.col(text_col), n)).alias(
            "idx", "chunk"
        ),
    ).select(
        "doc_id",
        (
            F.col("doc_id").cast("decimal(38,0)") * _PK_STRIDE + F.col("idx")
        ).alias("pk"),
        _hash60(F.col("chunk")).alias("h"),
    )
    # Winner per chunk hash: map-side-combined min over a 16-byte
    # decimal (bigint would overflow for hash-derived 63-bit doc_ids:
    # max doc_id * stride ~ 9.2e23 < 1e38).
    winners = chunks.groupBy("h").agg(F.min("pk").alias("wpk"))
    kept = (
        winners.select(
            F.expr(f"CAST(wpk div {_PK_STRIDE} AS BIGINT)").alias("doc_id")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.round(
            F.lit(1.0)
            - F.coalesce("n_kept", F.lit(0)).cast("double")
            / F.col("n_chunks"),
            6,
        ).alias("dup_frac"),
    )


def chunk_dedup_rewrite(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = CHUNK_WORDS,
) -> DataFrame:
    """The C4 REWRITE stage on top of ``chunk_dedup_stats``'s keep-first
    rule: reassemble each document from only its corpus-wide-first
    chunks -> (doc_id, n_kept, clean_text). A doc whose every chunk
    already occurred in a lower-keyed doc disappears entirely.

    Scale shape: the packed winner key alone encodes (doc, idx) —
    ``wpk // stride`` / ``wpk % stride`` recover the keep-set —
    so the global-dedup shuffles carry 8-16 bytes per chunk exactly
    like the stats op, and document text moves once, in the final
    rewrite join against the per-doc keep-index arrays.
    """
    chunks = docs.select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        F.posexplode(chunk_texts_col(F.col(text_col), n)).alias(
            "idx", "chunk"
        ),
    ).select(
        (
            F.col("doc_id").cast("decimal(38,0)") * _PK_STRIDE + F.col("idx")
        ).alias("pk"),
        _hash60(F.col("chunk")).alias("h"),
    )
    winners = chunks.groupBy("h").agg(F.min("pk").alias("wpk"))
    keep = (
        winners.select(
            F.expr(f"CAST(wpk div {_PK_STRIDE} AS BIGINT)").alias("doc_id"),
            (F.col("wpk") % _PK_STRIDE).cast("int").alias("idx"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("keep_idx"))
    )
    return (
        docs.select(
            F.col(key_col).cast("bigint").alias("doc_id"),
            chunk_texts_col(F.col(text_col), n).alias("chs"),
        )
        .join(keep, "doc_id")
        .select(
            "doc_id",
            F.size("keep_idx").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    "keep_idx", lambda i: F.element_at("chs", i + 1)
                ),
            ).alias("clean_text"),
        )
    )


def sql_chunk_dedup_rewrite(
    text_expr: str = "text", n: int = CHUNK_WORDS
) -> str:
    return f"""
        WITH ch AS (
            -- two unnests in one SELECT zip positionally in DuckDB,
            -- matching Spark's posexplode (chunk, idx) pairing
            SELECT doc_id, unnest({sql_chunks(text_expr, n)}) AS chunk,
                   unnest(range(len({sql_chunks(text_expr, n)}))) AS idx
            FROM documents
        ),
        k AS (
            SELECT doc_id, idx, chunk,
                   CAST(doc_id AS HUGEINT) * {_PK_STRIDE} + idx AS pk,
                   CAST('0x' || substr(md5(chunk), 1, 15) AS BIGINT) AS h
            FROM ch
        ),
        win AS (SELECT h, min(pk) AS wpk FROM k GROUP BY h)
        SELECT k.doc_id,
               CAST(count(*) AS INTEGER) AS n_kept,
               string_agg(k.chunk, ' ' ORDER BY k.idx) AS clean_text
        FROM k JOIN win ON k.pk = win.wpk
        GROUP BY k.doc_id
    """


# ---------------------------------------------------------------------------
# Gopher repetition rules
# ---------------------------------------------------------------------------


def _shingles_from_words(words: Column, k: int) -> Column:
    """k-word shingles over a pre-tokenized words array — identical
    construction to ``dedup.shingles_col`` (a doc shorter than k words
    yields one shingle), factored so one tokenize pass can feed
    several gram sizes."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - F.lit(k), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))


def repetition_stats(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition features + keep flag:
    fraction of 2-grams taken by the single most frequent 2-gram, and
    fraction of 3-gram occurrences that are repeats of an
    already-seen 3-gram.

    One tokenize pass feeds both gram sizes: the 2- and 3-gram hashes
    are built from the same words array, exploded once with a k tag,
    and the per-doc stats come out of a single conditional aggregation
    — no second scan, no g2⋈g3 join. Grams are counted by their
    60-bit md5 hash so the shuffle carries 8 bytes per gram instead
    of gram text (collisions are 2^-60-level noise on a count
    statistic); hashes are identical to the two-pass formulation, so
    outputs are bit-identical."""
    tokens = docs.select(
        F.col(key_col).alias("doc_id"),
        words_col(F.col(text_col)).alias("w"),
    )
    def _tagged(k: int) -> Column:
        # NB: transform's lambda must stay unary — a second parameter
        # would be bound to the element INDEX by the HOF protocol
        return F.transform(
            _shingles_from_words(F.col("w"), k),
            lambda s: F.struct(F.lit(k).alias("k"), _hash60(s).alias("g")),
        )

    tagged = tokens.select(
        "doc_id",
        F.explode(F.concat(_tagged(2), _tagged(3))).alias("t"),
    ).select("doc_id", F.col("t.k").alias("k"), F.col("t.g").alias("gram"))
    per_gram = tagged.groupBy("doc_id", "k", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is2, is3 = F.col("k") == 2, F.col("k") == 3
    stats = per_gram.groupBy("doc_id").agg(
        F.max(F.when(is2, F.col("cnt"))).alias("top2_cnt"),
        F.sum(F.when(is2, F.col("cnt"))).alias("total2"),
        F.count(F.when(is3, F.lit(1))).alias("distinct3"),
        F.sum(F.when(is3, F.col("cnt"))).alias("total3"),
    )
    top2 = F.round(
        F.col("top2_cnt").cast("double") / F.greatest("total2", F.lit(1)), 6
    )
    dup3 = F.round(
        F.lit(1.0)
        - F.col("distinct3").cast("double") / F.greatest("total3", F.lit(1)),
        6,
    )
    return stats.select(
        "doc_id",
        top2.alias("top_2gram_frac"),
        dup3.alias("dup_3gram_frac"),
    ).withColumn(
        "keep",
        (F.col("top_2gram_frac") <= MAX_TOP_2GRAM_FRAC)
        & (F.col("dup_3gram_frac") <= MAX_DUP_3GRAM_FRAC),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


SUBSTR_K = 10  # stride-1 gram length (words) for cross-doc substring dedup


def substring_dup_stats(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = SUBSTR_K,
) -> DataFrame:
    """Per-doc cross-document exact-substring duplication: the
    fraction of a doc's k-word gram positions (stride 1 — every word
    offset, unlike ``chunk_dedup_stats``' fixed non-overlapping
    chunks) whose gram also occurs in at least one OTHER document.
    The hashed-gram approximation of suffix-array exact-substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): a shared run of >= k words shows up as a run of
    shared grams, so ``dup_frac`` measures how much of the doc is
    verbatim-copied from elsewhere in the corpus.

    Scale shape: two hash-partitioned aggs and one semi join, ALL on
    60-bit gram hashes (8 bytes per word position through every
    shuffle, never gram text). Linear in corpus word count — the
    stride-1 blow-up vs chunking is exactly k rows per word, the
    price of position-granular detection.
    """
    grams = docs.select(
        F.col(key_col).alias("doc_id"),
        F.explode(
            F.transform(shingles_col(F.col(text_col), k), _hash60)
        ).alias("gram"),
    )
    shared = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    totals = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total_pos")
    )
    dups = (
        grams.join(shared, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_pos"))
    )
    dup_pos = F.coalesce(F.col("dup_pos"), F.lit(0)).cast("bigint")
    frac = F.round(
        dup_pos.cast("double") / F.greatest("total_pos", F.lit(1)), 6
    )
    return (
        totals.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            dup_pos.alias("dup_pos"),
            F.col("total_pos").cast("bigint").alias("total_pos"),
            frac.alias("dup_frac"),
        )
    )


def pii_inject_col(text: Column, key: Column) -> Column:
    """Deterministically plant an email + phone in the doc (the
    synthetic corpus carries none) so the scrubber has real work; a
    production run drops this and scrubs the raw text."""
    return F.concat(
        F.substring(text, 1, 80),
        F.lit(" contact u"),
        key.cast("string"),
        F.lit("@mail"),
        (key % 7).cast("string"),
        F.lit(".example.com or +1-555-"),
        F.lpad((key % 10_000).cast("string"), 4, "0"),
        F.lit(" now"),
    )


def pii_redact(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and redact emails/phones with vectorized JVM regex —
    (doc_id, n_emails, n_phones, redacted). Patterns are plain
    char-class regexes valid in both Java regex and RE2 so the DuckDB
    oracle runs the identical expressions."""
    planted = pii_inject_col(F.col(text_col), F.col(key_col))
    redacted = F.regexp_replace(
        F.regexp_replace(planted, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.size(F.regexp_extract_all(planted, F.lit(PII_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(planted, F.lit(PII_PHONE_RE), 0)).alias(
            "n_phones"
        ),
        redacted.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization (NFC)
# ---------------------------------------------------------------------------

# Planted decomposed sequences (e + combining acute, A + combining
# ring) — the synthetic corpus is ASCII, so without planting the
# normalizer would be checked on a no-op.
NON_NFC_SUFFIX = " cafe\u0301 A\u030a"  # rendered: " café Å"


def plant_non_nfc_col(text: Column) -> Column:
    return F.concat(text, F.lit(NON_NFC_SUFFIX))


def sql_plant_non_nfc(text_expr: str = "text") -> str:
    return f"({text_expr} || ' cafe' || chr(769) || ' A' || chr(778))"


def normalize_nfc(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """NFC normalization — the canonical first step of a crawl text
    pipeline (mixed decomposed/composed forms break exact dedup and
    tokenization).  The Unicode composition tables are intrinsically
    library code, so this is an Arrow-batched ``pandas_udf`` (the
    accepted slow-path shape, like functions/parse.py); the oracle
    checks it against DuckDB's INDEPENDENT utf8proc-based
    ``nfc_normalize`` — two unrelated implementations agreeing on
    bytes.  Emits char counts + digest, not the text, so the gated
    rows stay narrow."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None
            else None
        )

    planted = plant_non_nfc_col(F.col(text_col))
    norm = _nfc(planted)
    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.length(planted).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_nfc"),
        F.md5(F.encode(norm, "utf-8")).alias("digest"),
    )


def sql_normalize_nfc() -> str:
    planted = sql_plant_non_nfc()
    return f"""
        SELECT doc_id,
               length({planted}) AS n_chars_raw,
               length(nfc_normalize({planted})) AS n_chars_nfc,
               md5(nfc_normalize({planted})) AS digest
        FROM documents
    """


# ---------------------------------------------------------------------------
# Domain blocklist filter
# ---------------------------------------------------------------------------


def blocklist_filter(
    spark: SparkSession,
    docs: DataFrame,
    blocked: Iterable[str] = tuple(BLOCKED_SOURCES),
    domain_col: str = "source",
) -> DataFrame:
    """LEFT ANTI against the blocklist as a broadcast table join —
    the shape that still works when the blocklist is a million-row
    table instead of three literals (isin() would inline the list
    into the plan and stop scaling)."""
    bl = spark.createDataFrame(
        [(d,) for d in blocked], f"{domain_col} string"
    )
    return docs.join(F.broadcast(bl), domain_col, "left_anti")


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------


def sql_chunks(text_expr: str, n: int = CHUNK_WORDS) -> str:
    w = sql_words(text_expr)
    return (
        f"list_transform(range(0, greatest(CAST(ceil(len({w}) / {float(n)!r}) "
        f"AS BIGINT), 1)), i -> array_to_string(({w})[i * {n} + 1 : i * {n} + {n}], ' '))"
    )


def sql_chunk_dedup_stats(text_expr: str = "text", n: int = CHUNK_WORDS) -> str:
    return f"""
        WITH ch AS (
            -- two unnests in one SELECT zip positionally in DuckDB,
            -- matching Spark's posexplode (chunk, idx) pairing
            SELECT doc_id, unnest({sql_chunks(text_expr, n)}) AS chunk,
                   unnest(range(len({sql_chunks(text_expr, n)}))) AS idx
            FROM documents
        ),
        k AS (
            SELECT doc_id,
                   CAST(doc_id AS HUGEINT) * {_PK_STRIDE} + idx AS pk,
                   CAST('0x' || substr(md5(chunk), 1, 15) AS BIGINT) AS h
            FROM ch
        ),
        win AS (SELECT h, min(pk) AS wpk FROM k GROUP BY h),
        kept AS (
            SELECT CAST(wpk // {_PK_STRIDE} AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_kept
            FROM win GROUP BY 1
        ),
        tot AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
            FROM k GROUP BY doc_id
        )
        SELECT t.doc_id,
               t.n_chunks,
               CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept,
               round(1.0 - CAST(coalesce(kp.n_kept, 0) AS DOUBLE) / t.n_chunks,
                     6) AS dup_frac
        FROM tot t LEFT JOIN kept kp ON t.doc_id = kp.doc_id
    """


def _sql_gram_stats(k: int, text_expr: str = "text") -> str:
    return f"""
        SELECT doc_id,
               max(cnt) AS top{k}_cnt,
               CAST(sum(cnt) AS BIGINT) AS total{k},
               CAST(count(*) AS BIGINT) AS distinct{k}
        FROM (
            SELECT doc_id, gram, count(*) AS cnt
            FROM (
                SELECT doc_id,
                       CAST('0x' || substr(md5(unnest(
                           {sql_shingles(text_expr, k)})), 1, 15)
                            AS BIGINT) AS gram
                FROM documents
            ) GROUP BY doc_id, gram
        ) GROUP BY doc_id
    """


def sql_substring_dup_stats(text_expr: str = "text", k: int = SUBSTR_K) -> str:
    return f"""
        WITH grams AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(unnest(
                       {sql_shingles(text_expr, k)})), 1, 15)
                        AS BIGINT) AS gram
            FROM documents
        ),
        shared AS (
            SELECT gram FROM grams
            GROUP BY gram HAVING count(DISTINCT doc_id) > 1
        ),
        totals AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS total_pos
            FROM grams GROUP BY doc_id
        ),
        dups AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_pos
            FROM grams
            WHERE gram IN (SELECT gram FROM shared)
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(d.dup_pos, 0) AS dup_pos,
               t.total_pos,
               round(CAST(COALESCE(d.dup_pos, 0) AS DOUBLE)
                     / greatest(t.total_pos, 1), 6) AS dup_frac
        FROM totals t LEFT JOIN dups d USING (doc_id)
    """


def sql_repetition_stats(text_expr: str = "text") -> str:
    return f"""
        WITH g2 AS ({_sql_gram_stats(2, text_expr)}), g3 AS ({_sql_gram_stats(3, text_expr)})
        SELECT g2.doc_id,
               round(CAST(top2_cnt AS DOUBLE) / greatest(total2, 1), 6)
                   AS top_2gram_frac,
               round(1.0 - CAST(distinct3 AS DOUBLE) / greatest(total3, 1), 6)
                   AS dup_3gram_frac,
               (round(CAST(top2_cnt AS DOUBLE) / greatest(total2, 1), 6)
                    <= {MAX_TOP_2GRAM_FRAC}
                AND round(1.0 - CAST(distinct3 AS DOUBLE)
                          / greatest(total3, 1), 6)
                    <= {MAX_DUP_3GRAM_FRAC}) AS keep
        FROM g2 JOIN g3 ON g2.doc_id = g3.doc_id
    """


def sql_pii_redact() -> str:
    planted = (
        "substr(text, 1, 80) || ' contact u' || CAST(doc_id AS STRING)"
        " || '@mail' || CAST(doc_id % 7 AS STRING)"
        " || '.example.com or +1-555-'"
        " || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' now'"
    )
    # DuckDB single-quoted literals pass backslashes through verbatim,
    # so the Python regex strings are usable as-is.
    email = PII_EMAIL_RE
    phone = PII_PHONE_RE
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all({planted}, '{email}')) AS INT)
                   AS n_emails,
               CAST(len(regexp_extract_all({planted}, '{phone}')) AS INT)
                   AS n_phones,
               regexp_replace(
                   regexp_replace({planted}, '{email}', '<EMAIL>', 'g'),
                   '{phone}', '<PHONE>', 'g') AS redacted
        FROM documents
    """


def sql_blocklist_filter(blocked: Iterable[str] = tuple(BLOCKED_SOURCES)) -> str:
    lst = ", ".join(f"'{d}'" for d in blocked)
    return f"""
        SELECT doc_id, source, lang, n_chars FROM documents
        WHERE source NOT IN ({lst})
    """


# ---------------------------------------------------------------------------
# T73 — phrase blocklist (multi-pattern substring matching, Aho-Corasick)
# ---------------------------------------------------------------------------

# ``blocklist_filter`` drops docs by exact domain key; real takedown /
# policy lists are *phrases* matched inside the text (titles, slogans,
# boilerplate snippets), thousands to millions of them.  One Aho-
# Corasick automaton pass matches all patterns simultaneously — the
# classic answer when P patterns make P regex passes unaffordable.
# Counts are greedy non-overlapping (Python ``str.count`` semantics),
# which is exactly what the DuckDB replace()-length oracle computes, so
# parity is by construction.

# Stand-in policy list over the synthetic corpus vocabulary: hitting
# bigrams, a trigram, single words nested inside longer patterns (these
# exercise the automaton's output links), and never-present controls.
BLOCK_PHRASES: Tuple[str, ...] = (
    "table hash",
    "customer join",
    "merge group",
    "big order",
    "merge",
    "hash",
    "slow key vector",
    "entirely absent phrase",
)

# below this many patterns a C-level str.count loop beats automaton
# construction + a per-char Python scan; above it the single-pass
# automaton wins (and is the only option that scales to 10^5+ patterns)
AC_MIN_PATTERNS = 64

_WS_JAVA = " \t\n\x0b\f\r"  # Java regex \s set, matching words_col


def _normalize_ws(text: str) -> str:
    """trim + collapse runs of whitespace to single spaces — the same
    normalization words_col / sql_words apply before tokenizing."""
    import re

    return re.sub(f"[{_WS_JAVA}]+", " ", text or "").strip()


def _ac_build(patterns: List[str]):
    """Aho-Corasick automaton: trie + BFS failure links + output lists.
    Nodes are dicts for goto, parallel lists for fail/out."""
    goto: List[dict] = [{}]
    out: List[List[int]] = [[]]
    for pi, pat in enumerate(patterns):
        node = 0
        for ch in pat:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(pi)
    fail = [0] * len(goto)
    from collections import deque

    q = deque(goto[0].values())
    while q:
        node = q.popleft()
        for ch, nxt in goto[node].items():
            q.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] = out[nxt] + out[fail[nxt]]
    return goto, fail, out


def _count_phrases_ac(text: str, patterns: List[str], automaton) -> dict:
    """Single automaton pass; greedy non-overlapping count per pattern
    (a match is accepted iff it starts after the previous accepted
    match of the SAME pattern ends — str.count semantics)."""
    goto, fail, out = automaton
    counts: dict = {}
    last_end = [-1] * len(patterns)
    node = 0
    for i, ch in enumerate(text):
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for pi in out[node]:
            start = i - len(patterns[pi]) + 1
            if start > last_end[pi]:
                counts[pi] = counts.get(pi, 0) + 1
                last_end[pi] = i
    return counts


def phrase_blocklist(
    docs: DataFrame,
    phrases: Iterable[str] = BLOCK_PHRASES,
    key_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "auto",
) -> DataFrame:
    """Count occurrences of every blocklist phrase in every doc.

    Emits (doc_id, phrase, n_hits) for phrases with >= 1 hit, counting
    greedy non-overlapping occurrences in the whitespace-normalized
    text.  ``engine``: 'auto' picks str.count below AC_MIN_PATTERNS and
    the Aho-Corasick automaton above it; 'count'/'aho' force a path
    (the test asserts both produce identical rows).

    Scale shape: the pattern set ships once per executor inside the
    Arrow-batched UDF closure (a million phrases is ~20 MB — broadcast
    territory, never a join); the corpus is never shuffled — one
    projection, then a generator explode of the per-doc hit list.  The
    automaton makes the scan O(text + hits) regardless of P, the
    property that keeps a 10^5-phrase policy list viable at 100 TB."""
    pats = list(phrases)
    use_ac = engine == "aho" or (engine == "auto" and len(pats) >= AC_MIN_PATTERNS)
    # build once at plan time and ship in the closure (per-batch
    # construction would rebuild it for every Arrow batch)
    automaton = _ac_build(pats) if use_ac else None

    @F.pandas_udf("array<struct<phrase:string,n_hits:bigint>>")
    def _match(texts: pd.Series) -> pd.Series:
        rows = []
        for t in texts:
            norm = _normalize_ws(t)
            if use_ac:
                counts = _count_phrases_ac(norm, pats, automaton)
                hits = [
                    {"phrase": pats[pi], "n_hits": n}
                    for pi, n in sorted(counts.items())
                ]
            else:
                hits = []
                for p in pats:
                    n = norm.count(p)
                    if n:
                        hits.append({"phrase": p, "n_hits": n})
            rows.append(hits)
        return pd.Series(rows)

    return (
        docs.select(F.col(key_col).alias("doc_id"), F.col(text_col))
        .select("doc_id", F.explode(_match(F.col(text_col))).alias("h"))
        .select("doc_id", F.col("h.phrase"), F.col("h.n_hits"))
    )


def sql_phrase_blocklist(phrases: Iterable[str] = BLOCK_PHRASES) -> str:
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in phrases)
    return f"""
        WITH pats AS (SELECT * FROM (VALUES {vals}) AS t(phrase)),
        norm AS (
            SELECT doc_id,
                   trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nt
            FROM documents
        )
        SELECT n.doc_id,
               p.phrase,
               CAST((len(n.nt) - len(replace(n.nt, p.phrase, '')))
                    // len(p.phrase) AS BIGINT) AS n_hits
        FROM norm n CROSS JOIN pats p
        WHERE len(n.nt) - len(replace(n.nt, p.phrase, '')) > 0
    """


# ---------------------------------------------------------------------------
# T75 — boilerplate chunk scrub (corpus-frequency line rule, C4-style)
# ---------------------------------------------------------------------------

# C4 removed lines recurring across the corpus (nav bars, footers,
# cookie banners appear on thousands of pages); chunk_dedup_stats only
# *measures* duplication keep-first.  This op ships the rewrite: any
# chunk appearing in >= min_df distinct docs is boilerplate, and every
# doc is re-emitted without its boilerplate chunks.

BOILER_MIN_DF = 3


def boilerplate_scrub(
    docs: DataFrame,
    min_df: int = BOILER_MIN_DF,
    n: int = CHUNK_WORDS,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chunks, n_dropped, clean_text): docs rewritten
    without their corpus-boilerplate chunks (chunks in >= min_df
    distinct docs), preserving original chunk order.

    Scale shape: the document-frequency count shuffles 8-byte chunk
    hashes only (chunk arrays are built in-row and posexploded without
    text); the boilerplate set is broadcast (boilerplate is by
    definition a tiny set of very frequent chunks); each doc's dropped
    chunk indexes come back as one broadcast-joined array row, and the
    rewrite is an in-row higher-order filter — document text never
    shuffles."""
    key = F.col(key_col)
    h_arr = F.transform(chunk_texts_col(F.col(text_col), n), _hash60)
    ch = docs.select(key.alias("doc_id"), F.posexplode(h_arr).alias("idx", "h"))

    boiler = (
        ch.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    dropped = (
        ch.join(F.broadcast(boiler), "h")
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("drop_idx"))
    )

    chunks = chunk_texts_col(F.col(text_col), n)
    drop = F.coalesce(F.col("drop_idx"), F.array().cast("array<int>"))
    kept = F.filter(chunks, lambda c, i: ~F.array_contains(drop, i))
    return (
        docs.select(key.alias("doc_id"), F.col(text_col))
        .join(F.broadcast(dropped), "doc_id", "left")
        .select(
            "doc_id",
            F.size(chunks).cast("bigint").alias("n_chunks"),
            F.size(drop).cast("bigint").alias("n_dropped"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )


def sql_boilerplate_scrub(
    min_df: int = BOILER_MIN_DF,
    n: int = CHUNK_WORDS,
    text_expr: str = "text",
) -> str:
    return f"""
        WITH ch AS (
            SELECT doc_id, unnest({sql_chunks(text_expr, n)}) AS c,
                   unnest(range(len({sql_chunks(text_expr, n)}))) AS idx
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, idx, c,
                   CAST('0x' || substr(md5(c), 1, 15) AS BIGINT) AS h
            FROM ch
        ),
        boiler AS (
            SELECT h FROM hashed
            GROUP BY h HAVING count(DISTINCT doc_id) >= {min_df}
        )
        SELECT k.doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(b.h) AS BIGINT) AS n_dropped,
               coalesce(string_agg(CASE WHEN b.h IS NULL THEN k.c END,
                                   ' ' ORDER BY k.idx), '') AS clean_text
        FROM hashed k LEFT JOIN boiler b ON k.h = b.h
        GROUP BY k.doc_id
    """


# ---------------------------------------------------------------------------
# T86 — local line/paragraph rules (C4's per-line filters)
# ---------------------------------------------------------------------------
#
# C4's cheapest text filters are LOCAL per line: too few words, policy
# mentions ("javascript", cookie banners, lorem-ipsum filler), list
# markup.  boilerplate_scrub (T75) needs a corpus-wide DF count; these
# rules need nothing but the line itself — an in-row higher-order
# filter, zero shuffle, zero Python, applicable before any corpus-wide
# stage.  Chunks stand in for lines (chunk_texts_col's documented
# paragraph proxy).

LINE_MIN_WORDS = 4
LINE_POLICY_RE = r"(javascript|cookie|lorem ipsum)"
LINE_MARKUP_RE = r"^[*-] "

_LINE_POLICY_PLANT = " ".join(
    ["click here to accept the cookie banner javascript required"]
    + ["pad"] * (CHUNK_WORDS - 9)
)
_LINE_MARKUP_PLANT = "* " + " ".join(["item"] * (CHUNK_WORDS - 1))


def plant_bad_lines_col(text: Column, key: Column) -> Column:
    """Plant one policy chunk (%9) and one markup chunk (%15), each
    padded to a full chunk so neighbours' boundaries stay put."""
    return F.concat(
        F.when(key % 9 == 0, F.lit(_LINE_POLICY_PLANT + " ")).otherwise(
            F.lit("")
        ),
        F.when(key % 15 == 0, F.lit(_LINE_MARKUP_PLANT + " ")).otherwise(
            F.lit("")
        ),
        text,
    )


def sql_plant_bad_lines(
    text_expr: str = "text", key_expr: str = "doc_id"
) -> str:
    return f"""(
        CASE WHEN {key_expr} % 9 = 0
             THEN '{_LINE_POLICY_PLANT} ' ELSE '' END
        || CASE WHEN {key_expr} % 15 = 0
                THEN '{_LINE_MARKUP_PLANT} ' ELSE '' END
        || {text_expr}
    )"""


def line_rules(
    docs: DataFrame,
    min_words: int = LINE_MIN_WORDS,
    key_col: str = "doc_id",
    text_col: str = "text",
    plant: bool = True,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_text): apply C4's local line
    rules — drop lines under ``min_words`` words, lines mentioning
    javascript/cookie/lorem-ipsum policy text, and list-markup lines —
    and re-emit the doc from the survivors, order preserved.
    ``plant=True`` injects the oracle's bad-line fixtures; production
    callers (jobs/curate.py) pass plant=False to scrub real text.

    Scale shape: one transform+filter over the in-row chunk array; no
    shuffle, no corpus-wide state, no Python (plan-asserted) — this is
    the filter that runs FIRST at 10^12 rows because it costs a scan."""
    key = F.col(key_col)
    planted = (
        plant_bad_lines_col(F.col(text_col), key)
        if plant
        else F.col(text_col)
    )
    lines = chunk_texts_col(planted)

    def keep(c):
        return (
            (F.size(F.split(c, " ")) >= min_words)
            & ~F.lower(c).rlike(LINE_POLICY_RE)
            & ~c.rlike(LINE_MARKUP_RE)
        )

    kept = F.filter(lines, keep)
    return docs.select(
        key.alias("doc_id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def clean_lines_col(text: Column, min_words: int = LINE_MIN_WORDS) -> Column:
    """The line_rules rewrite as ONE column expression — for pipeline
    callers (jobs/curate.py) that must stay join-free: a rewrite
    joined back onto its own source doubles the plan subtree, and a
    chain of such self-joins grows the lineage exponentially."""
    lines = chunk_texts_col(text)
    kept = F.filter(
        lines,
        lambda c: (
            (F.size(F.split(c, " ")) >= min_words)
            & ~F.lower(c).rlike(LINE_POLICY_RE)
            & ~c.rlike(LINE_MARKUP_RE)
        ),
    )
    return F.array_join(kept, " ")


def sql_line_rules(min_words: int = LINE_MIN_WORDS) -> str:
    planted = sql_plant_bad_lines()
    ch = sql_chunks("t")
    return f"""
        WITH p AS (
            SELECT doc_id, {planted} AS t FROM documents
        ),
        l AS (SELECT doc_id, {ch} AS lines FROM p),
        k AS (
            SELECT doc_id, lines,
                   list_filter(lines, c ->
                       len(string_split(c, ' ')) >= {min_words}
                       AND NOT regexp_matches(lower(c), '{LINE_POLICY_RE}')
                       AND NOT regexp_matches(c, '{LINE_MARKUP_RE}')
                   ) AS kept
            FROM l
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               array_to_string(kept, ' ') AS clean_text
        FROM k
    """


# ---------------------------------------------------------------------------
# T87 — mojibake detection + digraph repair
# ---------------------------------------------------------------------------
#
# Crawl text is full of UTF-8 bytes decoded as Latin-1 (U+00C3 U+00A9
# where e-acute was meant; U+00E2 U+0080 U+0099 for a right quote).
# Full repair is ftfy's job; the workhorse core is (a) a detector
# counting the characteristic lead-byte digraphs and (b) a bounded
# digraph -> char mapping applied as chained replaces — both pure
# column expressions, so the 10^12-row pass costs a scan and the
# DuckDB oracle matches byte-for-byte.  Damaged sequences are spelled
# as escapes throughout: their raw forms contain C1 control chars.

MOJIBAKE_MAP = [
    ("\xc3\xa9", "\xe9"),            # mangled e-acute
    ("\xc3\xa8", "\xe8"),            # mangled e-grave
    ("\xe2\x80\x99", "’"),      # mangled right single quote
    ("\xe2\x80\x9c", "“"),      # mangled left double quote
]
MOJIBAKE_RE = "(\xc3.|\xe2.)"

# Planted damage: two repairable digraphs + one detect-only (mangled
# u-umlaut \xc3\xbc, NOT in the map), so n_hits can exceed the
# repairs made.
_MOJIBAKE_PLANT = " caf\xc3\xa9 don\xe2\x80\x99t \xc3\xbcber"


def plant_mojibake_col(text: Column, key: Column) -> Column:
    return F.when(
        key % 21 == 0, F.concat(text, F.lit(_MOJIBAKE_PLANT))
    ).otherwise(text)


def sql_plant_mojibake(
    text_expr: str = "text", key_expr: str = "doc_id"
) -> str:
    return (
        f"(CASE WHEN {key_expr} % 21 = 0 THEN {text_expr} || "
        f"'{_MOJIBAKE_PLANT}' ELSE {text_expr} END)"
    )


def repair_mojibake_col(text: Column) -> Column:
    """The digraph repair as ONE column expression (join-free pipeline
    form, same rationale as clean_lines_col)."""
    fixed = text
    for bad, good in MOJIBAKE_MAP:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return fixed


def mojibake_stats(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    plant: bool = True,
) -> DataFrame:
    """(doc_id, n_hits, had_mojibake, text_fixed): count encoding-
    damage digraphs and repair the mapped ones with chained replaces.
    Zero shuffle, zero Python.  ``plant=False`` for production callers
    (jobs/curate.py) — no fixture damage injected."""
    key = F.col(key_col)
    planted = (
        plant_mojibake_col(F.col(text_col), key) if plant else F.col(text_col)
    )
    fixed = repair_mojibake_col(planted)
    n_hits = F.regexp_count(planted, F.lit(MOJIBAKE_RE)).cast("bigint")
    return docs.select(
        key.alias("doc_id"),
        n_hits.alias("n_hits"),
        (n_hits > 0).alias("had_mojibake"),
        fixed.alias("text_fixed"),
    )


def sql_mojibake_stats() -> str:
    planted = sql_plant_mojibake()
    fixed = planted
    for bad, good in MOJIBAKE_MAP:
        fixed = f"replace({fixed}, '{bad}', '{good}')"
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all({planted}, '{MOJIBAKE_RE}'))
                    AS BIGINT) AS n_hits,
               len(regexp_extract_all({planted}, '{MOJIBAKE_RE}')) > 0
                   AS had_mojibake,
               {fixed} AS text_fixed
        FROM documents
    """


# ---------------------------------------------------------------------------
# T140 — full-repertoire encoding repair (the fix side of T87)
# ---------------------------------------------------------------------------
#
# T87's detector + 4-entry demo map flags damage; a curation pipeline
# also REPAIRS it (the ftfy workhorse case: UTF-8 bytes decoded as
# cp1252/Latin-1, sometimes twice).  The full digraph table is
# GENERATED, not hand-listed: for every character in the Latin-1
# Supplement, the cp1252 punctuation block, and the five C1 fallback
# holes, the damaged key is its UTF-8 bytes re-decoded as cp1252
# (latin-1 fallback for the holes) — injective, so the longest-first
# replace chain is an exact inverse of the mangle.  Two chained
# passes repair doubly-mangled text (pass cascades can fix deeper
# nestings opportunistically; ``n_passes`` reports how many passes
# changed the row, a lower bound on the true nesting).  Everything is
# one in-row projection — zero exchange, zero Python per row — and
# the DuckDB oracle is generated from the SAME table, so the gate is
# byte-for-byte.  At 10^12 rows this is a pure scan; the ~330-node
# replace chain is a one-time codegen cost.


def _cp1252_render(b: bytes) -> str:
    """How ``b`` looks after a cp1252 mis-decode (latin-1 fallback for
    the five bytes cp1252 leaves undefined — what lenient decoders
    emit)."""
    out = []
    for x in b:
        try:
            out.append(bytes([x]).decode("cp1252"))
        except UnicodeDecodeError:  # 0x81 0x8D 0x8F 0x90 0x9D
            out.append(chr(x))
    return "".join(out)


def _mojibake_full_table() -> List[Tuple[str, str]]:
    chars = [chr(c) for c in range(0xA0, 0x100)]  # Latin-1 Supplement
    # the cp1252 punctuation block (every printable 0x80-0x9F char)
    chars += [_cp1252_render(bytes([b])) for b in range(0x80, 0xA0)
              if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
    # the five holes render as C1 controls; repairing them makes the
    # two-pass fix exact for targets whose UTF-8 hits those bytes
    # (e.g. mangled-twice 'Á' passes through U+0081)
    chars += [chr(c) for c in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
    pairs = [(_cp1252_render(c.encode("utf-8")), c) for c in chars]
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return pairs


MOJIBAKE_FULL = _mojibake_full_table()


def mangle_utf8_as_cp1252(s: str) -> str:
    """The damage being repaired (used to build plants and tests)."""
    return _cp1252_render(s.encode("utf-8"))


def repair_encoding_col(text: Column) -> Column:
    """One full-repertoire repair pass as a single column chain."""
    fixed = text
    for bad, good in MOJIBAKE_FULL:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return fixed


def _sql_repair_chunks(expr: str, chunk: int = 60) -> List[str]:
    """The repair chain as a list of nested-replace expressions, each
    at most ``chunk`` deep (DuckDB caps expression recursion at 128);
    feed each element the previous stage's output column."""
    out = []
    for i in range(0, len(MOJIBAKE_FULL), chunk):
        e = expr if not out else "__x__"
        for bad, good in MOJIBAKE_FULL[i : i + chunk]:
            b = bad.replace("'", "''")
            g = good.replace("'", "''")
            e = f"replace({e}, '{b}', '{g}')"
        out.append(e)
    return out


# plants: one singly- and one doubly-mangled suffix (hole-free chars,
# so the literals carry no C1 controls into SQL strings)
_REPAIR_SINGLE_PLANT = mangle_utf8_as_cp1252(" caf\xe9 don’t \xfcber")
_REPAIR_DOUBLE_PLANT = mangle_utf8_as_cp1252(
    mangle_utf8_as_cp1252(" na\xefve fianc\xe9e")
)


def mojibake_repair(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    plant: bool = True,
) -> DataFrame:
    """(doc_id, n_passes, chars_saved, text_fixed): full-repertoire
    encoding repair, two chained passes. ``plant=False`` for
    production callers."""
    key = F.col(key_col)
    text = F.col(text_col)
    if plant:
        text = (
            F.when(key % 35 == 0, F.concat(text, F.lit(_REPAIR_DOUBLE_PLANT)))
            .when(key % 21 == 0, F.concat(text, F.lit(_REPAIR_SINGLE_PLANT)))
            .otherwise(text)
        )
    d1 = repair_encoding_col(text)
    d2 = repair_encoding_col(d1)
    n_passes = (
        F.when(d2 != d1, F.lit(2))
        .when(d1 != text, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )
    return docs.select(
        key.alias("doc_id"),
        n_passes.alias("n_passes"),
        (F.length(text) - F.length(d2)).cast("bigint").alias("chars_saved"),
        d2.alias("text_fixed"),
    )


def sql_mojibake_repair() -> str:
    sp = _REPAIR_SINGLE_PLANT.replace("'", "''")
    dp = _REPAIR_DOUBLE_PLANT.replace("'", "''")
    planted = (
        f"(CASE WHEN doc_id % 35 = 0 THEN text || '{dp}' "
        f"WHEN doc_id % 21 = 0 THEN text || '{sp}' ELSE text END)"
    )
    ctes = [f"p AS (SELECT doc_id, {planted} AS t FROM documents)"]
    prev = "p"

    def add_pass(in_col, out_col):
        nonlocal prev
        chunks = _sql_repair_chunks(in_col)
        carry = "doc_id, t" + ("" if in_col == "t" else f", {in_col}")
        for j, e in enumerate(chunks):
            name = f"{out_col}_{j}"
            col = out_col if j == len(chunks) - 1 else "__x__"
            ctes.append(
                f"{name} AS (SELECT {carry}, {e} AS {col} FROM {prev})"
            )
            prev = name

    add_pass("t", "d1")
    add_pass("d1", "d2")
    return f"""
        WITH {', '.join(ctes)}
        SELECT doc_id,
               CAST(CASE WHEN d2 <> d1 THEN 2
                         WHEN d1 <> t THEN 1 ELSE 0 END AS INTEGER)
                   AS n_passes,
               CAST(length(t) - length(d2) AS BIGINT) AS chars_saved,
               d2 AS text_fixed
        FROM {prev}
    """


# ---------------------------------------------------------------------------
# T120 — overlapping chunk windows (RAG / context packing)
# ---------------------------------------------------------------------------
#
# Retrieval corpora and long-context packers consume documents as
# overlapping fixed-size character windows (chunk size W, stride S <
# W, so consecutive chunks share W-S chars of context).  The operator
# is a pure NARROW transformation — sequence + explode + substr inside
# whole-stage codegen, no shuffle at any scale — and the bounded
# explode factor (len/S) is the only cost.  Emitting the md5 alongside
# the span keeps downstream chunk-level dedup (T25) joinable without
# re-reading text.

CHUNK_W = 400
CHUNK_S = 300


def chunk_windows(
    docs: DataFrame,
    width: int = CHUNK_W,
    stride: int = CHUNK_S,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, start, chunk_len, chunk_md5): overlapping
    windows covering the whole text; a doc shorter than ``width``
    yields exactly one chunk.  Chunk count = 1 + max(0,
    ceil((len-width)/stride)) — integer math shared with the oracle."""
    n = F.length(F.col(text_col))
    extra = F.when(
        n > width,
        F.floor((n - width + stride - 1) / stride).cast("int"),
    ).otherwise(F.lit(0))
    chunks = docs.select(
        key_col,
        text_col,
        F.explode(F.sequence(F.lit(0), extra)).alias("chunk_id"),
    )
    chunk = F.col(text_col).substr(
        (F.col("chunk_id") * stride + 1).cast("int"), F.lit(width)
    )
    return chunks.select(
        key_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("bigint").alias("start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


def sql_chunk_windows(width: int = CHUNK_W, stride: int = CHUNK_S) -> str:
    n_extra = (
        f"CASE WHEN length(text) > {width} "
        f"THEN (length(text) - {width} + {stride - 1}) // {stride} "
        f"ELSE 0 END"
    )
    return f"""
        WITH exploded AS (
            SELECT doc_id, text,
                   unnest(range(0, {n_extra} + 1)) AS chunk_id
            FROM documents
        )
        SELECT doc_id,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(chunk_id * {stride} AS BIGINT) AS start,
               CAST(length(substr(text, CAST(chunk_id * {stride} + 1 AS INT),
                                  {width})) AS BIGINT) AS chunk_len,
               md5(substr(text, CAST(chunk_id * {stride} + 1 AS INT),
                          {width})) AS chunk_md5
        FROM exploded
    """


# ---------------------------------------------------------------------------
# T129 — compression-ratio quality signal
# ---------------------------------------------------------------------------
#
# The deflate ratio is the classic cheap spam/template detector
# (used alongside repetition rules in Gopher/RefinedWeb-class
# pipelines): machine-generated and templated pages compress far
# below organic prose.  zlib is stdlib and deterministic at a fixed
# level, but not SQL-expressible — so this op is Arrow-batched
# (``pandas_udf``, the accepted Python seam) and pytest-gated with
# planted compressible/incompressible rows; the surrounding plan is a
# narrow projection.

COMPRESS_LEVEL = 6
COMPRESS_SPAM_MAX_RATIO = 0.35   # below this, flag as templated/spammy


def compression_ratio(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    level: int = COMPRESS_LEVEL,
    spam_max_ratio: float = COMPRESS_SPAM_MAX_RATIO,
) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio, templated): deflate
    ratio of the UTF-8 text at a fixed level; ``templated`` flags
    ratios below ``spam_max_ratio``.  Empty docs get ratio 1.0."""
    import pandas as pd

    @F.pandas_udf("bigint")
    def _zlen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    n_bytes = F.octet_length(F.col(text_col)).cast("bigint")
    out = docs.select(
        F.col(key_col).alias("doc_id"),
        n_bytes.alias("n_bytes"),
        _zlen(F.col(text_col)).alias("n_compressed"),
    )
    ratio = F.when(F.col("n_bytes") == 0, F.lit(1.0)).otherwise(
        F.round(
            F.col("n_compressed").cast("double")
            / F.col("n_bytes").cast("double"),
            6,
        )
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        ratio.alias("ratio"),
        (ratio < spam_max_ratio).alias("templated"),
    )


# ---------------------------------------------------------------------------
# T131 — corpus-wide boilerplate-line scrub (line-level dedup)
# ---------------------------------------------------------------------------
#
# RefinedWeb-style line-level dedup: navigation/footer lines repeat
# across a host's every page ("Home | About | Contact") and survive
# per-document heuristics because each page contains them once.  The
# corpus-wide rule — drop any line occurring in >= LINE_DUP_MIN
# distinct documents — removes them everywhere at once.  The synthetic
# corpus is single-line, so the operator plants a deterministic nav +
# subscribe header per host (every branch gets real work) and the
# oracle replays the identical construction.
#
# Scale shape (same as T82's chunk rewrite): the frequency agg and
# the rebuild join are keyed on the line's 60-bit hash — the exchange
# carries (h, doc_id, pos) plus each line's text ONCE for the
# rebuild; the per-doc reassembly sorts each doc's own lines only
# (array_sort over collect_list, no global sort).

LINE_DUP_MIN = 5


def _planted_page(docs: DataFrame) -> DataFrame:
    """(doc_id, page): text prefixed with two per-host boilerplate
    lines — column expressions shared with the SQL mirror."""
    page = F.concat(
        F.lit("Home | About | "), F.col("source"), F.lit("\n"),
        F.lit("Subscribe to "), F.col("source"), F.lit("\n"),
        F.col("text"),
    )
    return docs.select("doc_id", page.alias("page"))


def line_dedup_scrub(docs: DataFrame, min_docs: int = LINE_DUP_MIN) -> DataFrame:
    """(doc_id, n_lines, n_removed, clean_md5): every line occurring
    in >= min_docs distinct documents removed, remaining lines
    rejoined in order; md5 of the cleaned text keeps the result row
    narrow."""
    from ocr_spark.operators.dedup import _hash60

    lines = _planted_page(docs).select(
        "doc_id",
        F.posexplode(F.split(F.col("page"), "\n")).alias("pos", "line"),
    ).withColumn("h", _hash60(F.col("line")))
    freq = lines.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    tagged = lines.join(freq, "h")
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("n_docs") < min_docs,
                        F.struct(F.col("pos"), F.col("line")),
                    )
                )
            ),
            lambda s: s.line,
        ),
        "\n",
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum((F.col("n_docs") >= min_docs).cast("bigint")).alias(
            "n_removed"
        ),
        F.md5(kept_text).alias("clean_md5"),
    )


def sql_line_dedup_scrub(min_docs: int = LINE_DUP_MIN) -> str:
    return f"""
        WITH pages AS (
            SELECT doc_id,
                   'Home | About | ' || source || chr(10) ||
                   'Subscribe to ' || source || chr(10) || text AS page
            FROM documents
        ),
        lines AS (
            SELECT doc_id,
                   unnest(range(1, len(string_split(page, chr(10))) + 1))
                       - 1 AS pos,
                   unnest(string_split(page, chr(10))) AS line
            FROM pages
        ),
        freq AS (
            SELECT line, count(DISTINCT doc_id) AS n_docs
            FROM lines GROUP BY line
        )
        SELECT l.doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN f.n_docs >= {min_docs} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               md5(COALESCE(array_to_string(
                   list(l.line ORDER BY l.pos)
                       FILTER (WHERE f.n_docs < {min_docs}),
                   chr(10)), '')) AS clean_md5
        FROM lines l JOIN freq f USING (line)
        GROUP BY l.doc_id
    """


# ---------------------------------------------------------------------------
# T153 — license-marker classification
# ---------------------------------------------------------------------------
#
# License-aware corpus assembly (The Stack, permissively-licensed code
# subsets, CC-BY web partitions) starts with a cheap in-row scan for
# the handful of phrases that pin a document's license posture.  The
# classifier is DELIBERATELY marker-based — it answers "what did the
# document declare", not "what is legally true" — and the priority
# order encodes the curation policy: an explicit grant (permissive /
# CC) overrides reflexive all-rights-reserved boilerplate, which in
# turn overrides silence.
#
# Scale shape: pure per-row lower()+contains() columns — zero
# exchanges, whole-stage codegen; the rollup the dataset card wants is
# one bounded groupBy(license).

_LICENSE_PERMISSIVE = ("apache license", "mit license", "bsd license")
_LICENSE_CC = ("creative commons", "cc-by", "cc by")
_LICENSE_RESTRICTED = ("all rights reserved", "copyright (c)")
LICENSE_KEEP = ("permissive", "cc", "none")


def _any_marker(low: Column, markers: Tuple[str, ...]) -> Column:
    hit = F.lit(False)
    for m in markers:
        hit = hit | low.contains(m)
    return hit


def license_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, license, keep): marker-based license class with the
    grant-overrides-boilerplate priority; keep = class in
    LICENSE_KEEP."""
    low = F.lower(F.col(text_col))
    lic = (
        F.when(_any_marker(low, _LICENSE_PERMISSIVE), F.lit("permissive"))
        .when(_any_marker(low, _LICENSE_CC), F.lit("cc"))
        .when(_any_marker(low, _LICENSE_RESTRICTED), F.lit("restricted"))
        .otherwise(F.lit("none"))
    )
    return docs.select(
        "doc_id",
        lic.alias("license"),
        lic.isin(*LICENSE_KEEP).alias("keep"),
    )


def sql_license_filter(text_expr: str = "text") -> str:
    def any_of(markers: Tuple[str, ...]) -> str:
        return " OR ".join(
            f"contains(lower({text_expr}), '{m}')" for m in markers
        )

    keep = ", ".join(f"'{k}'" for k in LICENSE_KEEP)
    return f"""
        WITH c AS (
            SELECT doc_id,
                   CASE WHEN {any_of(_LICENSE_PERMISSIVE)} THEN 'permissive'
                        WHEN {any_of(_LICENSE_CC)} THEN 'cc'
                        WHEN {any_of(_LICENSE_RESTRICTED)} THEN 'restricted'
                        ELSE 'none' END AS license
            FROM documents
        )
        SELECT doc_id, license, license IN ({keep}) AS keep
        FROM c
    """


# ---------------------------------------------------------------------------
# T154 — code-vs-prose detection
# ---------------------------------------------------------------------------
#
# Mixed crawls carry source code, and the mixture wants it IDENTIFIED
# (routed to a code subset or weighted separately), not silently
# diluting the prose quality stats.  Two cheap in-row signals agree
# well enough for routing: the density of code-punctuation characters
# ({}();=<>[]#) and hits on language-keyword markers with their
# trailing-space/syntax context.  Thresholds: symbol density alone
# above CODE_SYM_HI, or a lower density corroborated by >=2 keyword
# markers.
#
# Scale shape: per-row length/regexp/contains columns — zero
# exchanges, codegen'd; the marker list is a fixed literal chain, not
# a UDF.

CODE_SYM_HI = 0.08
CODE_SYM_LO = 0.03
_CODE_SYM_RE = r"[{}();=<>\[\]#]"
_CODE_KEYWORDS = (
    "def ",
    "return ",
    "import ",
    "#include",
    "function(",
    "void ",
    "public static",
    "=> ",
)


def code_detect(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sym_ratio, kw_hits, is_code): code-punctuation density
    (6dp), keyword-marker hit count, and the routing verdict."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_sym = n_chars - F.length(F.regexp_replace(text, _CODE_SYM_RE, ""))
    ratio = F.when(n_chars > 0, F.round(
        n_sym.cast("double") / n_chars.cast("double"), 6
    )).otherwise(F.lit(0.0))
    kw = sum(
        (text.contains(k).cast("int") for k in _CODE_KEYWORDS),
        F.lit(0),
    ).cast("int")
    return docs.select(
        "doc_id",
        ratio.alias("sym_ratio"),
        kw.alias("kw_hits"),
        (
            (ratio >= CODE_SYM_HI)
            | ((ratio >= CODE_SYM_LO) & (kw >= 2))
        ).alias("is_code"),
    )


def sql_code_detect(text_expr: str = "text") -> str:
    kw = " + ".join(
        f"CAST(contains({text_expr}, '{k.replace(chr(39), chr(39)*2)}') AS INTEGER)"
        for k in _CODE_KEYWORDS
    )
    ratio = (
        f"CASE WHEN length({text_expr}) > 0 THEN "
        f"round(CAST(length({text_expr}) - length(regexp_replace("
        f"{text_expr}, '{_CODE_SYM_RE}', '', 'g')) AS DOUBLE)"
        f" / CAST(length({text_expr}) AS DOUBLE), 6) ELSE 0.0 END"
    )
    return f"""
        WITH c AS (
            SELECT doc_id, {ratio} AS sym_ratio, {kw} AS kw_hits
            FROM documents
        )
        SELECT doc_id, sym_ratio, CAST(kw_hits AS INTEGER) AS kw_hits,
               sym_ratio >= {CODE_SYM_HI}
               OR (sym_ratio >= {CODE_SYM_LO} AND kw_hits >= 2) AS is_code
        FROM c
    """


# ---------------------------------------------------------------------------
# T166 — extraction-residue audit (markup leftovers per host)
# ---------------------------------------------------------------------------
#
# The flagship extractor's output contract is clean text; the cheapest
# regression tripwire for it (or for any upstream extractor whose
# output lands in `text`) is counting documents that still carry
# markup residue — tag fragments, unresolved character entities, CSS
# braces.  Grouped per host because extraction failures are template-
# correlated: one host's new page layout breaks the boilerplate
# heuristics for every page it serves, and the per-host residue rate
# jumps while the corpus average barely moves.
#
# Scale shape: three per-row regexp/contains columns (zero exchange,
# codegen) + one map-side-combined groupBy(host).

_TAG_RE = r"<[a-zA-Z/][^>]*>"
_ENTITY_RE = r"&[a-zA-Z]{2,8};|&#[0-9]{1,6};"


def residue_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_tag, n_entity, n_css, residue_rate): per-host
    counts of docs with tag fragments / unresolved entities / CSS-ish
    brace runs, and the any-residue doc rate (6dp)."""
    text = F.col(text_col)
    has_tag = (F.length(F.regexp_extract(text, _TAG_RE, 0)) > 0).cast(
        "bigint"
    )
    has_ent = (F.length(F.regexp_extract(text, _ENTITY_RE, 0)) > 0).cast(
        "bigint"
    )
    has_css = (
        text.contains("{") & text.contains("}") & text.contains(":")
    ).cast("bigint")
    any_res = F.greatest(has_tag, has_ent, has_css)
    return (
        docs.select(
            F.col("source").alias("host"),
            has_tag.alias("t"),
            has_ent.alias("e"),
            has_css.alias("c"),
            any_res.alias("a"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("n_tag"),
            F.sum("e").cast("bigint").alias("n_entity"),
            F.sum("c").cast("bigint").alias("n_css"),
            F.round(
                F.sum("a").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("residue_rate"),
        )
    )


def sql_residue_audit(text_expr: str = "text") -> str:
    tag = f"CASE WHEN regexp_matches({text_expr}, '{_TAG_RE}') THEN 1 ELSE 0 END"
    ent = (
        f"CASE WHEN regexp_matches({text_expr}, '{_ENTITY_RE}')"
        " THEN 1 ELSE 0 END"
    )
    css = (
        f"CASE WHEN contains({text_expr}, '{{') AND contains({text_expr}, '}}')"
        f" AND contains({text_expr}, ':') THEN 1 ELSE 0 END"
    )
    return f"""
        WITH d AS (
            SELECT source AS host, {tag} AS t, {ent} AS e, {css} AS c,
                   greatest({tag}, {ent}, {css}) AS a
            FROM documents
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(t) AS BIGINT) AS n_tag,
               CAST(sum(e) AS BIGINT) AS n_entity,
               CAST(sum(c) AS BIGINT) AS n_css,
               round(CAST(sum(a) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                   AS residue_rate
        FROM d GROUP BY host
    """


# ---------------------------------------------------------------------------
# T168 — templated-intro share (prefix duplication per host)
# ---------------------------------------------------------------------------
#
# Template farms and CMS boilerplate give thousands of documents the
# SAME first paragraph while the tails differ enough to dodge
# whole-document dedup; line-level (T131) and chunk-level (T25)
# scrubs catch repeated content anywhere, but the prefix-specific
# view answers the curation question directly — "how much of this
# host is one intro template?" — and names the template by its hash
# count.  Exact md5 over the whitespace-normalized first PREFIX_CHARS
# characters; a prefix shorter than MIN_PREFIX chars can't be a
# meaningful template and is ignored.
#
# Scale shape: one per-row hash column, groupBy(host, prefix-hash)
# with map-side combine, then a bounded per-host rollup.  Only 16-byte
# hash keys shuffle, never text.

PREFIX_CHARS = 64
MIN_PREFIX = 32


def prefix_dup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_templates, templated_docs, templated_share):
    per-host duplicated-intro profile — a template is a normalized
    PREFIX_CHARS-char prefix shared by >= 2 docs."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    eligible = F.length(norm) >= MIN_PREFIX
    fp = F.md5(F.substring(norm, 1, PREFIX_CHARS))
    per_tpl = (
        docs.filter(eligible)
        .select(F.col("source").alias("host"), fp.alias("fp"))
        .groupBy("host", "fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return per_tpl.groupBy("host").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum((F.col("c") >= 2).cast("bigint")).cast("bigint").alias(
            "n_templates"
        ),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("templated_docs"),
        F.round(
            F.sum(
                F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("templated_share"),
    )


def sql_prefix_dup(text_expr: str = "text") -> str:
    norm = f"regexp_replace(trim({text_expr}), '\\s+', ' ', 'g')"
    return f"""
        WITH per_tpl AS (
            SELECT source AS host,
                   md5(substr({norm}, 1, {PREFIX_CHARS})) AS fp,
                   CAST(count(*) AS BIGINT) AS c
            FROM documents
            WHERE length({norm}) >= {MIN_PREFIX}
            GROUP BY source, md5(substr({norm}, 1, {PREFIX_CHARS}))
        )
        SELECT host, CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_templates,
               CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                   AS templated_docs,
               round(CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
                     / CAST(sum(c) AS DOUBLE), 6) AS templated_share
        FROM per_tpl GROUP BY host
    """


# ---------------------------------------------------------------------------
# T171 — list/navigation-page detection (line-structure profile)
# ---------------------------------------------------------------------------
#
# Index, tag-cloud, and navigation pages survive boilerplate stripping
# as stacks of short lines (menu items, link captions) with no prose
# in between; they poison LM training (no sentence structure) but are
# invisible to word-level quality rules because every individual
# token is clean.  The line-structure signal: a page whose non-empty
# lines are mostly short IS a list page.  Grouped per host because
# list pages are structural — a host's /tag/ and /archive/ subtrees
# produce them wholesale.
#
# Scale shape: per-row split + two higher-order list aggregates (zero
# exchange, codegen) + one map-side-combined groupBy(host).

LIST_SHORT_CHARS = 30
LIST_MIN_LINES = 5
LIST_SHORT_SHARE = 0.6


def list_page_detect(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_listpages, list_share): per-host share of
    list/nav-shaped pages (>= LIST_MIN_LINES non-empty lines of which
    >= LIST_SHORT_SHARE are shorter than LIST_SHORT_CHARS chars)."""
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), r"\n"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    n_lines = F.size(lines).cast("bigint")
    n_short = F.size(
        F.filter(lines, lambda x: F.length(x) < LIST_SHORT_CHARS)
    ).cast("bigint")
    is_list = (
        (n_lines >= LIST_MIN_LINES)
        & (
            n_short.cast("double")
            >= F.lit(LIST_SHORT_SHARE) * n_lines.cast("double")
        )
    ).cast("bigint")
    return (
        docs.select(F.col("source").alias("host"), is_list.alias("l"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("l").cast("bigint").alias("n_listpages"),
            F.round(
                F.sum("l").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("list_share"),
        )
    )


def sql_list_page_detect(text_expr: str = "text") -> str:
    lines = (
        f"list_filter(list_transform(string_split({text_expr}, chr(10)),"
        " x -> trim(x)), x -> x <> '')"
    )
    is_list = (
        f"CASE WHEN len({lines}) >= {LIST_MIN_LINES}"
        f" AND CAST(len(list_filter({lines},"
        f" x -> length(x) < {LIST_SHORT_CHARS})) AS DOUBLE)"
        f" >= {LIST_SHORT_SHARE} * CAST(len({lines}) AS DOUBLE)"
        " THEN 1 ELSE 0 END"
    )
    return f"""
        WITH d AS (
            SELECT source AS host, {is_list} AS l FROM documents
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(l) AS BIGINT) AS n_listpages,
               round(CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                   AS list_share
        FROM d GROUP BY host
    """


_PII_EMAIL_MOD = 3
_PII_PHONE_MOD = 5


def pii_sparse_inject_col(text: Column, key: Column) -> Column:
    """Variable-prevalence PII planting: an email on every
    ``key % 3 == 0`` doc, a phone on every ``key % 5 == 0`` doc (both
    at %15) — gives the prevalence rollup a non-degenerate
    distribution, unlike :func:`pii_inject_col`'s one-of-each."""
    email = F.when(
        key % _PII_EMAIL_MOD == 0,
        F.concat(
            F.lit(" contact u"),
            key.cast("string"),
            F.lit("@mail"),
            (key % 7).cast("string"),
            F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        key % _PII_PHONE_MOD == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((key % 10_000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.substring(text, 1, 80), email, phone)


def pii_prevalence(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """T185 (source, n_docs, docs_with_email, docs_with_phone,
    n_emails, n_phones): per-host PII prevalence — the governance view
    a release review reads BEFORE deciding where the T27 scrubber must
    run (a host with pervasive PII gets quarantined, not scrubbed).
    Extraction is the same JVM regexes as the scrubber, so the rollup
    counts what redaction would actually touch.  One map-side-combined
    per-source aggregation over in-row regex counts."""
    planted = pii_sparse_inject_col(F.col(text_col), F.col(key_col))
    ne = F.size(F.regexp_extract_all(planted, F.lit(PII_EMAIL_RE), 0)).cast(
        "bigint"
    )
    np_ = F.size(F.regexp_extract_all(planted, F.lit(PII_PHONE_RE), 0)).cast(
        "bigint"
    )
    return (
        docs.select(
            F.col(source_col).alias("source"),
            ne.alias("ne"),
            np_.alias("np"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("ne") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_with_email"),
            F.sum((F.col("np") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_with_phone"),
            F.sum("ne").cast("bigint").alias("n_emails"),
            F.sum("np").cast("bigint").alias("n_phones"),
        )
    )


def sql_pii_prevalence() -> str:
    """Oracle: prevalence restated from the planting arithmetic — the
    regex extraction must recover exactly the planted occurrences."""
    return f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN doc_id % {_PII_EMAIL_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_email,
               CAST(sum(CASE WHEN doc_id % {_PII_PHONE_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_phone,
               CAST(sum(CASE WHEN doc_id % {_PII_EMAIL_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_emails,
               CAST(sum(CASE WHEN doc_id % {_PII_PHONE_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_phones
        FROM documents
        GROUP BY source
    """
