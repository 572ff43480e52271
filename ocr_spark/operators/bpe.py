"""Distributed BPE tokenizer training (Sennrich et al. 2016) — learn
the merge table for a subword vocabulary over the corpus itself, the
step a training-data pipeline runs between curation and tokenization.

The reference (an OCR task-queue web app) has nothing like this; the
algorithm is the published byte-pair-encoding procedure, shaped for
Spark:

* The ONLY corpus-scale stage is the initial word count — one
  map-side-combined groupBy.  BPE then operates on the word-TYPE
  dictionary (word, count), which is orders of magnitude smaller than
  the corpus (a 100 TB crawl has ~10^8 distinct words, a few GB as a
  DataFrame) and stays fully distributed.
* Each merge round is one explode→sum pair count over the dictionary
  (map-side combinable, 2 short strings + a bigint per row) and ONE
  collected row (the argmax pair) — the same bounded-driver-merge
  pattern as the k-means/PQ trainers in ann.py.
* Applying a merge is an in-row higher-order transform+filter of the
  symbol arrays; the dictionary is re-cached per round so round r
  doesn't replay rounds 1..r-1.

Variant note (documented, shared by the DuckDB oracle so parity is by
construction): self-pair candidates (a == b) are excluded.  For a != b
left-to-right non-overlapping merges cannot interact, so the merge
application is a pure vectorized zip — no run-parity bookkeeping — and
the oracle can express the whole K-round training loop as K generated
CTE layers.  Self-merges ("e e") are pathological for natural text;
real tokenizers rarely learn them early.

Ties break on (count DESC, hash60(lhs || US || rhs) ASC) — a 60-bit
md5 prefix over the UTF-8 bytes of the pair (unit-separator joined so
("ab","c") and ("a","bc") never alias).  md5-over-UTF-8 is computed
identically by Spark, DuckDB and Python's hashlib, so the learned
table is deterministic ACROSS ENGINES for every codepoint, including
supplementary-plane symbols where raw string order diverges (Spark
compares UTF-16 code units, Python/DuckDB code points — a tie pitting
a symbol >= U+10000 against one >= U+E000 sorted differently under
the old lexicographic tie-break).  (lhs, rhs) remains as a final
fallback key; it can only fire on an md5-prefix collision.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import sql_words, words_col

BPE_MERGES = 8
END_OF_WORD = "</w>"

# Below this many word types the merge loop finishes on the driver
# over the collected dictionary — the shape production tokenizer
# trainers use (distributed corpus count, local merge loop on the
# type dictionary), and the same bounded-driver-merge pattern as the
# k-means/PQ trainers.  65k types x a few dozen bytes is ~MBs; each
# distributed round costs 2 jobs + a fresh codegen compile, so a toy
# dictionary pays seconds per merge for microseconds of work.  Above
# the threshold the loop runs distributed.
DICT_LOCAL_TYPES = 65_536

# Unit separator joining (lhs, rhs) before hashing the tie-break key,
# so ("ab","c") and ("a","bc") hash differently.  A collision would
# need U+001F inside a corpus word; even then the (lhs, rhs) fallback
# keys keep the argmax deterministic within each engine.
_TIE_SEP = "\x1f"


def _tie_hash_local(lhs: str, rhs: str) -> int:
    """60-bit md5 prefix of the pair — the Python replica of
    ``_tie_hash_col`` / the DuckDB expression in ``_sql_bpe_ctes``."""
    import hashlib

    return int(
        hashlib.md5(f"{lhs}{_TIE_SEP}{rhs}".encode()).hexdigest()[:15], 16
    )


def _tie_hash_col() -> "F.Column":
    """Spark column form of the tie-break hash over (lhs, rhs)."""
    from ocr_spark.operators.dedup import _hash60

    return _hash60(
        F.concat(F.col("lhs"), F.lit(_TIE_SEP), F.col("rhs"))
    )


def _initial_dict(docs: DataFrame, text_col: str) -> DataFrame:
    """(syms, cnt): per distinct word, its character symbols + the
    end-of-word marker, weighted by corpus frequency."""
    words = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Spark's split can emit a leading '' for zero-width patterns;
    # characters are never empty, so drop them.  The zero-width split
    # must NOT fire inside a UTF-16 surrogate pair (Spark strings are
    # UTF-16 under java.util.regex): the (?![\uDC00-\uDFFF]) guard
    # keeps supplementary-plane symbols (emoji, CJK extensions) whole,
    # matching Python's and DuckDB's code-point alphabets.
    chars = F.filter(
        F.split(F.col("w"), r"(?!^)(?![\uDC00-\uDFFF])"), lambda x: x != ""
    )
    syms = F.concat(chars, F.array(F.lit(END_OF_WORD)))
    return words.select(syms.alias("syms"), "cnt")


def _pair_counts(d: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the dictionary, self-pairs
    excluded (see module docstring)."""
    s = F.col("syms")
    n = F.size(s)
    z = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("lhs"),
            F.element_at(s, i + 1).alias("rhs"),
        ),
    )
    return (
        d.filter(n >= 2)
        .select(F.explode(z).alias("p"), "cnt")
        .select(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"), "cnt")
        .filter(F.col("lhs") != F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(d: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Merge every (lhs, rhs) adjacency left-to-right.  lhs != rhs
    guarantees occurrences cannot overlap, so a zip-style mark/skip
    transform is exact."""
    s = F.col("syms")
    new_syms = _apply_merge_to(s, lhs, rhs)
    return d.select(new_syms.alias("syms"), "cnt")


def _local_merge_loop(
    seqs: dict, n_merges: int
) -> List[Tuple[int, str, str, str, int]]:
    """The merge loop over a driver-local {symbol-tuple: count} dict —
    bit-identical semantics to the distributed loop (self-pairs
    excluded, greedy non-overlapping apply, (count DESC, pair-hash)
    tie-break)."""
    out: List[Tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for s, c in seqs.items():
            for x, y in zip(s, s[1:]):
                if x != y:
                    counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(),
            key=lambda kv: (
                -kv[1],
                _tie_hash_local(kv[0][0], kv[0][1]),
                kv[0][0],
                kv[0][1],
            ),
        )
        out.append((rank, lhs, rhs, lhs + rhs, int(cnt)))
        nxt: dict = {}
        for s, c in seqs.items():
            acc, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    acc.append(lhs + rhs)
                    i += 2
                else:
                    acc.append(s[i])
                    i += 1
            key = tuple(acc)
            nxt[key] = nxt.get(key, 0) + c
        seqs = nxt
    return out


def train_bpe(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    local_types: int = DICT_LOCAL_TYPES,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Returns (merge_rank, lhs, rhs, merged, pair_count) — the merge
    table, in learning order.  Stops early (fewer rows) if the
    dictionary runs out of non-self pairs.

    The corpus-scale word count always runs distributed; the merge
    loop finishes on the driver when the type dictionary is small
    (<= ``local_types``, the production-trainer shape) and distributed
    otherwise.  Both loops implement identical semantics; a pytest
    pins them equal."""
    spark = docs.sparkSession
    d = _initial_dict(docs, text_col).persist()
    n_types = d.count()  # materialize before the loop

    if n_types <= local_types:
        seqs = {tuple(r.syms): r.cnt for r in d.collect()}
        d.unpersist()
        out = _local_merge_loop(seqs, n_merges)
    else:
        out = []
        try:
            for r in range(1, n_merges + 1):
                top = (
                    _pair_counts(d)
                    .orderBy(
                        F.desc("pair_count"),
                        F.asc(_tie_hash_col()),
                        F.asc("lhs"),
                        F.asc("rhs"),
                    )
                    .limit(1)
                    .collect()
                )
                if not top:
                    break
                lhs, rhs, cnt = top[0].lhs, top[0].rhs, top[0].pair_count
                out.append((r, lhs, rhs, lhs + rhs, int(cnt)))
                nxt = _apply_merge(d, lhs, rhs).persist()
                nxt.count()
                d.unpersist()
                d = nxt
        finally:
            d.unpersist()
    return spark.createDataFrame(
        out,
        "merge_rank bigint, lhs string, rhs string, "
        "merged string, pair_count bigint",
    )


def _sql_char_syms(expr: str) -> str:
    """chars of ``expr`` + the end-of-word marker, as a list."""
    return (
        f"list_append(list_transform(range(1, len({expr}) + 1), "
        f"i -> ({expr})[CAST(i AS INTEGER)]), '{END_OF_WORD}')"
    )


def _sql_apply_layer(merged_cte: str) -> str:
    """The merge-apply expression over ``d.syms`` given merge row
    ``m`` from ``merged_cte`` (identical body for the dictionary and
    the corpus encode layers)."""
    return f"""CASE WHEN m.lhs IS NULL THEN d.syms ELSE
                list_filter(
                    list_transform(d.syms, (x, i) -> CASE
                        WHEN x = m.lhs AND i < len(d.syms)
                             AND d.syms[CAST(i AS INTEGER) + 1] = m.rhs
                            THEN m.lhs || m.rhs
                        WHEN x = m.rhs AND i > 1
                             AND d.syms[CAST(i AS INTEGER) - 1] = m.lhs
                            THEN NULL
                        ELSE x END),
                    x -> x IS NOT NULL)
                END"""


def _sql_bpe_ctes(n_merges: int, text_expr: str) -> List[str]:
    """The shared training CTE chain d0, (m1, d1) .. (mK, dK)."""
    w = sql_words(text_expr)
    ctes = [
        f"""d0 AS (
            SELECT {_sql_char_syms('w')} AS syms, cnt
            FROM (SELECT w, count(*) AS cnt
                  FROM (SELECT unnest({w}) AS w FROM documents)
                  WHERE len(w) > 0 GROUP BY w)
        )"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(
            f"""m{r} AS (
            SELECT syms[CAST(i AS INTEGER)] AS lhs,
                   syms[CAST(i AS INTEGER) + 1] AS rhs,
                   sum(cnt) AS pair_count
            FROM d{p}, UNNEST(range(1, len(syms))) AS t(i)
            WHERE syms[CAST(i AS INTEGER)] <> syms[CAST(i AS INTEGER) + 1]
            GROUP BY 1, 2
            ORDER BY pair_count DESC,
                     CAST('0x' || substr(md5(lhs || chr(31) || rhs), 1, 15)
                          AS BIGINT),
                     lhs, rhs
            LIMIT 1
        )"""
        )
        ctes.append(
            f"""d{r} AS (
            SELECT {_sql_apply_layer(f'm{r}')} AS syms, d.cnt
            FROM d{p} d LEFT JOIN m{r} m ON TRUE
        )"""
        )
    return ctes


def sql_train_bpe(n_merges: int = BPE_MERGES, text_expr: str = "text") -> str:
    """The whole training loop as one generated query: K pair-count +
    argmax + apply layers.  Mirrors train_bpe exactly (same candidate
    exclusion, same tiebreak)."""
    ctes = _sql_bpe_ctes(n_merges, text_expr)
    sels = [
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, lhs, rhs, "
        f"lhs || rhs AS merged, CAST(pair_count AS BIGINT) AS pair_count "
        f"FROM m{r}"
        for r in range(1, n_merges + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


def _apply_merge_to(seq, lhs: str, rhs: str):
    """Expression: apply one (lhs, rhs) merge to a symbol-array Column
    (the in-row form of _apply_merge, usable on nested lambda vars)."""
    merged = F.lit(lhs + rhs)

    def emit(x, i):
        starts = (x == lhs) & (F.get(seq, i + 1) == rhs)
        consumed = (x == rhs) & (F.get(seq, i - 1) == lhs)
        return (
            F.when(starts, merged).when(consumed, F.lit(None)).otherwise(x)
        )

    return F.filter(F.transform(seq, emit), lambda x: x.isNotNull())


def _encode_word_local(syms: list, ranks: dict, pairs: list) -> list:
    """Apply a rank-ordered merge table to one word's symbol list —
    greedy lowest-rank-first, merging all non-overlapping occurrences
    left-to-right per step.  Provably identical to the one-pass-per-rank
    projection chain: a merged symbol lhs+rhs is a new string, so a pair
    of rank r can never reappear after rank r's pass — greedy order IS
    rank order (pytest pins the two paths equal)."""
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best is None or rk < best):
                best = rk
        if best is None:
            break
        lhs, rhs = pairs[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# Above this many merges the layered-projection encoder is replaced by
# the Arrow-batched table-lookup encoder: K stacked HOF projections
# mean K plan nodes — analysis/codegen cost grows with K and a
# production-size table (--merges 4096) would blow up plan compilation
# long before execution.  Both paths implement identical semantics
# (pytest-pinned equal); the projection path stays the default at
# small K because it is whole-stage-codegen'd and oracle-mirrored.
ENCODE_COMPILE_MAX = 64


def encode_bpe(
    docs: DataFrame,
    merges=None,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    key_col: str = "doc_id",
    compile_max: int = ENCODE_COMPILE_MAX,
) -> DataFrame:
    """Tokenize every doc with a learned BPE merge table.

    ``merges``: [(lhs, rhs), ...] in rank order; trained on ``docs``
    itself via train_bpe when omitted.  Emits (doc_id, n_words,
    n_subwords) — the true-BPE token count (token_count_bpe is the
    regex approximation).

    Scale shape: the merge table is K rows collected once and shipped
    in the task closure (the broadcast-scalar pattern) — encoding
    explodes words once and applies the merges either as K successive
    narrow projections (column-level HOF per layer, whole-stage
    codegen'd; nesting all K inside a per-word lambda trips the
    analyzer's resolution limit) or, above ``compile_max`` merges, as
    ONE Arrow-batched pandas UDF doing rank-table lookup per word —
    identical semantics, constant plan size at production vocabulary
    scale.  The only shuffle is the final map-side-combined per-doc
    count agg — no dictionary join, the word rows carry (doc_id, syms)
    and nothing else."""
    if merges is None:
        merges = [
            (r.lhs, r.rhs)
            for r in train_bpe(docs, n_merges=n_merges, text_col=text_col)
            .orderBy("merge_rank")
            .collect()
        ]
    key = F.col(key_col)
    ex = (
        docs.select(key.alias("doc_id"), F.explode(words_col(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .select(
            "doc_id",
            F.concat(
                F.filter(
                    F.split(F.col("w"), r"(?!^)(?![\uDC00-\uDFFF])"),
                    lambda x: x != "",
                ),
                F.array(F.lit(END_OF_WORD)),
            ).alias("syms"),
        )
    )
    if len(merges) <= compile_max:
        for lhs, rhs in merges:
            ex = ex.select(
                "doc_id",
                _apply_merge_to(F.col("syms"), lhs, rhs).alias("syms"),
            )
    else:
        from pyspark.sql.functions import pandas_udf

        ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        pairs = list(merges)

        @pandas_udf("array<string>")
        def _encode_batch(col: pd.Series) -> pd.Series:
            return col.map(
                lambda syms: _encode_word_local(list(syms), ranks, pairs)
            )

        ex = ex.select("doc_id", _encode_batch("syms").alias("syms"))
    agg = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("syms")).alias("n_subwords"),
    )
    return (
        docs.select(key.alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_subwords", F.lit(0))
            .cast("bigint")
            .alias("n_subwords"),
        )
    )


def sql_encode_bpe(n_merges: int = BPE_MERGES, text_expr: str = "text") -> str:
    """Mirror: the training CTE layers (so the oracle learns the SAME
    merge table) plus the corpus-side per-word sequences pushed through
    the identical K apply layers, re-aggregated per doc."""
    w = sql_words(text_expr)
    parts = _sql_bpe_ctes(n_merges, text_expr)
    parts.append(
        f"""w0 AS (
            SELECT doc_id, {_sql_char_syms('w')} AS syms
            FROM (SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE len(w) > 0
        )"""
    )
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f"""w{r} AS (
            SELECT doc_id, {_sql_apply_layer(f'm{r}')} AS syms
            FROM w{p} d LEFT JOIN m{r} m ON TRUE
        )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
        agg AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(len(syms)) AS BIGINT) AS n_subwords
            FROM w{n_merges} GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_words, 0) AS n_words,
               coalesce(a.n_subwords, 0) AS n_subwords
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """
    )


# ---------------------------------------------------------------------------
# T81 — per-language tokenizer fertility audit
# ---------------------------------------------------------------------------


def bpe_fertility(
    docs: DataFrame,
    merges=None,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    key_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, n_words, n_subwords, fertility): mean BPE tokens
    per word by language — the standard multilingual-tokenizer audit
    (a vocabulary trained on a skewed mix over-segments the minority
    languages; fertility disparity is the signal).

    Scale shape: everything is encode_bpe's plan (merge table compiled
    into narrow projections, one per-doc count agg) plus a per-language
    re-agg of the per-doc counts — the second agg runs over n_docs
    rows, map-side combined down to n_languages."""
    enc = encode_bpe(
        docs,
        merges=merges,
        n_merges=n_merges,
        text_col=text_col,
        key_col=key_col,
    )
    return (
        docs.select(F.col(key_col).alias("doc_id"), group_col)
        .join(enc, "doc_id")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_subwords",
            F.round(
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
    )


def sql_bpe_fertility(
    n_merges: int = BPE_MERGES, text_expr: str = "text"
) -> str:
    """Mirror: the encode_bpe CTE stack re-aggregated by language."""
    w = sql_words(text_expr)
    parts = _sql_bpe_ctes(n_merges, text_expr)
    parts.append(
        f"""w0 AS (
            SELECT doc_id, {_sql_char_syms('w')} AS syms
            FROM (SELECT doc_id, unnest({w}) AS w FROM documents)
            WHERE len(w) > 0
        )"""
    )
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f"""w{r} AS (
            SELECT doc_id, {_sql_apply_layer(f'm{r}')} AS syms
            FROM w{p} d LEFT JOIN m{r} m ON TRUE
        )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
        agg AS (
            SELECT doc_id, count(*) AS n_words, sum(len(syms)) AS n_subwords
            FROM w{n_merges} GROUP BY doc_id
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(a.n_words, 0)) AS BIGINT) AS n_words,
               CAST(sum(coalesce(a.n_subwords, 0)) AS BIGINT) AS n_subwords,
               round(CAST(sum(coalesce(a.n_subwords, 0)) AS DOUBLE)
                     / CAST(sum(coalesce(a.n_words, 0)) AS DOUBLE), 6)
                   AS fertility
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        GROUP BY d.lang
    """
    )
