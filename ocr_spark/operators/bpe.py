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

Ties break on (count DESC, lhs ASC, rhs ASC) — binary string order in
both engines — so the learned table is deterministic.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import sql_words, words_col

BPE_MERGES = 8
END_OF_WORD = "</w>"


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
    # characters are never empty, so drop them.
    chars = F.filter(F.split(F.col("w"), r"(?!^)"), lambda x: x != "")
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
    merged = lhs + rhs
    s = F.col("syms")

    def emit(x, i):
        # F.get is 0-based and NULL-safe out of bounds (NULL comparisons
        # make the `when` condition false), unlike 1-based element_at
        # which raises on index 0.
        starts = (x == lhs) & (F.get(s, i + 1) == rhs)
        consumed = (x == rhs) & (F.get(s, i - 1) == lhs)
        return (
            F.when(starts, F.lit(merged))
            .when(consumed, F.lit(None))
            .otherwise(x)
        )

    new_syms = F.filter(F.transform(s, emit), lambda x: x.isNotNull())
    return d.select(new_syms.alias("syms"), "cnt")


def train_bpe(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Returns (merge_rank, lhs, rhs, merged, pair_count) — the merge
    table, in learning order.  Stops early (fewer rows) if the
    dictionary runs out of non-self pairs."""
    spark = docs.sparkSession
    d = _initial_dict(docs, text_col).persist()
    d.count()  # materialize before the loop
    out: List[Tuple[int, str, str, str, int]] = []
    try:
        for r in range(1, n_merges + 1):
            top = (
                _pair_counts(d)
                .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
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


def sql_train_bpe(n_merges: int = BPE_MERGES, text_expr: str = "text") -> str:
    """The whole training loop as one generated query: K pair-count +
    argmax + apply layers.  Mirrors train_bpe exactly (same candidate
    exclusion, same tiebreak)."""
    w = sql_words(text_expr)
    eow = END_OF_WORD
    ctes = [
        f"""d0 AS (
            SELECT list_append(
                       list_transform(range(1, len(w) + 1),
                                      i -> (w)[CAST(i AS INTEGER)]),
                       '{eow}') AS syms,
                   cnt
            FROM (SELECT w, count(*) AS cnt
                  FROM (SELECT unnest({w}) AS w FROM documents)
                  WHERE len(w) > 0 GROUP BY w)
        )"""
    ]
    sels = []
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
            ORDER BY pair_count DESC, lhs, rhs LIMIT 1
        )"""
        )
        ctes.append(
            f"""d{r} AS (
            SELECT CASE WHEN m.lhs IS NULL THEN d.syms ELSE
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
                END AS syms,
                d.cnt
            FROM d{p} d LEFT JOIN m{r} m ON TRUE
        )"""
        )
        sels.append(
            f"SELECT CAST({r} AS BIGINT) AS merge_rank, lhs, rhs, "
            f"lhs || rhs AS merged, CAST(pair_count AS BIGINT) AS pair_count "
            f"FROM m{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)
