"""Near-duplicate detection suite — the training-data-pipeline ops a
100 TB crawl needs before anything is fed to a model.

The reference deduplicates nothing (every upload is a fresh task;
`INSERT OR REPLACE` on (task_id, page) — models/database.py:860-869 —
is its only uniqueness notion).  This module adds the standard
web-corpus near-dup stack, each expressed with **built-in Spark SQL
functions only** (JVM-side, codegen'd; zero Python on the hot path):

* exact dedup           — hash groupBy (`__spark_entry__.q_dedup_exact`)
* MinHash + LSH         — word-shingle minhash signatures, banded into
                          LSH keys; candidate pairs = docs sharing a
                          band bucket.  The bucket groupBy shuffles on
                          the band key, so at cluster scale each band
                          is an ordinary hash-partitioned aggregation —
                          no pairwise O(n²) anywhere.
* SimHash               — 16-bit sign-of-sum signature over hashed
                          tokens; hamming-close docs are near-dups.
* n-gram Jaccard        — exact shingle-set similarity for candidate
                          verification (array_intersect / size).

Every construction is generated twice from the same parameters: once
as a PySpark Column, once as ANSI-ish SQL for the DuckDB oracle — the
only hash used is md5 (identical hex output in both engines), and all
integer math avoids engine-specific rounding (explicit floor before
casts).

Because the driver's `documents` testdata has no planted duplicates,
`neardup_corpus` derives a deterministic mutated copy of every doc
(word-truncation to ~90%) with doc_id offset +1,000,000; recall of the
(orig, mutant) pairs is then a measurable property both engines agree
on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3
MINHASH_BANDS = 8  # LSH bands
MINHASH_ROWS = 2  # minhashes per band (AND-construction within a band)
SIMHASH_BITS = 16
NEARDUP_OFFSET = 1_000_000
MUTATE_KEEP = 0.9  # fraction of characters kept in the mutated copy

_HEX = "0123456789abcdef"

# Minhash permutation family: ONE md5 per shingle yields TWO
# independent 60-bit bases (hex chars 1-15 and 16-30); per seed,
# h_i = (A_i·x0 + B_i·y0 + C_i·x1 + D_i·y1 + E_i) mod M over the four
# 30-bit halves (multiply-add universal hashing; max intermediate
# 4·2^60 + M < 2^63 so BIGINT-exact in both Spark and DuckDB).
# Replaces 16 string-concat md5 calls per shingle with 1 md5 + 16
# integer mixes. A weaker two-half family (one 60-bit base) measurably
# hurt planted-mutant recall (94% vs 98%+); the four-half family
# restores it.
_MIX_MOD = (1 << 61) - 1  # Mersenne prime
_HALF = 1 << 30


def _mix_consts(n_seeds: int) -> list:
    """Deterministic (A, B, C, D, E) per seed, derived from md5 so
    both engines' codegen uses identical literals."""
    import hashlib

    out = []
    for i in range(n_seeds):
        d = hashlib.md5(f"mix:{i}".encode()).hexdigest()
        d2 = hashlib.md5(f"mix2:{i}".encode()).hexdigest()
        a = (int(d[0:8], 16) % (_HALF - 1)) | 1
        b = (int(d[8:16], 16) % (_HALF - 1)) | 1
        c = (int(d[16:24], 16) % (_HALF - 1)) | 1
        e = (int(d[24:32], 16) % (_HALF - 1)) | 1
        f = int(d2[0:15], 16) % _MIX_MOD
        out.append((a, b, c, e, f))
    return out


_MIX = _mix_consts(MINHASH_BANDS * MINHASH_ROWS)


def _mix_col(h0: Column, h1: Column, seed: int) -> Column:
    a, b, c, d, e = _MIX[seed]
    return (
        F.lit(a) * (h0 % F.lit(_HALF))
        + F.lit(b) * F.shiftright(h0, 30)
        + F.lit(c) * (h1 % F.lit(_HALF))
        + F.lit(d) * F.shiftright(h1, 30)
        + F.lit(e)
    ) % F.lit(_MIX_MOD)


def _sql_mix(h0_expr: str, h1_expr: str, seed: int) -> str:
    a, b, c, d, e = _MIX[seed]
    return (
        f"(({a} * (({h0_expr}) % {_HALF}) + {b} * (({h0_expr}) >> 30)"
        f" + {c} * (({h1_expr}) % {_HALF}) + {d} * (({h1_expr}) >> 30)"
        f" + {e}) % {_MIX_MOD})"
    )


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------


def words_col(text: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles; a doc shorter than k words yields one shingle
    (all its words), so no doc drops out of the signature."""
    words = words_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - F.lit(k), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))


def _hash60(col: Column) -> Column:
    """md5 truncated to its first 15 hex chars as a BIGINT (60 bits).
    Fixed-width hex means integer order == lexicographic order, and a
    bigint aggregation buffer keeps min() hash-aggregable (min over
    STRING forces Spark into SortAggregate) while the shuffle carries
    8 bytes instead of a 32-char string per signature slot."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _hash60b(col: Column) -> Column:
    """Second independent 60-bit value from the SAME md5 digest
    (hex chars 16-30) — no extra hash invocation."""
    return F.conv(F.substring(F.md5(col), 16, 15), 16, 10).cast("bigint")


def minhash_col(shingles: Column, seed: int) -> Column:
    """One minhash: min over shingles of the seed's mix of the
    shingle's two 60-bit md5 bases (see _MIX)."""
    return F.array_min(
        F.transform(
            shingles, lambda s: _mix_col(_hash60(s), _hash60b(s), seed)
        )
    )


def band_keys_col(
    shingles: Column, bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS
) -> Column:
    """Array of LSH band keys: band j = md5 of its ``rows``
    ':'-joined decimal minhashes (seeds j*rows .. j*rows+rows-1)."""
    keys = []
    for j in range(bands):
        parts = [
            minhash_col(shingles, j * rows + r).cast("string")
            for r in range(rows)
        ]
        keys.append(F.md5(F.concat_ws(":", *parts)))
    return F.array(*keys)


def simhash_col(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash: per bit position p, sum +/-1 over distinct hashed
    tokens by bit p of md5(token); sign of the sum is signature bit p.
    md5 is computed once per token; each bit folds over the hash array."""
    hashed = F.transform(F.array_distinct(words_col(text)), F.md5)

    def _bit_merge(hex_pos: int, bit_shift: int):
        def merge(acc, h):
            digit = F.conv(F.substring(h, hex_pos, 1), 16, 10).cast("int")
            bit = F.floor(digit / F.lit(2**bit_shift)) % 2
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return merge

    total = F.lit(0).cast("bigint")
    for p in range(bits):
        hex_pos = 1 + p // 4  # 1-based hex char
        bit_shift = 3 - (p % 4)  # high bit first within the hex digit
        score = F.aggregate(hashed, F.lit(0), _bit_merge(hex_pos, bit_shift))
        total = total + F.when(score > 0, F.lit(2**p)).otherwise(F.lit(0))
    return total


WINNOW_WINDOW = 4


def winnow_fingerprint_col(text: Column, w: int = WINNOW_WINDOW) -> Column:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken): hash the
    k-word shingles (the rolling-hash stream), take the min of every
    ``w``-hash window, dedupe and sort — a compact, position-robust
    document signature whose overlap measures near-duplication.
    Emitted as a ','-joined string so both engines stringify the
    BIGINT selection identically."""
    hashes = F.transform(
        shingles_col(text), lambda s: _hash60(F.concat(F.lit("w:"), s))
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(hashes) - F.lit(w), F.lit(0)))
    mins = F.transform(idx, lambda i: F.array_min(F.slice(hashes, i + 1, w)))
    return F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.array_distinct(mins)), lambda x: x.cast("string")
        ),
    )


def jaccard_col(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over distinct shingle sets."""
    a = F.array_distinct(shingles_a)
    b = F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.round(inter.cast("double") / union, 6)


# ---------------------------------------------------------------------------
# Derived near-dup corpus + candidate-pair pipelines
# ---------------------------------------------------------------------------


def _mutated_text(text: Column, n_chars: Column) -> Column:
    keep = F.greatest(
        F.floor(n_chars * F.lit(MUTATE_KEEP)).cast("int"), F.lit(40)
    )
    return F.trim(F.substring(text, 1, keep))


def neardup_corpus(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, n_chars) -> union of originals and
    deterministic ~90%-prefix mutants at doc_id + NEARDUP_OFFSET."""
    orig = docs.select("doc_id", "text")
    mut = docs.select(
        (F.col("doc_id") + F.lit(NEARDUP_OFFSET)).alias("doc_id"),
        _mutated_text(F.col("text"), F.col("n_chars")).alias("text"),
    )
    return orig.unionByName(mut)


def _band_keyed(corpus: DataFrame) -> DataFrame:
    """(doc_id, band, key) — one LSH band key per doc per band.

    Shingles are exploded once and the 16 minhash mins aggregated with
    a map-side combine, instead of inlining the shingle subtree into 16
    array folds (which defeats codegen and re-tokenizes per seed —
    measured ~30x slower). The shuffle carries only n_docs x n_seeds
    bigint hashes, never shingles.
    """
    n_seeds = MINHASH_BANDS * MINHASH_ROWS
    exploded = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_col(F.col("text")))).alias(
            "shingle"
        ),
    )
    based = exploded.select(
        "doc_id",
        _hash60(F.col("shingle")).alias("b0"),
        _hash60b(F.col("shingle")).alias("b1"),
    )
    hashed = based.select(
        "doc_id",
        *[
            _mix_col(F.col("b0"), F.col("b1"), seed).alias(f"h{seed}")
            for seed in range(n_seeds)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{seed}").alias(f"h{seed}") for seed in range(n_seeds)]
    )
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{j * MINHASH_ROWS + r}").cast("string")
                        for r in range(MINHASH_ROWS)
                    ],
                )
            )
            for j in range(MINHASH_BANDS)
        ]
    )
    return sig.select("doc_id", F.posexplode(bands).alias("band", "key"))


# A degenerate band key (boilerplate-heavy or very short docs colliding
# en masse on a real crawl) must not produce an unbounded O(m^2)
# combination array in a single executor row; buckets above this size
# are skipped — use oversize_minhash_buckets to audit the drop.
MAX_MINHASH_BUCKET = 1024


def minhash_candidate_pairs(
    corpus: DataFrame, max_bucket: int = MAX_MINHASH_BUCKET
) -> DataFrame:
    """corpus(doc_id, text) -> distinct candidate pairs (doc_a < doc_b)
    sharing at least one LSH band bucket.

    Plan shape at scale: posexplode of the band-key array (bands x n
    rows), one shuffle on (band, key), per-bucket pair expansion via
    array combinatorics over collected bucket members. Buckets are
    tiny when the corpus is healthy (only near-dups collide), and the
    ``max_bucket`` cap bounds the in-row blow-up when it isn't —
    members of a hotter bucket are near-identical to each other
    anyway, so exact-dedup upstream is the right tool for them, not
    pairwise LSH verification.
    """
    keyed = _band_keyed(corpus)
    # Pair expansion per bucket instead of a self-join: a self-join
    # would recompute the whole signature subtree for its second input;
    # grouping bucket members and expanding (a < b) combinations with
    # array functions costs one signature pass and one shuffle. Buckets
    # are tiny by construction (only near-dups collide), so the
    # in-bucket combination blow-up is bounded.
    buckets = (
        keyed.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def signature_table(
    corpus: DataFrame, max_bucket: int = MAX_MINHASH_BUCKET
) -> DataFrame:
    """(doc_id, band, key) LSH index of a corpus, with degenerate
    buckets (> ``max_bucket`` members) dropped at build time — the
    persisted state that makes dedup *incremental*: a fresh ingest
    batch probes this table instead of re-signaturing the whole
    corpus. Persist with ``plans.bucketed.save_bucketed(...,
    key="key")`` so every future probe join is exchange-free on the
    indexed side; the oversize drop is auditable via
    ``oversize_minhash_buckets`` on the same corpus."""
    keyed = _band_keyed(corpus)
    ok = (
        keyed.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") <= max_bucket)
        .select("band", "key")
    )
    return keyed.join(ok, ["band", "key"], "left_semi")


def incremental_neardup_pairs(
    new_docs: DataFrame, signatures: DataFrame
) -> DataFrame:
    """(doc_new, doc_old) candidate pairs between an ingest batch and
    an indexed corpus — the production shape: per-ingest cost is
    O(|batch|) signatures plus one equi-join against the signature
    table on (band, key), never a corpus-wide recompute. With the
    signature table stored bucketed on the band key, the join
    shuffles only the batch side."""
    new_keyed = _band_keyed(new_docs).select(
        F.col("doc_id").alias("doc_new"), "band", "key"
    )
    hits = new_keyed.join(
        signatures.select(F.col("doc_id").alias("doc_old"), "band", "key"),
        ["band", "key"],
    ).filter(F.col("doc_new") != F.col("doc_old"))
    return hits.select("doc_new", "doc_old").distinct()


def oversize_minhash_buckets(
    corpus: DataFrame, max_bucket: int = MAX_MINHASH_BUCKET
) -> DataFrame:
    """Audit companion to minhash_candidate_pairs: the (band, key,
    n_members) rows skipped by the bucket-size cap — the drop is
    recorded as data, never silent."""
    return (
        _band_keyed(corpus)
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket)
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors (same constructions, string form)
# ---------------------------------------------------------------------------


def sql_words(text_expr: str) -> str:
    return (
        "string_split_regex(trim(regexp_replace("
        f"{text_expr}, '\\s+', ' ', 'g')), ' ')"
    )


def sql_shingles(text_expr: str, k: int = SHINGLE_K) -> str:
    words = sql_words(text_expr)
    return (
        f"list_transform(range(0, greatest(len({words}) - {k}, 0) + 1), "
        f"i -> array_to_string(({words})[i + 1 : i + {k}], ' '))"
    )


def sql_minhash(shingles_expr: str, seed: int) -> str:
    """Mirror of minhash_col: min over the seed's integer mix of each
    shingle's 60-bit truncated-md5 base (fixed-width hex ⇒ integer
    order == lexicographic order; all mix intermediates BIGINT-exact)."""
    h0 = "CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)"
    h1 = "CAST('0x' || substr(md5(s), 16, 15) AS BIGINT)"
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"s -> {_sql_mix(h0, h1, seed)}))"
    )


def sql_band_keys(
    shingles_expr: str, bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS
) -> str:
    keys = []
    for j in range(bands):
        parts = " || ':' || ".join(
            f"CAST({sql_minhash(shingles_expr, j * rows + r)} AS VARCHAR)"
            for r in range(rows)
        )
        keys.append(f"md5({parts})")
    return "[" + ", ".join(keys) + "]"


def sql_winnow_fingerprint(text_expr: str, w: int = WINNOW_WINDOW) -> str:
    h = (
        f"list_transform({sql_shingles(text_expr)}, "
        "s -> CAST('0x' || substr(md5('w:' || s), 1, 15) AS BIGINT))"
    )
    mins = (
        f"list_transform(range(0, greatest(len({h}) - {w}, 0) + 1), "
        f"i -> list_min(({h})[i + 1 : i + {w}]))"
    )
    return f"array_to_string(list_sort(list_distinct({mins})), ',')"


def sql_simhash(text_expr: str, bits: int = SIMHASH_BITS) -> str:
    hashed = f"list_transform(list_distinct({sql_words(text_expr)}), w -> md5(w))"
    terms = []
    for p in range(bits):
        hex_pos = 1 + p // 4
        bit_shift = 3 - (p % 4)
        digit = f"(instr('{_HEX}', substr(h, {hex_pos}, 1)) - 1)"
        score = (
            f"list_sum(list_transform(hw, h -> CASE WHEN "
            f"CAST(floor({digit} / {2 ** bit_shift}) AS INT) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {score} > 0 THEN {2 ** p} ELSE 0 END)")
    return (
        "(SELECT " + " + ".join(terms) + f" FROM (SELECT {hashed} AS hw) _sh)"
    )


def sql_mutated_text(text_expr: str = "text", n_chars_expr: str = "n_chars") -> str:
    return (
        f"trim(substr({text_expr}, 1, greatest("
        f"CAST(floor({n_chars_expr} * {MUTATE_KEEP}) AS INT), 40)))"
    )


def sql_neardup_corpus() -> str:
    """CTE body for the derived corpus over the `documents` view."""
    return f"""
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {NEARDUP_OFFSET} AS doc_id,
               {sql_mutated_text()} AS text
        FROM documents
    """


def sql_minhash_pairs() -> str:
    return f"""
        WITH corpus AS ({sql_neardup_corpus()}),
        shingled AS (
            SELECT doc_id, {sql_shingles('text')} AS sh FROM corpus
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys('sh')}) AS key
            FROM shingled
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM keyed a JOIN keyed b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """


def sql_neardup_survivors() -> str:
    """Oracle for the streaming near-dup drain: keep docs with no
    LSH candidate partner of lower id — with id-ordered arrival this
    is exactly what neardup_batch_step emits across batches."""
    return f"""
        WITH pairs AS ({sql_minhash_pairs()}),
        corpus AS ({sql_neardup_corpus()})
        SELECT doc_id FROM corpus
        WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """


def sql_simhash_signatures() -> str:
    return f"""
        SELECT doc_id, {sql_simhash('text')} AS simhash
        FROM documents
    """


def sql_jaccard_pairs(threshold: float) -> str:
    mut = sql_mutated_text("o.text", "o.n_chars")
    return f"""
        WITH pairs AS (
            SELECT o.doc_id AS doc_a,
                   o.doc_id + {NEARDUP_OFFSET} AS doc_b,
                   list_distinct({sql_shingles('o.text')}) AS sa,
                   list_distinct({sql_shingles(mut)}) AS sb
            FROM documents o
        )
        SELECT doc_a, doc_b,
               round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                     / (len(sa) + len(sb) - len(list_intersect(sa, sb))),
                     6) AS jaccard
        FROM pairs
        WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
              / (len(sa) + len(sb) - len(list_intersect(sa, sb)))
              >= {threshold}
    """


def sql_incremental_pairs(max_bucket: int = MAX_MINHASH_BUCKET) -> str:
    """Oracle for incremental dedup: originals are the indexed corpus,
    their mutants are the ingest batch; same band keys, same
    oversize-bucket drop on the indexed side only."""
    return f"""
        WITH old_sh AS (
            SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
        ),
        old_k AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys('sh')}) AS key
            FROM old_sh
        ),
        ok AS (
            SELECT band, key FROM old_k GROUP BY band, key
            HAVING count(*) <= {max_bucket}
        ),
        old_ok AS (
            SELECT o.* FROM old_k o JOIN ok USING (band, key)
        ),
        new_sh AS (
            SELECT doc_id + {NEARDUP_OFFSET} AS doc_id,
                   {sql_shingles(sql_mutated_text())} AS sh
            FROM documents
        ),
        new_k AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys('sh')}) AS key
            FROM new_sh
        )
        SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM new_k n JOIN old_ok o USING (band, key)
        WHERE n.doc_id != o.doc_id
    """


# ---------------------------------------------------------------------------
# T104 — LSH threshold tuning curve
# ---------------------------------------------------------------------------
#
# The S-curve every MinHash deployment is tuned against: with b bands
# of r rows, a pair at Jaccard s collides with probability
# 1 - (1 - s^r)^b.  Publishing the curve for the shipped (b, r) is how
# the dedup threshold choice is justified and reviewed; the math runs
# identically in both engines (pure double powers, 6dp).


def lsh_tuning_curve(
    spark, bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS
) -> "DataFrame":
    """(s, p_collide) for s = 0.05 .. 0.95 step 0.05 under the shipped
    band/row configuration."""
    grid = spark.range(1, 20).select(
        F.round(F.col("id").cast("double") * 0.05, 2).alias("s")
    )
    p = F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(F.col("s"), F.lit(float(rows))), F.lit(float(bands))
    )
    return grid.select("s", F.round(p, 6).alias("p_collide"))


def sql_lsh_tuning_curve(
    bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS
) -> str:
    return f"""
        SELECT round(CAST(i AS DOUBLE) * 0.05, 2) AS s,
               round(1.0 - pow(1.0 - pow(round(CAST(i AS DOUBLE) * 0.05, 2),
                                         {float(rows)!r}),
                               {float(bands)!r}), 6) AS p_collide
        FROM (SELECT unnest(range(1, 20)) AS i)
    """


# ---------------------------------------------------------------------------
# T109 — verified-pair Jaccard histogram
# ---------------------------------------------------------------------------
#
# lsh_tuning_curve (T104) is the THEORY; this is the corpus's actual
# similarity mass: the distribution of exact Jaccard over the verified
# candidate pairs, in 0.05 buckets.  Reviewing the two together is how
# the dedup threshold gets picked — a valley in the histogram is where
# the cut belongs.  One bucket agg over the pair table; integer bucket
# keys, exact cross-engine.


def jaccard_histogram(docs: DataFrame) -> DataFrame:
    """(bucket_lo, n_pairs) over the planted (orig, mutant) verified
    pairs, bucket = floor(jaccard * 20) / 20."""
    mut = _mutated_text(F.col("text"), F.col("n_chars"))
    j = jaccard_col(shingles_col(F.col("text")), shingles_col(mut))
    bucket = F.round(F.floor(j * 20).cast("double") / 20, 2)
    return (
        docs.select(bucket.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def sql_jaccard_histogram() -> str:
    mut = sql_mutated_text("o.text", "o.n_chars")
    return f"""
        WITH pairs AS (
            SELECT list_distinct({sql_shingles('o.text')}) AS sa,
                   list_distinct({sql_shingles(mut)}) AS sb
            FROM documents o
        ),
        j AS (
            SELECT round(CAST(floor(
                       CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                       / (len(sa) + len(sb) - len(list_intersect(sa, sb)))
                       * 20) AS DOUBLE) / 20, 2) AS bucket_lo
            FROM pairs
        )
        SELECT bucket_lo, CAST(count(*) AS BIGINT) AS n_pairs
        FROM j GROUP BY bucket_lo
    """


# ---------------------------------------------------------------------------
# T115 — LSH candidate precision audit
# ---------------------------------------------------------------------------
#
# The other half of the tuning story: T104 gives the theoretical
# S-curve, T109 the corpus's similarity mass — this measures what the
# deployed (bands, rows) ACTUALLY delivers: of the candidate pairs the
# buckets emit, how many survive exact Jaccard verification.  Low
# precision = wasted verify compute; the number that justifies (or
# re-tunes) the band configuration on every corpus.


def lsh_precision(
    corpus: DataFrame,
    threshold: float = 0.5,
    max_bucket: int = MAX_MINHASH_BUCKET,
) -> DataFrame:
    """One row: (n_candidates, n_verified, precision) over the LSH
    candidate pairs of ``corpus(doc_id, text)``."""
    pairs = minhash_candidate_pairs(corpus, max_bucket)
    sh = corpus.select(
        F.col("doc_id"),
        F.array_distinct(shingles_col(F.col("text"))).alias("sh"),
    )
    ver = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sa"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sb"), "doc_b")
        .select(jaccard_col(F.col("sa"), F.col("sb")).alias("j"))
    )
    return ver.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum((F.col("j") >= threshold).cast("bigint"))
        .cast("bigint")
        .alias("n_verified"),
    ).select(
        "n_candidates",
        "n_verified",
        F.round(
            F.col("n_verified").cast("double")
            / F.col("n_candidates").cast("double"),
            6,
        ).alias("precision"),
    )


def sql_lsh_precision(
    threshold: float = 0.5, max_bucket: int = MAX_MINHASH_BUCKET
) -> str:
    return f"""
        WITH corpus AS ({sql_neardup_corpus()}),
        shingled AS (
            SELECT doc_id, {sql_shingles('text')} AS sh,
                   list_distinct({sql_shingles('text')}) AS sd
            FROM corpus
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys('sh')}) AS key
            FROM shingled
        ),
        ok AS (
            SELECT band, key FROM keyed GROUP BY band, key
            HAVING count(*) <= {max_bucket}
        ),
        keyed_ok AS (
            SELECT k.* FROM keyed k JOIN ok USING (band, key)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM keyed_ok a JOIN keyed_ok b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        ver AS (
            SELECT CAST(len(list_intersect(sa.sd, sb.sd)) AS DOUBLE)
                   / (len(sa.sd) + len(sb.sd)
                      - len(list_intersect(sa.sd, sb.sd))) AS j
            FROM pairs p
            JOIN shingled sa ON p.doc_a = sa.doc_id
            JOIN shingled sb ON p.doc_b = sb.doc_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN j >= {threshold} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_verified,
               round(CAST(sum(CASE WHEN j >= {threshold} THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS precision
        FROM ver
    """


# ---------------------------------------------------------------------------
# T130 — containment (asymmetric near-dup / quote inclusion)
# ---------------------------------------------------------------------------
#
# Symmetric Jaccard misses the commonest web-duplication shape:
# a SHORT passage quoted inside a LONG aggregator page (Jaccard is
# diluted by the host page's size; containment |Sq ∩ Sa| / |Sq| is
# not — Broder's original distinction).  The operator plants a
# partially-quoted passage (doc d's leading words inside doc d+1's
# page, planted length varying by doc_id) and measures both metrics
# side by side; the flags column shows containment catching what
# Jaccard cannot.  Construction is test scaffolding — the MEASUREMENT
# is per-pair column math over shingle arrays, the same shape the
# verify stage of T2/T4 runs on real candidate pairs.
#
# Scale shape: one equi-join on adjacent ids for the planted pair
# (at scale the aggregator pages already exist in the corpus; real
# use verifies LSH candidates, T115's path); the set math is
# in-row array expressions — no extra shuffle.

QUOTE_WORDS = 20
QUOTE_MIN_PLANT = 10
CONTAIN_THRESH = 0.6
JACCARD_THRESH = 0.5


def quote_containment(docs: DataFrame) -> DataFrame:
    """(doc_id, n_quote_sh, jaccard, containment, jaccard_flag,
    containment_flag): doc d's leading QUOTE_WORDS words planted
    (truncated to 10 + d%11 words) inside doc d+1's page."""
    words = words_col(F.col("text"))
    quote_text = F.concat_ws(" ", F.slice(words, 1, QUOTE_WORDS))
    plant_n = (F.col("doc_id") % 11 + QUOTE_MIN_PLANT).cast("int")
    planted_text = F.concat_ws(" ", F.slice(words, F.lit(1), plant_n))
    a = docs.select("doc_id", "text", quote_text.alias("quote"),
                    planted_text.alias("planted"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("text").alias("next_text"),
    )
    paired = a.join(b, "doc_id")
    agg_page = F.concat(F.col("next_text"), F.lit(" "), F.col("planted"))
    sq = F.array_distinct(shingles_col(F.col("quote")))
    sa = F.array_distinct(shingles_col(agg_page))
    so = F.array_distinct(shingles_col(F.col("text")))
    inter_qa = F.size(F.array_intersect(sq, sa))
    inter_oa = F.size(F.array_intersect(so, sa))
    containment = F.round(
        inter_qa.cast("double") / F.size(sq).cast("double"), 6
    )
    jaccard = F.round(
        inter_oa.cast("double")
        / (F.size(so) + F.size(sa) - inter_oa).cast("double"),
        6,
    )
    return paired.select(
        "doc_id",
        F.size(sq).cast("bigint").alias("n_quote_sh"),
        jaccard.alias("jaccard"),
        containment.alias("containment"),
        (jaccard >= JACCARD_THRESH).alias("jaccard_flag"),
        (containment >= CONTAIN_THRESH).alias("containment_flag"),
    )


def sql_quote_containment() -> str:
    w = sql_words("o.text")
    quote = f"array_to_string(({w})[1:{QUOTE_WORDS}], ' ')"
    plant = (
        f"array_to_string(({w})[1:CAST(o.doc_id % 11 + {QUOTE_MIN_PLANT} "
        f"AS INT)], ' ')"
    )
    return f"""
        WITH paired AS (
            SELECT o.doc_id, o.text,
                   {quote} AS quote,
                   n.text || ' ' || {plant} AS agg_page
            FROM documents o JOIN documents n ON n.doc_id = o.doc_id + 1
        ),
        sets AS (
            SELECT doc_id,
                   list_distinct({sql_shingles("quote")}) AS sq,
                   list_distinct({sql_shingles("agg_page")}) AS sa,
                   list_distinct({sql_shingles("text")}) AS so
            FROM paired
        )
        SELECT doc_id,
               CAST(len(sq) AS BIGINT) AS n_quote_sh,
               round(CAST(len(list_intersect(so, sa)) AS DOUBLE)
                     / (len(so) + len(sa) - len(list_intersect(so, sa))),
                     6) AS jaccard,
               round(CAST(len(list_intersect(sq, sa)) AS DOUBLE)
                     / CAST(len(sq) AS DOUBLE), 6) AS containment,
               round(CAST(len(list_intersect(so, sa)) AS DOUBLE)
                     / (len(so) + len(sa) - len(list_intersect(so, sa))),
                     6) >= {JACCARD_THRESH!r} AS jaccard_flag,
               round(CAST(len(list_intersect(sq, sa)) AS DOUBLE)
                     / CAST(len(sq) AS DOUBLE), 6) >= {CONTAIN_THRESH!r}
                   AS containment_flag
        FROM sets
    """


# ---------------------------------------------------------------------------
# T134 — edit-distance verification of LSH candidate pairs
# ---------------------------------------------------------------------------
#
# The missing middle of the MinHash pipeline: LSH emits CANDIDATES
# (band collisions), Jaccard verifies set overlap — but set measures
# are blind to ORDER, so "a b c ... z" and its reversal verify as
# near-identical.  Production dedup (Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better" uses exact substrings;
# SimHash/MinHash pipelines typically add an edit-ratio gate) confirms
# candidates with a sequence-aware measure.  Levenshtein is O(len_a *
# len_b) per pair, so the verify stage (a) only ever runs on the
# LSH-bounded candidate set, never all pairs, and (b) compares fixed
# PREFIXES (EDIT_VERIFY_PREFIX chars) — the standard truncation that
# bounds per-pair cost at a constant while preserving the decision for
# documents that are near-dups end-to-end.  The joins that attach text
# to the pair list carry only the truncated prefixes (<= 400 bytes
# per row), never whole documents.

EDIT_VERIFY_PREFIX = 400
EDIT_SIM_THRESHOLD = 0.8


def edit_verify_pairs(
    corpus: DataFrame,
    pairs: DataFrame | None = None,
    prefix: int = EDIT_VERIFY_PREFIX,
    threshold: float = EDIT_SIM_THRESHOLD,
) -> DataFrame:
    """(doc_a, doc_b, edit_dist, edit_sim, is_dup): Levenshtein verify
    of each candidate pair over ``prefix``-truncated texts.
    edit_sim = 1 - dist / max(len_a, len_b) (6dp)."""
    if pairs is None:
        pairs = minhash_candidate_pairs(corpus)
    t = corpus.select(
        F.col("doc_id"), F.substring("text", 1, prefix).alias("t")
    )
    j = (
        pairs.join(
            t.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta")),
            "doc_a",
        )
        .join(
            t.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb")),
            "doc_b",
        )
    )
    dist = F.levenshtein("ta", "tb")
    denom = F.greatest(F.length("ta"), F.length("tb"), F.lit(1))
    sim = F.round(
        F.lit(1.0) - dist.cast("double") / denom.cast("double"), 6
    )
    return j.select(
        "doc_a",
        "doc_b",
        dist.cast("bigint").alias("edit_dist"),
        sim.alias("edit_sim"),
        (sim >= threshold).alias("is_dup"),
    )


def sql_edit_verify(
    prefix: int = EDIT_VERIFY_PREFIX, threshold: float = EDIT_SIM_THRESHOLD
) -> str:
    return f"""
        WITH corpus AS ({sql_neardup_corpus()}),
        pairs AS ({sql_minhash_pairs()}),
        t AS (SELECT doc_id, substr(text, 1, {prefix}) AS t FROM corpus),
        j AS (
            SELECT p.doc_a, p.doc_b,
                   levenshtein(a.t, b.t) AS d,
                   greatest(length(a.t), length(b.t), 1) AS m
            FROM pairs p
            JOIN t a ON a.doc_id = p.doc_a
            JOIN t b ON b.doc_id = p.doc_b
        )
        SELECT doc_a, doc_b,
               CAST(d AS BIGINT) AS edit_dist,
               round(1.0 - CAST(d AS DOUBLE) / CAST(m AS DOUBLE), 6)
                   AS edit_sim,
               round(1.0 - CAST(d AS DOUBLE) / CAST(m AS DOUBLE), 6)
                   >= {threshold!r} AS is_dup
        FROM j
    """


# ---------------------------------------------------------------------------
# T145 — per-document n-gram novelty (df==1 shingle fraction)
# ---------------------------------------------------------------------------
#
# The document-level uniqueness signal (Dolma's "uniqueness" /
# RefinedWeb's duplicated-fraction complement): what fraction of a
# doc's distinct k-gram shingles appear in NO other document.  Low
# novelty means the doc is assembled from corpus-common material
# (mirrors, templates, wire-copy reprints) even when no single pair
# crosses a near-dup threshold — the long-tail duplication mass
# MinHash pair detection (T2) structurally misses.
#
# Scale shape: shingle hashes only (8-byte bigints, never shingle
# text) cross the wire; (doc, gram) distinct + gram-df agg + one
# key-only join back — all map-side combined, no candidate pair set,
# no O(n²) anywhere.


def ngram_novelty(
    docs: DataFrame,
    k: int = SHINGLE_K,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): distinct k-gram shingle
    count, how many have corpus document-frequency 1, and their
    fraction (6dp)."""
    key = F.col(key_col)
    dg = (
        docs.select(
            key.alias("doc_id"),
            F.explode(shingles_col(F.col(text_col), k)).alias("g"),
        )
        .select("doc_id", _hash60(F.col("g")).alias("h"))
        .distinct()
    )
    df_tbl = dg.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    per = (
        dg.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.round(
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
            6,
        ).alias("novelty"),
    )


def sql_ngram_novelty(k: int = SHINGLE_K) -> str:
    sh = sql_shingles("text", k)
    return f"""
        WITH dg AS (
            SELECT DISTINCT doc_id,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
            FROM (SELECT doc_id, unnest({sh}) AS g FROM documents)
        ),
        dftbl AS (SELECT h, count(*) AS df FROM dg GROUP BY h),
        per AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_novel
            FROM dg JOIN dftbl USING (h) GROUP BY doc_id
        )
        SELECT doc_id, n_grams, n_novel,
               round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
                   AS novelty
        FROM per
    """


# ---------------------------------------------------------------------------
# T160 — near-dup graph transitivity audit (global clustering coefficient)
# ---------------------------------------------------------------------------
#
# Cluster-then-keep-one dedup (T29/T68) treats near-duplication as an
# equivalence relation; real near-dup similarity is NOT transitive (A~B
# and B~C at 0.8 Jaccard can leave A,C at 0.6), and how badly it fails
# decides whether connected components over-merge.  The global
# clustering coefficient of the LSH candidate-pair graph — 3*triangles
# / open-triads — is the one-number audit: near 1.0 means clusters are
# cliques (component dedup is safe), low values mean long chains are
# fusing unrelated docs and the verify-stage threshold (T4/T134) must
# gate membership instead.
#
# Scale shape: the pair list is LSH-bounded (only near-dups collide,
# oversize buckets capped), so the triangle join runs over candidate
# EDGES, never the corpus; triads come from one degree aggregation.
# Integer counts, one final double division.


def dup_transitivity(corpus: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, n_triangles, n_triads,
    clustering_coeff): transitivity of the MinHash-LSH candidate-pair
    graph over ``corpus`` (doc_id, text)."""
    edges = minhash_candidate_pairs(corpus).select("doc_a", "doc_b")
    deg = (
        edges.select(F.col("doc_a").alias("v"))
        .unionByName(edges.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    nodes_triads = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias(
            "n_triads"
        ),
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    m = nodes_triads.crossJoin(F.broadcast(tri)).crossJoin(
        F.broadcast(edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
    )
    cc = F.when(
        F.col("n_triads") > 0,
        F.round(
            3.0 * F.col("n_triangles").cast("double")
            / F.col("n_triads").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return m.select(
        "n_nodes", "n_edges", "n_triangles", "n_triads",
        cc.alias("clustering_coeff"),
    )


def sql_dup_transitivity() -> str:
    return f"""
        WITH edges AS (
            SELECT doc_a, doc_b FROM ({sql_minhash_pairs()})
        ),
        deg AS (
            SELECT v, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT doc_a AS v FROM edges
                  UNION ALL SELECT doc_b AS v FROM edges)
            GROUP BY v
        ),
        nt AS (
            SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_triads
            FROM deg
        ),
        tri AS (
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM edges e1
            JOIN edges e2 ON e1.doc_b = e2.doc_a
            JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        ),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
        SELECT n_nodes, n_edges, n_triangles, n_triads,
               CASE WHEN n_triads > 0
                    THEN round(3.0 * CAST(n_triangles AS DOUBLE)
                               / CAST(n_triads AS DOUBLE), 6)
                    ELSE 0.0 END AS clustering_coeff
        FROM nt, tri, ne
    """


def minhash_band_stats(
    corpus: DataFrame, max_bucket: int = MAX_MINHASH_BUCKET
) -> DataFrame:
    """T182 (band, n_buckets, n_docs, n_singleton, max_bucket,
    n_pairs, n_over_cap): the LSH health dashboard — per-band bucket
    census the MAX_MINHASH_BUCKET cap and the (bands, rows) tuning are
    reviewed against.  n_pairs is the exact candidate-pair mass
    sum(sz*(sz-1)/2); a band whose n_pairs explodes or whose
    n_over_cap grows is the first sign boilerplate is gluing the
    corpus into degenerate buckets.

    Scale shape: bucket sizes come from ONE map-side-combined
    (band, key) count (the same shuffle the candidate join pays —
    never shingles); the per-band rollup is bounded at MINHASH_BANDS
    rows.  Integer arithmetic end-to-end so the oracle is exact."""
    sizes = (
        _band_keyed(corpus)
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum((F.col("sz") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_singleton"),
            F.max("sz").cast("bigint").alias("max_bucket"),
            F.sum(F.expr("(sz * (sz - 1)) div 2"))
            .cast("bigint")
            .alias("n_pairs"),
            F.sum((F.col("sz") > max_bucket).cast("bigint"))
            .cast("bigint")
            .alias("n_over_cap"),
        )
        .orderBy("band")
    )


def sql_minhash_band_stats(max_bucket: int = MAX_MINHASH_BUCKET) -> str:
    return f"""
        WITH corpus AS ({sql_neardup_corpus()}),
        shingled AS (
            SELECT doc_id, {sql_shingles('text')} AS sh FROM corpus
        ),
        keyed AS (
            SELECT doc_id,
                   unnest(range(0, {MINHASH_BANDS})) AS band,
                   unnest({sql_band_keys('sh')}) AS key
            FROM shingled
        ),
        sizes AS (
            SELECT band, key, CAST(count(*) AS BIGINT) AS sz
            FROM keyed GROUP BY band, key
        )
        SELECT band,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(sz) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singleton,
               CAST(max(sz) AS BIGINT) AS max_bucket,
               CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN sz > {max_bucket} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over_cap
        FROM sizes GROUP BY band
    """


SWEEP_THRESHOLDS_MILLI = (700, 800, 900)


def dedup_threshold_sweep(
    docs: DataFrame,
    thresholds_milli: tuple = SWEEP_THRESHOLDS_MILLI,
) -> DataFrame:
    """T184 (threshold_milli, n_pairs): how many planted near-dup
    pairs a Jaccard gate keeps at each candidate threshold — the
    evidence table the production cutoff (T4's 0.8) is chosen from,
    computed from ONE pair-Jaccard pass.

    Jaccard is quantized to exact integer milli units
    ((1000*|∩|) div |∪|) BEFORE comparison, so the sweep is
    bit-identical across engines — no float-boundary flakiness at the
    exact threshold.  Scale shape: the pair set is the bounded planted
    (doc, mutant) pairing (production feeds `minhash_candidate_pairs`
    here); the sweep itself is one conditional aggregation."""
    pairs = docs.select(
        "doc_id",
        F.array_distinct(shingles_col(F.col("text"))).alias("sa"),
        F.array_distinct(
            shingles_col(_mutated_text(F.col("text"), F.col("n_chars")))
        ).alias("sb"),
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("bigint")
    union = (
        F.size("sa").cast("bigint") + F.size("sb").cast("bigint") - inter
    )
    jac_milli = F.expr(
        f"({1000} * CAST(size(array_intersect(sa, sb)) AS BIGINT)) div "
        "(CAST(size(sa) AS BIGINT) + CAST(size(sb) AS BIGINT)"
        " - CAST(size(array_intersect(sa, sb)) AS BIGINT))"
    )
    j = pairs.select(jac_milli.alias("jm"))
    counts = j.agg(
        *[
            F.sum((F.col("jm") >= t).cast("bigint")).alias(f"c{t}")
            for t in thresholds_milli
        ]
    )
    stacked = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("int").alias("threshold_milli"),
                        F.col(f"c{t}").cast("bigint").alias("n_pairs"),
                    )
                    for t in thresholds_milli
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.threshold_milli", "s.n_pairs")


def sql_dedup_threshold_sweep(
    thresholds_milli: tuple = SWEEP_THRESHOLDS_MILLI,
) -> str:
    mut = sql_mutated_text("text", "n_chars")
    arms = " UNION ALL ".join(
        f"""SELECT CAST({t} AS INTEGER) AS threshold_milli,
                   CAST(sum(CASE WHEN jm >= {t} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pairs
            FROM j"""
        for t in thresholds_milli
    )
    return f"""
        WITH pairs AS (
            SELECT list_distinct({sql_shingles('text')}) AS sa,
                   list_distinct({sql_shingles(mut)}) AS sb
            FROM documents
        ),
        j AS (
            SELECT (1000 * CAST(len(list_intersect(sa, sb)) AS BIGINT))
                   // (CAST(len(sa) AS BIGINT) + CAST(len(sb) AS BIGINT)
                       - CAST(len(list_intersect(sa, sb)) AS BIGINT))
                       AS jm
            FROM pairs
        )
        {arms}
    """
