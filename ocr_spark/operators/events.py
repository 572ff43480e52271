"""Event-time operators: as-of join and gap sessionization.

The reference's analytics surface is status rollups over its task
tables (database.py get_task_stats*); a crawl/teletry pipeline also
needs the two classic event-time shapes Spark has no built-in for:

* **As-of join** (``asof_join``) — for each left row, the latest right
  row with ``right.ts <= left.ts`` per key.  Implemented as the
  union-merge pattern: tag both sides, one hash exchange on the key,
  one sort within partitions by (ts, side, seq), then a running
  ``last(value, ignorenulls)`` window — O(n log n) per partition, no
  range-join row blow-up, no per-row Python.  At 10^12 rows both
  sides shuffle once on the key; compare a naive range join, whose
  candidate set is quadratic per key.
* **Sessionization** (``sessionize``) — gap-based session ids via
  lag + running sum over the same single exchange, then a per-session
  rollup.  The standard training-data shape for user-activity logs.

Both are stated identically in DuckDB for the oracle (DuckDB has a
native ASOF JOIN — the mirror uses it, so the Spark plan is checked
against an independent implementation, not a restatement of itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_SESSION_GAP_MIN = 30


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """Left rows + ``asof_<value_col>``: the value of the latest right
    row at-or-before the left row's timestamp, per key (NULL when no
    right row precedes).

    Right rows are first reduced to one per (key, ts) — the row with
    the greatest ``value_col`` — so tie semantics are deterministic
    and match DuckDB's ASOF JOIN against the same reduced side.  The
    left row's own columns ride through the union (no (key, ts)
    join-back, which would duplicate rows on timestamp ties).
    """
    passthrough = [c for c in left.columns if c not in (key, ts)]
    r = (
        right.groupBy(key, ts)
        .agg(F.max(value_col).alias("_asof_v"))
        .select(
            key,
            ts,
            "_asof_v",
            F.lit(0).alias("_side"),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in passthrough
            ],
        )
    )
    l = left.select(
        key,
        ts,
        F.lit(None).cast(r.schema["_asof_v"].dataType).alias("_asof_v"),
        F.lit(1).alias("_side"),
        *passthrough,
    )
    # (ts, side) ordering puts the right row first at equal timestamps,
    # so the match is inclusive (right.ts <= left.ts) like DuckDB ASOF.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "_asof", F.last("_asof_v", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_side") == 1).select(
        key, ts, *passthrough, F.col("_asof").alias(f"asof_{value_col}")
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = ASOF_SESSION_GAP_MIN,
) -> DataFrame:
    """Per-session rollup: a new session starts when the gap since the
    key's previous event exceeds ``gap_minutes``.  One exchange on the
    key; ids and the rollup ride the same partitioning."""
    order = [F.col(ts).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(key).orderBy(*order)
    # integer microseconds end-to-end: the testdata timestamps carry
    # microseconds, and second-truncating arithmetic (unix_timestamp /
    # DuckDB epoch) would disagree between engines at gap boundaries
    gap_us = gap_minutes * 60 * 1_000_000
    with_id = (
        events.withColumn("_prev", F.lag(ts).over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (
                    # cast NTZ->TZ for unix_micros (session tz is UTC;
                    # only differences are used, so any offset cancels)
                    F.unix_micros(F.col(ts).cast("timestamp"))
                    - F.unix_micros(F.col("_prev").cast("timestamp"))
                    > gap_us
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_idx",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return with_id.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max(ts), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        (
            F.unix_micros(F.max(ts).cast("timestamp"))
            - F.unix_micros(F.min(ts).cast("timestamp"))
        ).alias("duration_us"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------


def sql_asof_join(
    left_filter: str, right_filter: str, value_col: str = "value"
) -> str:
    """Native DuckDB ASOF JOIN over the same reduced right side — an
    independent implementation of the semantics, not a restatement of
    the Spark plan."""
    return f"""
        WITH l AS (
            SELECT event_id, user_id, ts, round(value, 6) AS value
            FROM events WHERE {left_filter}
        ),
        r AS (
            SELECT user_id, ts, max({value_col}) AS v
            FROM events WHERE {right_filter}
            GROUP BY user_id, ts
        )
        SELECT l.event_id, l.user_id,
               strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts, l.value,
               COALESCE(round(r.v, 6), CAST(-1.0 AS DOUBLE)) AS asof_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def sql_sessionize(gap_minutes: int = ASOF_SESSION_GAP_MIN) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
        WITH tagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        ids AS (
            SELECT user_id, ts, event_id, value,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM tagged
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
               round(sum(value), 6) AS total_value
        FROM ids
        GROUP BY user_id, session_idx
    """


# ---------------------------------------------------------------------------
# T94 — retention cohort matrix
# ---------------------------------------------------------------------------
#
# The standard product-analytics rollup a clickstream warehouse runs
# daily: users grouped by first-seen day (the cohort), activity
# counted by day offset from it.  Scale shape: the cohort table is one
# min-agg per user (map-side combined), reattached with one hash join
# on user_id, then one (cohort, offset) agg — no windows, no per-user
# state, every shuffled row is (bigint, date-int).

def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_day, offset_days, n_users, n_events): distinct active
    users and event volume per cohort x day-offset cell; cohort_day
    rendered as a string for cross-engine hash stability."""
    day = F.to_date("ts")
    first = (
        events.select(F.col("user_id"), day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
    )
    return (
        events.select("user_id", "event_id", day.alias("day"))
        .join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def sql_retention_cohorts() -> str:
    return """
        WITH first AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(CAST(e.ts AS DATE) - f.cohort_day AS BIGINT)
                   AS offset_days,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# T121 — burst detection (per-key rate anomaly)
# ---------------------------------------------------------------------------
#
# Crawl-ops monitoring: a host (here: user) whose hourly event count
# jumps more than Z_THRESH standard deviations above its own mean is
# a burst — a stuck recrawl loop, a spam injection, a misbehaving
# frontier shard.  Two map-side-combined aggregations (hour counts,
# then per-key moments) and one join; the moments are EXACT bigint
# sums (n, sum, sum of squares), so mean/variance derive from exact
# integers with one fixed-shape float expression — bit-reproducible
# across partitionings and mirrored verbatim by the oracle.

Z_THRESH = 2.0


def burst_detection(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    z_thresh: float = Z_THRESH,
) -> DataFrame:
    """(user_id, hour_s, n_events, z): the (key, hour) cells whose
    count exceeds the key's mean by ``z_thresh`` sigmas (population
    variance over the key's ACTIVE hours)."""
    hour = F.date_trunc("hour", F.col(ts_col))
    counts = (
        events.groupBy(F.col(key_col).alias("k"), hour.alias("hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    moments = counts.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    joined = counts.join(moments, "k")
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / n
    z = (F.col("c").cast("double") - mean) / F.sqrt(var)
    return (
        joined.filter((var > 0) & (z >= F.lit(z_thresh)))
        .select(
            F.col("k").alias(key_col),
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            F.col("c").cast("bigint").alias("n_events"),
            F.round(z, 6).alias("z"),
        )
    )


def sql_burst_detection(z_thresh: float = Z_THRESH) -> str:
    return f"""
        WITH counts AS (
            SELECT user_id AS k, date_trunc('hour', ts) AS hour,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ),
        moments AS (
            SELECT k, count(*) AS n,
                   CAST(sum(c) AS BIGINT) AS s,
                   CAST(sum(c * c) AS BIGINT) AS ss
            FROM counts GROUP BY k
        )
        SELECT k AS user_id,
               strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
               CAST(c AS BIGINT) AS n_events,
               round((CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                     / sqrt((CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                               / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)),
                     6) AS z
        FROM counts JOIN moments USING (k)
        WHERE (CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE) > 0
          AND (CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
              >= {z_thresh!r}
    """


# ---------------------------------------------------------------------------
# T125 — transition matrix (next-event Markov estimates)
# ---------------------------------------------------------------------------
#
# First-order Markov transitions over per-user event streams: the
# navigation model behind "what happens after a click" dashboards and
# the sequence prior for session-level bot scoring.  One window pass
# per user (ts order) to form (type -> next type) pairs, one
# map-side-combined pair count, then conditional probabilities from a
# bounded per-source window sum — at any corpus scale the result is
# |types|^2 rows.

def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(from_type, to_type, n, p): next-event transition counts and
    row-normalized probabilities (6dp); the terminal event of each
    user contributes nothing."""
    from pyspark.sql import Window as W

    seq = W.partitionBy(key_col).orderBy(ts_col, "event_id")
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(seq).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(total).cast("double"),
            6,
        ).alias("p"),
    )


def sql_transition_matrix() -> str:
    return """
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, count(*) AS n
            FROM pairs WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
                     6) AS p
        FROM counts
    """
