"""Rule-based content moderation as a pure column expression (M9).

The reference moderates every extracted page with a *second model
call* (core/content_moderator.py:105-184: gpt-4o-mini, 4000-char
truncation, fail-**closed** — any error means blocked, admin exempt).
A deterministic engine can't call a model; what it keeps is the
moderation *dataflow*: a (blocked BOOLEAN, reason STRING) verdict per
document, computed fail-closed, evaluated JVM-side so it never leaves
whole-stage codegen, feeding the same assembly filter (F7,
task_manager.py:527-530) the reference applies.

Rules (deterministic, ordered, first match wins):
  1. NULL/empty text            -> blocked 'empty'        (fail-closed)
  2. > MAX_CHARS characters     -> blocked 'too_long'
  3. contains a blocklist term  -> blocked 'blocked_term'
     (case-insensitive, the reference truncates to its first 4000
     chars before moderating — mirrored here)
  4. otherwise                  -> ok

The DuckDB mirror states the identical CASE expression, so the
verdict column is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_CHARS = 100_000
SCAN_CHARS = 4_000  # reference truncation, content_moderator.py:193-196
BLOCKLIST = ("badword", "forbidden", "blocked-content")

MODERATION_OK = "ok"


def moderation_reason(text: Column) -> Column:
    """STRING reason: 'empty' | 'too_long' | 'blocked_term' | 'ok'."""
    head = F.lower(F.substring(text, 1, SCAN_CHARS))
    term_hit = F.lit(False)
    for term in BLOCKLIST:
        term_hit = term_hit | head.contains(term)
    return (
        F.when(F.length(F.coalesce(text, F.lit(""))) == 0, F.lit("empty"))
        .when(F.length(text) > MAX_CHARS, F.lit("too_long"))
        .when(term_hit, F.lit("blocked_term"))
        .otherwise(F.lit(MODERATION_OK))
    )


def moderation_blocked(text: Column) -> Column:
    """BOOLEAN fail-closed verdict."""
    return moderation_reason(text) != MODERATION_OK


def sql_moderation_reason(text_expr: str) -> str:
    """DuckDB mirror of moderation_reason."""
    hits = " OR ".join(
        f"contains(lower(substr({text_expr}, 1, {SCAN_CHARS})), '{t}')"
        for t in BLOCKLIST
    )
    return f"""
        CASE WHEN length(coalesce({text_expr}, '')) = 0 THEN 'empty'
             WHEN length({text_expr}) > {MAX_CHARS} THEN 'too_long'
             WHEN {hits} THEN 'blocked_term'
             ELSE '{MODERATION_OK}' END
    """
