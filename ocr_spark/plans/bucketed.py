"""Bucketed-table layout — shuffle-free co-located joins for the
tables a curation pipeline joins REPEATEDLY.

The extraction output is joined on ``url`` by every downstream stage
(moderation verdicts, quality scores, dedup keep-lists, resume
audits). At 100 TB each such join would shuffle the full text-bearing
table; writing both sides bucketed on the join key ONCE makes every
subsequent equi-join co-located: Spark's bucket join matches the two
tables' bucket files pairwise and the plan contains no Exchange on
either side (and no sort either, when the buckets are written sorted
by the key).

This is the Spark analog of the reference's single-SQLite-file
locality (every reference query joins in-process,
models/database.py) — locality by layout instead of by living in one
process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TABLE_BUCKETS = 64


def save_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = DEFAULT_TABLE_BUCKETS,
    key: str | tuple[str, ...] = "url",
) -> None:
    """Write ``df`` as a parquet table bucketed AND sorted by ``key``
    (a column name or tuple of names — a join avoids shuffling the
    bucketed side when its equi-join keys cover the bucket columns).
    Bucket metadata lives in the session catalog; matching bucket
    counts on two tables make their equi-join exchange-free."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "url",
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. The
    plan reads matching bucket files pairwise — no shuffle of either
    side, regardless of table size."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
