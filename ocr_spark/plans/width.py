"""Plan-width control for CPU-bound stages.

File scans inherit their partitioning from input *bytes*
(``spark.sql.files.maxPartitionBytes`` over parquet row groups).
That sizing is right for I/O-bound plans but wrong for the
gram-explosion stages of the dedup/curation stack, whose CPU cost per
input byte is 10-100x a scan's: tokenize -> k-word shingles -> md5
per gram multiplies every text byte into many hashed rows before the
first exchange. Two failure shapes, same cause:

* locally (and on any small table) a single-row-group file is
  unsplittable, so the whole corpus tokenizes on ONE core while the
  other 31 idle — measured 5.8 s single-task vs <1 s spread for the
  sf0.1 2-gram pass;
* on a crawl, a 128 MB compressed row group is ~0.5 GB of raw text
  and a multi-hour straggler for a shingle-hash stage sized for
  128 MB of *scan* work.

``spread_cpu`` inserts one explicit round-robin exchange of the raw
rows before such stages. The exchange ships each text byte exactly
once — strictly cheaper than the downstream explode that ships (or
aggregates) every gram — and caps the straggler at 1/parts of the
corpus. It is a no-op when the scan is already at least ``min_parts``
wide, so on a well-laid-out production table it costs nothing.

Only safe for partition-order-independent computations (integer/hash
aggregation, per-row projection). Float-fold operators whose oracles
pin a partial-sum association (k-means, PQ training, PageRank) must
keep their input partitioning.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def spread_cpu(df: DataFrame, min_parts: Optional[int] = None) -> DataFrame:
    """Round-robin ``df`` across at least ``min_parts`` partitions
    (default: the cluster's defaultParallelism) ahead of CPU-bound
    per-row work; no-op when the plan is already that wide."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    # An explicitly repartitioned frame is already width-managed; skip
    # without probing .rdd — under AQE, an identical executed shuffle
    # can be REUSED and coalesced, making getNumPartitions() report
    # the coalesced width and a naive probe re-add the exchange.
    # Only the plan ROOT counts: a repartition at the root is "the
    # caller just width-managed this exact frame"; a repartition
    # buried upstream (e.g. a narrow 2-way one below a filter) says
    # nothing about the width reaching the CPU-bound stage, and a
    # whole-plan string match would wrongly suppress the spread there.
    root = df._jdf.queryExecution().analyzed().nodeName()
    if root in ("Repartition", "RepartitionByExpression"):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
