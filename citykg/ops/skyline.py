"""Pareto skyline (maximal-vector) operator.

The reference's query surface is filter/join/aggregate SQL; a skyline
("all parts not dominated on (price, size)") is the classic OLAP
operator that SQL can only express as a quadratic NOT EXISTS — which is
exactly what the DuckDB oracle runs. The Spark side instead uses the
sorted-prefix-minimum characterization so the plan is one range
exchange + per-partition sort, no self-join.

2-D minimization skyline on DISTINCT (x, y) pairs: sort by (x asc,
y asc); a pair is on the skyline iff no earlier pair in that order has
y <= its y. (Earlier means x' < x, or x' == x with y' < y — either way
y' <= y witnesses dominance, and conversely any dominator sorts
earlier with y' <= y.)

Distribution: a global sort would be one task. Instead the frame is
RANGE-partitioned on (x, y) — Spark's range partitioner samples the
keys, so partitions are contiguous x-slices — the prefix minimum is
computed per-partition with a bounded window, and the cross-partition
carry-in is the per-partition min(y) folded cumulatively over the
P-row partition-summary frame (driver-scale, like sampling's
two-pass rank offsets) and broadcast back. Each data row is touched
by exactly one exchange and one partition-local sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """All non-dominated DISTINCT (x, y) pairs under joint minimization.

    A pair p is dominated iff some q has q.x <= p.x and q.y <= p.y with
    q != p. Returns the skyline pairs as (x_col, y_col), exactly the
    rows DuckDB's NOT-EXISTS formulation keeps.
    """
    pairs = df.select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).distinct()
    rp = pairs.repartitionByRange(n_partitions, "_x", "_y").withColumn(
        "_pid", F.spark_partition_id()
    )
    # per-partition prefix min of y over the (x, y) sort order; the
    # window is partition-local so no single-task stage appears
    w = (
        Window.partitionBy("_pid")
        .orderBy("_x", "_y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = rp.withColumn("_pmin", F.min("_y").over(w))
    # carry-in: cumulative min(y) of all STRICTLY EARLIER partitions.
    # Range partitioning makes partition id order == (x, y) order, and
    # the summary frame is P rows — driver-scale, safe for the
    # unpartitioned cumulative window.
    summary = rp.groupBy("_pid").agg(F.min("_y").alias("_mn"))
    cw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    carry = summary.withColumn("_carry", F.min("_mn").over(cw)).select("_pid", "_carry")
    # Spark least() skips NULLs, so a first row / first partition with
    # no predecessor naturally yields NULL -> kept
    best_before = F.least("_pmin", "_carry")
    return (
        local.join(F.broadcast(carry), "_pid")
        .where(best_before.isNull() | (F.col("_y") < best_before))
        .select(F.col("_x").alias(x_col), F.col("_y").alias(y_col))
    )
