"""Temporal operators over event streams: sessionization and as-of joins.

Spark has no native as-of join; both ops here are expressed as window
functions (lag + conditional cumsum / last-non-null over an ordered
union), which keeps them JVM-side, partition-parallel by key, and
byte-identical to a SQL oracle. The streaming twins are
`session_window(ts, gap)` / `applyInPandasWithState` — batch semantics
here match what those produce for closed windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds `gap_minutes`.

    One shuffle on user_col; cumsum is the standard lag+flag trick."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # double cast: TIMESTAMP_NTZ (common in parquet) has no direct long cast
    sec = F.col(ts_col).cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn("_new", new_sess).withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session row counts and duration (seconds)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(sec) - F.min(sec)).alias("duration_s"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row (same key,
    right.ts <= left.ts).

    Implemented as the ordered-union trick: tag both sides, sort within
    key by (ts, side), carry `last(right value, ignorenulls)` forward.
    One shuffle on the key — no range-join explosion, no per-row Python
    (pd.merge_asof in applyInPandas is the fallback for multi-column
    payloads; this stays JVM-side)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        on, ts_col, *[F.col(c).alias(f"_r_{c}") for c in right_cols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(r.columns).unionByName(r.select(r.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return out.where(F.col("_side") == 1).drop("_side", *[f"_r_{c}" for c in right_cols])


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Range (interval) join: attach every interval of the same key that
    contains the event's timestamp (start <= ts <= end, inclusive).

    Plan shape: the key equality makes this an EQUI-join with the range
    predicate as a residual filter — one hash exchange per side on
    key_col, no BroadcastNestedLoop, no cartesian. That is the right
    plan whenever a selective equi-key exists (here: per-user sessions).
    For keyless interval joins (pure time overlap at 100 TB) the scale
    path is time-bucketing: explode each interval to its covered coarse
    buckets, equi-join on (bucket), refine with the residual — same
    technique as ops.geo's grid-cell DWithin, one axis instead of two."""
    e = events.alias("e")
    i = intervals.alias("i")
    ts = F.col(f"e.{ts_col}")
    return e.join(
        i,
        (F.col(f"e.{key_col}") == F.col(f"i.{key_col}"))
        & ts.between(F.col(f"i.{start_col}"), F.col(f"i.{end_col}")),
    ).select(
        "e.*",
        F.col(f"i.{start_col}").alias(start_col),
        F.col(f"i.{end_col}").alias(end_col),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each key's state
    stream into validity intervals — one row per state CHANGE with
    [valid_from, valid_to) and a per-key version number; the open
    interval (valid_to NULL) is the current state. The standard
    warehouse pattern for turning an event log into a dimension an
    as-of join can consume (`asof_join` upstream in this module).

    Scale shape: two key-partitioned windows (lag to detect changes,
    lead/row_number over the collapsed rows) — partitions are bounded
    by per-key event counts, no global window, no self-join. Ordering
    ties on `ts_col` break by `tie_col` so the interval chain is
    deterministic on both engines.

    The change test is NULL-safe: a transition to or from a NULL state
    is a real state change (eqNullSafe here, IS DISTINCT FROM in the
    oracle), and the first row per key is detected positionally
    (row_number == 1) rather than by `lag IS NULL` — lag is also NULL
    when the previous state was legitimately NULL, which would wrongly
    keep consecutive NULL states."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    changed = (
        events.withColumn("_prev", F.lag(state_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col(state_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    return changed.select(
        F.col(key_col),
        F.row_number().over(w2).alias("version"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.when(F.lead(ts_col).over(w2).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )
