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


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per key under forward-hold semantics: each
    observation's value holds from its timestamp until the key's next
    observation (the last one carries no weight) — the TimescaleDB
    `time_weight('LOCF', ...)` aggregate for irregular samples, where a
    plain AVG over-counts whichever state happens to be sampled often.

    Scale shape: ONE key-partitioned window (lead) + one partial agg —
    partitions bounded by per-key event counts, no self-join, no global
    window. Epochs enter only as DIFFERENCES, so the parquet
    TIMESTAMP_NTZ vs TZ carrier shift cancels (same policy as the EWMA
    operator). Keys with a single observation have zero total hold time
    and are excluded (TWA undefined).

    Output: (key, n_events, span_s, twa)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    hold = F.lead(sec).over(w) - sec
    return (
        events.select(
            F.col(key_col), F.col(value_col).alias("_v"), hold.alias("_w")
        )
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("_w"), 6).alias("span_s"),
            F.round(F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"), 6).alias("twa"),
        )
        .where(F.col("span_s") > 0)
    )


def gapfill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar gap-fill with forward-fill: per key, one row for EVERY day
    between that key's first and last observation; days with no events
    carry the last observed daily total (LOCF) — the time-series spine
    every dashboarding/feature pipeline needs before resampling, since a
    groupBy alone silently drops empty buckets.

    Scale shape: daily totals are one partial agg; the spine is
    `sequence(min_day, max_day)` exploded from the per-key extent row —
    spine size is bounded by key_count x date_range, NOT event count, and
    never touches the raw events again. The fill is one key-partitioned
    window over the spine (bounded partitions). No driver-side calendar,
    no cross join against a global date dimension.

    Output: (key, day, day_value, n_events, is_observed)."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = events.groupBy(F.col(key_col), day.alias("day")).agg(
        F.round(F.sum(value_col), 6).alias("_obs_value"),
        F.count("*").cast("long").alias("_obs_n"),
    )
    spine = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            F.col(key_col),
            F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, [key_col, "day"], "left")
        .select(
            F.col(key_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("_obs_value", ignorenulls=True).over(w).alias("day_value"),
            F.coalesce("_obs_n", F.lit(0)).cast("long").alias("n_events"),
            F.when(F.col("_obs_n").isNotNull(), 1).otherwise(0).alias("is_observed"),
        )
    )


def rolling_daily_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
) -> DataFrame:
    """Trailing `window_days`-day moving average of the per-key DAILY
    value total, computed with a RANGE window frame over the day number —
    the frame is defined by TIME distance, not row count, so silent days
    shorten the window honestly instead of a ROWS frame silently reaching
    further back in time (the classic moving-average bug on sparse
    series).

    Plan shape: one partial agg to daily totals, then one key-partitioned
    RANGE window over the (key, day) frame — window input is bounded by
    key_count x date_range, never raw event count.

    Output: (key, day, day_value, roll_avg, n_days_in_window)."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = events.groupBy(F.col(key_col), day.alias("_day")).agg(
        F.round(F.sum(value_col), 6).alias("day_value")
    )
    daily = daily.withColumn("_day_num", F.datediff("_day", F.lit("1970-01-01")))
    w = (
        Window.partitionBy(key_col)
        .orderBy("_day_num")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        F.col(key_col),
        F.date_format("_day", "yyyy-MM-dd").alias("day"),
        "day_value",
        F.round(F.avg("day_value").over(w), 6).alias("roll_avg"),
        F.count("*").over(w).cast("long").alias("n_days_in_window"),
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


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate over inter-event
    gaps: each user's gap to their NEXT event is an observed duration;
    the user's final event is right-CENSORED at the corpus max
    timestamp (we know only that the next gap exceeds it). The
    estimator at duration t multiplies (1 - d_i/n_i) over all event
    times t_i <= t, with n_i = subjects still at risk.

    Plan shape: one per-user window (lead) to form durations — hash
    partitioning on the user key, the same economics as sessionize —
    then a per-duration aggregate; the cumulative product runs over the
    DISTINCT-duration frame (aggregate-level, not data-level; at 100 TB
    durations would be bucketed to a fixed grid first, noted here
    because the oracle demands exact seconds). The product is evaluated
    as exp(cumulative sum of ln factors) with an explicit zero-factor
    guard — both engines fold the ordered sum sequentially, so the
    double is stable.

    Returns (duration_s, n_risk, n_events, survival) for UNCENSORED
    durations, survival rounded to 8 dp.
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(user_col).orderBy("_t")
    mx = events.agg(F.max(sec).alias("_mx"))
    durs = (
        events.select(F.col(user_col), sec.alias("_t"))
        .withColumn("_nxt", F.lead("_t").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.coalesce(F.col("_nxt") - F.col("_t"), F.col("_mx") - F.col("_t")).alias(
                "duration_s"
            ),
            F.col("_nxt").isNotNull().cast("int").alias("_event"),
        )
    )
    per = durs.groupBy("duration_s").agg(
        F.sum("_event").alias("n_events"), F.count("*").alias("_n")
    )
    # total subjects as a one-row broadcast fold, not a driver action
    tot = durs.agg(F.count("*").alias("_total"))
    ow = Window.orderBy("duration_s").rowsBetween(Window.unboundedPreceding, -1)
    cw = Window.orderBy("duration_s").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = per.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk", F.col("_total") - F.coalesce(F.sum("_n").over(ow), F.lit(0))
    )
    factor = 1.0 - F.col("n_events") / F.col("n_risk")
    # ln of a zero factor is guarded BEFORE the window fold (window
    # expressions evaluate eagerly in both engines, so a lazy CASE
    # around the sum would still hit ln(0)); rows at/after a zero
    # factor are forced to survival 0 by the cumulative-min test
    km = (
        at_risk.withColumn("_f", factor)
        .withColumn("_lnf", F.when(F.col("_f") > 0.0, F.log("_f")).otherwise(F.lit(0.0)))
        .withColumn(
            "survival",
            F.when(F.min("_f").over(cw) <= 0.0, F.lit(0.0)).otherwise(
                F.exp(F.sum("_lnf").over(cw))
            ),
        )
    )
    return (
        km.where(F.col("n_events") > 0)
        .select(
            F.col("duration_s").cast("long"),
            F.col("n_risk").cast("long"),
            F.col("n_events").cast("long"),
            F.round("survival", 8).alias("survival"),
        )
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key (gaps-and-islands):
    an interval starts a new island iff its start exceeds the running
    max end of all earlier intervals of the same key (ordered by
    start, end — ties collapse to the same island either way, so the
    order within ties is immaterial). One per-key window + one
    aggregate, all-integer arithmetic — hash-partitioned on the key,
    no self-join, the standard O(n log n)-per-key formulation.
    Returns (key, island_start, island_end, n_merged)."""
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prevmax = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.select(key_col, start_col, end_col).withColumn(
        "_new", F.when(prevmax.isNull() | (F.col(start_col) > prevmax), 1).otherwise(0)
    )
    island = flagged.withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        island.groupBy(key_col, "_isl")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("_isl")
    )


def allen_relations(
    intervals: DataFrame,
    part_col: str = "user_id",
    id_col: str = "event_id",
    start_col: str = "s",
    end_col: str = "e",
    band: int = 5,
) -> DataFrame:
    """Classify interval pairs into Allen's 13 temporal relations
    (Allen 1983) — the exhaustive, mutually-exclusive algebra on top of
    which interval_join (a single 'intersects' disjunction of 9 of
    them) and coalesce_intervals are special cases. Pairs are bounded
    the way every scalable temporal self-join here is: same partition
    key AND an id band (0 < id_b - id_a <= band), so a partition with n
    intervals yields O(n * band) pairs, never O(n^2); the classifier
    itself is one branch-ordered CASE both engines evaluate identically
    (pure timestamp comparisons, no float).

    Returns (part, id_a, id_b, relation) with id_a < id_b; the inverse
    relations (preceded_by, met_by, ...) ARE distinguished, so the
    distribution over all 13 labels is hashable evidence."""
    a = intervals.select(
        F.col(part_col).alias("_p"),
        F.col(id_col).alias("id_a"),
        F.col(start_col).alias("_s1"),
        F.col(end_col).alias("_e1"),
    )
    b = intervals.select(
        F.col(part_col).alias("_p"),
        F.col(id_col).alias("id_b"),
        F.col(start_col).alias("_s2"),
        F.col(end_col).alias("_e2"),
    )
    s1, e1, s2, e2 = F.col("_s1"), F.col("_e1"), F.col("_s2"), F.col("_e2")
    rel = (
        F.when((s1 == s2) & (e1 == e2), "equals")
        .when(e1 < s2, "precedes")
        .when(e2 < s1, "preceded_by")
        .when(e1 == s2, "meets")
        .when(e2 == s1, "met_by")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e1 > e2), "started_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((e1 == e2) & (s1 < s2), "finished_by")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when(s1 < s2, "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        a.join(b, "_p")
        .where(
            (F.col("id_b") > F.col("id_a"))
            & (F.col("id_b") - F.col("id_a") <= band)
        )
        .select(F.col("_p").alias(part_col), "id_a", "id_b", rel.alias("relation"))
    )
