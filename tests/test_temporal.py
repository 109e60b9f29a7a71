"""Sessionization + as-of join (window-trick implementations)."""

from datetime import datetime, timedelta

from citykg.ops.temporal import asof_join, session_stats, sessionize


def _ts(m, s=0):
    return datetime(2024, 1, 1) + timedelta(minutes=m, seconds=s)


def test_sessionize_gap_split(spark):
    rows = [
        (1, _ts(0)), (1, _ts(5)), (1, _ts(50)), (1, _ts(52)),  # 2 sessions
        (2, _ts(0)),                                            # 1 session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.user_id, r.session_seq): (r.n_events, r.duration_s)
           for r in session_stats(df, gap_minutes=30).collect()}
    assert out == {(1, 1): (2, 300), (1, 2): (2, 120), (2, 1): (1, 0)}


def test_sessionize_assigns_monotonic_ids(spark):
    rows = [(1, _ts(i * 40)) for i in range(4)]  # every gap > 30min
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    seqs = sorted(r.session_seq for r in sessionize(df, gap_minutes=30).collect())
    assert seqs == [1, 2, 3, 4]


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(20), 2.0), (1, _ts(40), 3.0)],
        "user_id long, ts timestamp, rv double",
    )
    out = {r.event_id: r.asof_rv for r in asof_join(left, right, "user_id").collect()}
    assert out == {100: 1.0, 101: 2.0, 200: None}  # no right rows for user 2


def test_asof_join_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(10), 1)], "user_id long, ts timestamp, event_id long")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "user_id long, ts timestamp, rv double")
    out = asof_join(left, right, "user_id").collect()[0]
    assert out.asof_rv == 7.0


def test_scd2_collapses_repeats_and_chains_intervals(spark):
    from citykg.ops.temporal import scd2_intervals

    rows = [
        (1, _ts(0), 1, "view"),
        (1, _ts(5), 2, "view"),      # repeat -> collapsed into v1
        (1, _ts(10), 3, "click"),
        (1, _ts(20), 4, "view"),     # state may recur as a NEW version
        (2, _ts(0), 5, "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {(r.user_id, r.version): r for r in scd2_intervals(df).collect()}
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1.state, v2.state, v3.state) == ("view", "click", "view")
    # intervals chain: each valid_to == the next valid_from; last is open
    assert v1.valid_to == v2.valid_from and v2.valid_to == v3.valid_from
    assert v3.valid_to is None and v3.is_current == 1 and v1.is_current == 0
    assert out[(2, 1)].is_current == 1


def test_scd2_ties_break_by_event_id(spark):
    from citykg.ops.temporal import scd2_intervals

    rows = [(1, _ts(0), 2, "b"), (1, _ts(0), 1, "a")]  # same ts
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = sorted(scd2_intervals(df).collect(), key=lambda r: r.version)
    assert [r.state for r in out] == ["a", "b"]


def test_scd2_null_states_are_real_changes(spark):
    """Transitions to/from a NULL state are state changes (null-safe
    change test), consecutive NULLs collapse, and a leading NULL state
    survives as version 1 — the `_prev != state` formulation silently
    dropped every NULL-involving transition (r4 ADVICE, medium)."""
    from citykg.ops.temporal import scd2_intervals

    rows = [
        (1, _ts(0), 1, None),        # leading NULL state -> v1
        (1, _ts(5), 2, None),        # repeat NULL -> collapsed
        (1, _ts(10), 3, "click"),    # NULL -> click is a change
        (1, _ts(20), 4, None),       # click -> NULL is a change
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = sorted(scd2_intervals(df).collect(), key=lambda r: r.version)
    assert [r.state for r in out] == [None, "click", None]
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert out[2].valid_to is None and out[2].is_current == 1


def test_time_weighted_avg_forward_hold(spark):
    from citykg.ops.temporal import time_weighted_avg

    # value 10 holds 60s, value 20 holds 180s, last obs carries no weight
    rows = [
        (1, _ts(0), 1, 10.0),
        (1, _ts(1), 2, 20.0),
        (1, _ts(4), 3, 99.0),
        (2, _ts(0), 4, 5.0),  # single obs -> zero span, excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r.user_id: r for r in time_weighted_avg(df).collect()}
    assert set(out) == {1}
    assert out[1].span_s == 240.0
    assert out[1].twa == round((10.0 * 60 + 20.0 * 180) / 240, 6)
    assert out[1].n_events == 3


def test_gapfill_daily_fills_and_flags(spark):
    from datetime import datetime

    from citykg.ops.temporal import gapfill_daily

    rows = [
        (1, datetime(2024, 1, 1, 9), 2.0),
        (1, datetime(2024, 1, 1, 10), 3.0),
        # Jan 2-3 silent
        (1, datetime(2024, 1, 4, 8), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.day: (r.day_value, r.n_events, r.is_observed)
           for r in gapfill_daily(df).collect()}
    assert out == {
        "2024-01-01": (5.0, 2, 1),
        "2024-01-02": (5.0, 0, 0),  # forward-filled
        "2024-01-03": (5.0, 0, 0),
        "2024-01-04": (7.0, 1, 1),
    }


def test_event_cusum_reflection_identity(spark):
    """The window-expressed CUSUM equals the reference recurrence
    S_t = max(0, S_{t-1} + x_t - mu - 0.5*sd) computed in Python."""
    import statistics
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from datetime import datetime, timedelta

    counts = [5] * 10 + [9] * 10  # sustained +4 shift after day 10
    rows = []
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append(("click", datetime(2024, 2, 1) + timedelta(days=d, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")

    import tempfile, os
    sf = tempfile.mkdtemp(prefix="cusum_sf_")
    df.withColumn("user_id", df.ts.cast("long") % 7) \
      .withColumn("event_id", df.ts.cast("long")) \
      .withColumn("value", df.ts.cast("long") % 5 * 1.0) \
      .withColumn("props", df.event_type) \
      .write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    out = {r.day: (r.cusum, r.alarm)
           for r in entrymod.q_event_cusum(spark, sf).collect()}

    mu = statistics.mean(counts)
    sd = statistics.stdev(counts)
    s, expect = 0.0, {}
    for d, c in enumerate(counts):
        s = max(0.0, s + (c - mu - 0.5 * sd))
        expect[f"2024-02-{d+1:02d}"] = (round(s, 6), 1 if round(s, 6) > round(4 * sd, 6) else 0)
    assert out == expect
    assert any(a for _, a in out.values())  # the shift actually alarms


def test_kaplan_meier_hand_computed(spark):
    from citykg.ops.temporal import kaplan_meier

    # user A events at 0s and 10s; user B at 0s and 5s; corpus max = 10s.
    # durations: A 10 (event) + 0 (censored), B 5 (event) + 5 (censored)
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:10"),
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:00:05"),
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts"])
    got = sorted(
        (r["duration_s"], r["n_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier(e, "user_id", "ts").collect()
    )
    # at t=5: 3 at risk (the 0s censored duration already left), 1 event
    # -> S = 2/3; at t=10: 1 at risk, 1 event -> factor 0 -> S = 0
    assert got == [(5, 3, 1, round(2 / 3, 8)), (10, 1, 1, 0.0)]


def test_coalesce_intervals_hand_computed(spark):
    from citykg.ops.temporal import coalesce_intervals

    iv = spark.createDataFrame(
        [
            ("u", 0, 10), ("u", 5, 12), ("u", 12, 15),   # touch at 12 merges
            ("u", 20, 25),                               # gap -> new island
            ("v", 0, 1),
        ],
        ["k", "s", "e"],
    )
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_merged"])
        for r in coalesce_intervals(iv, "k", "s", "e").collect()
    )
    assert got == [("u", 0, 15, 3), ("u", 20, 25, 1), ("v", 0, 1, 1)]
