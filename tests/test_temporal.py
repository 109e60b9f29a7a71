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
