"""Locks for the round-3 breadth queries: multi-resolution time rollup,
exact percentiles, and the snapshot diff (changed-triples audit)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


def test_time_rollup_day_rows_equal_hour_sum(spark):
    out = entry.queries()["time_rollup"](spark, SF_SMOKE)
    day = out.where(F.col("hr").isNull()).select("event_type", "day", "n")
    hour = (
        out.where(F.col("hr").isNotNull())
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"))
    )
    # the day grain must be exactly the fold of its hour grain
    assert day.join(hour, ["event_type", "day", "n"]).count() == day.count()
    assert day.count() == hour.count()


def test_event_quantiles_ordered_and_bounded(spark):
    rows = entry.queries()["event_quantiles"](spark, SF_SMOKE).collect()
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in e.groupBy("event_type").agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()
    }
    assert rows
    for r in rows:
        lo, hi = bounds[r.event_type]
        assert lo <= r.p25 <= r.p50 <= r.p75 <= r.p90 <= r.p99 <= hi


def test_snapshot_diff_is_exactly_the_planted_update(spark):
    out = entry.queries()["kg_snapshot_diff"](spark, SF_SMOKE)
    rows = out.collect()
    added = [r for r in rows if r.change == "added"]
    removed = [r for r in rows if r.change == "removed"]
    # the planted update rewrites one predicate on every 10th doc: the
    # diff must pair each removed triple with its ' v2' added twin
    assert added and len(added) == len(removed)
    assert all(r.pred == "ocgml:description" for r in rows)
    a = {(r.graph, r.subj, r.obj) for r in added}
    b = {(r.graph, r.subj, r.obj + " v2") for r in removed}
    assert a == b
