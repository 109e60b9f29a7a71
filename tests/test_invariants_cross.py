"""Cross-operator invariants: independent queries over the same store
must agree on derived totals — a cheap consistency harness on top of the
per-query oracles."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


def test_degree_histogram_folds_to_void_triple_counts(spark):
    """sum(degree * n_subjects) per graph (kg_degree_stats) must equal
    the per-graph triple totals implied by kg_void_stats."""
    deg = (
        entry.queries()["kg_degree_stats"](spark, SF_SMOKE)
        .groupBy("graph")
        .agg(F.sum(F.col("degree") * F.col("n_subjects")).alias("n"))
    )
    void = (
        entry.queries()["kg_void_stats"](spark, SF_SMOKE)
        .groupBy("graph")
        .agg(F.sum("n_triples").alias("n"))
    )
    a = {r.graph: r.n for r in deg.collect()}
    b = {r.graph: r.n for r in void.collect()}
    assert a == b and a


def test_funnel_stages_are_monotone(spark):
    r = entry.queries()["event_funnel"](spark, SF_SMOKE).collect()[0]
    assert r.n_view >= r.n_click_after_view >= r.n_purchase_after_click >= 0
    assert r.n_view > 0


def test_snapshot_diff_roundtrips_through_void_totals(spark):
    """Applying the diff to 'old' must land exactly on 'new': the added
    and removed row counts are equal (a pure in-place update) and every
    changed row is the planted predicate."""
    d = entry.queries()["kg_snapshot_diff"](spark, SF_SMOKE)
    counts = {r.change: r.n for r in d.groupBy("change").agg(F.count("*").alias("n")).collect()}
    assert counts.get("added", 0) == counts.get("removed", 0) > 0
