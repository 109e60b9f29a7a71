"""Training-data sampling ops: deterministic split / stratified sample /
global shuffle (citykg/ops/sampling.py)."""

from pyspark.sql import functions as F

from citykg.ops import sampling


def test_split_deterministic_and_proportional(spark):
    d = spark.range(20000).selectExpr("cast(id as string) as doc_id")
    s1 = sampling.with_split(d, "doc_id")
    counts = {r.split: r.n for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.9) < 0.01
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    # deterministic: re-running yields identical assignment
    a = {r.doc_id: r.split for r in s1.collect()}
    b = {r.doc_id: r.split for r in sampling.with_split(d, "doc_id").collect()}
    assert a == b
    # a different seed re-deals the rows
    c = {r.doc_id: r.split for r in sampling.with_split(d, "doc_id", seed=7).collect()}
    assert a != c


def test_split_is_pure_project(spark):
    d = spark.range(100).selectExpr("cast(id as string) as doc_id")
    plan = sampling.with_split(d, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_exact_threshold(spark):
    d = spark.range(4000).selectExpr(
        "cast(id as string) as doc_id", "cast(id % 4 as int) as label"
    )
    out = sampling.stratified_sample(d, {0: 1.0, 1: 0.5}, label_col="label")
    rows = out.collect()
    labs = {r.label for r in rows}
    assert labs == {0, 1}  # labels 2,3 dropped
    n0 = sum(1 for r in rows if r.label == 0)
    n1 = sum(1 for r in rows if r.label == 1)
    assert n0 == 1000  # fraction 1.0 keeps every row
    assert abs(n1 / 1000 - 0.5) < 0.05


def test_global_shuffle_total_and_stable(spark):
    d = spark.range(500).selectExpr("cast(id as string) as doc_id")
    r1 = sampling.global_shuffle_rank(d, "doc_id").collect()
    ranks = sorted(r.shuffle_rank for r in r1)
    assert ranks == list(range(1, 501))  # total permutation
    r2 = {r.doc_id: r.shuffle_rank for r in sampling.global_shuffle_rank(d, "doc_id").collect()}
    assert {r.doc_id: r.shuffle_rank for r in r1} == r2
    # the permutation actually shuffles (not identity order)
    ordered = [r.doc_id for r in sorted(r1, key=lambda r: r.shuffle_rank)]
    assert ordered != sorted(ordered)
    # scale form agrees with the rank form
    ordered_scale = [r.doc_id for r in sampling.global_shuffle(d, "doc_id").collect()]
    assert ordered_scale == ordered


def test_global_shuffle_scale_form_is_range_partitioned(spark):
    # the scale form must sort via a parallel range exchange, not funnel
    # through a single partition (that is the rank form's documented cost)
    d = spark.range(1000).selectExpr("cast(id as string) as doc_id")
    plan = sampling.global_shuffle(d, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
