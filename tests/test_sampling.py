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


def test_weighted_mix_rank_interleaves_by_weight(spark):
    """A weight-3 source must contribute ~3x the docs of a weight-1 source
    in every prefix of the mixed stream; ranks are a 1..N permutation; no
    unpartitioned window over the data frame."""
    from citykg.ops.sampling import weighted_mix_rank

    rows = [(f"a{i}", "A", 3.0) for i in range(300)] + [
        (f"b{i}", "B", 1.0) for i in range(300)
    ]
    d = spark.createDataFrame(rows, "doc_id string, source string, weight double")
    out = weighted_mix_rank(d).select("doc_id", "source", "mix_rank").collect()
    ranks = sorted(r.mix_rank for r in out)
    assert ranks == list(range(1, 601))
    prefix = [r.source for r in sorted(out, key=lambda r: r.mix_rank)[:200]]
    n_a = prefix.count("A")
    # ideal 150 A : 50 B in the first 200; allow +-2 for boundary ties
    assert abs(n_a - 150) <= 2
    # determinism across recomputation (resume invariant)
    again = {r.doc_id: r.mix_rank
             for r in weighted_mix_rank(d).select("doc_id", "mix_rank").collect()}
    assert all(again[r.doc_id] == r.mix_rank for r in out)

    plan = weighted_mix_rank(d)._jdf.queryExecution().executedPlan().toString()
    w = [ln for ln in plan.splitlines() if "Window" in ln]
    # every data-sized window is bucket-partitioned; the only global-order
    # windows run on the B-row offset frames
    assert all(("_bkt" in ln or "_kbkt" in ln) for ln in w if "row_number" in ln)


def test_weighted_sample_matches_python_aes(spark):
    """The k selected ids are exactly the Python-recomputed A-ES top-k
    (ln(u)/w with u from the char fold), and the draw is deterministic."""
    import math

    from citykg.ops.hashing import POLY_BASE, POLY_P

    texts = {i: "x" * (1 + (i * 37) % 200) for i in range(300)}
    d = spark.createDataFrame(
        [(str(i), t) for i, t in texts.items()], "doc_id string, text string"
    )

    def fold(s):
        acc = 0
        for ch in s:
            acc = (acc * POLY_BASE + ord(ch)) % POLY_P
        return acc

    def key(i):
        u = (fold(f"{i}#ws#7") + 1.0) / (POLY_P + 1)
        return math.log(u) / max(len(texts[i]), 1)

    exp = sorted(texts, key=lambda i: (-key(i), str(i)))[:50]
    out = sampling.weighted_sample(d, k=50)
    got = [r.id for r in out.collect()]
    assert sorted(got) == sorted(str(i) for i in exp)
    again = [r.id for r in sampling.weighted_sample(d, k=50).collect()]
    assert sorted(again) == sorted(got)


def test_weighted_sample_plan_is_take_ordered(spark):
    d = spark.range(1000).selectExpr(
        "cast(id as string) as doc_id", "repeat('a', cast(id % 50 as int) + 1) as text"
    )
    plan = sampling.weighted_sample(d, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_gumbel_topk_matches_python_and_shifts_with_temperature(spark):
    """Selected ids equal the Python-recomputed Gumbel top-k; as tau -> 0
    the sample approaches the deterministic argmax of the score."""
    import math

    from citykg.ops.hashing import POLY_BASE, POLY_P

    scores = {str(i): float(i % 17) - 8.0 for i in range(200)}
    d = spark.createDataFrame(list(scores.items()), "id string, s double")

    def fold(x):
        acc = 0
        for ch in x:
            acc = (acc * POLY_BASE + ord(ch)) % POLY_P
        return acc

    def key(i, tau):
        u = (fold(f"{i}#g#11") + 1.0) / (POLY_P + 1)
        return scores[i] / tau - math.log(-math.log(u))

    exp = sorted(scores, key=lambda i: (-key(i, 1.0), i))[:30]
    got = [r.id for r in sampling.gumbel_topk(d, "s", k=30, tau=1.0).collect()]
    assert sorted(got) == sorted(exp)
    # near-zero temperature: only max-score ids (s = 8.0) survive
    cold = sampling.gumbel_topk(d, "s", k=10, tau=1e-6).collect()
    assert all(r.score == 8.0 for r in cold)
