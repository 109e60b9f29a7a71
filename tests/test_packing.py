"""Sequence packing (citykg/ops/packing.py)."""

from citykg.ops import packing


def test_pack_respects_budget_and_covers_all(spark):
    d = spark.range(300).selectExpr(
        "cast(id as string) as doc_id", "cast(10 + id % 90 as int) as n_tokens"
    )
    out = packing.pack_sequences(d, "doc_id", "n_tokens", budget=128, n_groups=4)
    rows = out.collect()
    assert len(rows) == 300  # every doc placed exactly once
    fills = {}
    for r in rows:
        fills.setdefault((r.grp, r.bin), 0)
        fills[(r.grp, r.bin)] += r.tokens
    # no bin overflows (no doc here exceeds the budget alone)
    assert all(v <= 128 for v in fills.values())
    # greedy fill is tight: every non-final bin in a group is > budget - max_doc
    for grp in {g for g, _ in fills}:
        bins = sorted(b for g, b in fills if g == grp)
        for b in bins[:-1]:
            assert fills[(grp, b)] > 128 - 100


def test_pack_oversized_doc_gets_own_bin(spark):
    d = spark.createDataFrame(
        [("a", 1000), ("b", 10), ("c", 10)], "doc_id string, n_tokens int"
    )
    out = packing.pack_sequences(d, "doc_id", "n_tokens", budget=64, n_groups=1)
    by_doc = {r.id: (r.grp, r.bin) for r in out.collect()}
    bins = {}
    for doc, (g, b) in by_doc.items():
        bins.setdefault(b, []).append(doc)
    assert ["a"] in bins.values()  # the oversized doc sits alone


def test_pack_deterministic(spark):
    d = spark.range(200).selectExpr(
        "cast(id as string) as doc_id", "cast(5 + id % 50 as int) as n_tokens"
    )
    a = {r.id: (r.grp, r.bin) for r in packing.pack_sequences(d, "doc_id", "n_tokens").collect()}
    b = {r.id: (r.grp, r.bin) for r in packing.pack_sequences(d, "doc_id", "n_tokens").collect()}
    assert a == b


def test_packing_stats_fill_ratio(spark):
    d = spark.range(400).selectExpr(
        "cast(id as string) as doc_id", "cast(32 as int) as n_tokens"
    )
    packed = packing.pack_sequences(d, "doc_id", "n_tokens", budget=128, n_groups=2)
    stats = packing.packing_stats(packed, budget=128).collect()
    for r in stats:
        # constant 32-token docs pack 4-per-bin: full bins except group tails
        assert r.fill_ratio > 0.9
