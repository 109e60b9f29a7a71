"""Round-5 final-tranche operators: Kneser-Ney LM, blocklist gate,
Turtle blocks, solid volume, convex hull, content-defined chunking."""
import math

from pyspark.sql import functions as F

from citykg.ops import dedup, geo, text
from citykg.ops.relevance import kneser_ney_scores


def test_kneser_ney_hand_computed(spark):
    # corpus bigrams: (a,b) x2, (b,a) x2; every KN factor known exactly:
    #   p(b|a) = max(2-.75,0)/2 + .75 * 1/2 * (1/2) = 0.8125 = p(a|b)
    docs = spark.createDataFrame([(1, "a b a b"), (2, "b a")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in kneser_ney_scores(docs).collect()}
    lp = round(math.log(0.8125), 6)
    assert got[1]["n_bigrams"] == 3 and got[1]["avg_logprob"] == lp
    assert got[2]["n_bigrams"] == 1 and got[2]["avg_logprob"] == lp


def test_kneser_ney_single_token_doc_drops(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "solo")], ["doc_id", "text"])
    assert [r["doc_id"] for r in kneser_ney_scores(docs).collect()] == [1]


def test_blocklist_hits_counts_and_flag(spark):
    docs = spark.createDataFrame(
        [(1, "slow slow ok"), (2, "clean text here"), (3, "dup skew dup leak")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in text.blocklist_hits(docs).collect()}
    assert (got[1]["n_hits"], got[1]["n_hit_terms"], got[1]["flagged"]) == (2, 1, 1)
    assert got[1]["hit_frac"] == round(2 / 3, 6)
    # clean doc keeps its zero row (LEFT join back to the doc spine)
    assert (got[2]["n_hits"], got[2]["n_hit_terms"], got[2]["flagged"]) == (0, 0, 0)
    assert (got[3]["n_hits"], got[3]["n_hit_terms"]) == (4, 3)


def test_turtle_blocks_grouping_and_ordering(spark):
    from citykg.materialize import turtle_blocks

    t = spark.createDataFrame(
        [
            ("g", "http://x/s1", "ocgml:zeta", "v2", "lit",
             "http://www.w3.org/2001/XMLSchema#double"),
            ("g", "http://x/s1", "ocgml:alpha", "http://x/o1", "iri", None),
            ("g", "http://x/s2", "ocgml:alpha", 'say "hi"', "lit", None),
        ],
        ["graph", "subj", "pred", "obj", "obj_type", "datatype"],
    )
    got = {r["subj"]: r for r in turtle_blocks(t).collect()}
    assert got["http://x/s1"]["n_statements"] == 2
    # predicate-object pairs sort by (p, o): alpha before zeta
    assert got["http://x/s1"]["block"] == (
        "<http://x/s1> ocgml:alpha <http://x/o1> ;\n"
        '    ocgml:zeta "v2"^^<http://www.w3.org/2001/XMLSchema#double> .'
    )
    # literal escaping: embedded quotes
    assert got["http://x/s2"]["block"] == (
        '<http://x/s2> ocgml:alpha "say \\"hi\\"" .'
    )


def _ring(*pts):
    pts = pts + (pts[0],)
    return "#".join(f"{c}" for p in pts for c in p)


def test_solid_volume_unit_cube_and_box(spark):
    # outward-oriented boxes: unit cube -> 1; 2x3x4 box translated -> 24
    def box(w, d, h, bx=0.0, by=0.0):
        def p(x, y, z):
            return (bx + x, by + y, z)

        return [
            _ring(p(0, 0, 0), p(0, d, 0), p(w, d, 0), p(w, 0, 0)),
            _ring(p(0, 0, h), p(w, 0, h), p(w, d, h), p(0, d, h)),
            _ring(p(0, 0, 0), p(w, 0, 0), p(w, 0, h), p(0, 0, h)),
            _ring(p(0, d, 0), p(0, d, h), p(w, d, h), p(w, d, 0)),
            _ring(p(0, 0, 0), p(0, 0, h), p(0, d, h), p(0, d, 0)),
            _ring(p(w, 0, 0), p(w, d, 0), p(w, d, h), p(w, 0, h)),
        ]

    rows = [(1, lit) for lit in box(1, 1, 1)] + [
        (2, lit) for lit in box(2, 3, 4, bx=7.0, by=11.0)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lit"])
    got = {r["doc_id"]: r for r in geo.solid_volume(df).collect()}
    assert got[1]["n_faces"] == 6 and got[1]["volume"] == 1.0
    assert got[2]["n_faces"] == 6 and got[2]["volume"] == 24.0


def test_solid_volume_degenerate_face_contributes_zero(spark):
    # a 2-point "face" is ignored (guarded fold), not an ANSI fault
    df = spark.createDataFrame([(1, "0#0#0#1#1#1")], ["doc_id", "lit"])
    got = geo.solid_volume(df).collect()[0]
    assert got["volume"] == 0.0


def test_convex_hull_square_with_interior_points(spark):
    # 4 corners + 2 interior points, fed out of order -> hull 4, area 4
    lit = "#".join(
        map(str, [0, 0, 1, 1, 2, 0, 0.5, 1.2, 2, 2, 0, 2])
    )
    df = spark.createDataFrame([(1, lit)], ["doc_id", "lit"])
    got = geo.convex_hull_stats(df).collect()[0]
    assert got["n_hull"] == 4 and abs(got["hull_area"] - 4.0) < 1e-9


def test_convex_hull_degenerate_two_points(spark):
    df = spark.createDataFrame([(1, "0#0#3#4")], ["doc_id", "lit"])
    got = geo.convex_hull_stats(df).collect()[0]
    assert got["n_hull"] == 2 and got["hull_area"] == 0.0


def test_cdc_identical_docs_share_all_chunks(spark):
    base = ("the quick brown fox jumps over the lazy dog and keeps going " * 12)
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different content " * 20)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dedup.cdc_chunk_stats(docs).collect()}
    assert got[1]["n_chunks"] >= 2  # the mask actually fires
    assert got[1]["shared_frac"] == 1.0 and got[2]["shared_frac"] == 1.0
    assert got[1]["n_chunks"] == got[2]["n_chunks"]
    assert got[3]["n_shared"] == 0


def test_cdc_shift_resistance_and_partition_invariance(spark):
    # CDC's defining property: a prefix insertion leaves the tail chunks
    # shared (exact-hash dedup would lose everything)
    base = "shared tail content that is long enough to chunk " * 14
    docs = spark.createDataFrame(
        [(1, base), (2, "zq inserted prefix " + base)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in dedup.cdc_chunk_stats(docs).collect()}
    assert got[1]["n_shared"] >= 1 and got[2]["n_shared"] >= 1
    # determinism under different partitioning
    got4 = {
        r["doc_id"]: r
        for r in dedup.cdc_chunk_stats(docs.repartition(4)).collect()
    }
    for k in (1, 2):
        assert got4[k]["n_chunks"] == got[k]["n_chunks"]
        assert got4[k]["n_shared"] == got[k]["n_shared"]


def test_neighbor_mean_agg_path_graph(spark):
    from citykg.ops import graph as g

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    feats = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 40.0)], ["id", "feat"]
    )
    got = {r["id"]: r for r in g.neighbor_mean_agg(edges, feats).collect()}
    assert got[1]["degree"] == 1 and got[1]["h1"] == 20.0 and got[1]["h2"] == 25.0
    assert got[2]["degree"] == 2 and got[2]["h1"] == 25.0 and got[2]["h2"] == 20.0
    assert got[3]["degree"] == 1 and got[3]["h1"] == 20.0 and got[3]["h2"] == 25.0


def test_threshold_curve_monotone_and_consistent(spark):
    from citykg.ops.dedup import semantic_dedup, semantic_threshold_curve

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    curve = {
        r["threshold"]: r
        for r in semantic_threshold_curve(e, thresholds=(0.30, 0.45)).collect()
    }
    assert curve[0.30]["n_pairs"] >= curve[0.45]["n_pairs"]
    assert curve[0.30]["n_dropped"] >= curve[0.45]["n_dropped"]
    # the sweep at t must agree with a full semantic_dedup run at t
    dropped = (
        semantic_dedup(e, threshold=0.45)
        .where("dropped = 1")
        .count()
    )
    assert curve[0.45]["n_dropped"] == dropped


def test_event_attribution_hand_computed(spark):
    import datetime as dt

    rows = [
        (1, i, dt.datetime(2024, 1, 1, 0, i), t)
        for i, t in enumerate(
            ["view", "click", "purchase", "click", "purchase", "view"]
        )
    ]
    e = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    import citykg  # noqa: F401

    from pyspark.sql import functions as F  # noqa: F811

    # inline the entry-file shape: write to a temp view and reuse the op
    # via the registered query's logic — simplest is to replicate here
    import __spark_entry__ as em

    import tempfile, os
    d = tempfile.mkdtemp()
    e.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["model"], r["channel"]): r["credit"]
        for r in em.queries()["event_attribution"](spark, d).collect()
    }
    assert got == {
        ("first_touch", "view"): 1.0,
        ("first_touch", "click"): 1.0,
        ("last_touch", "click"): 2.0,
        ("linear", "view"): 0.5,
        ("linear", "click"): 1.5,
    }


def test_eq_rep_rewrite_merges_and_keeps_literals(spark):
    from citykg.ops.owl import eq_rep_rewrite

    t = spark.createDataFrame(
        [
            ("A", "p", "B", "iri"),
            ("B", "p", "B", "iri"),
            ("B", "p", "C", "iri"),
            ("A", "q", "B", "lit"),  # literal that LOOKS like a member IRI
        ],
        ["subj", "pred", "obj", "obj_type"],
    )
    sa = spark.createDataFrame([("B", "A", 2)], ["subj", "canon", "n_shared"])
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_type"]): r["n_merged"]
        for r in eq_rep_rewrite(t, sa).collect()
    }
    assert got == {
        ("A", "p", "A", "iri"): 2,  # (A,p,B) and (B,p,B) merge
        ("A", "p", "C", "iri"): 1,
        ("A", "q", "B", "lit"): 1,  # literal untouched
    }


def test_jones_plassmann_proper_coloring(spark):
    from citykg.ops.graph import jones_plassmann_coloring

    # K3 plus a pendant: proper coloring needs 3 colors on the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    got = {r["id"]: r for r in jones_plassmann_coloring(edges).collect()}
    assert set(got) == {1, 2, 3, 4}
    # everyone colored within 8 rounds on a 4-node graph
    assert all(r["color"] >= 0 for r in got.values())
    # proper: no edge shares a color
    for a, b in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        assert got[a]["color"] != got[b]["color"]
    # greedy bound: color <= degree
    deg = {1: 2, 2: 2, 3: 3, 4: 1}
    for v, r in got.items():
        assert r["color"] <= deg[v]
    # the highest-priority node colors in round 1 with color 0
    prio = {v: (v * 2654435761) % (1 << 32) for v in (1, 2, 3, 4)}
    top = max(prio, key=prio.get)
    assert got[top]["round_colored"] == 1 and got[top]["color"] == 0


def test_nearest_hub_snaps_origin_doc(spark):
    import __spark_entry__ as em

    got = {
        r["doc_id"]: r
        for r in em.queries()["spatial_nearest_hub"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # doc 0 sits exactly on hub 0 -> distance 0
    assert got[0]["hub_id"] == 0 and got[0]["dist"] == 0.0
    assert all(0 <= r["hub_id"] < 20 for r in got.values())


def test_graph_squares_hand_computed(spark):
    import __spark_entry__ as em
    import os, tempfile

    # square 1-2-3-4 with chord 1-3: exactly one 4-cycle
    # (drive through the op shape directly)
    from citykg.ops import geo as _geo  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F811

    p = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], ["src", "dst"]
    )
    adj = p.unionByName(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a1 = adj.select(F.col("src").alias("w"), F.col("dst").alias("p"))
    a2 = adj.select(F.col("src").alias("w"), F.col("dst").alias("q"))
    cn = (
        a1.join(a2, "w")
        .where(F.col("p") < F.col("q"))
        .groupBy("p", "q")
        .agg(F.count("*").alias("cn"))
    )
    n = cn.agg(
        (F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2).cast("bigint").alias("n")
    ).collect()[0]["n"]
    assert n == 1


def test_abc_analysis_invariants(spark):
    import __spark_entry__ as em

    rows = {
        r["abc_class"]: r
        for r in em.queries()["abc_analysis"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    total = sum(r["revenue_cents"] for r in rows.values())
    n_cust = sum(r["n_customers"] for r in rows.values())
    got_cust = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_cust == got_cust
    # integer-exact class boundary: A's total stays within 80% of revenue
    if "A" in rows:
        assert rows["A"]["revenue_cents"] * 5 <= total * 4
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-5
