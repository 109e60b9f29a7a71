"""Geo analytics (A1/A2/A3/A10, Q7), N-Quads sink (S6), OWL checks (G5)."""

import math
import random

from pyspark.sql import functions as F

from citykg.materialize import nquads_lines
from citykg.ops import geo, owl
from citykg.vocab import DEFAULT_BASE, OCGML

ROOF = "0#0#30#9#0#30#9#8#34#0#8#34#0#0#30"  # tilted top (fixture shape)
WALL = "0#0#30#9#0#30#9#0#34#0#0#34#0#0#30"  # vertical
GROUND = "0#0#30#0#8#30#9#8#30#9#0#30#0#0#30"  # clockwise -> normal down


def _lits(spark):
    return spark.createDataFrame(
        [("roof", ROOF), ("wall", WALL), ("ground", GROUND)], "id string, lit string"
    )


def test_area3d_matches_cross_product(spark):
    out = {r.id: r.area for r in geo.with_area3d(_lits(spark), "lit").collect()}
    # parallelogram areas: |(9,0,0)x(0,8,4)| etc.
    assert math.isclose(out["roof"], math.sqrt(36**2 + 72**2))
    assert math.isclose(out["wall"], 36.0)
    assert math.isclose(out["ground"], 72.0)


def test_surface_classification(spark):
    out = {r.id: r.surf_class for r in geo.classify_surface(_lits(spark), "lit").collect()}
    assert out == {"roof": "ROOF", "wall": "WALL", "ground": "GROUND"}


def test_surface_classification_threshold(spark):
    # tilt angle of the roof quad is atan(36/72) = 26.57 deg; a stricter
    # critical angle must demote it to WALL
    out = {
        r.id: r.surf_class
        for r in geo.classify_surface(_lits(spark), "lit", theta_deg=20.0).collect()
    }
    assert out["roof"] == "WALL"
    assert out["ground"] == "GROUND"


def test_force_2d(spark):
    df = spark.createDataFrame([("a", "1#2#3#4#5#6#7#8#9")], "id string, lit string")
    out = geo.force_2d(df, "lit").collect()[0]
    assert out.lit2d == "1#2#4#5#7#8"


def test_ring_validity(spark):
    df = spark.createDataFrame(
        [
            ("ok", ROOF),
            ("open", "0#0#30#9#0#30#9#8#34#0#8#34"),  # 4 pts, unclosed
            ("short", "0#0#30#9#0#30"),  # 2 pts
            ("degen", "0#0#30#0#0#30#0#0#30#0#0#30"),  # zero area, closed
        ],
        "id string, lit string",
    )
    out = {r.id: (r.is_valid, r.reason) for r in geo.ring_validity(df, "lit").collect()}
    assert out["ok"] == (True, "ok")
    assert out["open"] == (False, "not_closed")
    assert out["short"] == (False, "too_few_points")
    assert out["degen"] == (False, "zero_area")


def test_footprint_union_filters_and_folds(spark):
    df = spark.createDataFrame(
        [
            ("g1", ROOF),
            ("g1", "20#20#0#29#20#0#29#28#0#20#28#0#20#20#0"),  # disjoint square
            ("g1", "0#0#30#9#0#30"),  # invalid -> filtered
            ("g1", "0#0#0#1#0#0#1#1#0#0#1#0#0#0#0"),  # area 1 < min_area
        ],
        "grp string, lit string",
    )
    row = geo.footprint_union(df, "grp", "lit", min_area=50.0).collect()[0]
    assert row.n_members == 2
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (0.0, 0.0, 29.0, 28.0)
    assert math.isclose(row.total_area, math.sqrt(36**2 + 72**2) + 72.0)


def test_dwithin_grid_equals_brute_force(spark):
    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    d = 5.0
    got = {
        (r.id_a, r.id_b) for r in geo.dwithin_pairs(df, "id", "x", "y", d).collect()
    }
    want = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 < d * d
    }
    assert got == want and len(want) > 100


def test_beyond_filter(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 30.0, 40.0)], "id long, x double, y double")
    out = geo.beyond_filter(df, "x", "y", 0.0, 0.0, 49.9).collect()
    assert [r.id for r in out] == [2]


def test_nquads_escaping_and_shape(spark):
    t = spark.createDataFrame(
        [
            ("http://x/s/", "ocgml:name", 'he said "hi"\n\\end', "literal", None, "building"),
            ("http://x/s/", "ocgml:id", "http://x/s/", "iri", None, "building"),
            ("http://x/s/", "ocgml:GeometryType", "1#2#3", "literal", "http://dt/P", "building"),
        ],
        "subj string, pred string, obj string, obj_type string, datatype string, graph string",
    )
    lines = [r.line for r in nquads_lines(t).orderBy("pred").collect()]
    geom, ident, name = lines
    assert name == (
        f'<http://x/s/> <{OCGML}name> "he said \\"hi\\"\\n\\\\end" '
        f"<{DEFAULT_BASE}/building/> ."
    )
    assert ident == f"<http://x/s/> <{OCGML}id> <http://x/s/> <{DEFAULT_BASE}/building/> ."
    assert geom == (
        f'<http://x/s/> <{OCGML}GeometryType> "1#2#3"^^<http://dt/P> '
        f"<{DEFAULT_BASE}/building/> ."
    )


def _tiny_triples(spark):
    rows = [
        ("s1", "ocgml:objectClassId", "33", "literal", None, "thematicsurface"),
        ("s1", "ocgml:lod2MultiSurfaceId", "g1", "iri", None, "thematicsurface"),
        ("s2", "ocgml:objectClassId", "35", "literal", None, "thematicsurface"),
        # s2 lacks lod2MultiSurfaceId -> cardinality violation
        ("s2", "ocgml:objectClassId", "34", "literal", None, "thematicsurface"),
        # s2 asserts classes 35 AND 34 -> disjointness violation
        ("s3", "ocgml:buildingId", "b1", "iri", None, "room"),
        # buildingId declared for addresstobuilding -> domain violation
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_type string, datatype string, graph string"
    )


def test_owl_cardinality_violations(spark):
    v = owl.cardinality_violations(
        spark, _tiny_triples(spark), [("thematicsurface", "ocgml:lod2MultiSurfaceId")]
    ).collect()
    assert [(r.subj, r.missing_pred) for r in v] == [("s2", "ocgml:lod2MultiSurfaceId")]


def test_owl_disjoint_violations(spark):
    v = owl.disjoint_class_violations(spark, _tiny_triples(spark), [("34", "35")]).collect()
    assert [(r.subj, r.class_a, r.class_b) for r in v] == [("s2", "34", "35")]


def test_owl_domain_violations(spark):
    v = owl.domain_violations(
        spark, _tiny_triples(spark), [("ocgml:buildingId", "addresstobuilding")]
    ).collect()
    assert [(r.subj, r.graph) for r in v] == [("s3", "room")]


def test_dwithin_plan_has_no_cartesian(spark):
    df = spark.range(10).selectExpr("id", "cast(id as double) x", "cast(id as double) y")
    plan = geo.dwithin_pairs(df, "id", "x", "y", 2.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_envelope_relations_all_branches(spark):
    # one crafted pair per DE-9IM box relation; base box [0,10]x[0,10]
    rows = [
        ("base", 0.0, 0.0, 10.0, 10.0),
        ("same", 0.0, 0.0, 10.0, 10.0),        # equals base
        ("inner", 2.0, 2.0, 8.0, 8.0),          # within base / base contains
        ("edge", 10.0, 0.0, 20.0, 10.0),        # touches base (shared edge)
        ("corner", 10.0, 10.0, 20.0, 20.0),     # touches base (single point)
        ("cross", 5.0, 5.0, 15.0, 15.0),        # overlaps base
        ("far", 100.0, 100.0, 110.0, 110.0),    # disjoint from all -> absent
    ]
    env = spark.createDataFrame(
        rows, "id string, xmin double, ymin double, xmax double, ymax double"
    )
    out = {(r.id_a, r.id_b): r.relation for r in geo.envelope_relations(env, "id", cell_size=16.0).collect()}
    assert out[("base", "same")] == "equals"
    assert out[("base", "inner")] == "contains"
    assert out[("inner", "same")] == "within"
    assert out[("base", "edge")] == "touches"
    assert out[("base", "corner")] == "touches"
    assert out[("base", "cross")] == "overlaps"
    assert not any("far" in k for k in out)
    plan = geo.envelope_relations(env, "id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_owl_subclass_closure_matches_python_walk(spark):
    # independent oracle: walk each class's superclass chain in Python
    direct = {cid: sup for cid, _, sup in owl.OBJECTCLASS}
    expected = set()
    for cid in direct:
        d, cur = 0, cid
        while direct.get(cur) is not None:
            cur = direct[cur]
            d += 1
            expected.add((cid, cur, d))
    got = {(r.sub_id, r.super_id, r.depth) for r in owl.subclass_closure(spark).collect()}
    assert got == expected


def test_owl_class_membership_inherits_ancestors(spark):
    t = spark.createDataFrame(
        [("b1", "ocgml:objectClassId", "26", "literal", None, "cityobject")],
        "subj string, pred string, obj string, obj_type string, datatype string, graph string",
    )
    mem = {(r.member_class_id, r.member_of, r.depth)
           for r in owl.class_membership(spark, t).collect()}
    # Building 26 -> _AbstractBuilding 24 -> _Site 20 -> _CityObject 3 -> _Feature 2 -> _GML 1
    assert mem == {
        (26, "Building", 0), (24, "_AbstractBuilding", 1), (20, "_Site", 2),
        (3, "_CityObject", 3), (2, "_Feature", 4), (1, "_GML", 5),
    }


def test_owl_value_and_max_cardinality(spark):
    rows = [
        ("b1", "ocgml:storeysAboveGround", "25", "literal", None, "building"),
        ("b2", "ocgml:storeysAboveGround", "5", "literal", None, "building"),
        ("g1", "ocgml:cityObjectId", "co1", "iri", None, "cityobjectgenericattrib"),
        ("g2", "ocgml:cityObjectId", "co1", "iri", None, "cityobjectgenericattrib"),
        ("g3", "ocgml:cityObjectId", "co2", "iri", None, "cityobjectgenericattrib"),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_type string, datatype string, graph string"
    )
    v = owl.value_restriction_violations(
        spark, t, [("building", "ocgml:storeysAboveGround", 1.0, 20.0)]
    ).collect()
    assert [r.subj for r in v] == ["b1"]
    m = owl.max_cardinality_violations(
        spark, t, "cityobjectgenericattrib", "ocgml:cityObjectId", 1
    ).collect()
    assert [(r.individual, r.n) for r in m] == [("co1", 2)]
    s = owl.consistency_summary({"vr": owl.value_restriction_violations(
        spark, t, [("building", "ocgml:storeysAboveGround", 1.0, 20.0)])}).collect()
    assert [(r["check"], r.n_violations, r.consistent) for r in s] == [("vr", 1, False)]


def test_footprint_union_exact_path_plumbing(spark, monkeypatch):
    """The shapely-backed exact path can't run in this image (no shapely);
    drive its applyInPandas plumbing — grouping, Arrow batch shape, output
    schema — with a minimal test double that implements the subset of the
    shapely API the kernel touches (Polygon(pts), unary_union -> object
    with .bounds/.area/.wkt)."""
    import sys
    import types

    class FakeUnion:
        def __init__(self, polys):
            pts = [p for poly in polys for p in poly.pts]
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            self.bounds = (min(xs), min(ys), max(xs), max(ys))
            # shoelace per member, summed (members disjoint in the test)
            def shoe(ps):
                return abs(sum(ps[i][0] * ps[(i + 1) % len(ps)][1]
                               - ps[(i + 1) % len(ps)][0] * ps[i][1]
                               for i in range(len(ps)))) / 2
            self.area = sum(shoe(p.pts) for p in polys)
            self.wkt = f"MULTIPOLYGON<{len(polys)}>"

    class FakePolygon:
        def __init__(self, pts):
            self.pts = list(pts)

    geom_mod = types.ModuleType("shapely.geometry")
    geom_mod.Polygon = FakePolygon
    ops_mod = types.ModuleType("shapely.ops")
    ops_mod.unary_union = lambda polys: FakeUnion(polys)
    shapely_mod = types.ModuleType("shapely")
    shapely_mod.geometry = geom_mod
    shapely_mod.ops = ops_mod
    monkeypatch.setitem(sys.modules, "shapely", shapely_mod)
    monkeypatch.setitem(sys.modules, "shapely.geometry", geom_mod)
    monkeypatch.setitem(sys.modules, "shapely.ops", ops_mod)

    # two disjoint unit squares (closed rings, z=0) in one group
    def ring(x0, y0):
        return "#".join(
            f"{v}" for p in [(x0, y0), (x0 + 1.0, y0), (x0 + 1.0, y0 + 1.0),
                             (x0, y0 + 1.0), (x0, y0)] for v in (p[0], p[1], 0.0)
        )

    df = spark.createDataFrame(
        [("g1", ring(0.0, 0.0)), ("g1", ring(5.0, 5.0))], "grp string, lit string"
    )
    rows = geo.footprint_union(df, "grp", "lit", min_area=0.5, exact=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_members == 2
    assert (r.xmin, r.ymin, r.xmax, r.ymax) == (0.0, 0.0, 6.0, 6.0)
    assert abs(r.total_area - 2.0) < 1e-9
    assert r.wkt == "MULTIPOLYGON<2>"


def test_ring_validity_degenerate_literals_no_ansi_error(spark):
    """Rings with <2 points must classify as invalid, not blow up with
    INVALID_ARRAY_INDEX under ANSI mode (the sequence upper bound would
    otherwise go negative)."""
    df = spark.createDataFrame(
        [("one_pt", "1.0#2.0#3.0"),
         ("two_pt", "0.0#0.0#0.0#1.0#1.0#1.0"),
         ("ok", "#".join(str(float(v)) for v in
                         [0,0,0, 1,0,0, 1,1,0, 0,1,0, 0,0,0]))],
        "id string, lit string",
    )
    out = {r.id: (r.is_valid, r.reason) for r in geo.ring_validity(df, "lit").collect()}
    assert out["one_pt"] == (False, "too_few_points")
    assert out["two_pt"] == (False, "too_few_points")
    assert out["ok"] == (True, "ok")


def test_collada_geometry_structure(spark):
    from citykg.ops.collada import collada_geometry

    ring = "#".join(str(float(v)) for v in
                    [0, 0, 0, 4, 0, 0, 4, 3, 0, 0, 3, 0, 0, 0, 0])  # closed quad
    df = spark.createDataFrame([("g1", ring)], "gml_id string, lit string")
    x = collada_geometry(df, "gml_id", "lit").collect()[0].collada
    assert '<geometry id="g1"><mesh>' in x
    assert 'count="12"' in x          # 4 unique points x 3
    assert 'count="4" stride="3"' in x
    assert '<triangles count="2">' in x
    assert "<p>0 1 2 0 2 3</p>" in x
    assert "0.0 0.0 0.0 4.0 0.0 0.0 4.0 3.0 0.0 0.0 3.0 0.0</float_array>" in x


def test_gltf_document_and_buffer(spark, tmp_path):
    import json
    import struct as st

    import numpy as np

    from citykg.ops.gltf import export_gltf, gltf_buffers, gltf_document

    ring = "#".join(str(float(v)) for v in
                    [0, 0, 0, 4, 0, 0, 4, 3, 5, 0, 3, 0, 0, 0, 0])  # closed quad, one raised z
    df = spark.createDataFrame([("g1", ring)], "gml_id string, lit string")
    doc = json.loads(gltf_document(df, "gml_id", "lit").collect()[0].gltf)
    assert doc["asset"]["version"] == "2.0"
    pos_acc, idx_acc = doc["accessors"]
    assert (pos_acc["count"], pos_acc["type"], pos_acc["componentType"]) == (4, "VEC3", 5126)
    assert pos_acc["min"] == [0.0, 0.0, 0.0] and pos_acc["max"] == [4.0, 3.0, 5.0]
    assert (idx_acc["count"], idx_acc["componentType"]) == (6, 5123)
    pv, iv = doc["bufferViews"]
    assert (pv["byteOffset"], pv["byteLength"]) == (0, 48)
    assert (iv["byteOffset"], iv["byteLength"]) == (48, 12)
    assert doc["buffers"] == [{"uri": "g1.bin", "byteLength": 60}]
    # packed buffer round-trips to the literal's own coordinates + fan
    b = bytes(gltf_buffers(df, "gml_id", "lit").collect()[0].bin)
    assert len(b) == 60
    pos = np.frombuffer(b[:48], dtype="<f4").reshape(4, 3)
    assert pos.tolist() == [[0, 0, 0], [4, 0, 0], [4, 3, 5], [0, 3, 0]]
    assert np.frombuffer(b[48:], dtype="<u2").tolist() == [0, 1, 2, 0, 2, 3]
    # degenerate literal -> NULL buffer, not a job error
    bad = spark.createDataFrame([("g2", "0.0#0.0#0.0#1.0")], "gml_id string, lit string")
    assert gltf_buffers(bad, "gml_id", "lit").collect()[0].bin is None
    export_gltf(df, "gml_id", "lit", str(tmp_path / "out"))
    assert json.loads(
        spark.read.text(str(tmp_path / "out/docs")).collect()[0].value
    ) == doc


def test_point_in_polygon_join(spark):
    ring = "#".join(str(float(v)) for v in
                    [0, 0, 0, 10, 0, 0, 10, 10, 0, 0, 10, 0, 0, 0, 0])
    far = "#".join(str(float(v)) for v in
                   [100, 100, 0, 110, 100, 0, 110, 110, 0, 100, 110, 0, 100, 100, 0])
    polys = spark.createDataFrame([("sq", ring), ("far", far)], "poly_id string, lit string")
    pts = spark.createDataFrame(
        [("in1", 5.0, 5.0), ("edge_out", 15.0, 5.0), ("in_far", 105.0, 105.0)],
        "point_id string, x double, y double",
    )
    got = {(r.point_id, r.poly_id)
           for r in geo.point_in_polygon_join(pts, polys, cell_size=8.0).collect()}
    assert got == {("in1", "sq"), ("in_far", "far")}
    plan = geo.point_in_polygon_join(pts, polys)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_citygml_export_roundtrip(spark):
    """Exporter fragment for a synthetic building: known attribute values
    land in the right CityGML elements, envelope corners come from the
    ring's pt0/pt2, and the JSON twin parses as real JSON."""
    import json

    from citykg.ops.citygml_export import building_citygml, building_cityjson

    ring = "#".join(map(str, [10, 20, 1, 19, 20, 1, 19, 28, 5, 10, 28, 5, 10, 20, 1]))
    rows = [
        ("d1", "s/cityobject/BLDG_1/", "ocgml:gmlId", "BLDG_1", "cityobject"),
        ("d1", "s/cityobject/BLDG_1/", "ocgml:name", "Building 1", "cityobject"),
        ("d1", "s/cityobject/BLDG_1/", "ocgml:EnvelopeType", ring, "cityobject"),
        ("d1", "s/cityobject/BLDG_1/", "ocgml:creationDate", "2014-07-08T00:00Z", "cityobject"),
        ("d1", "s/building/BLDG_1/", "ocgml:class", "3", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:function", "1004", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:usage", "2001", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:yearOfConstruction", "1984", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:roofType", "2", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:measuredHeigh", "7.5", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:storeysAboveGround", "2", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:storeysBelowGround", "1", "building"),
        # building-part + non-export preds must be ignored by the pivot
        ("d1", "s/building/BP_1/", "ocgml:class", "9", "building"),
        ("d1", "s/building/BLDG_1/", "ocgml:objectClassId", "26", "building"),
    ]
    t = spark.createDataFrame(
        rows, "doc_id string, subj string, pred string, obj string, graph string"
    )
    x = building_citygml(t).collect()[0]
    assert x.gml_id == "BLDG_1"
    assert '<bldg:Building gml:id="BLDG_1">' in x.citygml
    assert "<gml:lowerCorner>10 20 1</gml:lowerCorner>" in x.citygml
    assert "<gml:upperCorner>19 28 5</gml:upperCorner>" in x.citygml
    assert '<bldg:measuredHeight uom="#m">7.5</bldg:measuredHeight>' in x.citygml
    assert "<bldg:class>3</bldg:class>" in x.citygml  # not the BP_1 value

    j = building_cityjson(t).collect()[0]
    parsed = json.loads(j.cityjson)
    b = parsed["BLDG_1"]
    assert b["type"] == "Building"
    assert b["attributes"]["storeysAboveGround"] == "2"
    assert b["geometry"][0]["boundaries"] == [[[0, 1, 2, 3]]]
    assert b["vertices"] == [[10, 20, 1], [19, 20, 1], [19, 28, 5], [10, 28, 5]]

    # scale shape: exactly ONE exchange (the pivot agg), no join
    plan = building_citygml(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 and "Join" not in plan


def test_citygml_export_missing_attrs(spark):
    """A feature missing attributes (incl. the envelope) still exports an
    empty-element fragment instead of a NULL row or an ANSI index error."""
    from citykg.ops.citygml_export import building_citygml

    t = spark.createDataFrame(
        [
            ("d2", "s/cityobject/BLDG_2/", "ocgml:gmlId", "BLDG_2", "cityobject"),
            ("d2", "s/building/BLDG_2/", "ocgml:storeysAboveGround", "4", "building"),
        ],
        "doc_id string, subj string, pred string, obj string, graph string",
    )
    x = building_citygml(t).collect()[0]
    assert x.citygml is not None
    assert '<bldg:Building gml:id="BLDG_2">' in x.citygml
    assert "<bldg:storeysAboveGround>4</bldg:storeysAboveGround>" in x.citygml
    assert "<gml:name></gml:name>" in x.citygml  # absent -> empty element
    assert "<gml:lowerCorner></gml:lowerCorner>" in x.citygml


def test_ring_relations_exact(spark):
    """Q7 ring-exact classifier: DE-9IM-style relations computed on actual
    rings, including the cases where the envelope classifier diverges
    (bbox contains/equals while rings are disjoint/touching)."""
    from citykg.ops import geo

    def ring(*pts):
        flat = []
        for x, y in list(pts) + [pts[0]]:
            flat += [x, y, 0]
        return "#".join(str(float(v)) for v in flat)

    sq = lambda x0, y0, s: ring((x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s))  # noqa: E731
    cases = [
        ("env_div_disjoint", ring((0, 0), (10, 0), (0, 10)), ring((9, 9), (10, 9), (9, 10)), "disjoint"),
        ("equals", sq(0, 0, 4), sq(0, 0, 4), "equals"),
        ("equals_rotated_start", ring((0, 0), (4, 0), (4, 4), (0, 4)), ring((4, 4), (0, 4), (0, 0), (4, 0)), "equals"),
        ("within", sq(1, 1, 2), sq(0, 0, 10), "within"),
        ("within_boundary_touch", sq(0, 0, 4), sq(0, 0, 10), "within"),
        ("contains", sq(0, 0, 10), sq(3, 3, 1), "contains"),
        ("overlaps", sq(0, 0, 4), sq(2, 2, 4), "overlaps"),
        ("touch_corner", sq(0, 0, 4), sq(4, 4, 4), "touches"),
        ("touch_edge_env_equal", ring((0, 0), (6, 0), (0, 6)), ring((6, 0), (6, 6), (0, 6)), "touches"),
        ("disjoint_far", sq(0, 0, 1), sq(50, 50, 1), "disjoint"),
    ]
    df = spark.createDataFrame(cases, "name string, la string, lb string, expect string")
    out = geo.ring_relations(df, "la", "lb")
    bad = [(r.name, r.relation, r.expect) for r in out.collect() if r.relation != r.expect]
    assert not bad, bad


def test_haskey_sameas_star_form(spark):
    """owl:hasKey: a/b/c share both key values -> two star edges to min
    IRI a; d differs on one key; e is dropped (missing a key value);
    other-graph rows never contribute."""
    rows = []
    for s, h, r in [("a", "10", "flat"), ("b", "10", "flat"),
                    ("c", "10", "flat"), ("d", "11", "flat")]:
        rows += [("building", s, "ocgml:h", h, "literal"),
                 ("building", s, "ocgml:r", r, "literal")]
    rows.append(("building", "e", "ocgml:h", "10", "literal"))  # no ocgml:r
    rows.append(("other", "z", "ocgml:h", "10", "literal"))
    t = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj string, obj_type string"
    )
    out = {(r.subj, r.canon, r.n_shared)
           for r in owl.haskey_sameas(t, "building", ["ocgml:h", "ocgml:r"]).collect()}
    assert out == {("b", "a", 3), ("c", "a", 3)}


def test_shacl_report_violation_families(spark):
    """Each constraint family counted independently per focus node:
    s1 conforms on p1; s2 misses p1 (min); s2 has p2 twice (max);
    s3 carries p1 as the wrong node kind."""
    rows = [
        ("building", "s1", "p1", "x", "literal"),
        ("building", "s1", "p2", "x", "literal"),
        ("building", "s2", "p2", "x", "literal"),
        ("building", "s2", "p2", "y", "literal"),
        ("building", "s3", "p1", "iri:z", "iri"),
        ("other", "zz", "p1", "x", "literal"),  # other graphs never count
    ]
    t = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj string, obj_type string"
    )
    shapes = [("p1", 1, 1, "literal"), ("p2", 0, 1, "literal")]
    out = {r.pred: r for r in owl.shacl_report(spark, t, shapes).collect()}
    # universe = {s1, s2, s3}
    assert out["p1"].n_subjects == 3
    assert out["p1"].n_min_violations == 1   # s2 has no p1
    assert out["p1"].n_kind_violations == 1  # s3's p1 is an iri
    assert out["p1"].n_conforming == 1       # s1
    assert out["p2"].n_max_violations == 1   # s2 has p2 twice
    assert out["p2"].n_conforming == 2       # s1 (one p2), s3 (zero, min 0)


def test_knn_within_exact_across_cells(spark):
    """Nearest neighbors straddling grid-cell boundaries are found
    (cell size = radius, 3x3 probe), ranks are distance-ordered, the
    radius excludes far points, and k truncates."""
    pts = [
        ("a", 0.0, 0.0),
        ("b", 1.5, 0.0),   # dist 1.5 from a, crosses the x-cell boundary
        ("c", 0.0, 0.5),   # dist 0.5 from a
        ("d", 1.5, 0.5),
        ("far", 50.0, 50.0),
    ]
    df = spark.createDataFrame(pts, "id string, x double, y double")
    out = geo.knn_within(df, "id", "x", "y", 2.0, k=2)
    got = {(r.id_a, r.rank): (r.id_b, r.dist) for r in out.collect()}
    assert got[("a", 1)] == ("c", 0.5)
    assert got[("a", 2)] == ("b", 1.5)
    assert ("far", 1) not in got          # nothing within radius
    assert len([k for k in got if k[0] == "b"]) == 2  # k truncates at 2


def test_knn_within_equals_brute_force_on_random_points(spark):
    """Grid-blocked kNN == brute-force kNN on 200 seeded-random points:
    the 3x3 probe at cell size = radius provably covers the disc, so the
    blocked result may never lose a neighbor."""
    import random

    rng = random.Random(1234)
    pts = [(i, rng.uniform(0, 50), rng.uniform(0, 50)) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {(r.id_a, r.rank): r.id_b
           for r in geo.knn_within(df, "id", "x", "y", 4.0, k=3).collect()}

    import math
    want = {}
    for i, xi, yi in pts:
        cands = []
        for j, xj, yj in pts:
            if i == j:
                continue
            d = round(math.sqrt((xi - xj) ** 2 + (yi - yj) ** 2), 6)
            if d <= 4.0:
                cands.append((d, j))
        for rank, (_, j) in enumerate(sorted(cands)[:3], start=1):
            want[(i, rank)] = j
    assert got == want


def test_owl_property_chain_direct_and_inverse(spark):
    """prp-spo2: direct chain composes P.obj = Q.subj; invert_first
    walks a link table (two predicates off one link row) into direct
    assertions; duplicates collapse via the distinct."""
    t = spark.createDataFrame(
        [
            ("L1", "p:addr", "A1", "addresstobuilding"),
            ("L1", "p:bldg", "B1", "addresstobuilding"),
            ("L2", "p:addr", "A1", "addresstobuilding"),
            ("L2", "p:bldg", "B1", "addresstobuilding"),  # dup derivation
            ("L3", "p:addr", "A2", "addresstobuilding"),
            ("X", "p:a", "Y", "g"),
            ("Y", "p:b", "Z", "g"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    inv = owl.property_chain(t, "p:addr", "p:bldg", "p:of", invert_first=True).collect()
    assert {(r.subj, r.pred, r.obj) for r in inv} == {("A1", "p:of", "B1")}
    direct = owl.property_chain(t, "p:a", "p:b", "p:ab").collect()
    assert {(r.subj, r.obj) for r in direct} == {("X", "Z")}
