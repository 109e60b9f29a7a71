"""S3 CityJSON reader: same docs/triples as the CityGML reader for an
equivalent input (reader-agnostic pipeline invariant)."""

from citykg.citygml import parse_citygml
from citykg.cityjson import parse_cityjson
from citykg.extract import extract_triples
from citykg.schema import DOC_SCHEMA

GML = """<?xml version="1.0" encoding="UTF-8"?>
<CityModel xmlns="http://www.opengis.net/citygml/2.0"
           xmlns:bldg="http://www.opengis.net/citygml/building/2.0"
           xmlns:gen="http://www.opengis.net/citygml/generics/2.0"
           xmlns:gml="http://www.opengis.net/gml">
 <cityObjectMember>
  <bldg:Building gml:id="B_1">
   <creationDate>2020-05-01</creationDate>
   <gen:stringAttribute name="owner"><gen:value>ACME</gen:value></gen:stringAttribute>
   <bldg:function>1000</bldg:function>
   <bldg:measuredHeight uom="m">12.5</bldg:measuredHeight>
   <bldg:storeysAboveGround>4</bldg:storeysAboveGround>
   <bldg:lod2MultiSurface>
    <gml:MultiSurface>
     <gml:surfaceMember>
      <gml:Polygon>
       <gml:exterior><gml:LinearRing>
        <gml:posList>0 0 0 4 0 0 4 4 0 0 4 0 0 0 0</gml:posList>
       </gml:LinearRing></gml:exterior>
      </gml:Polygon>
     </gml:surfaceMember>
     <gml:surfaceMember>
      <gml:Polygon>
       <gml:exterior><gml:LinearRing>
        <gml:posList>0 0 10 4 0 10 4 4 10 0 4 10 0 0 10</gml:posList>
       </gml:LinearRing></gml:exterior>
      </gml:Polygon>
     </gml:surfaceMember>
    </gml:MultiSurface>
   </bldg:lod2MultiSurface>
  </bldg:Building>
 </cityObjectMember>
</CityModel>"""

CJ = """{
 "type": "CityJSON", "version": "1.1",
 "transform": {"scale": [0.5, 0.5, 0.5], "translate": [0.0, 0.0, 0.0]},
 "vertices": [[0,0,0],[8,0,0],[8,8,0],[0,8,0],[0,0,20],[8,0,20],[8,8,20],[0,8,20]],
 "CityObjects": {
  "B_1": {
   "type": "Building",
   "attributes": {"creationDate": "2020-05-01", "owner": "ACME",
                  "function": "1000", "measuredHeight": 12.5,
                  "storeysAboveGround": 4},
   "geometry": [
    {"type": "MultiSurface", "lod": "2",
     "boundaries": [[[0,1,2,3]], [[4,5,6,7]]]}
   ]
  }
 }
}"""


def test_cityjson_matches_citygml_triples(spark):
    def triples(parsed):
        docs = spark.createDataFrame(
            [
                (d, [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans])
                for d, spans in parsed
            ],
            DOC_SCHEMA,
        )
        return {
            (r.graph, r.subj, r.pred, r.obj)
            for r in extract_triples(spark, docs).collect()
        }

    t_gml = triples(parse_citygml(GML))
    t_cj = triples(parse_cityjson(CJ))
    # CityGML marks measuredHeight's uom (no uom channel in CityJSON) and
    # the readers differ only there
    t_gml = {t for t in t_gml if t[2] != "ocgml:measuredHeightUnit"}
    assert t_cj == t_gml
    assert any(p == "ocgml:GeometryType" and "#" in o for _, _, p, o in t_cj)


def test_cityjson_solid_threading(spark):
    cj = """{
     "type": "CityJSON", "version": "1.1",
     "vertices": [[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]],
     "CityObjects": {"S_1": {"type": "Building",
       "geometry": [{"type": "Solid", "lod": 1,
         "boundaries": [[[[0,3,2,1]], [[4,5,6,7]], [[0,1,5,4]]]]}]}}}"""
    rows = parse_cityjson(cj)
    assert len(rows) == 1
    doc_id, spans = rows[0]
    geom = [dict(kv.split("=", 1) for kv in t.split(";")) for k, t, _, _ in spans if k == "surface_geometry"]
    solid = geom[0]
    shell = geom[1]
    polys = geom[2:]
    assert solid["isSolid"] == "1" and "coords" not in solid
    assert shell["parentId"] == solid["gmlId"] and shell["isComposite"] == "1"
    assert len(polys) == 3
    assert all(p["rootId"] == solid["gmlId"] and p["parentId"] == shell["gmlId"] for p in polys)
    # rings are closed on emission (first vertex repeated): 4 pts -> 15 values
    assert all(len(p["coords"].split("#")) == 15 for p in polys)
    # building span references the solid container at lod1
    bldg = next(dict(kv.split("=", 1) for kv in t.split(";")) for k, t, _, _ in spans if k == "building")
    assert bldg["lod1SolidId"] == solid["gmlId"]


def test_read_cityjson_source(spark, tmp_path):
    p = tmp_path / "a.json"
    p.write_text(CJ)
    from citykg.sources import read_cityjson

    df = read_cityjson(spark, str(p))
    rows = df.collect()
    assert len(rows) == 1 and rows[0].doc_id == "B_1"
    kinds = [s.kind for s in rows[0].spans]
    assert kinds[0] == "building" and kinds.count("surface_geometry") == 3


def test_hostile_inputs_become_rejects(spark, tmp_path):
    """A malformed file fails THAT file, not the job; rejects are
    auditable rows."""
    (tmp_path / "good.json").write_text(CJ)
    (tmp_path / "bad1.json").write_text("{not json at all")
    # valid JSON, out-of-bounds vertex index -> parser exception
    (tmp_path / "bad2.json").write_text(
        '{"type":"CityJSON","vertices":[[0,0,0]],"CityObjects":{"B":{"type":"Building",'
        '"geometry":[{"type":"MultiSurface","lod":1,"boundaries":[[[0,1,2,3]]]}]}}}'
    )
    from citykg.cityjson import parse_cityjson
    from citykg.sources import docs_from_text, split_rejects

    files = spark.read.text(str(tmp_path), wholetext=True)
    docs = docs_from_text(files, parse_cityjson, errors="keep")
    good, rejects = split_rejects(docs)
    assert [r.doc_id for r in good.collect()] == ["B_1"]
    rej = rejects.collect()
    assert len(rej) == 2
    assert all(r.doc_id.startswith("_reject_") for r in rej)
    assert all(r.spans[0].kind == "_error" for r in rej)
