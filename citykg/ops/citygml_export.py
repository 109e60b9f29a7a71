"""CityGML / CityJSON re-export — the "Exporter" half of the reference's
Importer/Exporter, over the triple store instead of relational tables.

The reference exporter reconstructs `bldg:Building` CityGML documents from
the database per feature: thematic attributes + bldg:boundedBy envelope
(/root/reference/impexp-core/src/main/java/org/citydb/citygml/exporter/
database/content/DBBuilding.java:123,271-283,322-330 — measuredHeight with
uom, class/function/usage, storeys, boundedBy) streamed through
writer/CityGMLWriter.java. Here the same projection runs over the extracted
triples: ONE conditional-aggregation pivot per doc (a single partial-agg
shuffle on doc_id, map-side combinable), then a pure JVM string Project —
no Python, no second shuffle, no join. At 100 TB the pivot shuffles only
the ~14 attribute triples per building that the export consumes (the
`where` on graph+pred prunes the rest at the scan), and the XML rendering
is whole-stage-codegen'd string concat.

CityJSON export (the reference tool gained a CityJSON writer in v4; the
fork's reader is S3) renders the same pivot as a CityJSON 1.0 CityObjects
entry with the envelope ring as a one-surface lod1 MultiSurface and
0-indexed vertices — string-built on both engines so the driver's value
hash compares byte-exact JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (alias, graph, predicate) consumed by the building export projection;
# predicate spelling per SchemaManagerAdapter (incl. the reference's
# 'measuredHeigh' typo, preserved by vocab.py).
BUILDING_EXPORT_PREDS = [
    ("gml_id", "cityobject", "ocgml:gmlId"),
    ("name", "cityobject", "ocgml:name"),
    ("env", "cityobject", "ocgml:EnvelopeType"),
    ("creation", "cityobject", "ocgml:creationDate"),
    ("clazz", "building", "ocgml:class"),
    ("function", "building", "ocgml:function"),
    ("usage", "building", "ocgml:usage"),
    ("yoc", "building", "ocgml:yearOfConstruction"),
    ("roof", "building", "ocgml:roofType"),
    ("height", "building", "ocgml:measuredHeigh"),
    ("sag", "building", "ocgml:storeysAboveGround"),
    ("sbg", "building", "ocgml:storeysBelowGround"),
]


def building_export_pivot(triples: DataFrame) -> DataFrame:
    """Pivot the building + cityobject graphs to one attribute row per
    main building (subject contains '/BLDG_'; building parts 'BP_' are
    child features the flat export skips, as does the reference's
    top-feature query). Input: the triple frame (any superset of the two
    graphs). One groupBy(doc_id) shuffle."""
    wanted = triples.where(
        F.col("subj").contains("/BLDG_")
        & F.col("graph").isin("building", "cityobject")
        & F.col("pred").isin(*sorted({p for _, _, p in BUILDING_EXPORT_PREDS}))
    )
    aggs = [
        # coalesce to '': a feature missing an attribute must still export
        # (the reference omits absent elements; the flat fragment renders
        # them empty) — without this, concat() null-propagates and a
        # single absent pred would null the whole document
        F.coalesce(
            F.max(
                F.when((F.col("graph") == g) & (F.col("pred") == p), F.col("obj"))
            ),
            F.lit(""),
        ).alias(a)
        for a, g, p in BUILDING_EXPORT_PREDS
    ]
    return wanted.groupBy("doc_id").agg(*aggs)


def _corner(env_col: str, first: int) -> F.Column:
    """'x y z' corner string from the 5-pt '#'-ring literal; tokens are
    1-indexed. lower = pt0 (tokens 1..3), upper = pt2 (tokens 7..9) per
    the envelope ring convention (DBCityObject.java:324-331)."""
    t = F.split(F.col(env_col), "#")
    # F.get (not getItem/element_at): returns NULL out-of-range even under
    # ANSI, so a feature with a missing/short envelope exports an empty
    # corner instead of failing the job
    return F.concat_ws(
        " ", F.get(t, first - 1), F.get(t, first), F.get(t, first + 1)
    )


def building_citygml(triples: DataFrame) -> DataFrame:
    """CityGML 2.0 `bldg:Building` fragment per building, mirroring the
    reference exporter's property order (DBBuilding.java:249-420: gml:name,
    boundedBy envelope, creationDate, class, function, usage,
    yearOfConstruction, roofType, measuredHeight uom, storeys)."""
    p = building_export_pivot(triples)
    xml = F.concat(
        F.lit('<cityObjectMember><bldg:Building gml:id="'), F.col("gml_id"),
        F.lit('"><gml:name>'), F.col("name"),
        F.lit('</gml:name><gml:boundedBy><gml:Envelope srsDimension="3">'
              "<gml:lowerCorner>"), _corner("env", 1),
        F.lit("</gml:lowerCorner><gml:upperCorner>"), _corner("env", 7),
        F.lit("</gml:upperCorner></gml:Envelope></gml:boundedBy>"
              "<core:creationDate>"), F.col("creation"),
        F.lit("</core:creationDate><bldg:class>"), F.col("clazz"),
        F.lit("</bldg:class><bldg:function>"), F.col("function"),
        F.lit("</bldg:function><bldg:usage>"), F.col("usage"),
        F.lit("</bldg:usage><bldg:yearOfConstruction>"), F.col("yoc"),
        F.lit('</bldg:yearOfConstruction><bldg:roofType>'), F.col("roof"),
        F.lit('</bldg:roofType><bldg:measuredHeight uom="#m">'),
        F.col("height"),
        F.lit("</bldg:measuredHeight><bldg:storeysAboveGround>"),
        F.col("sag"),
        F.lit("</bldg:storeysAboveGround><bldg:storeysBelowGround>"),
        F.col("sbg"),
        F.lit("</bldg:storeysBelowGround></bldg:Building>"
              "</cityObjectMember>"),
    )
    return p.select("doc_id", "gml_id", xml.alias("citygml"))


def building_cityjson(triples: DataFrame) -> DataFrame:
    """CityJSON 1.0 CityObjects entry per building: typed attributes +
    the envelope ring as a one-surface lod1 MultiSurface over 0-indexed
    vertices (the 4 distinct ring points; the closing 5th point is
    dropped, CityJSON boundaries are implicitly closed). String-built so
    key order and number rendering are engine-exact."""
    p = building_export_pivot(triples)
    t = F.split(F.col("env"), "#")
    verts = F.concat_ws(
        ",",
        *[
            F.concat(
                F.lit("["),
                F.concat_ws(
                    ",", F.get(t, 3 * i), F.get(t, 3 * i + 1), F.get(t, 3 * i + 2)
                ),
                F.lit("]"),
            )
            for i in range(4)
        ],
    )
    js = F.concat(
        F.lit('{"'), F.col("gml_id"),
        F.lit('":{"type":"Building","attributes":{"name":"'), F.col("name"),
        F.lit('","class":"'), F.col("clazz"),
        F.lit('","function":"'), F.col("function"),
        F.lit('","usage":"'), F.col("usage"),
        F.lit('","yearOfConstruction":"'), F.col("yoc"),
        F.lit('","roofType":"'), F.col("roof"),
        F.lit('","measuredHeight":"'), F.col("height"),
        F.lit('","storeysAboveGround":"'), F.col("sag"),
        F.lit('","storeysBelowGround":"'), F.col("sbg"),
        F.lit('"},"geometry":[{"type":"MultiSurface","lod":1,'
              '"boundaries":[[[0,1,2,3]]]}],"vertices":['),
        verts,
        F.lit("]}}"),
    )
    return p.select("doc_id", "gml_id", js.alias("cityjson"))
