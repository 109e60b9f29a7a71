"""S8 — KML export (the formatting core of the reference's
KML/COLLADA/glTF visual-export plugin).

The reference's KmlExporterManager builds Placemark documents per feature
from the surface-geometry query results
(/root/reference/impexp-kml-collada-plugin/src/main/java/org/citydb/modules/
kml/database/KmlExporterManager.java), tiled by KmlSplitter (tiling = the
`tiling` query in __spark_entry__). The COLLADA mesh half lives in
citykg.ops.collada; glTF conversion (an external collada2gltf tool in the
reference) is out of scope. The Placemark projections here are pure string
transforms of the '#'-geometry literal — one JVM-side Project, zero
shuffles, oracled in DuckDB.

Coordinate regrouping keeps the ORIGINAL literal tokens (no double
parse/re-render): every 3rd '#' boundary becomes the KML tuple separator,
the others become commas — x#y#z#x#y#z -> "x,y,z x,y,z". Re-projection to
WGS84 (the reference does this via its SRS config) is the separate A4 op
(ops.crs.transform_df); compose when lon/lat output is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KML_HEADER = '<?xml version="1.0" encoding="UTF-8"?><kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
KML_FOOTER = "</Document></kml>"


def kml_coordinates_expr(lit_col: str) -> str:
    """SQL expr: '#'-literal -> KML coordinate string 'x,y,z x,y,z ...'."""
    t = f"split({lit_col}, '#')"
    return (
        f"array_join(transform(sequence(0, greatest(int(size({t}) / 3) - 1, 0)), i -> "
        f"concat(element_at({t}, cast(3 * i + 1 as int)), ',', "
        f"element_at({t}, cast(3 * i + 2 as int)), ',', "
        f"element_at({t}, cast(3 * i + 3 as int)))), ' ')"
    )


def kml_placemarks(df: DataFrame, id_col: str, lit_col: str, out: str = "kml") -> DataFrame:
    """Adds a Placemark XML column per row (geometry footprint ring)."""
    coords = kml_coordinates_expr(lit_col)
    return df.withColumn(
        out,
        F.expr(
            f"concat('<Placemark><name>', {id_col}, '</name>"
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>', "
            f"{coords}, "
            "'</coordinates></LinearRing></outerBoundaryIs></Polygon></Placemark>')"
        ),
    )


def kml_extruded_placemarks(
    df: DataFrame,
    id_col: str,
    lit_col: str,
    height_col: str,
    style_basis: str = "Building",
    out: str = "kml",
) -> DataFrame:
    """EXTRUDED display form (KmlGenericObject.createPlacemarksForExtruded,
    KmlGenericObject.java:1598-1680): the ground ring's x,y with z replaced
    by the measured height, wrapped in a Polygon with extrude/tessellate
    set and relativeToGround altitude inside a MultiGeometry; placemark id
    gets the extruded prefix and the styleUrl the '<basis>ExtrudedNormal'
    style (KmlGenericObject.java:1611-1615). `height_col` must be a
    string-typed column so rendering is engine-exact."""
    t = f"split({lit_col}, '#')"
    coords = (
        f"array_join(transform(sequence(0, greatest(int(size({t}) / 3) - 1, 0)), i -> "
        f"concat(element_at({t}, cast(3 * i + 1 as int)), ',', "
        f"element_at({t}, cast(3 * i + 2 as int)), ',', {height_col})), ' ')"
    )
    return df.withColumn(
        out,
        F.expr(
            f"concat('<Placemark id=\"KMLExtr_', {id_col}, '\"><name>', {id_col}, "
            f"'</name><styleUrl>#{style_basis}ExtrudedNormal</styleUrl>"
            "<MultiGeometry><Polygon><extrude>1</extrude><tessellate>1</tessellate>"
            "<altitudeMode>relativeToGround</altitudeMode>"
            "<outerBoundaryIs><LinearRing><coordinates>', "
            f"{coords}, "
            "'</coordinates></LinearRing></outerBoundaryIs></Polygon>"
            "</MultiGeometry></Placemark>')"
        ),
    )


def kml_geometry_placemarks(
    df: DataFrame,
    id_col: str,
    lit_col: str,
    type_col: str,
    out: str = "kml",
) -> DataFrame:
    """GEOMETRY display form (KmlGenericObject.createPlacemarksForGeometry,
    KmlGenericObject.java:1840-2080): the feature's surfaces are grouped
    per (feature, surfaceType) into ONE Placemark holding a MultiGeometry
    of that type's polygons — name = '<gmlId>_<surfaceType>', id =
    'KMLGeom_' + name (IdPrefixes.java:43), styleUrl =
    '#<surfaceType>Normal' (KmlGenericObject.java:2060-2068). `type_col`
    is the thematic surface type when present, else the normal-vector
    classification (compose with geo.classify_surface — the reference's
    own "walk-around-way ... calculate the Normal-vector" fallback,
    KmlGenericObject.java:1951-1956).

    Polygon order inside a MultiGeometry is pinned by sorting the
    rendered polygon XML (the reference inherits JDBC result-set order;
    a distributed engine must make it deterministic). Scale shape: ONE
    groupBy shuffle on (feature, type) — partial-agg combinable — then a
    pure JVM string Project; per-feature surface counts bound the
    collect_list, no global state."""
    coords = kml_coordinates_expr(lit_col)
    per = df.withColumn(
        "_poly",
        F.expr(
            "concat('<Polygon><outerBoundaryIs><LinearRing><coordinates>', "
            f"{coords}, "
            "'</coordinates></LinearRing></outerBoundaryIs></Polygon>')"
        ),
    )
    return (
        per.groupBy(id_col, type_col)
        .agg(F.array_sort(F.collect_list("_poly")).alias("_polys"))
        .withColumn(
            out,
            F.expr(
                f"concat('<Placemark id=\"KMLGeom_', {id_col}, '_', {type_col}, "
                f"'\"><name>', {id_col}, '_', {type_col}, '</name>"
                f"<styleUrl>#', {type_col}, 'Normal</styleUrl><MultiGeometry>', "
                "array_join(_polys, ''), '</MultiGeometry></Placemark>')"
            ),
        )
        .drop("_polys")
    )


def export_kml(df: DataFrame, id_col: str, lit_col: str, path: str) -> None:
    """Placemark lines to a text sink; wrap with KML_HEADER/KML_FOOTER when
    assembling a single document (driver-side concat of part files, or a
    coalesce(1) for small exports)."""
    kml_placemarks(df, id_col, lit_col).select(F.col("kml").alias("value")).write.mode(
        "overwrite"
    ).text(path)
