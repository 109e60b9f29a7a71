"""S8 — COLLADA geometry export (the mesh half of the reference's
KML/COLLADA plugin).

The reference assembles a COLLADA 1.4.1 document per feature:
`KmlGenericObject.java:350-431` builds the asset (meters, Z_UP) and a
`library_geometries` entry with a position float-array source + stride-3
X/Y/Z accessor, then triangulates each surface into `<triangles>` with
vertex indices (`KmlGenericObject.java:674+`). This module reproduces the
geometry document Spark-first: one JVM string Project per feature, no
Python, no shuffle.

Fidelity contract (documented simplifications, both oracled):
* positions reuse the ORIGINAL '#'-literal tokens (no double re-render) —
  the ring's unique points, i.e. the closed ring minus its closing repeat;
* triangulation is the polygon fan (0, i, i+1) — exact for the convex
  rings the synthetic corpus and envelope literals carry (the reference
  runs full ear-clipping for concave rings; that is per-feature local
  work and would slot into the same Project as a Pandas UDF);
* per-vertex normals/texcoords are omitted (COLLADA triangles are valid
  with a VERTEX input alone); the surface normal is available separately
  via ops.geo.with_normal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

COLLADA_HEADER = (
    '<?xml version="1.0" encoding="UTF-8" standalone="no"?>'
    '<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">'
    '<asset><unit meter="1.0" name="meters"/><up_axis>Z_UP</up_axis></asset>'
    "<library_geometries>"
)
COLLADA_FOOTER = "</library_geometries></COLLADA>"


def collada_geometry(df: DataFrame, id_col: str, lit_col: str, out: str = "collada") -> DataFrame:
    """Adds a `<geometry>` element per row from a closed-ring '#'-literal.

    npts = point count minus the closing repeat; the fan emits npts-2
    triangles. All generated numbers are integers and coordinates are the
    literal's own tokens, so the output is engine-exact (DuckDB-oracled).
    """
    t = f"split({lit_col}, '#')"
    npts = f"(int(size({t}) / 3) - 1)"
    pos = f"array_join(slice({t}, 1, 3 * {npts}), ' ')"
    fan = (
        f"array_join(transform(sequence(1, greatest({npts} - 2, 0)), "
        "i -> concat('0 ', i, ' ', i + 1)), ' ')"
    )
    return df.withColumn(
        out,
        F.expr(
            f"concat('<geometry id=\"', {id_col}, '\"><mesh>"
            f"<source id=\"', {id_col}, '-position\">"
            f"<float_array id=\"', {id_col}, '-position-array\" count=\"', 3 * {npts}, '\">', "
            f"{pos}, "
            f"'</float_array><technique_common>"
            f"<accessor source=\"#', {id_col}, '-position-array\" count=\"', {npts}, '\" stride=\"3\">"
            '<param name="X" type="float"/><param name="Y" type="float"/>'
            "<param name=\"Z\" type=\"float\"/></accessor></technique_common></source>"
            f"<vertices id=\"', {id_col}, '-vertices\">"
            f"<input semantic=\"POSITION\" source=\"#', {id_col}, '-position\"/></vertices>"
            f"<triangles count=\"', {npts} - 2, '\">"
            f"<input semantic=\"VERTEX\" source=\"#', {id_col}, '-vertices\" offset=\"0\"/>"
            f"<p>', {fan}, '</p></triangles></mesh></geometry>')"
        ),
    )


def export_collada(df: DataFrame, id_col: str, lit_col: str, path: str) -> None:
    """Geometry elements to a text sink; wrap parts with COLLADA_HEADER/
    FOOTER when assembling single documents driver-side (same contract as
    ops.kml.export_kml)."""
    collada_geometry(df, id_col, lit_col).select(
        F.col("collada").alias("value")
    ).write.mode("overwrite").text(path)
