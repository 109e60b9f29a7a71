"""CityJSON -> interleaved-document reader (reference operator S3).

The reference ships a CityJSON reader next to the CityGML one
(/root/reference/impexp-core/src/main/java/org/citydb/citygml/importer/
reader/cityjson/) that feeds the same importer pipeline; this module does
the same: parse a CityJSON text (spec: cityjson.org, v1.0/1.1) and emit
doc rows with EXACTLY the span shape the CityGML reader (citygml.py)
produces, so extract.extract_triples is reader-agnostic.

Covered:
* `transform` (quantized vertices: v * scale + translate);
* Building objects with standard attributes mapped to the same keys the
  CityGML parser uses; non-standard attributes become generic_attribute
  spans with the reference's dataType dispatch (string=1/int=2/double=3,
  DBCityObjectGenericAttrib.java:239-433);
* geometry types Solid / MultiSurface / CompositeSurface with the
  parent/root threading of DBSurfaceGeometry.doImport and the '#'-literal
  polygon encoding (GeometryConverterAdapter.java:256-288);
* envelope = coordinate-bounds fold in the 5-point ring convention
  (DBCityObject.java:324-331).

Driver-side in tests; Spark-scale via sources.read_cityjson (mapInPandas).
"""

from __future__ import annotations

import json

from .citygml import LAST_MOD, _Doc, _fmt_date
from .geometry import compute_bounds, encode_rings, fmt_double

# CityJSON attribute name -> building span key (same keys as citygml.py)
_BLDG_ATTRS = {
    "class": "class",
    "function": "function",
    "usage": "usage",
    "yearOfConstruction": "yearOfConstruction",
    "yearOfDemolition": "yearOfDemolition",
    "roofType": "roofType",
    "measuredHeight": "measuredHeight",
    "storeysAboveGround": "storeysAboveGround",
    "storeysBelowGround": "storeysBelowGround",
    "storeyHeightsAboveGround": "storeyHeightsAboveGround",
    "storeyHeightsBelowGround": "storeyHeightsBelowGround",
    "creationDate": "creationDate",
    "terminationDate": "terminationDate",
}

_CONTAINER_FLAGS = {
    "Solid": ("1", "0"),
    "CompositeSolid": ("1", "1"),
    "CompositeSurface": ("0", "1"),
    "MultiSurface": ("0", "0"),
}


def _num(v: float) -> str:
    """Attribute rendering: integers without trailing .0, floats as-is."""
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


class _CjGeom:
    def __init__(self, doc: _Doc, owner: str, verts: list[list[float]]):
        self.doc = doc
        self.owner = owner
        self.verts = verts
        self.n = 0
        self.all_coords: list[list[float]] = []

    def _mint(self) -> str:
        gid = f"{self.owner}_geom_{self.n}"
        self.n += 1
        return gid

    def _container(self, is_solid: str, is_comp: str, parent: str | None, root: str | None) -> str:
        gid = self._mint()
        self.doc.add(
            "surface_geometry",
            {
                "gmlId": gid,
                "parentId": parent,
                "rootId": root or gid,
                "isSolid": is_solid,
                "isComposite": is_comp,
                "isTriangulated": "0",
                "isXlink": "0",
                "isReverse": "0",
                "cityObjectId": self.owner,
            },
        )
        return gid

    def _ring(self, idxs: list[int]) -> list[float]:
        # CityJSON rings are NOT closed (first vertex not repeated) —
        # close them to match the GML posList convention
        pts = [self.verts[i] for i in idxs] + [self.verts[idxs[0]]]
        return [c for p in pts for c in p]

    def _polygon(self, rings_idx: list[list[int]], parent: str, root: str) -> None:
        gid = self._mint()
        rings = [self._ring(r) for r in rings_idx]
        self.all_coords.extend(rings)
        lexical, datatype = encode_rings("POLYGON", rings, 3)
        self.doc.add(
            "surface_geometry",
            {
                "gmlId": gid,
                "parentId": parent,
                "rootId": root,
                "isSolid": "0",
                "isComposite": "0",
                "isTriangulated": "0",
                "isXlink": "0",
                "isReverse": "0",
                "cityObjectId": self.owner,
                "coords": lexical,
            },
            media_ref=datatype.rsplit("/", 1)[-1],
        )

    def emit(self, gtype: str, boundaries: list) -> str | None:
        """One CityJSON geometry object -> container + polygon spans;
        returns the top container gmlId."""
        if gtype not in _CONTAINER_FLAGS:
            return None
        is_solid, is_comp = _CONTAINER_FLAGS[gtype]
        top = self._container(is_solid, is_comp, None, None)
        if gtype in ("Solid", "CompositeSolid"):
            # boundaries: [shell][surface][ring][vertex]
            for shell in boundaries:
                shell_gid = self._container("0", "1", top, top)
                for surf in shell:
                    self._polygon(surf, shell_gid, top)
        else:
            # boundaries: [surface][ring][vertex]
            for surf in boundaries:
                self._polygon(surf, top, top)
        return top


def parse_cityjson(json_text: str) -> list[tuple[str, list[tuple[str, str, str, int]]]]:
    """One CityJSON document string -> [(doc_id, spans), ...] rows."""
    cj = json.loads(json_text)
    if cj.get("type") != "CityJSON":
        return []
    tr = cj.get("transform", {})
    scale = tr.get("scale", [1.0, 1.0, 1.0])
    trans = tr.get("translate", [0.0, 0.0, 0.0])
    verts = [
        [v[a] * scale[a] + trans[a] for a in range(3)] for v in cj.get("vertices", [])
    ]

    docs = []
    for gid, obj in cj.get("CityObjects", {}).items():
        if obj.get("type") not in ("Building", "BuildingPart"):
            continue
        doc = _Doc(doc_id=gid)
        attrs: dict = {"gmlId": gid, "rootId": gid}
        gen_attrs = []
        for k, v in (obj.get("attributes") or {}).items():
            if v is None:
                continue
            if k in _BLDG_ATTRS:
                val = _num(v)
                if k in ("creationDate", "terminationDate"):
                    # same OffsetDateTime rendering as the CityGML reader
                    # (DBCityObject.java:343-355)
                    val = _fmt_date(val)
                attrs[_BLDG_ATTRS[k]] = val
            else:
                # reference dataType dispatch for generic attributes
                code, vkey = (
                    (2, "intVal") if isinstance(v, bool) or isinstance(v, int)
                    else (3, "realVal") if isinstance(v, float)
                    else (1, "strVal")
                )
                gen_attrs.append((k, str(code), vkey, _num(v)))
        attrs["lastModificationDate"] = LAST_MOD

        walker = _CjGeom(_Doc(doc_id=gid), gid, verts)
        for g in obj.get("geometry") or []:
            top = walker.emit(g.get("type", ""), g.get("boundaries") or [])
            if top is None:
                continue
            lod = str(g.get("lod", "2")).split(".")[0]
            key = (
                f"lod{lod}SolidId"
                if g["type"] in ("Solid", "CompositeSolid")
                else f"lod{lod}MultiSurfaceId"
            )
            attrs.setdefault(key, top)
        if walker.all_coords:
            b = compute_bounds(walker.all_coords, 3)
            ring = [
                b[0], b[1], b[2], b[3], b[1], b[2], b[3], b[4], b[5],
                b[0], b[4], b[5], b[0], b[1], b[2],
            ]
            attrs["envelope"] = "#".join(fmt_double(v) for v in ring)
            attrs["envelopeDatatype"] = "POLYGON-3-15"

        doc.add("building", attrs)
        for aname, code, vkey, val in gen_attrs:
            doc.add(
                "generic_attribute",
                {
                    "gmlId": f"{gid}_ga_{aname}",
                    "rootGenattribId": f"{gid}_ga_{aname}",
                    "name": aname,
                    "dataType": code,
                    vkey: val,
                    "cityObjectId": gid,
                },
            )
        for kind, text, media_ref, _ in walker.doc.spans:
            doc.spans.append((kind, text, media_ref, len(doc.spans)))
        docs.append(doc)
    return [(d.doc_id, d.spans) for d in docs]
