"""CityGML -> interleaved-document reader (reference operators S2/S3 + P21).

Pure-Python, namespace-version-agnostic (CityGML 1.0 and 2.0) parser that
turns each <cityObjectMember> into ONE document row of the input_hint shape
(doc_id, spans ordered as the reference imports them: the feature first,
then generic attributes, then the geometry tree in document order —
DBBuilding.doImport child order, DBBuilding.java:177,421,431+).

The geometry tree walk mirrors DBSurfaceGeometry.doImport's recursive
decomposition (DBSurfaceGeometry.java:246-1460): container nodes (Solid,
CompositeSurface, MultiSurface, MultiPolygon, ...) become surfacegeometry
rows with isSolid/isComposite flags and parent/root threading; Polygon
leaves carry the '#'-coordinate literal (GeometryConverterAdapter.java:
256-288 encoding) with the datatype suffix in media_ref.

Synthetic-node id convention (FIXTURES.md): nodes without a gml:id are
minted `<ownerGmlId>_geom_<n>`; generic attributes `<ownerGmlId>_ga_<name>`.
Content-derived, never counters — the reference's per-connection sequence
restart (SequenceHelper.java:59-79) shows numeric ids were never
load-bearing; IRIs are.

Used two ways:
* driver-side in tests (small fixtures), and
* vectorized inside mapInPandas by sources.read_citygml (one XML string per
  row -> many doc rows) — the Spark-scale path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from .geometry import compute_bounds, encode_rings, fmt_double


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _fmt_date(text: str) -> str:
    """Java OffsetDateTime.toString of a date truncated to days at UTC
    (DBCityObject.java:343-355): '2014-07-08' -> '2014-07-08T00:00Z'."""
    t = text.strip()
    if "T" in t:
        return t
    return f"{t}T00:00Z"


@dataclass
class _Doc:
    doc_id: str
    spans: list = field(default_factory=list)

    def add(self, kind: str, attrs: dict, media_ref: str = "") -> None:
        text = ";".join(f"{k}={v}" for k, v in attrs.items() if v is not None)
        self.spans.append((kind, text, media_ref, len(self.spans)))


# gen:*Attribute localname -> (dataType code, value key)
# dispatch mirrors DBCityObjectGenericAttrib.java:239-433
_GEN_ATTR = {
    "stringAttribute": (1, "strVal"),
    "intAttribute": (2, "intVal"),
    "doubleAttribute": (3, "realVal"),
    "uriAttribute": (4, "uriVal"),
    "dateAttribute": (5, "dateVal"),
    "measureAttribute": (7, "realVal"),
}

# building scalar properties -> attr keys (DBBuilding.java bindings)
_BLDG_PROPS = {
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
}

_LOD_SOLID = {f"lod{i}Solid": f"lod{i}SolidId" for i in range(1, 5)}
_LOD_MSURF = {f"lod{i}MultiSurface": f"lod{i}MultiSurfaceId" for i in range(0, 5)}

# multi-valued properties (function, usage, name) are joined into one
# literal with the reference delimiter (CoreConstants.DEFAULT_DELIMITER,
# AttributeValueJoiner.join)
DELIM = "--/\\--"
_MULTI = {"function", "usage"}

LAST_MOD = "2026-01-01T00:00Z"  # deterministic lastModificationDate stand-in
# (reference writes wall-clock `now`, DBCityObject.java:412 — the P/R
# comparator matches this predicate on presence only, FIXTURES.md)


class CircularXlinkError(Exception):
    """L5: circular intra-document geometry reference — the reference
    aborts the feature import (DBCityObject.java:437-446,
    LocalGeometryXlinkResolver)."""


def _href(el: ET.Element) -> str | None:
    for k, v in el.attrib.items():
        if _local(k) == "href":
            return v.lstrip("#")
    return None


def _gml_id(el: ET.Element, default: str) -> str:
    for k, v in el.attrib.items():
        if _local(k) == "id":
            return v
    return default


def _first(el: ET.Element, localname: str) -> ET.Element | None:
    for c in el.iter():
        if _local(c.tag) == localname:
            return c
    return None


class _GeomWalker:
    """P21: recursive geometry-aggregate flatten with parent/root threading
    (DBSurfaceGeometry.java:293-322)."""

    CONTAINERS = {
        "Solid": dict(isSolid="1", isComposite="0"),
        "CompositeSolid": dict(isSolid="1", isComposite="1"),
        "CompositeSurface": dict(isSolid="0", isComposite="1"),
        "MultiSurface": dict(isSolid="0", isComposite="0"),
        "MultiPolygon": dict(isSolid="0", isComposite="0"),
        "MultiSolid": dict(isSolid="0", isComposite="0"),
        "Surface": dict(isSolid="0", isComposite="0"),
        "TriangulatedSurface": dict(isSolid="0", isComposite="0", isTriangulated="1"),
        "Tin": dict(isSolid="0", isComposite="0", isTriangulated="1"),
        "OrientableSurface": dict(isSolid="0", isComposite="0"),
        "MultiGeometry": dict(isSolid="0", isComposite="0"),
        "GeometricComplex": dict(isSolid="0", isComposite="0"),
    }

    def __init__(self, doc: _Doc, owner_gml_id: str, id_index: dict | None = None):
        self.doc = doc
        self.owner = owner_gml_id
        self.n = 0
        self.all_coords: list[list[float]] = []
        # L5 doc-local xlink state: geometry elements by gml:id + the ids
        # on the current walk path (cycle detection)
        self.id_index = id_index or {}
        self.path: list[str] = []

    def _mint(self, el: ET.Element) -> str:
        gid = _gml_id(el, "")
        if not gid:
            gid = f"{self.owner}_geom_{self.n}"
        self.n += 1
        return gid

    def walk(self, el: ET.Element, parent_id: str | None, root_id: str | None) -> str | None:
        name = _local(el.tag)
        if name == "Polygon" or name == "Triangle" or name == "Rectangle":
            return self._polygon(el, parent_id, root_id)
        if name in self.CONTAINERS:
            gid = self._mint(el)
            root = root_id or gid
            attrs = {
                "gmlId": gid,
                "parentId": parent_id,
                "rootId": root,
                "isSolid": self.CONTAINERS[name]["isSolid"],
                "isComposite": self.CONTAINERS[name]["isComposite"],
                "isTriangulated": self.CONTAINERS[name].get("isTriangulated", "0"),
                "isXlink": "0",
                "isReverse": "0",
                "cityObjectId": self.owner,
            }
            self.doc.add("surface_geometry", attrs)
            self.path.append(gid)
            for child in el:
                # property wrappers (exterior, surfaceMember, solidMember...)
                h = _href(child)
                if h is not None:
                    self._xlink(h, gid, root)
                    continue
                for g in child:
                    self.walk(g, gid, root)
            self.path.pop()
            return gid
        # property wrapper reached directly
        for child in el:
            return self.walk(child, parent_id, root_id)
        return None

    def _xlink(self, target_id: str, parent_id: str, root_id: str) -> None:
        """L5: resolve `xlink:href="#id"` inside the same document — emit a
        reference row (isXlink=1, shared gmlId = shared IRI identity; the
        geometry literal stays with the target's own row) after checking
        the target's subtree for cycles back into the current walk path."""
        self._check_cycle(target_id, set())
        self.doc.add(
            "surface_geometry",
            {
                "gmlId": target_id,
                "parentId": parent_id,
                "rootId": root_id,
                "isSolid": "0",
                "isComposite": "0",
                "isTriangulated": "0",
                "isXlink": "1",
                "isReverse": "0",
                "cityObjectId": self.owner,
            },
        )
        self.n += 1

    def _check_cycle(self, target_id: str, seen: set) -> None:
        if target_id in self.path:
            raise CircularXlinkError(target_id)
        if target_id in seen:
            return
        seen.add(target_id)
        target = self.id_index.get(target_id)
        if target is None:
            return
        for el in target.iter():
            h = _href(el)
            if h is not None:
                self._check_cycle(h, seen)

    def _rings(self, poly: ET.Element) -> list[list[float]]:
        rings = []
        for wrapper in poly:
            w = _local(wrapper.tag)
            if w not in ("exterior", "interior"):
                continue
            pos = _first(wrapper, "posList")
            if pos is None:
                # gml:pos sequence
                coords = []
                for p in wrapper.iter():
                    if _local(p.tag) == "pos" and p.text:
                        coords.extend(float(x) for x in p.text.split())
                if coords:
                    rings.append(coords)
                continue
            rings.append([float(x) for x in (pos.text or "").split()])
        return rings

    def _polygon(self, el: ET.Element, parent_id: str | None, root_id: str | None) -> str:
        gid = self._mint(el)
        root = root_id or gid
        rings = self._rings(el)
        self.all_coords.extend(rings)
        lexical, datatype = encode_rings("POLYGON", rings, 3)
        attrs = {
            "gmlId": gid,
            "parentId": parent_id,
            "rootId": root,
            "isSolid": "0",
            "isComposite": "0",
            "isTriangulated": "0",
            "isXlink": "0",
            "isReverse": "0",
            "cityObjectId": self.owner,
            "coords": lexical,
        }
        self.doc.add("surface_geometry", attrs, media_ref=datatype.rsplit("/", 1)[-1])
        return gid


def _envelope_attrs(feature: ET.Element) -> dict:
    env = _first(feature, "Envelope")
    if env is None:
        return {}
    lo = _first(env, "lowerCorner")
    hi = _first(env, "upperCorner")
    if lo is None or hi is None or not lo.text or not hi.text:
        return {}
    l = [float(x) for x in lo.text.split()]
    h = [float(x) for x in hi.text.split()]
    ring = [
        l[0], l[1], l[2],
        h[0], l[1], l[2],
        h[0], h[1], h[2],
        l[0], h[1], h[2],
        l[0], l[1], l[2],
    ]  # DBCityObject.java:324-331
    return {
        "envelope": "#".join(fmt_double(v) for v in ring),
        "envelopeDatatype": "POLYGON-3-15",
    }


def parse_building(member: ET.Element, feature: ET.Element) -> _Doc:
    gid = _gml_id(feature, "unknown")
    doc = _Doc(doc_id=gid)

    attrs: dict = {"gmlId": gid, "rootId": gid}
    name_el = None
    gen_attrs = []
    geoms: list[tuple[str, ET.Element]] = []

    for child in feature:
        ln = _local(child.tag)
        if ln == "name":
            name_el = child
        elif ln == "creationDate" and child.text:
            attrs["creationDate"] = _fmt_date(child.text)
        elif ln == "terminationDate" and child.text:
            attrs["terminationDate"] = _fmt_date(child.text)
        elif ln in _GEN_ATTR:
            gen_attrs.append(child)
        elif ln in _BLDG_PROPS and child.text is not None:
            key = _BLDG_PROPS[ln]
            val = child.text.strip()
            if ln in _MULTI and key in attrs:
                attrs[key] = attrs[key] + DELIM + val
            else:
                attrs[key] = val
            uom = child.attrib.get("uom")
            if ln == "measuredHeight" and uom:
                attrs["measuredHeightUnit"] = uom
        elif ln in _LOD_SOLID or ln in _LOD_MSURF:
            geoms.append((ln, child))

    if name_el is not None and name_el.text:
        attrs["name"] = name_el.text.strip()
    attrs.update(_envelope_attrs(feature))
    attrs["lastModificationDate"] = LAST_MOD

    # geometry ids must be known before the building span is emitted
    # (the building row references lodXSolidId); walk into a scratch doc
    # first, then stitch spans in reference order: building, genattribs,
    # geometry rows (DBBuilding.java child-import order)
    geo_doc = _Doc(doc_id=gid)
    id_index = {
        _gml_id(el, ""): el
        for el in feature.iter()
        if _local(el.tag) in _GeomWalker.CONTAINERS
        or _local(el.tag) in ("Polygon", "Triangle", "Rectangle")
    }
    id_index.pop("", None)
    walker = _GeomWalker(geo_doc, gid, id_index)
    for ln, prop in geoms:
        for g in prop:
            top = walker.walk(g, None, None)
            if top:
                key = _LOD_SOLID.get(ln) or _LOD_MSURF.get(ln)
                attrs[key] = top
    if walker.all_coords and "envelope" not in attrs:
        b = compute_bounds(walker.all_coords, 3)
        ring = [
            b[0], b[1], b[2], b[3], b[1], b[2], b[3], b[4], b[5],
            b[0], b[4], b[5], b[0], b[1], b[2],
        ]
        attrs["envelope"] = "#".join(fmt_double(v) for v in ring)
        attrs["envelopeDatatype"] = "POLYGON-3-15"

    doc.add("building", attrs)

    for ga in gen_attrs:
        code, vkey = _GEN_ATTR[_local(ga.tag)]
        aname = ga.attrib.get("name", "")
        val_el = _first(ga, "value")
        val = (val_el.text or "").strip() if val_el is not None else ""
        ga_attrs = {
            "gmlId": f"{gid}_ga_{aname}",
            "rootGenattribId": f"{gid}_ga_{aname}",
            "name": aname,
            "dataType": str(code),
            vkey: val,
            "cityObjectId": gid,
        }
        uom = ga.attrib.get("uom")
        if uom:
            ga_attrs["unit"] = uom
        doc.add("generic_attribute", ga_attrs)

    # re-emit geometry spans with corrected offsets
    for kind, text, media_ref, _ in geo_doc.spans:
        doc.spans.append((kind, text, media_ref, len(doc.spans)))
    return doc


# ---------------------------------------------------------------------------
# P25+ feature parsing — spec-driven branches for the entity types whose
# importers are SQL-only in the reference (DBBridge/DBTunnel/... — see
# vocab.py P25+ block). Each spec: CityGML element localname -> span kind,
# scalar property -> attr-key map, geometry property -> ref-attr map, uom
# side-channel keys, and an objectClassId override for subtype elements
# (Road/Railway/Track/Square, Util.getObjectClassId analog).
# ---------------------------------------------------------------------------

_CFU = {"class": "class", "function": "function", "usage": "usage"}


def _lods(*specs: str) -> dict:
    """('MultiSurface:1-4', 'Solid:1-4', ...) -> {lodNProp: lodNAttrKey}."""
    out = {}
    for spec in specs:
        name, rng = spec.split(":")
        lo, hi = (int(x) for x in rng.split("-"))
        key = {"MultiSurface": "MultiSurfaceId", "Solid": "SolidId",
               "MultiSolid": "MultiSolidId", "Geometry": "BrepId"}[name]
        for i in range(lo, hi + 1):
            out[f"lod{i}{name}"] = f"lod{i}{key}"
    return out


_FEATURE_SPECS = {
    "Bridge": dict(
        kind="bridge",
        props={**_CFU, "yearOfConstruction": "yearOfConstruction",
               "yearOfDemolition": "yearOfDemolition", "isMovable": "isMovable"},
        lods=_lods("MultiSurface:1-4", "Solid:1-4"),
    ),
    "Tunnel": dict(
        kind="tunnel",
        props={**_CFU, "yearOfConstruction": "yearOfConstruction",
               "yearOfDemolition": "yearOfDemolition"},
        lods=_lods("MultiSurface:1-4", "Solid:1-4"),
    ),
    "TransportationComplex": dict(
        kind="transportation_complex", props=_CFU, lods=_lods("MultiSurface:1-4"),
    ),
    # subtype elements override the objectClassId (3dcitydb-schema.xml)
    "Railway": dict(kind="transportation_complex", props=_CFU,
                    lods=_lods("MultiSurface:1-4"), class_id=43),
    "Track": dict(kind="transportation_complex", props=_CFU,
                  lods=_lods("MultiSurface:1-4"), class_id=44),
    "Road": dict(kind="transportation_complex", props=_CFU,
                 lods=_lods("MultiSurface:1-4"), class_id=45),
    "Square": dict(kind="transportation_complex", props=_CFU,
                   lods=_lods("MultiSurface:1-4"), class_id=46),
    "ReliefFeature": dict(kind="relief_feature", props={"lod": "lod"}, lods={}),
    "LandUse": dict(kind="land_use", props=_CFU, lods=_lods("MultiSurface:0-4")),
    "PlantCover": dict(
        kind="plant_cover",
        props={**_CFU, "averageHeight": "averageHeight"},
        uoms={"averageHeight": "averageHeightUnit"},
        lods=_lods("MultiSurface:1-4", "MultiSolid:1-4"),
    ),
    "SolitaryVegetationObject": dict(
        kind="solitary_vegetation",
        props={**_CFU, "species": "species", "height": "height",
               "trunkDiameter": "trunkDiameter", "crownDiameter": "crownDiameter"},
        uoms={"height": "heightUnit", "trunkDiameter": "trunkDiameterUnit",
              "crownDiameter": "crownDiameterUnit"},
        # CityGML veg:lodXGeometry lands in the brep columns
        # (DBSolitaryVegetatObject importSurfaceGeometryProperties "_brep_id")
        lods=_lods("Geometry:1-4"),
    ),
    "WaterBody": dict(
        kind="water_body", props=_CFU,
        lods=_lods("MultiSurface:0-1", "Solid:1-4"),
        # wtr:boundedBy holds Water*Surface sub-features; each emits its own
        # doc spans plus a waterbod_to_waterbnd_srf link row
        # (DBWaterBody.java boundary-surface import + DBWaterBodToWaterBndSrf)
        subs={"boundedBy": dict(link=("waterbod_to_waterbnd_srf",
                                      "waterBoundarySurfaceId", "waterBodyId"))},
    ),
    "CityObjectGroup": dict(
        kind="city_object_group", props=_CFU,
        # grp:geometry -> brep_id (DBCityObjectGroup.java geometry property)
        lods={"geometry": "brepId"},
    ),
    # nested sub-feature types
    "TrafficArea": dict(
        kind="traffic_area",
        props={**_CFU, "surfaceMaterial": "surfaceMaterial"},
        lods=_lods("MultiSurface:2-4"),
    ),
    "AuxiliaryTrafficArea": dict(
        kind="traffic_area",
        props={**_CFU, "surfaceMaterial": "surfaceMaterial"},
        lods=_lods("MultiSurface:2-4"), class_id=48,
    ),
    "WaterSurface": dict(
        kind="water_boundary_surface", props={"waterLevel": "waterLevel"},
        lods={f"lod{i}Surface": f"lod{i}SurfaceId" for i in (2, 3, 4)},
    ),
    "WaterGroundSurface": dict(
        kind="water_boundary_surface", props={"waterLevel": "waterLevel"},
        lods={f"lod{i}Surface": f"lod{i}SurfaceId" for i in (2, 3, 4)}, class_id=12,
    ),
    "WaterClosureSurface": dict(
        kind="water_boundary_surface", props={"waterLevel": "waterLevel"},
        lods={f"lod{i}Surface": f"lod{i}SurfaceId" for i in (2, 3, 4)}, class_id=13,
    ),
    "TINRelief": dict(
        kind="tin_relief",
        props={"lod": "lod", "maxLength": "maxLength", "extent": "extent"},
        uoms={"maxLength": "maxLengthUnit"},
        # dem:tin wraps the gml:TriangulatedSurface/Tin container
        lods={"tin": "surfaceGeometryId"},
    ),
}

# bridge / tunnel interior families (element localnames are bridge/tunnel
# namespace-unique: BridgeConstructionElement, HollowSpace, etc.)
_FEATURE_SPECS.update({
    "BridgeConstructionElement": dict(
        kind="bridge_constr_element", props=_CFU,
        lods=_lods("Geometry:1-4"),
    ),
    "BridgeInstallation": dict(
        kind="bridge_installation", props=_CFU, lods=_lods("Geometry:2-4"),
    ),
    "IntBridgeInstallation": dict(
        kind="bridge_installation", props=_CFU, lods=_lods("Geometry:4-4"),
        class_id=66,
    ),
    "BridgeRoom": dict(
        kind="bridge_room", props=_CFU,
        lods=_lods("MultiSurface:4-4", "Solid:4-4"),
        subs={"interiorFurniture": dict(fk="bridgeRoomId")},
    ),
    "BridgeFurniture": dict(
        kind="bridge_furniture", props=_CFU, lods=_lods("Geometry:4-4"),
    ),
    "TunnelInstallation": dict(
        kind="tunnel_installation", props=_CFU, lods=_lods("Geometry:2-4"),
    ),
    "IntTunnelInstallation": dict(
        kind="tunnel_installation", props=_CFU, lods=_lods("Geometry:4-4"),
        class_id=87,
    ),
    "HollowSpace": dict(
        kind="tunnel_hollow_space", props=_CFU,
        lods=_lods("MultiSurface:4-4", "Solid:4-4"),
        subs={"interiorFurniture": dict(fk="tunnelHollowSpaceId")},
    ),
    "TunnelFurniture": dict(
        kind="tunnel_furniture", props=_CFU, lods=_lods("Geometry:4-4"),
    ),
})

# parent specs that import nested sub-features: property localname ->
# link spec (kind, sub-id key, parent-id key). TransportationComplex and
# ReliefFeature bind the parent via an FK attr / link table respectively;
# Bridge/Tunnel bind their interiors via FK columns.
for _n in ("TransportationComplex", "Railway", "Track", "Road", "Square"):
    _FEATURE_SPECS[_n]["subs"] = {
        "trafficArea": dict(fk="transportationComplexId"),
        "auxiliaryTrafficArea": dict(fk="transportationComplexId"),
    }
_FEATURE_SPECS["ReliefFeature"]["subs"] = {
    "reliefComponent": dict(link=("relief_feat_to_rel_comp",
                                  "reliefComponentId", "reliefFeatureId")),
}
_FEATURE_SPECS["Bridge"]["subs"] = {
    "outerBridgeConstructionElement": dict(fk="bridgeId"),
    "outerBridgeConstruction": dict(fk="bridgeId"),
    "outerBridgeInstallation": dict(fk="bridgeId"),
    "interiorBridgeInstallation": dict(fk="bridgeId"),
    "interiorBridgeRoom": dict(fk="bridgeId"),
}
_FEATURE_SPECS["Tunnel"]["subs"] = {
    "outerTunnelInstallation": dict(fk="tunnelId"),
    "interiorTunnelInstallation": dict(fk="tunnelId"),
    "interiorHollowSpace": dict(fk="tunnelId"),
}


def parse_feature(
    member: ET.Element,
    feature: ET.Element,
    spec: dict,
    extra_attrs: dict | None = None,
) -> _Doc:
    """P25+ generic feature parse: scalar props + generic attributes +
    geometry tree, emitted in the importer's order (cityobject analog span
    first, then genattribs, then geometry rows) — same stitching as
    parse_building. Nested sub-features declared in spec['subs'] (traffic
    areas inside a transportation complex, Water*Surfaces inside a water
    body, relief components inside a relief feature) are parsed
    recursively AFTER the parent, their spans appended to the parent's doc
    with either an FK attr injected (traffic_area.transportationComplexId)
    or a link-table span emitted — exactly the child-import order of
    DBTransportationComplex / DBWaterBody / DBReliefFeature."""
    gid = _gml_id(feature, "unknown")
    doc = _Doc(doc_id=gid)
    props, lods = spec["props"], spec["lods"]
    uoms = spec.get("uoms", {})
    subs = spec.get("subs", {})

    attrs: dict = {"gmlId": gid}
    if spec["kind"] in ("bridge", "tunnel"):
        attrs["rootId"] = gid
    if "class_id" in spec:
        attrs["objectClassId"] = str(spec["class_id"])
    if extra_attrs:
        attrs.update(extra_attrs)
    name_el = None
    gen_attrs = []
    geoms: list[tuple[str, ET.Element]] = []
    members: list[tuple[str, str]] = []  # (href gmlId, role)
    sub_els: list[tuple[dict, ET.Element]] = []  # (sub spec entry, feature el)

    for child in feature:
        ln = _local(child.tag)
        if ln in subs and any(_local(g.tag) in _FEATURE_SPECS for g in child):
            # sub-feature property wrapper (checked before everything else:
            # wtr:boundedBy shares its localname with gml:boundedBy, but
            # only the former contains a feature element)
            for g in child:
                if _local(g.tag) in _FEATURE_SPECS:
                    sub_els.append((subs[ln], g))
            continue
        if ln == "name":
            name_el = child
        elif ln == "creationDate" and child.text:
            attrs["creationDate"] = _fmt_date(child.text)
        elif ln == "terminationDate" and child.text:
            attrs["terminationDate"] = _fmt_date(child.text)
        elif ln in _GEN_ATTR:
            gen_attrs.append(child)
        elif ln == "groupMember":
            h = _href(child)
            if h is not None:
                members.append((h, child.attrib.get("role")))
        elif ln in props and child.text is not None:
            key = props[ln]
            val = child.text.strip()
            if ln in _MULTI and key in attrs:
                attrs[key] = attrs[key] + DELIM + val
            else:
                attrs[key] = val
            uom = child.attrib.get("uom")
            if uom and ln in uoms:
                attrs[uoms[ln]] = uom
        elif ln in lods:
            geoms.append((ln, child))

    if name_el is not None and name_el.text:
        attrs["name"] = name_el.text.strip()
    attrs.update(_envelope_attrs(feature))
    attrs["lastModificationDate"] = LAST_MOD

    geo_doc = _Doc(doc_id=gid)
    id_index = {
        _gml_id(el, ""): el
        for el in feature.iter()
        if _local(el.tag) in _GeomWalker.CONTAINERS
        or _local(el.tag) in ("Polygon", "Triangle", "Rectangle")
    }
    id_index.pop("", None)
    walker = _GeomWalker(geo_doc, gid, id_index)
    for ln, prop in geoms:
        for g in prop:
            top = walker.walk(g, None, None)
            if top:
                attrs[lods[ln]] = top
    if walker.all_coords and "envelope" not in attrs:
        b = compute_bounds(walker.all_coords, 3)
        ring = [
            b[0], b[1], b[2], b[3], b[1], b[2], b[3], b[4], b[5],
            b[0], b[4], b[5], b[0], b[1], b[2],
        ]
        attrs["envelope"] = "#".join(fmt_double(v) for v in ring)
        attrs["envelopeDatatype"] = "POLYGON-3-15"

    doc.add(spec["kind"], attrs)

    for ga in gen_attrs:
        code, vkey = _GEN_ATTR[_local(ga.tag)]
        aname = ga.attrib.get("name", "")
        val_el = _first(ga, "value")
        val = (val_el.text or "").strip() if val_el is not None else ""
        ga_attrs = {
            "gmlId": f"{gid}_ga_{aname}",
            "rootGenattribId": f"{gid}_ga_{aname}",
            "name": aname,
            "dataType": str(code),
            vkey: val,
            "cityObjectId": gid,
        }
        uom = ga.attrib.get("uom")
        if uom:
            ga_attrs["unit"] = uom
        doc.add("generic_attribute", ga_attrs)

    # grp:groupMember xlinks -> group_to_cityobject link rows
    # (DBCityObjectGroup.java:192-208 via XlinkGroupToCityObject)
    for href, role in members:
        doc.add(
            "group_to_cityobject",
            {"gmlId": f"{gid}_m_{href}", "cityObjectId": href,
             "cityObjectGroupId": gid, "role": role},
        )

    for kind, text, media_ref, _ in geo_doc.spans:
        doc.spans.append((kind, text, media_ref, len(doc.spans)))

    # nested sub-features: parsed after the parent, spans appended in
    # document order; FK attr or link-table span binds them to the parent
    for entry, sub_el in sub_els:
        sub_spec = _FEATURE_SPECS[_local(sub_el.tag)]
        fk = entry.get("fk")
        sub_doc = parse_feature(
            member, sub_el, sub_spec, extra_attrs={fk: gid} if fk else None
        )
        sub_gid = sub_doc.doc_id
        for kind, text, media_ref, _ in sub_doc.spans:
            doc.spans.append((kind, text, media_ref, len(doc.spans)))
        link = entry.get("link")
        if link:
            link_kind, sub_key, parent_key = link
            doc.add(
                link_kind,
                {"gmlId": f"{gid}_l_{sub_gid}", sub_key: sub_gid, parent_key: gid},
            )
    return doc


def parse_citygml(xml_text: str) -> list[tuple[str, list[tuple[str, str, str, int]]]]:
    """One CityGML document string -> [(doc_id, spans), ...] rows."""
    root = ET.fromstring(xml_text)
    docs = []
    for member in root:
        if _local(member.tag) != "cityObjectMember":
            continue
        for feature in member:
            ln = _local(feature.tag)
            try:
                if ln == "Building":
                    docs.append(parse_building(member, feature))
                elif ln in _FEATURE_SPECS:
                    docs.append(parse_feature(member, feature, _FEATURE_SPECS[ln]))
            except CircularXlinkError:
                # reference behavior: abort THIS feature, keep the rest
                # (DBCityObject.java:437-446)
                continue
    return [(d.doc_id, d.spans) for d in docs]
