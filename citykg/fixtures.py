"""Deterministic interleaved-document synthesis + matching DuckDB oracles.

The driver's testdata has a flat `documents` table (doc_id bigint, text,
lang, source, n_chars). This module derives the BASELINE.json `input_hint`
shape — (doc_id string, spans array<struct<kind,text,media_ref,offset>>) —
from it with PURE integer/string arithmetic on the bigint doc_id, expressed
in a SQL dialect subset shared by Spark SQL and DuckDB. The same expression
table renders both:

* the Spark-side span synthesis (`synth_docs`), and
* the DuckDB oracle SQL for extracted triples (`triples_oracle_sql`),

so the driver's row-hash comparison checks the REAL pipeline (posexplode ->
str_to_map -> template join) against an independent SQL derivation.

Every doc gets 6 spans at fixed offsets (kinds below); values vary by
doc_id modulus. 50% of docs mention the mega-entity "City 0" — the skew
case the north_rule requires salting for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .vocab import CLASS_ID, BASE_URL_LITERALS, DEFAULT_BASE, KIND_EMISSIONS

# bump when the synthesis changes — invalidates bench-staged corpora
# (r4: 3 = P25+ spans 20-30; 4 = nested sub-feature spans 31-35;
#  5 = bridge/tunnel interior family spans 36-51)
SYNTH_VERSION = 5

# span layout: (span_idx, kind, media_ref) — ALL spans unconditional so
# span_idx constants stay stable for the md5 link-graph subjects; value
# variation comes from doc_id arithmetic. Covers every KIND_EMISSIONS
# template (SURVEY §2.2 P1-P20).
SPAN_LAYOUT = [
    (0, "building", ""),
    (1, "address", ""),
    (2, "surface_geometry", "POLYGON-3-15"),
    (3, "generic_attribute", ""),
    (4, "external_reference", ""),
    (5, "media", ""),
    (6, "thematic_surface", ""),
    (7, "room", ""),
    (8, "building_installation", ""),
    (9, "opening", ""),
    (10, "opening_to_them_surface", ""),
    (11, "city_furniture", ""),
    (12, "generic_city_object", ""),
    (13, "building_part", ""),
    (14, "appearance", ""),
    (15, "surface_data", ""),
    (16, "appear_to_surface_data", ""),
    (17, "texture_param", ""),
    (18, "building_furniture", ""),
    (19, "generic_attribute_set", ""),
    # P25+ SQL-only types (vocab.py template block): appended so existing
    # span_idx constants — baked into the md5 link-graph subjects — stay put
    (20, "bridge", ""),
    (21, "tunnel", ""),
    (22, "transportation_complex", ""),
    (23, "relief_feature", ""),
    (24, "land_use", ""),
    (25, "plant_cover", ""),
    (26, "solitary_vegetation", ""),
    (27, "water_body", ""),
    (28, "city_object_group", ""),
    (29, "group_to_cityobject", ""),
    (30, "implicit_geometry", ""),
    # nested sub-feature importers (traffic areas, water boundary
    # surfaces, relief components + their link tables)
    (31, "traffic_area", ""),
    (32, "water_boundary_surface", ""),
    (33, "waterbod_to_waterbnd_srf", ""),
    (34, "tin_relief", ""),
    (35, "relief_feat_to_rel_comp", ""),
    # bridge / tunnel interior families
    (36, "bridge_part", ""),
    (37, "bridge_thematic_surface", ""),
    (38, "bridge_installation", ""),
    (39, "bridge_room", ""),
    (40, "bridge_furniture", ""),
    (41, "bridge_opening", ""),
    (42, "bridge_open_to_them_srf", ""),
    (43, "bridge_constr_element", ""),
    (44, "address_to_bridge", ""),
    (45, "tunnel_part", ""),
    (46, "tunnel_thematic_surface", ""),
    (47, "tunnel_installation", ""),
    (48, "tunnel_hollow_space", ""),
    (49, "tunnel_furniture", ""),
    (50, "tunnel_opening", ""),
    (51, "tunnel_open_to_them_srf", ""),
]

LAST_MOD = "2026-01-01T00:00Z"  # deterministic stand-in for the reference's
# `now` lastModificationDate (DBCityObject.java:412) — determinism is what
# makes resume idempotent


def _s(x: str, dialect: str) -> str:
    """Dialect-portable int->string cast."""
    t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"CAST({x} AS {t})"


def _lp(x: str, n: int, dialect: str) -> str:
    return f"lpad({_s(x, dialect)}, {n}, '0')"


def doc_key_expr(dialect: str) -> str:
    return f"'doc_' || {_lp('d', 8, dialect)}"


def _envelope_lit(dialect: str) -> str:
    """5-pt closed ring literal from integer corner arithmetic
    (ring order per DBCityObject.java:324-331)."""
    x0, y0, z0 = "(384000 + d % 1000)", "(5820000 + d % 2000)", "(30 + d % 10)"
    x1, y1, z1 = f"({x0} + 9)", f"({y0} + 8)", f"({z0} + 4)"
    pts = [
        (x0, y0, z0),
        (x1, y0, z0),
        (x1, y1, z1),
        (x0, y1, z1),
        (x0, y0, z0),
    ]
    parts = []
    for p in pts:
        parts.extend(_s(c, dialect) for c in p)
    return " || '#' || ".join(parts)


def attr_exprs(dialect: str) -> dict[str, dict[str, str]]:
    """Per-kind attribute SQL expressions over alias d (bigint doc_id) and
    src (documents.source). Key order here IS the key=value; order in the
    span text."""
    lp8 = _lp("d", 8, dialect)
    bldg = f"'BLDG_' || {lp8}"
    dt = "(CASE WHEN d % 6 = 5 THEN 7 ELSE 1 + d % 6 END)"
    return {
        "building": {
            "gmlId": bldg,
            "name": f"'Building ' || {_s('d % 100', dialect)}",
            "description": "src",
            "class": _s("d % 10", dialect),
            "function": _s("1000 + d % 7", dialect),
            "usage": _s("2000 + d % 5", dialect),
            "yearOfConstruction": _s("1900 + d % 120", dialect),
            "roofType": _s("1 + d % 5", dialect),
            "measuredHeight": f"{_s('3 + d % 50', dialect)} || '.' || {_s('d % 10', dialect)}",
            "storeysAboveGround": _s("1 + d % 40", dialect),
            "storeysBelowGround": _s("d % 3", dialect),
            "creationDate": "'2014-07-08T00:00Z'",
            "lastModificationDate": f"'{LAST_MOD}'",
            "updatingPerson": "'citykg'",
            "lineage": f"'doc:' || {lp8}",
            "envelope": _envelope_lit(dialect),
        },
        "address": {
            "gmlId": f"'ADDR_' || {lp8}",
            "street": f"'Street ' || {_s('d % 97', dialect)}",
            "houseNumber": _s("1 + d % 150", dialect),
            "zipCode": _s("10000 + d % 90000", dialect),
            "city": f"'City ' || {_s('CASE WHEN d % 2 = 0 THEN 0 ELSE d % 50 END', dialect)}",
            "country": f"'Country ' || {_s('d % 10', dialect)}",
            "addressId": f"'ADDR_' || {lp8}",
            "buildingId": bldg,
        },
        "surface_geometry": {
            "gmlId": f"'SURF_' || {lp8}",
            "rootId": f"'SURF_' || {lp8}",
            "isSolid": "'0'",
            "isComposite": "'0'",
            "isTriangulated": "'0'",
            "isXlink": "'0'",
            "isReverse": "'0'",
            "cityObjectId": bldg,
            "coords": _envelope_lit(dialect),
        },
        "generic_attribute": {
            "gmlId": f"'GA_' || {lp8}",
            "rootGenattribId": f"'GA_' || {lp8}",
            "name": f"'attr_' || {_s('d % 20', dialect)}",
            "dataType": _s(dt, dialect),
            # exactly one typed value is set per dataType
            # (DBCityObjectGenericAttrib.java:239-433 dispatch)
            "strVal": f"CASE WHEN {dt} = 1 THEN 'val_' || {_s('d', dialect)} END",
            "intVal": f"CASE WHEN {dt} = 2 THEN {_s('d % 1000', dialect)} END",
            "realVal": (
                f"CASE WHEN {dt} = 3 THEN {_s('d % 100', dialect)} || '.5' "
                f"WHEN {dt} = 7 THEN {_s('d % 50', dialect)} || '.25' END"
            ),
            "uriVal": f"CASE WHEN {dt} = 4 THEN 'http://example.org/r/' || {_s('d', dialect)} END",
            "dateVal": f"CASE WHEN {dt} = 5 THEN '19' || {_lp('d % 100', 2, dialect)} || '-01-15' END",
            "unit": f"CASE WHEN {dt} = 7 THEN 'm' END",
            "cityObjectId": bldg,
        },
        "external_reference": {
            "gmlId": f"'ER_' || {lp8}",
            "infoSys": f"'sys_' || {_s('d % 5', dialect)}",
            "name": f"'ext_' || {_s('d', dialect)}",
            "uri": f"'http://example.org/ext/' || {_s('d', dialect)}",
            "cityObjectId": bldg,
        },
        "media": {
            "gmlId": f"'IMG_' || {lp8}",
            "imageURI": f"'img_' || {_s('d', dialect)} || '.png'",
            "mimeType": "'image/png'",
        },
        "thematic_surface": {
            "gmlId": f"'TS_' || {lp8}",
            # wall/roof/ground class ids 34/33/35 — attrs override the
            # template constant (objectClassId coalesce in extract.py)
            "objectClassId": _s("CASE d % 3 WHEN 0 THEN 33 WHEN 1 THEN 34 ELSE 35 END", dialect),
            "buildingId": bldg,
            # lod2 geometry only for 75% of features (Q8 LoD-filter fodder)
            "lod2MultiSurfaceId": f"CASE WHEN d % 4 <> 0 THEN 'SURF_' || {lp8} END",
        },
        "room": {
            "gmlId": f"'ROOM_' || {lp8}",
            "class": _s("d % 6", dialect),
            "usage": _s("3000 + d % 4", dialect),
            "buildingId": bldg,
            "lod4MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "building_installation": {
            "gmlId": f"'BI_' || {lp8}",
            "class": _s("d % 4", dialect),
            "function": _s("4000 + d % 3", dialect),
            "buildingId": bldg,
            "roomId": f"'ROOM_' || {lp8}",
            "lod2BrepId": f"'SURF_' || {lp8}",
        },
        "opening": {
            "gmlId": f"'OP_' || {lp8}",
            "objectClassId": _s("CASE WHEN d % 2 = 0 THEN 38 ELSE 39 END", dialect),
            "addressId": f"'ADDR_' || {lp8}",
            "lod3MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "opening_to_them_surface": {
            "gmlId": f"'OTS_' || {lp8}",
            "openingId": f"'OP_' || {lp8}",
            "themSurfaceId": f"'TS_' || {lp8}",
        },
        "city_furniture": {
            "gmlId": f"'CF_' || {lp8}",
            "class": _s("d % 8", dialect),
            "function": _s("5000 + d % 6", dialect),
            "lod1BrepId": f"'SURF_' || {lp8}",
        },
        "generic_city_object": {
            "gmlId": f"'GCO_' || {lp8}",
            "class": _s("d % 12", dialect),
            "usage": _s("6000 + d % 2", dialect),
            "lod0BrepId": f"'SURF_' || {lp8}",
        },
        "building_part": {
            "gmlId": f"'BP_' || {lp8}",
            "parentId": bldg,
            "rootId": bldg,
            "class": _s("d % 5", dialect),
            "storeysAboveGround": _s("1 + d % 6", dialect),
        },
        "appearance": {
            "gmlId": f"'AP_' || {lp8}",
            "theme": f"'theme_' || {_s('d % 3', dialect)}",
            "cityObjectId": bldg,
        },
        "surface_data": {
            "gmlId": f"'SD_' || {lp8}",
            "isFront": _s("d % 2", dialect),
            "x3dShininess": f"'0.' || {_s('2 + d % 7', dialect)}",
            "x3dTransparency": f"'0.' || {_s('d % 10', dialect)}",
            "x3dDiffuseColor": f"'0.5 0.5 0.' || {_s('d % 10', dialect)}",
        },
        "appear_to_surface_data": {
            "gmlId": f"'ASD_' || {lp8}",
            "surfaceDataId": f"'SD_' || {lp8}",
            "appearanceId": f"'AP_' || {lp8}",
        },
        "texture_param": {
            "gmlId": f"'TP_' || {lp8}",
            "surfaceGeometryId": f"'SURF_' || {lp8}",
            "isTextureParametrization": "'1'",
            "worldToTexture": f"'1 0 0 0 0 1 0 0 0 0 1 ' || {_s('d % 9', dialect)}",
            "textureCoordinates": f"'0 0 1 0 1 1 0 1 0 ' || {_s('d % 2', dialect)}",
            "surfaceDataId": f"'SD_' || {lp8}",
        },
        "building_furniture": {
            "gmlId": f"'BF_' || {lp8}",
            "class": _s("d % 7", dialect),
            "roomId": f"'ROOM_' || {lp8}",
            "lod4BrepId": f"'SURF_' || {lp8}",
        },
        "generic_attribute_set": {
            "gmlId": f"'GAS_' || {lp8}",
            "rootGenattribId": f"'GAS_' || {lp8}",
            "name": f"'attrset_' || {_s('d % 5', dialect)}",
            "dataType": "'107'",  # attr-set marker (reference template 1)
            "genattribsetCodespace": f"'cs_' || {_s('d % 3', dialect)}",
            "cityObjectId": bldg,
        },
        # P25+ SQL-only types — value shapes mirror what each DB* importer
        # would bind from a real feature (class/function code lists, year,
        # measured dimensions); every doc carries one of each
        "bridge": {
            "gmlId": f"'BRDG_' || {lp8}",
            "parentId": f"'BRDG_' || {lp8}",
            "rootId": f"'BRDG_' || {lp8}",
            "class": _s("d % 4", dialect),
            "function": _s("7000 + d % 5", dialect),
            "yearOfConstruction": _s("1850 + d % 170", dialect),
            "isMovable": _s("d % 2", dialect),
            "lod1MultiSurfaceId": f"'SURF_' || {lp8}",
            "lod2SolidId": f"CASE WHEN d % 3 = 0 THEN 'SURF_' || {lp8} END",
        },
        "tunnel": {
            "gmlId": f"'TUN_' || {lp8}",
            "parentId": f"'TUN_' || {lp8}",
            "rootId": f"'TUN_' || {lp8}",
            "class": _s("d % 3", dialect),
            "usage": _s("7100 + d % 4", dialect),
            "yearOfConstruction": _s("1900 + d % 125", dialect),
            "lod2MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "transportation_complex": {
            "gmlId": f"'TC_' || {lp8}",
            # road 45 / railway 43 / track 44 / square 46 — attr overrides
            # the template constant (same mechanism as thematic_surface)
            "objectClassId": _s("43 + d % 4", dialect),
            "class": _s("d % 5", dialect),
            "function": _s("7200 + d % 6", dialect),
            "lod2MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "relief_feature": {
            "gmlId": f"'RF_' || {lp8}",
            "lod": _s("d % 5", dialect),
        },
        "land_use": {
            "gmlId": f"'LU_' || {lp8}",
            "class": _s("d % 9", dialect),
            "usage": _s("7300 + d % 3", dialect),
            "lod0MultiSurfaceId": f"'SURF_' || {lp8}",
            "lod2MultiSurfaceId": f"CASE WHEN d % 2 = 0 THEN 'SURF_' || {lp8} END",
        },
        "plant_cover": {
            "gmlId": f"'PC_' || {lp8}",
            "class": _s("d % 6", dialect),
            "averageHeight": f"{_s('1 + d % 30', dialect)} || '.' || {_s('d % 10', dialect)}",
            "averageHeightUnit": "'m'",
            "lod1MultiSurfaceId": f"'SURF_' || {lp8}",
            "lod1MultiSolidId": f"CASE WHEN d % 4 = 0 THEN 'SURF_' || {lp8} END",
        },
        "solitary_vegetation": {
            "gmlId": f"'VEG_' || {lp8}",
            "class": _s("d % 7", dialect),
            "species": f"'species_' || {_s('d % 40', dialect)}",
            "height": f"{_s('2 + d % 35', dialect)} || '.' || {_s('d % 10', dialect)}",
            "heightUnit": "'m'",
            "trunkDiameter": f"'0.' || {_s('1 + d % 9', dialect)}",
            "trunkDiameterUnit": "'m'",
            "crownDiameter": f"{_s('1 + d % 12', dialect)} || '.0'",
            "crownDiameterUnit": "'m'",
            "lod1BrepId": f"'SURF_' || {lp8}",
        },
        "water_body": {
            "gmlId": f"'WB_' || {lp8}",
            "class": _s("d % 4", dialect),
            "function": _s("7400 + d % 5", dialect),
            "lod0MultiSurfaceId": f"'SURF_' || {lp8}",
            "lod1SolidId": f"CASE WHEN d % 5 <> 0 THEN 'SURF_' || {lp8} END",
        },
        "city_object_group": {
            "gmlId": f"'GRP_' || {lp8}",
            "class": _s("d % 3", dialect),
            "function": _s("7500 + d % 2", dialect),
            "brepId": f"CASE WHEN d % 6 = 0 THEN 'SURF_' || {lp8} END",
        },
        "group_to_cityobject": {
            "gmlId": f"'GTC_' || {lp8}",
            "cityObjectId": f"'BLDG_' || {lp8}",
            "cityObjectGroupId": f"'GRP_' || {lp8}",
            "role": f"'role_' || {_s('d % 4', dialect)}",
        },
        "implicit_geometry": {
            "gmlId": f"'IG_' || {lp8}",
            "referenceToLibrary": f"'lib/tree_' || {_s('d % 25', dialect)} || '.gml'",
            "mimeType": "'model/gml+xml'",
            "relativeBrepId": f"'SURF_' || {lp8}",
        },
        "traffic_area": {
            "gmlId": f"'TA_' || {lp8}",
            # 47 TrafficArea / 48 AuxiliaryTrafficArea
            "objectClassId": _s("47 + d % 2", dialect),
            "function": _s("7600 + d % 4", dialect),
            "surfaceMaterial": f"'material_' || {_s('d % 6', dialect)}",
            "lod2MultiSurfaceId": f"'SURF_' || {lp8}",
            "transportationComplexId": f"'TC_' || {lp8}",
        },
        "water_boundary_surface": {
            "gmlId": f"'WBS_' || {lp8}",
            # 11 WaterSurface / 12 WaterGroundSurface / 13 WaterClosureSurface
            "objectClassId": _s("11 + d % 3", dialect),
            "waterLevel": f"CASE WHEN d % 3 = 0 THEN 'level_' || {_s('d % 5', dialect)} END",
            "lod2SurfaceId": f"'SURF_' || {lp8}",
        },
        "waterbod_to_waterbnd_srf": {
            "gmlId": f"'WBL_' || {lp8}",
            "waterBoundarySurfaceId": f"'WBS_' || {lp8}",
            "waterBodyId": f"'WB_' || {lp8}",
        },
        "tin_relief": {
            "gmlId": f"'TIN_' || {lp8}",
            "lod": _s("1 + d % 3", dialect),
            "extent": f"CASE WHEN d % 2 = 0 THEN 'POLYGON_' || {_s('d % 10', dialect)} END",
            "maxLength": f"{_s('10 + d % 40', dialect)} || '.0'",
            "maxLengthUnit": "'m'",
            "surfaceGeometryId": f"'SURF_' || {lp8}",
        },
        "relief_feat_to_rel_comp": {
            "gmlId": f"'RFL_' || {lp8}",
            "reliefComponentId": f"'TIN_' || {lp8}",
            "reliefFeatureId": f"'RF_' || {lp8}",
        },
        # bridge / tunnel interior families
        "bridge_part": {
            "gmlId": f"'BRP_' || {lp8}",
            "parentId": f"'BRDG_' || {lp8}",
            "rootId": f"'BRDG_' || {lp8}",
            "class": _s("d % 3", dialect),
            "yearOfConstruction": _s("1880 + d % 140", dialect),
        },
        "bridge_thematic_surface": {
            "gmlId": f"'BTS_' || {lp8}",
            # roof 71 / wall 72 / ground 73
            "objectClassId": _s("71 + d % 3", dialect),
            "bridgeId": f"'BRDG_' || {lp8}",
            "lod2MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "bridge_installation": {
            "gmlId": f"'BIN_' || {lp8}",
            # 65 outer / 66 interior
            "objectClassId": _s("65 + d % 2", dialect),
            "class": _s("d % 4", dialect),
            "bridgeId": f"'BRDG_' || {lp8}",
            "lod2BrepId": f"'SURF_' || {lp8}",
        },
        "bridge_room": {
            "gmlId": f"'BRM_' || {lp8}",
            "usage": _s("7700 + d % 3", dialect),
            "bridgeId": f"'BRDG_' || {lp8}",
            "lod4MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "bridge_furniture": {
            "gmlId": f"'BFU_' || {lp8}",
            "class": _s("d % 5", dialect),
            "bridgeRoomId": f"'BRM_' || {lp8}",
            "lod4BrepId": f"'SURF_' || {lp8}",
        },
        "bridge_opening": {
            "gmlId": f"'BOP_' || {lp8}",
            # window 78 / door 79
            "objectClassId": _s("78 + d % 2", dialect),
            "addressId": f"CASE WHEN d % 2 = 1 THEN 'ADDR_' || {lp8} END",
            "lod3MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "bridge_open_to_them_srf": {
            "gmlId": f"'BOL_' || {lp8}",
            "bridgeOpeningId": f"'BOP_' || {lp8}",
            "bridgeThematicSurfaceId": f"'BTS_' || {lp8}",
        },
        "bridge_constr_element": {
            "gmlId": f"'BCE_' || {lp8}",
            "class": _s("d % 6", dialect),
            "function": _s("7800 + d % 4", dialect),
            "bridgeId": f"'BRDG_' || {lp8}",
            "lod1BrepId": f"'SURF_' || {lp8}",
        },
        "address_to_bridge": {
            "gmlId": f"'ABL_' || {lp8}",
            "bridgeId": f"'BRDG_' || {lp8}",
            "addressId": f"'ADDR_' || {lp8}",
        },
        "tunnel_part": {
            "gmlId": f"'TUP_' || {lp8}",
            "parentId": f"'TUN_' || {lp8}",
            "rootId": f"'TUN_' || {lp8}",
            "class": _s("d % 2", dialect),
        },
        "tunnel_thematic_surface": {
            "gmlId": f"'TTS_' || {lp8}",
            # roof 92 / wall 93 / ground 94
            "objectClassId": _s("92 + d % 3", dialect),
            "tunnelId": f"'TUN_' || {lp8}",
            "lod2MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "tunnel_installation": {
            "gmlId": f"'TIN2_' || {lp8}",
            # 86 outer / 87 interior
            "objectClassId": _s("86 + d % 2", dialect),
            "function": _s("7900 + d % 3", dialect),
            "tunnelId": f"'TUN_' || {lp8}",
            "lod3BrepId": f"'SURF_' || {lp8}",
        },
        "tunnel_hollow_space": {
            "gmlId": f"'THS_' || {lp8}",
            "class": _s("d % 3", dialect),
            "tunnelId": f"'TUN_' || {lp8}",
            "lod4SolidId": f"'SURF_' || {lp8}",
        },
        "tunnel_furniture": {
            "gmlId": f"'TFU_' || {lp8}",
            "usage": _s("8000 + d % 2", dialect),
            "tunnelHollowSpaceId": f"'THS_' || {lp8}",
            "lod4BrepId": f"'SURF_' || {lp8}",
        },
        "tunnel_opening": {
            "gmlId": f"'TOP_' || {lp8}",
            # window 99 / door 100
            "objectClassId": _s("99 + d % 2", dialect),
            "lod3MultiSurfaceId": f"'SURF_' || {lp8}",
        },
        "tunnel_open_to_them_srf": {
            "gmlId": f"'TOL_' || {lp8}",
            "tunnelOpeningId": f"'TOP_' || {lp8}",
            "tunnelThematicSurfaceId": f"'TTS_' || {lp8}",
        },
    }


def span_text_expr(kind: str, dialect: str) -> str:
    """'k=v;...' payload. CASE-valued attrs concat conditionally (a NULL
    segment must not null the whole string)."""
    ax = attr_exprs(dialect)[kind]
    parts = []
    for k, expr in ax.items():
        if expr.startswith("CASE"):
            parts.append(f"COALESCE(';{k}=' || ({expr}), '')")
        else:
            parts.append(f"';{k}=' || ({expr})")
    joined = " || ".join(parts)
    # strip the leading ';'
    return f"substring({joined}, 2)"


def synth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> input_hint-shaped docs DataFrame (pure SQL)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    structs = []
    for idx, kind, media_ref in SPAN_LAYOUT:
        # geometry spans carry the '#' literal in their coords= attribute
        # and the datatype suffix in media_ref (FIXTURES.md §1)
        text = span_text_expr(kind, "spark")
        structs.append(
            f"named_struct('kind', '{kind}', 'text', {text}, "
            f"'media_ref', '{media_ref}', 'offset', {idx})"
        )
    spans = "array(" + ", ".join(structs) + ")"
    return docs.selectExpr("doc_id AS d", "source AS src").selectExpr(
        f"{doc_key_expr('spark')} AS doc_id", f"{spans} AS spans"
    )


def synth_gazetteer(spark: SparkSession, n_entities: int = 1000) -> DataFrame:
    """Broadcast-side gazetteer (FIXTURES.md §4): 50 city entities the
    address spans actually mention (entity 0 is the mega-entity, ~50% of
    docs) + districts to pad the alias space.

    Built with spark.range — a driver-side python row list would serialize
    gazetteer construction into every job that links (measurable as a flat
    ~2-4 s serial tax in the scaling benchmark)."""
    return spark.range(n_entities).selectExpr(
        "printf('ENT_%04d', id) AS entity_id",
        "CASE WHEN id < 50 THEN 'City ' || id ELSE 'District ' || id END AS canonical_name",
        "CASE WHEN id < 50 THEN 'city' ELSE 'district' END AS kind",
        "CASE WHEN id < 50 THEN array('City ' || id, 'city ' || id, 'C' || id, 'city-' || id) "
        "ELSE array('District ' || id, 'district ' || id, 'D' || id) END AS aliases",
        "45.0D + (id % 90) * 0.5D AS lat",
        "(id % 360) * 0.5D - 180.0D AS lon",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generation — independent SQL derivation of the same triples
# ---------------------------------------------------------------------------

# which template binding resolves to which oracle SQL expression
def _oracle_obj(kind: str, graph: str, binding, base: str, ax: dict[str, str], dialect: str):
    """Returns (obj_expr, obj_is_null_literal) or None if never emitted."""
    lp8 = _lp("d", 8, dialect)
    subj = f"'{base}/{graph}/' || ({ax['gmlId']}) || '/'"
    if binding is None:
        return None
    if binding == "@iri":
        return subj
    if binding == "@class":
        # mirror extract.py: coalesce(attrs['objectClassId'], kind constant)
        cid = CLASS_ID.get(kind)
        if "objectClassId" in ax:
            return f"({ax['objectClassId']})"
        return f"'{cid}'" if cid is not None else None
    if binding == "@gmlid":
        return ax["gmlId"]
    if binding == "@geom":
        return f"({ax['coords']})" if "coords" in ax else None
    if binding == "@solid_geom":
        return None  # synth geometry spans are never solids
    if binding == "@envelope":
        return f"({ax['envelope']})" if "envelope" in ax else None
    if binding.startswith("@ref/"):
        _, refgraph, key = binding.split("/")
        if key not in ax:
            return None
        return f"'{base}/{refgraph}/' || ({ax[key]}) || '/'"
    return f"({ax[binding]})" if binding in ax else None


def triples_oracle_sql(
    graphs: list[str] | None = None,
    kinds: list[str] | None = None,
    base: str = DEFAULT_BASE,
    dialect: str = "duckdb",
) -> str:
    """DuckDB SQL equivalent of extract_triples(synth_docs(...)) restricted
    to `graphs`/`kinds`. Output columns match TRIPLE_SCHEMA."""
    ax_all = attr_exprs(dialect)
    span_idx = {kind: idx for idx, kind, _ in SPAN_LAYOUT}
    selects = []
    for kind in (kinds or [k for _, k, _ in SPAN_LAYOUT]):
        ax = ax_all[kind]
        pos = 0
        for graph, template in KIND_EMISSIONS[kind]:
            for pred, binding, obj_type in template:
                p = pos
                pos += 1
                if graphs and graph not in graphs:
                    continue
                from .extract import LINK_GRAPHS

                if graph in LINK_GRAPHS:
                    subj = (
                        f"'{base}/{graph}/' || md5(({doc_key_expr(dialect)}) || "
                        f"'#{span_idx[kind]}#{graph}') || '/'"
                    )
                else:
                    subj = f"'{base}/{graph}/' || ({ax['gmlId']}) || '/'"
                obj = _oracle_obj(kind, graph, binding, base, ax, dialect)
                if obj is None:
                    continue
                if binding in ("@geom", "@solid_geom"):
                    dt = f"'{BASE_URL_LITERALS}POLYGON-3-15'"
                elif binding == "@envelope":
                    dt = f"'{BASE_URL_LITERALS}POLYGON-3-15'"
                else:
                    dt = "CAST(NULL AS VARCHAR)"
                sel = (
                    f"SELECT {subj} AS subj, 'ocgml:{pred}' AS pred, {obj} AS obj, "
                    f"'{obj_type}' AS obj_type, {dt} AS datatype, '{graph}' AS graph, "
                    f"({doc_key_expr(dialect)}) AS doc_id, {span_idx[kind]} AS span_idx, "
                    f"{p} AS pos FROM base WHERE ({obj}) IS NOT NULL"
                )
                selects.append(sel)
    body = "\nUNION ALL\n".join(selects)
    return f"WITH base AS (SELECT doc_id AS d, source AS src FROM documents)\n{body}"
