"""Golden predicate-order locks, mirrored from the reference's template
unit tests (impexp-core/src/test/.../content/DB*Test.java). If an edit to
vocab.py reorders a template, these fail."""

from citykg import vocab

# predicate orders transcribed from the reference golden tests' expected
# SPARQL strings (the behavior contract — see each DB*Test.java)
GOLDEN_ORDERS = {
    "cityobject": [
        "id", "objectClassId", "gmlId", "name", "nameCodespace", "description",
        "EnvelopeType", "creationDate", "terminationDate", "relativeToTerrain",
        "relativeToWater", "lastModificationDate", "updatingPerson",
        "reasonForUpdate", "lineage",
    ],
    "building": [
        "id", "buildingParentId", "buildingRootId", "class", "classCodespace",
        "function", "functionCodespace", "usage", "usageCodespace",
        "yearOfConstruction", "yearOfDemolition", "roofType", "roofTypeCodespace",
        "measuredHeigh", "measuredHeightUnit", "storeysAboveGround",
        "storeysBelowGround", "storeyHeightsAboveGround", "storeyHeightsAgUnit",
        "storeyHeightsBelowGround", "storeyHeightsBgUnit",
        "lod1TerrainIntersection", "lod2TerrainIntersection",
        "lod3TerrainIntersection", "lod4TerrainIntersection",
        "lod2MultiCurve", "lod3MultiCurve", "lod4MultiCurve",
        "lod0FootprintId", "lod0RoofprintId",
        "lod1MultiSurfaceId", "lod2MultiSurfaceId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId", "lod1SolidId", "lod2SolidId", "lod3SolidId",
        "lod4SolidId", "objectClassId",
    ],
    "surfacegeometry": [
        "id", "gmlId", "parentId", "rootId", "isSolid", "isComposite",
        "isTriangulated", "isXlink", "isReverse", "GeometryType", "SolidType",
        "ImplicitGeometryType", "cityObjectId",
    ],
    "thematicsurface": [
        "id", "objectClassId", "buildingId", "roomId", "buildingInstallationId",
        "lod2MultiSurfaceId", "lod3MultiSurfaceId", "lod4MultiSurfaceId",
    ],
    "address": [
        "id", "gmlId", "street", "houseNumber", "poBox", "zipCode", "city",
        "country", "multiPoint", "xalSource",
    ],
    "addresstobuilding": ["buildingId", "addressId"],
    "openingtothemsurface": ["openingID", "themSurfaceID"],
    "room": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "buildingId", "lod4MultiSurfaceId",
        "lod4SolidId", "objectClassId",
    ],
    "opening": [
        "id", "objectClassId", "addressId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId", "lod3ImplicitRepId", "lod4ImplicitRepId",
        "lod3ImplicitRefPoint", "lod4ImplicitRefPoint",
        "lod3ImplicitTransformation", "lod4ImplicitTransformation",
    ],
    "externalreference": ["id", "infoSys", "name", "URI", "cityObjectId"],
    "teximage": ["id", "texImageURI", "texMimeType", "texMimeTypeCodespace"],
    "appearance": [
        "id", "gmlId", "name", "nameCodespace", "description", "theme",
        "cityModelId", "cityObjectId",
    ],
    "appeartosurfacedata": ["surfaceDataId", "appearanceId"],
    "textureparam": [
        "surfaceGeometryId", "isTextureParametrization", "worldToTexture",
        "textureCoordinates", "surfaceDataId",
    ],
    # P25+ SQL-only types: no blazegraph golden tests exist (the reference
    # stubs their SPARQL path) — the contract is each importer's SQL insert
    # column order, transcribed here from getSQLStatement()
    "bridge": [
        "id", "bridgeParentId", "bridgeRootId", "class", "classCodespace",
        "function", "functionCodespace", "usage", "usageCodespace",
        "yearOfConstruction", "yearOfDemolition", "isMovable",
        "lod1TerrainIntersection", "lod2TerrainIntersection",
        "lod3TerrainIntersection", "lod4TerrainIntersection",
        "lod2MultiCurve", "lod3MultiCurve", "lod4MultiCurve",
        "lod1MultiSurfaceId", "lod2MultiSurfaceId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId", "lod1SolidId", "lod2SolidId", "lod3SolidId",
        "lod4SolidId", "objectClassId",
    ],
    "tunnel": [
        "id", "tunnelParentId", "tunnelRootId", "class", "classCodespace",
        "function", "functionCodespace", "usage", "usageCodespace",
        "yearOfConstruction", "yearOfDemolition",
        "lod1TerrainIntersection", "lod2TerrainIntersection",
        "lod3TerrainIntersection", "lod4TerrainIntersection",
        "lod2MultiCurve", "lod3MultiCurve", "lod4MultiCurve",
        "lod1MultiSurfaceId", "lod2MultiSurfaceId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId", "lod1SolidId", "lod2SolidId", "lod3SolidId",
        "lod4SolidId", "objectClassId",
    ],
    "transportationcomplex": [
        "id", "objectClassId", "class", "classCodespace", "function",
        "functionCodespace", "usage", "usageCodespace", "lod0Network",
        "lod1MultiSurfaceId", "lod2MultiSurfaceId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId",
    ],
    "relieffeature": ["id", "lod", "objectClassId"],
    "landuse": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "lod0MultiSurfaceId", "lod1MultiSurfaceId",
        "lod2MultiSurfaceId", "lod3MultiSurfaceId", "lod4MultiSurfaceId",
        "objectClassId",
    ],
    "plantcover": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "averageHeight", "averageHeightUnit",
        "lod1MultiSurfaceId", "lod2MultiSurfaceId", "lod3MultiSurfaceId",
        "lod4MultiSurfaceId", "lod1MultiSolidId", "lod2MultiSolidId",
        "lod3MultiSolidId", "lod4MultiSolidId", "objectClassId",
    ],
    "solitaryvegetatobject": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "species", "speciesCodespace", "height",
        "heightUnit", "trunkDiameter", "trunkDiameterUnit", "crownDiameter",
        "crownDiameterUnit", "lod1BrepId", "lod2BrepId", "lod3BrepId",
        "lod4BrepId", "lod1OtherGeom", "lod2OtherGeom", "lod3OtherGeom",
        "lod4OtherGeom", "lod1ImplicitRepId", "lod2ImplicitRepId",
        "lod3ImplicitRepId", "lod4ImplicitRepId", "lod1ImplicitRefPoint",
        "lod2ImplicitRefPoint", "lod3ImplicitRefPoint", "lod4ImplicitRefPoint",
        "lod1ImplicitTransformation", "lod2ImplicitTransformation",
        "lod3ImplicitTransformation", "lod4ImplicitTransformation",
        "objectClassId",
    ],
    "waterbody": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "lod0MultiCurve", "lod1MultiCurve",
        "lod0MultiSurfaceId", "lod1MultiSurfaceId", "lod1SolidId",
        "lod2SolidId", "lod3SolidId", "lod4SolidId", "objectClassId",
    ],
    "cityobjectgroup": [
        "id", "class", "classCodespace", "function", "functionCodespace",
        "usage", "usageCodespace", "brepId", "otherGeom", "objectClassId",
    ],
    "grouptocityobject": ["cityObjectId", "cityObjectGroupId", "role"],
    "implicitgeometry": [
        "id", "referenceToLibrary", "mimeType", "relativeBrepId",
        "relativeOtherGeom",
    ],
}

TEMPLATE_BY_GRAPH = {
    "cityobject": vocab.T_CITYOBJECT,
    "building": vocab.T_BUILDING,
    "surfacegeometry": vocab.T_SURFACE_GEOMETRY,
    "thematicsurface": vocab.T_THEMATIC_SURFACE,
    "address": vocab.T_ADDRESS,
    "addresstobuilding": vocab.T_ADDRESS_TO_BUILDING,
    "openingtothemsurface": vocab.T_OPENING_TO_THEM_SURFACE,
    "room": vocab.T_ROOM,
    "opening": vocab.T_OPENING,
    "externalreference": vocab.T_EXTERNAL_REFERENCE,
    "teximage": vocab.T_TEX_IMAGE,
    "appearance": vocab.T_APPEARANCE,
    "appeartosurfacedata": vocab.T_APPEAR_TO_SURFACE_DATA,
    "textureparam": vocab.T_TEXTURE_PARAM,
    "bridge": vocab.T_BRIDGE,
    "tunnel": vocab.T_TUNNEL,
    "transportationcomplex": vocab.T_TRANSPORTATION_COMPLEX,
    "relieffeature": vocab.T_RELIEF_FEATURE,
    "landuse": vocab.T_LAND_USE,
    "plantcover": vocab.T_PLANT_COVER,
    "solitaryvegetatobject": vocab.T_SOLITARY_VEGETAT_OBJECT,
    "waterbody": vocab.T_WATER_BODY,
    "cityobjectgroup": vocab.T_CITY_OBJECT_GROUP,
    "grouptocityobject": vocab.T_GROUP_TO_CITYOBJECT,
    "implicitgeometry": vocab.T_IMPLICIT_GEOMETRY,
}


def test_golden_predicate_orders():
    for graph, want in GOLDEN_ORDERS.items():
        got = [p for p, _, _ in TEMPLATE_BY_GRAPH[graph]]
        assert got == want, f"{graph} predicate order drifted"


def test_building_measured_heigh_typo_is_preserved():
    # the reference's 'measuredHeigh' (sic) is asserted verbatim by
    # DBBuildingTest — parity requires keeping the typo
    preds = [p for p, _, _ in vocab.T_BUILDING]
    assert "measuredHeigh" in preds and "measuredHeight" not in preds


def test_template_rows_positions_monotonic_per_kind():
    seen = {}
    for kind, graph, pos, pred, binding, obj_type in vocab.template_rows():
        assert graph in vocab.GRAPHS
        last = seen.get(kind, -1)
        assert pos == last + 1, f"{kind} positions must be dense/ordered"
        seen[kind] = pos


def test_cityobject_emitted_first_for_features():
    # reference imports the cityobject row before the feature row
    # (DBBuilding.java:177 before :421)
    for kind, emissions in vocab.KIND_EMISSIONS.items():
        graphs = [g for g, _ in emissions]
        if "cityobject" in graphs:
            assert graphs[0] == "cityobject", kind
