"""OntoCityGML predicate vocabulary + per-entity ordered triple templates.

This is the data-driven replacement for the reference's DB* importer
classes — the 20 SPARQL-enabled ones AND (round 4) the 10 SQL-only entity
types plus their nested sub-feature importers (SURVEY.md §2.2). Each entity kind maps to one or more named graphs,
and each graph carries a FIXED, ORDERED predicate sequence. The orders below
are mirrored 1:1 from the reference's golden SPARQL-template unit tests
(e.g. DBBuildingTest.java:11-24, DBCityObjectTest.java, DBSurfaceGeometryTest
.java — /root/reference/impexp-core/src/test/java/org/citydb/citygml/importer/
database/content/) and locked by tests/test_vocab.py.

Field-binding mini-language (resolved JVM-side in extract.py — each binding
becomes a Catalyst CASE/element_at expression, never per-row Python):

* ``@iri``          subject IRI itself (ocgml:id always repeats the subject,
                    DBCityObject.java:248-251 setURL twice)
* ``@class``        the kind's objectClassId constant
* ``@gmlid``        the mention's gmlId
* ``@geom``         span text is the '#'-literal; datatype from media_ref
* ``@envelope``     attrs['envelope'] 5-pt-ring literal, POLYGON-3-15
* ``@ref/<graph>/<key>``  attrs[key] is a gmlId -> expand to IRI in <graph>
* ``<key>``         plain literal from attrs[key]
* ``None``          never populated in our feature model (kept to preserve
                    template positions; emits nothing — the reference emits
                    a blank node, which the P/R comparison excludes,
                    CityGMLImportManager setBlankNode / FIXTURES.md §2)
"""

from __future__ import annotations

# Ontology prefix: the agents' schema IRI (CityImportAgent.java:101); the
# impexp golden tests use the same IRI without '#' — we follow the agents
# (FIXTURES.md §3).
PREFIX_ONTOCITYGML = (
    "http://www.theworldavatar.com/ontology/ontocitygml/citieskg/OntoCityGML.owl#"
)
OCGML = PREFIX_ONTOCITYGML  # CURIE expansion base for ocgml:

# default IRI base (reference golden tests use
# http://127.0.0.1:9999/blazegraph/namespace/berlin/sparql — ours is
# configurable; canonicalization re-homes it, NquadsExporterTask.java:167-196)
DEFAULT_BASE = "http://127.0.0.1:9999/blazegraph/namespace/berlin/sparql"

# geometry literal datatype base (GeometryConverterAdapter.java:26)
BASE_URL_LITERALS = "http://localhost/blazegraph/literals/"

# named graphs (SchemaManagerAdapter.java:168-181 + other importers/agents)
GRAPHS = [
    "cityobject",
    "cityobjectgenericattrib",
    "externalreference",
    "building",
    "address",
    "addresstobuilding",
    "surfacegeometry",
    "thematicsurface",
    "buildinginstallation",
    "room",
    "opening",
    "openingtothemsurface",
    "cityfurniture",
    "buildingfurniture",
    "genericcityobject",
    "appearance",
    "appeartosurfacedata",
    "surfacedata",
    "teximage",
    "textureparam",
    "databasesrs",
    "distance",
    "ontoinfer",
    # P25+ SQL-only types (getIriGraphObjectRel of each importer)
    "bridge",
    "tunnel",
    "transportationcomplex",
    "relieffeature",
    "landuse",
    "plantcover",
    "solitaryvegetatobject",
    "waterbody",
    "cityobjectgroup",
    "grouptocityobject",
    "implicitgeometry",
    "trafficarea",
    "waterboundarysurface",
    "waterbodtowaterbndsrf",
    "reliefcomponent",
    "tinrelief",
    "relieffeattorelcomp",
    "bridgethematicsurface",
    "bridgeinstallation",
    "bridgeroom",
    "bridgefurniture",
    "bridgeopening",
    "bridgeopentothemsrf",
    "bridgeconstrelement",
    "addresstobridge",
    "tunnelthematicsurface",
    "tunnelinstallation",
    "tunnelhollowspace",
    "tunnelfurniture",
    "tunnelopening",
    "tunnelopentothemsrf",
]

# objectClassId constants (3DCityDB object class registry; whitelist used by
# StatementTransformer.java:201-219)
CLASS_ID = {
    "building": 26,
    "building_part": 25,
    "room": 41,
    "building_installation": 27,
    "thematic_surface": 35,  # wall/roof/ground 34/33/35; attr overrides
    "opening": 38,  # window 38 / door 39; attr overrides
    "city_furniture": 21,
    "generic_city_object": 5,
    "building_furniture": 40,
    "surface_data": 53,
    # P25+ (3dcitydb-schema.xml featureType objectClassId entries)
    "bridge": 64,
    "tunnel": 85,
    "transportation_complex": 42,
    "relief_feature": 14,
    "land_use": 4,
    "plant_cover": 8,
    "solitary_vegetation": 7,
    "water_body": 9,
    "city_object_group": 23,
    # sub-feature importers (3dcitydb-schema.xml)
    "traffic_area": 47,            # 48 AuxiliaryTrafficArea via attr override
    "water_boundary_surface": 11,  # 12/13 ground/closure via attr override
    "tin_relief": 16,              # 17/18 masspoint/breakline via attr override
    # bridge / tunnel interior families (3dcitydb-schema.xml)
    "bridge_part": 63,
    "tunnel_part": 84,
    "bridge_thematic_surface": 72,  # 71 roof / 73 ground via attr override
    "bridge_installation": 65,      # 66 interior via attr override
    "bridge_room": 81,
    "bridge_furniture": 80,
    "bridge_opening": 78,           # 79 door via attr override
    "bridge_constr_element": 82,
    "tunnel_thematic_surface": 93,  # 92 roof / 94 ground via attr override
    "tunnel_installation": 86,      # 87 interior via attr override
    "tunnel_hollow_space": 102,
    "tunnel_furniture": 101,
    "tunnel_opening": 99,           # 100 door via attr override
}

# ---------------------------------------------------------------------------
# ordered predicate templates, one list per graph: (pred, binding, obj_type)
# obj_type: 'iri' | 'literal'  (obj_type of emitted object when non-null)
# ---------------------------------------------------------------------------

# P1 DBCityObject.java:160-185 (golden: DBCityObjectTest.java)
T_CITYOBJECT = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("gmlId", "@gmlid", "literal"),
    ("name", "name", "literal"),
    ("nameCodespace", "nameCodespace", "literal"),
    ("description", "description", "literal"),
    ("EnvelopeType", "@envelope", "literal"),
    ("creationDate", "creationDate", "literal"),
    ("terminationDate", "terminationDate", "literal"),
    ("relativeToTerrain", "relativeToTerrain", "literal"),
    ("relativeToWater", "relativeToWater", "literal"),
    ("lastModificationDate", "lastModificationDate", "literal"),
    ("updatingPerson", "updatingPerson", "literal"),
    ("reasonForUpdate", "reasonForUpdate", "literal"),
    ("lineage", "lineage", "literal"),
]

# P2 DBBuilding.java:116-160 (golden: DBBuildingTest.java:11-24; note the
# reference's 'measuredHeigh' typo is load-bearing)
T_BUILDING = [
    ("id", "@iri", "iri"),
    ("buildingParentId", "@ref/building/parentId", "iri"),
    ("buildingRootId", "@ref/building/rootId", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("yearOfConstruction", "yearOfConstruction", "literal"),
    ("yearOfDemolition", "yearOfDemolition", "literal"),
    ("roofType", "roofType", "literal"),
    ("roofTypeCodespace", "roofTypeCodespace", "literal"),
    ("measuredHeigh", "measuredHeight", "literal"),
    ("measuredHeightUnit", "measuredHeightUnit", "literal"),
    ("storeysAboveGround", "storeysAboveGround", "literal"),
    ("storeysBelowGround", "storeysBelowGround", "literal"),
    ("storeyHeightsAboveGround", "storeyHeightsAboveGround", "literal"),
    ("storeyHeightsAgUnit", "storeyHeightsAgUnit", "literal"),
    ("storeyHeightsBelowGround", "storeyHeightsBelowGround", "literal"),
    ("storeyHeightsBgUnit", "storeyHeightsBgUnit", "literal"),
    ("lod1TerrainIntersection", None, "literal"),
    ("lod2TerrainIntersection", None, "literal"),
    ("lod3TerrainIntersection", None, "literal"),
    ("lod4TerrainIntersection", None, "literal"),
    ("lod2MultiCurve", None, "literal"),
    ("lod3MultiCurve", None, "literal"),
    ("lod4MultiCurve", None, "literal"),
    ("lod0FootprintId", "@ref/surfacegeometry/lod0FootprintId", "iri"),
    ("lod0RoofprintId", "@ref/surfacegeometry/lod0RoofprintId", "iri"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod1SolidId", "@ref/surfacegeometry/lod1SolidId", "iri"),
    ("lod2SolidId", "@ref/surfacegeometry/lod2SolidId", "iri"),
    ("lod3SolidId", "@ref/surfacegeometry/lod3SolidId", "iri"),
    ("lod4SolidId", "@ref/surfacegeometry/lod4SolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# P3 DBSurfaceGeometry.java:171-190 (golden: DBSurfaceGeometryTest.java)
T_SURFACE_GEOMETRY = [
    ("id", "@iri", "iri"),
    ("gmlId", "@gmlid", "literal"),
    ("parentId", "@ref/surfacegeometry/parentId", "iri"),
    ("rootId", "@ref/surfacegeometry/rootId", "iri"),
    ("isSolid", "isSolid", "literal"),
    ("isComposite", "isComposite", "literal"),
    ("isTriangulated", "isTriangulated", "literal"),
    ("isXlink", "isXlink", "literal"),
    ("isReverse", "isReverse", "literal"),
    ("GeometryType", "@geom", "literal"),
    ("SolidType", "@solid_geom", "literal"),
    ("ImplicitGeometryType", None, "literal"),
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
]

# P4 DBThematicSurface.java:76 (golden: DBThematicSurfaceTest.java)
T_THEMATIC_SURFACE = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("buildingId", "@ref/building/buildingId", "iri"),
    ("roomId", "@ref/room/roomId", "iri"),
    ("buildingInstallationId", "@ref/buildinginstallation/buildingInstallationId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
]

# P5 DBAddress.java:107 (golden: DBAddressTest.java)
T_ADDRESS = [
    ("id", "@iri", "iri"),
    ("gmlId", "@gmlid", "literal"),
    ("street", "street", "literal"),
    ("houseNumber", "houseNumber", "literal"),
    ("poBox", "poBox", "literal"),
    ("zipCode", "zipCode", "literal"),
    ("city", "city", "literal"),
    ("country", "country", "literal"),
    ("multiPoint", None, "literal"),
    ("xalSource", "xalSource", "literal"),
]

# P6 DBAddressToBuilding.java:64 (golden: DBAddressToBuildingTest.java;
# subject is a fresh uuid IRI, DBAddressToBuilding.java:84 — ours is a
# deterministic uuid5 of (doc_id, span_idx) for resumability)
T_ADDRESS_TO_BUILDING = [
    ("buildingId", "@ref/building/buildingId", "iri"),
    ("addressId", "@ref/address/addressId", "iri"),
]

# P7 DBBuildingInstallation.java:97 (golden: DBbuildingInstallationTest.java)
T_BUILDING_INSTALLATION = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("buildingId", "@ref/building/buildingId", "iri"),
    ("roomId", "@ref/room/roomId", "iri"),
    ("lod2BrepId", "@ref/surfacegeometry/lod2BrepId", "iri"),
    ("lod3BrepId", "@ref/surfacegeometry/lod3BrepId", "iri"),
    ("lod4BrepId", "@ref/surfacegeometry/lod4BrepId", "iri"),
    ("lod2OtherGeom", None, "literal"),
    ("lod3OtherGeom", None, "literal"),
    ("lod4OtherGeom", None, "literal"),
    ("lod2ImplicitRepId", None, "iri"),
    ("lod3ImplicitRepId", None, "iri"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod2ImplicitRefPoint", None, "literal"),
    ("lod3ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod2ImplicitTransformation", None, "literal"),
    ("lod3ImplicitTransformation", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
]

# P8 DBRoom.java:99 (golden: DBRoomTest.java)
T_ROOM = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("buildingId", "@ref/building/buildingId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod4SolidId", "@ref/surfacegeometry/lod4SolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# P9 DBBuildingFurniture.java:100 (golden: DBBuildingFurnitureTest.java)
T_BUILDING_FURNITURE = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("roomId", "@ref/room/roomId", "iri"),
    ("lod4BrepId", "@ref/surfacegeometry/lod4BrepId", "iri"),
    ("lod4OtherGeom", None, "literal"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
    ("objectClassId", "@class", "literal"),
]

# P10 DBOpening.java:99 (golden: DBOpeningTest.java)
T_OPENING = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("addressId", "@ref/address/addressId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod3ImplicitRepId", None, "iri"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod3ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod3ImplicitTransformation", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
]

# P11 DBOpeningToThemSurface.java:62 (golden: DBOpeningToThemSurfaceTest.java)
T_OPENING_TO_THEM_SURFACE = [
    ("openingID", "@ref/opening/openingId", "iri"),
    ("themSurfaceID", "@ref/thematicsurface/themSurfaceId", "iri"),
]

# P12 DBCityFurniture.java:105 (golden: DBCityFurnitureTest.java)
T_CITY_FURNITURE = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("lod1TerrainIntersection", None, "literal"),
    ("lod2TerrainIntersection", None, "literal"),
    ("lod3TerrainIntersection", None, "literal"),
    ("lod4TerrainIntersection", None, "literal"),
    ("lod1BrepId", "@ref/surfacegeometry/lod1BrepId", "iri"),
    ("lod2BrepId", "@ref/surfacegeometry/lod2BrepId", "iri"),
    ("lod3BrepId", "@ref/surfacegeometry/lod3BrepId", "iri"),
    ("lod4BrepId", "@ref/surfacegeometry/lod4BrepId", "iri"),
    ("lod1OtherGeom", None, "literal"),
    ("lod2OtherGeom", None, "literal"),
    ("lod3OtherGeom", None, "literal"),
    ("lod4OtherGeom", None, "literal"),
    ("lod1ImplicitRepId", None, "iri"),
    ("lod2ImplicitRepId", None, "iri"),
    ("lod3ImplicitRepId", None, "iri"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod1ImplicitRefPoint", None, "literal"),
    ("lod2ImplicitRefPoint", None, "literal"),
    ("lod3ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod1ImplicitTransformation", None, "literal"),
    ("lod2ImplicitTransformation", None, "literal"),
    ("lod3ImplicitTransformation", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
    ("objectClassId", "@class", "literal"),
]

# P13 DBGenericCityObject.java:103 (golden: DBGenericCityObjectTest.java)
T_GENERIC_CITY_OBJECT = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("lod0TerrainIntersection", None, "literal"),
    ("lod1TerrainIntersection", None, "literal"),
    ("lod2TerrainIntersection", None, "literal"),
    ("lod3TerrainIntersection", None, "literal"),
    ("lod4TerrainIntersection", None, "literal"),
    ("lod0BrepId", "@ref/surfacegeometry/lod0BrepId", "iri"),
    ("lod1BrepId", "@ref/surfacegeometry/lod1BrepId", "iri"),
    ("lod2BrepId", "@ref/surfacegeometry/lod2BrepId", "iri"),
    ("lod3BrepId", "@ref/surfacegeometry/lod3BrepId", "iri"),
    ("lod4BrepId", "@ref/surfacegeometry/lod4BrepId", "iri"),
    ("lod0OtherGeom", None, "literal"),
    ("lod1OtherGeom", None, "literal"),
    ("lod2OtherGeom", None, "literal"),
    ("lod3OtherGeom", None, "literal"),
    ("lod4OtherGeom", None, "literal"),
    ("lod0ImplicitRepId", None, "iri"),
    ("lod1ImplicitRepId", None, "iri"),
    ("lod2ImplicitRepId", None, "iri"),
    ("lod3ImplicitRepId", None, "iri"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod0ImplicitRefPoint", None, "literal"),
    ("lod1ImplicitRefPoint", None, "literal"),
    ("lod2ImplicitRefPoint", None, "literal"),
    ("lod3ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod0ImplicitTransformation", None, "literal"),
    ("lod1ImplicitTransformation", None, "literal"),
    ("lod2ImplicitTransformation", None, "literal"),
    ("lod3ImplicitTransformation", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
    ("objectClassId", "@class", "literal"),
]

# P14 DBCityObjectGenericAttrib.java:121-140 — attr-set + atomic templates
T_GENERIC_ATTRIB_SET = [
    ("id", "@iri", "iri"),
    ("parentGenattribId", "@ref/cityobjectgenericattrib/parentGenattribId", "iri"),
    ("rootGenattribId", "@ref/cityobjectgenericattrib/rootGenattribId", "iri"),
    ("attrName", "name", "literal"),
    ("dataType", "dataType", "literal"),
    ("genattribsetCodespace", "genattribsetCodespace", "literal"),
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
]
T_GENERIC_ATTRIB = [
    ("id", "@iri", "iri"),
    ("parentGenattribId", "@ref/cityobjectgenericattrib/parentGenattribId", "iri"),
    ("rootGenattribId", "@ref/cityobjectgenericattrib/rootGenattribId", "iri"),
    ("attrName", "name", "literal"),
    ("dataType", "dataType", "literal"),
    ("strVal", "strVal", "literal"),
    ("intVal", "intVal", "literal"),
    ("realVal", "realVal", "literal"),
    ("uriVal", "uriVal", "literal"),
    ("dateVal", "dateVal", "literal"),
    ("unit", "unit", "literal"),
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
]

# P15 DBExternalReference.java:72 (golden: DBExternalReferenceTest.java)
T_EXTERNAL_REFERENCE = [
    ("id", "@iri", "iri"),
    ("infoSys", "infoSys", "literal"),
    ("name", "name", "literal"),
    ("URI", "uri", "literal"),
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
]

# P16 DBAppearance.java:97 (golden: DBAppearanceTest.java)
T_APPEARANCE = [
    ("id", "@iri", "iri"),
    ("gmlId", "@gmlid", "literal"),
    ("name", "name", "literal"),
    ("nameCodespace", "nameCodespace", "literal"),
    ("description", "description", "literal"),
    ("theme", "theme", "literal"),
    ("cityModelId", None, "iri"),
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
]

# P17 DBAppearToSurfaceData.java:64 (golden: DBAppearToSurfaceDataTest.java)
T_APPEAR_TO_SURFACE_DATA = [
    ("surfaceDataId", "@ref/surfacedata/surfaceDataId", "iri"),
    ("appearanceId", "@ref/appearance/appearanceId", "iri"),
]

# P18 DBSurfaceData.java:180 (golden: DBSurfaceDataTest.java, x3d variant)
T_SURFACE_DATA = [
    ("id", "@iri", "iri"),
    ("gmlId", "@gmlid", "literal"),
    ("name", "name", "literal"),
    ("nameCodespace", "nameCodespace", "literal"),
    ("description", "description", "literal"),
    ("isFront", "isFront", "literal"),
    ("objectClassId", "@class", "literal"),
    ("x3dShininess", "x3dShininess", "literal"),
    ("x3dTransparency", "x3dTransparency", "literal"),
    ("x3dAmbientIntensity", "x3dAmbientIntensity", "literal"),
    ("x3dSpecularColor", "x3dSpecularColor", "literal"),
    ("x3dDiffuseColor", "x3dDiffuseColor", "literal"),
    ("x3dEmissiveColor", "x3dEmissiveColor", "literal"),
    ("x3dIsSmooth", "x3dIsSmooth", "literal"),
]

# P19 DBTexImage.java:91 (golden: DBTexImageTest.java)
T_TEX_IMAGE = [
    ("id", "@iri", "iri"),
    ("texImageURI", "imageURI", "literal"),
    ("texMimeType", "mimeType", "literal"),
    ("texMimeTypeCodespace", "mimeTypeCodespace", "literal"),
]

# P20 DBTextureParam.java:66 (golden: DBTextureParamTest.java)
T_TEXTURE_PARAM = [
    ("surfaceGeometryId", "@ref/surfacegeometry/surfaceGeometryId", "iri"),
    ("isTextureParametrization", "isTextureParametrization", "literal"),
    ("worldToTexture", "worldToTexture", "literal"),
    ("textureCoordinates", "textureCoordinates", "literal"),
    ("surfaceDataId", "@ref/surfacedata/surfaceDataId", "iri"),
]

# ---------------------------------------------------------------------------
# P25+ — the reference's SQL-ONLY entity types. Their importers exist in
# full (DBBridge.java, DBTunnel.java, DBTransportationComplex.java,
# DBReliefFeature.java, DBLandUse.java, DBPlantCover.java,
# DBSolitaryVegetatObject.java, DBWaterBody.java, DBCityObjectGroup.java,
# DBImplicitGeometry.java) but their SPARQL/blazegraph path is stubbed
# (AbstractDBImporter.java:88-90 returns "SPARQL import not implemented"),
# so a real city model's bridges/vegetation/waterbodies emit NOTHING on the
# KG path. We close that gap: predicate order mirrors each importer's SQL
# insert column order verbatim, names follow the blazegraph
# SchemaManagerAdapter's snake_case->camelCase convention (e.g.
# building_parent_id -> buildingParentId), graph names are the importers'
# own getIriGraphObjectRel() values, and objectClassIds come from
# 3dcitydb-schema.xml.
# ---------------------------------------------------------------------------

# DBBridge.java:102-109 (insert into bridge ...); graph DBBridge.java:97
T_BRIDGE = [
    ("id", "@iri", "iri"),
    ("bridgeParentId", "@ref/bridge/parentId", "iri"),
    ("bridgeRootId", "@ref/bridge/rootId", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("yearOfConstruction", "yearOfConstruction", "literal"),
    ("yearOfDemolition", "yearOfDemolition", "literal"),
    ("isMovable", "isMovable", "literal"),
    ("lod1TerrainIntersection", None, "literal"),
    ("lod2TerrainIntersection", None, "literal"),
    ("lod3TerrainIntersection", None, "literal"),
    ("lod4TerrainIntersection", None, "literal"),
    ("lod2MultiCurve", None, "literal"),
    ("lod3MultiCurve", None, "literal"),
    ("lod4MultiCurve", None, "literal"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod1SolidId", "@ref/surfacegeometry/lod1SolidId", "iri"),
    ("lod2SolidId", "@ref/surfacegeometry/lod2SolidId", "iri"),
    ("lod3SolidId", "@ref/surfacegeometry/lod3SolidId", "iri"),
    ("lod4SolidId", "@ref/surfacegeometry/lod4SolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBTunnel.java:90-97 — bridge minus is_movable; graph DBTunnel.java:89
T_TUNNEL = [
    ("id", "@iri", "iri"),
    ("tunnelParentId", "@ref/tunnel/parentId", "iri"),
    ("tunnelRootId", "@ref/tunnel/rootId", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("yearOfConstruction", "yearOfConstruction", "literal"),
    ("yearOfDemolition", "yearOfDemolition", "literal"),
    ("lod1TerrainIntersection", None, "literal"),
    ("lod2TerrainIntersection", None, "literal"),
    ("lod3TerrainIntersection", None, "literal"),
    ("lod4TerrainIntersection", None, "literal"),
    ("lod2MultiCurve", None, "literal"),
    ("lod3MultiCurve", None, "literal"),
    ("lod4MultiCurve", None, "literal"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod1SolidId", "@ref/surfacegeometry/lod1SolidId", "iri"),
    ("lod2SolidId", "@ref/surfacegeometry/lod2SolidId", "iri"),
    ("lod3SolidId", "@ref/surfacegeometry/lod3SolidId", "iri"),
    ("lod4SolidId", "@ref/surfacegeometry/lod4SolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBTransportationComplex.java:80-82 (objectclass_id is 2nd, unconditional);
# graph DBTransportationComplex.java:75
T_TRANSPORTATION_COMPLEX = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("lod0Network", None, "literal"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
]

# DBReliefFeature.java:72-75; graph DBReliefFeature.java:67
T_RELIEF_FEATURE = [
    ("id", "@iri", "iri"),
    ("lod", "lod", "literal"),
    ("objectClassId", "@class", "literal"),
]

# DBLandUse.java:73-76; graph DBLandUse.java:68
T_LAND_USE = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("lod0MultiSurfaceId", "@ref/surfacegeometry/lod0MultiSurfaceId", "iri"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBPlantCover.java:75-80; graph DBPlantCover.java:70
T_PLANT_COVER = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("averageHeight", "averageHeight", "literal"),
    ("averageHeightUnit", "averageHeightUnit", "literal"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("lod1MultiSolidId", "@ref/surfacegeometry/lod1MultiSolidId", "iri"),
    ("lod2MultiSolidId", "@ref/surfacegeometry/lod2MultiSolidId", "iri"),
    ("lod3MultiSolidId", "@ref/surfacegeometry/lod3MultiSolidId", "iri"),
    ("lod4MultiSolidId", "@ref/surfacegeometry/lod4MultiSolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBSolitaryVegetatObject.java:85-93; graph DBSolitaryVegetatObject.java:80
T_SOLITARY_VEGETAT_OBJECT = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("species", "species", "literal"),
    ("speciesCodespace", "speciesCodespace", "literal"),
    ("height", "height", "literal"),
    ("heightUnit", "heightUnit", "literal"),
    ("trunkDiameter", "trunkDiameter", "literal"),
    ("trunkDiameterUnit", "trunkDiameterUnit", "literal"),
    ("crownDiameter", "crownDiameter", "literal"),
    ("crownDiameterUnit", "crownDiameterUnit", "literal"),
    ("lod1BrepId", "@ref/surfacegeometry/lod1BrepId", "iri"),
    ("lod2BrepId", "@ref/surfacegeometry/lod2BrepId", "iri"),
    ("lod3BrepId", "@ref/surfacegeometry/lod3BrepId", "iri"),
    ("lod4BrepId", "@ref/surfacegeometry/lod4BrepId", "iri"),
    ("lod1OtherGeom", None, "literal"),
    ("lod2OtherGeom", None, "literal"),
    ("lod3OtherGeom", None, "literal"),
    ("lod4OtherGeom", None, "literal"),
    ("lod1ImplicitRepId", None, "iri"),
    ("lod2ImplicitRepId", None, "iri"),
    ("lod3ImplicitRepId", None, "iri"),
    ("lod4ImplicitRepId", None, "iri"),
    ("lod1ImplicitRefPoint", None, "literal"),
    ("lod2ImplicitRefPoint", None, "literal"),
    ("lod3ImplicitRefPoint", None, "literal"),
    ("lod4ImplicitRefPoint", None, "literal"),
    ("lod1ImplicitTransformation", None, "literal"),
    ("lod2ImplicitTransformation", None, "literal"),
    ("lod3ImplicitTransformation", None, "literal"),
    ("lod4ImplicitTransformation", None, "literal"),
    ("objectClassId", "@class", "literal"),
]

# DBWaterBody.java:82-86; graph DBWaterBody.java:77
T_WATER_BODY = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("lod0MultiCurve", None, "literal"),
    ("lod1MultiCurve", None, "literal"),
    ("lod0MultiSurfaceId", "@ref/surfacegeometry/lod0MultiSurfaceId", "iri"),
    ("lod1MultiSurfaceId", "@ref/surfacegeometry/lod1MultiSurfaceId", "iri"),
    ("lod1SolidId", "@ref/surfacegeometry/lod1SolidId", "iri"),
    ("lod2SolidId", "@ref/surfacegeometry/lod2SolidId", "iri"),
    ("lod3SolidId", "@ref/surfacegeometry/lod3SolidId", "iri"),
    ("lod4SolidId", "@ref/surfacegeometry/lod4SolidId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBCityObjectGroup.java:80-83; graph DBCityObjectGroup.java:75
T_CITY_OBJECT_GROUP = [
    ("id", "@iri", "iri"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("brepId", "@ref/surfacegeometry/brepId", "iri"),
    ("otherGeom", None, "literal"),
    ("objectClassId", "@class", "literal"),
]

# DBTrafficArea.java:66-70 (objectclass_id 2nd, unconditional — 47 traffic /
# 48 auxiliary via attr override); graph DBTrafficArea.java:62; the
# transportation_complex_id FK column binds the enclosing complex
T_TRAFFIC_AREA = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
    ("surfaceMaterial", "surfaceMaterial", "literal"),
    ("surfaceMaterialCodespace", "surfaceMaterialCodespace", "literal"),
    ("lod2MultiSurfaceId", "@ref/surfacegeometry/lod2MultiSurfaceId", "iri"),
    ("lod3MultiSurfaceId", "@ref/surfacegeometry/lod3MultiSurfaceId", "iri"),
    ("lod4MultiSurfaceId", "@ref/surfacegeometry/lod4MultiSurfaceId", "iri"),
    ("transportationComplexId", "@ref/transportationcomplex/transportationComplexId", "iri"),
]

# DBWaterBoundarySurface.java:66-68 (objectclass 11 WaterSurface /
# 12 WaterGroundSurface / 13 WaterClosureSurface via attr override);
# graph DBWaterBoundarySurface.java:62
T_WATER_BOUNDARY_SURFACE = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("waterLevel", "waterLevel", "literal"),
    ("waterLevelCodespace", "waterLevelCodespace", "literal"),
    ("lod2SurfaceId", "@ref/surfacegeometry/lod2SurfaceId", "iri"),
    ("lod3SurfaceId", "@ref/surfacegeometry/lod3SurfaceId", "iri"),
    ("lod4SurfaceId", "@ref/surfacegeometry/lod4SurfaceId", "iri"),
]

# DBWaterBodToWaterBndSrf.java:56-57; graph :52
T_WATERBOD_TO_WATERBND_SRF = [
    ("waterBoundarySurfaceId", "@ref/waterboundarysurface/waterBoundarySurfaceId", "iri"),
    ("waterBodyId", "@ref/waterbody/waterBodyId", "iri"),
]

# DBReliefComponent.java:78-85 — the component row plus the TIN flavor
# (tin_relief; masspoint/breakline analogous). DBReliefComponent is a raw
# SQL importer with no graph rel of its own; graph names follow its table
# names, consistent with every other importer's convention.
T_RELIEF_COMPONENT = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("lod", "lod", "literal"),
    ("extent", "extent", "literal"),
]
T_TIN_RELIEF = [
    ("id", "@iri", "iri"),
    ("maxLength", "maxLength", "literal"),
    ("maxLengthUnit", "maxLengthUnit", "literal"),
    ("stopLines", None, "literal"),
    ("breakLines", None, "literal"),
    ("controlPoints", None, "literal"),
    ("surfaceGeometryId", "@ref/surfacegeometry/surfaceGeometryId", "iri"),
    ("objectClassId", "@class", "literal"),
]

# DBReliefFeatToRelComp.java:54-55; graph :50
T_RELIEF_FEAT_TO_REL_COMP = [
    ("reliefComponentId", "@ref/reliefcomponent/reliefComponentId", "iri"),
    ("reliefFeatureId", "@ref/relieffeature/reliefFeatureId", "iri"),
]

# ---------------------------------------------------------------------------
# Bridge / tunnel interior families (all SQL-only in the reference, same
# AbstractDBImporter stub): thematic surfaces, installations, rooms/hollow
# spaces, furniture, openings, construction elements + their link tables.
# Column orders from each importer's getSQLStatement; note the reference's
# DBBridgeOpening.getIriGraphObjectRel returns "bridgefurniture/" — a
# copy-paste slip that is dead code on its stubbed SPARQL path; we use the
# correct "bridgeopening" graph.
# ---------------------------------------------------------------------------

_CFU_T = [
    ("class", "class", "literal"),
    ("classCodespace", "classCodespace", "literal"),
    ("function", "function", "literal"),
    ("functionCodespace", "functionCodespace", "literal"),
    ("usage", "usage", "literal"),
    ("usageCodespace", "usageCodespace", "literal"),
]


def _never(preds: list[str], obj_type: str = "literal") -> list[tuple]:
    return [(p, None, obj_type) for p in preds]


def _sg_refs(preds: list[str]) -> list[tuple]:
    return [(p, f"@ref/surfacegeometry/{p}", "iri") for p in preds]


def _implicit_block(lods: list[int]) -> list[tuple]:
    return (
        _never([f"lod{i}ImplicitRepId" for i in lods], "iri")
        + _never([f"lod{i}ImplicitRefPoint" for i in lods])
        + _never([f"lod{i}ImplicitTransformation" for i in lods])
    )


# DBBridgeThematicSurface.java:73-75; graph :69
T_BRIDGE_THEMATIC_SURFACE = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("bridgeId", "@ref/bridge/bridgeId", "iri"),
    ("bridgeRoomId", "@ref/bridgeroom/bridgeRoomId", "iri"),
    ("bridgeInstallationId", "@ref/bridgeinstallation/bridgeInstallationId", "iri"),
    ("bridgeConstrElementId", "@ref/bridgeconstrelement/bridgeConstrElementId", "iri"),
] + _sg_refs(["lod2MultiSurfaceId", "lod3MultiSurfaceId", "lod4MultiSurfaceId"])

# DBBridgeInstallation.java:86-91; graph :82
T_BRIDGE_INSTALLATION = (
    [("id", "@iri", "iri"), ("objectClassId", "@class", "literal")]
    + _CFU_T
    + [
        ("bridgeId", "@ref/bridge/bridgeId", "iri"),
        ("bridgeRoomId", "@ref/bridgeroom/bridgeRoomId", "iri"),
    ]
    + _sg_refs(["lod2BrepId", "lod3BrepId", "lod4BrepId"])
    + _never(["lod2OtherGeom", "lod3OtherGeom", "lod4OtherGeom"])
    + _implicit_block([2, 3, 4])
)

# DBBridgeRoom.java:83-86; graph :79
T_BRIDGE_ROOM = (
    [("id", "@iri", "iri")]
    + _CFU_T
    + [("bridgeId", "@ref/bridge/bridgeId", "iri")]
    + _sg_refs(["lod4MultiSurfaceId", "lod4SolidId"])
    + [("objectClassId", "@class", "literal")]
)

# DBBridgeFurniture.java:87-90; graph :83
T_BRIDGE_FURNITURE = (
    [("id", "@iri", "iri")]
    + _CFU_T
    + [("bridgeRoomId", "@ref/bridgeroom/bridgeRoomId", "iri")]
    + _sg_refs(["lod4BrepId"])
    + _never(["lod4OtherGeom"])
    + _implicit_block([4])
    + [("objectClassId", "@class", "literal")]
)

# DBBridgeOpening.java:86-90; graph intent "bridgeopening" (see note above)
T_BRIDGE_OPENING = (
    [
        ("id", "@iri", "iri"),
        ("objectClassId", "@class", "literal"),
        ("addressId", "@ref/address/addressId", "iri"),
    ]
    + _sg_refs(["lod3MultiSurfaceId", "lod4MultiSurfaceId"])
    + _implicit_block([3, 4])
)

# DBBridgeOpenToThemSrf.java:53-54; graph :49
T_BRIDGE_OPEN_TO_THEM_SRF = [
    ("bridgeOpeningId", "@ref/bridgeopening/bridgeOpeningId", "iri"),
    ("bridgeThematicSurfaceId", "@ref/bridgethematicsurface/bridgeThematicSurfaceId", "iri"),
]

# DBBridgeConstrElement.java:94-100; graph :90
T_BRIDGE_CONSTR_ELEMENT = (
    [("id", "@iri", "iri")]
    + _CFU_T
    + [("bridgeId", "@ref/bridge/bridgeId", "iri")]
    + _never([f"lod{i}TerrainIntersection" for i in (1, 2, 3, 4)])
    + _sg_refs(["lod1BrepId", "lod2BrepId", "lod3BrepId", "lod4BrepId"])
    + _never([f"lod{i}OtherGeom" for i in (1, 2, 3, 4)])
    + _implicit_block([1, 2, 3, 4])
    + [("objectClassId", "@class", "literal")]
)

# DBAddressToBridge.java:54-55; graph :50
T_ADDRESS_TO_BRIDGE = [
    ("bridgeId", "@ref/bridge/bridgeId", "iri"),
    ("addressId", "@ref/address/addressId", "iri"),
]

# DBTunnelThematicSurface.java:71-73; graph :67
T_TUNNEL_THEMATIC_SURFACE = [
    ("id", "@iri", "iri"),
    ("objectClassId", "@class", "literal"),
    ("tunnelId", "@ref/tunnel/tunnelId", "iri"),
    ("tunnelHollowSpaceId", "@ref/tunnelhollowspace/tunnelHollowSpaceId", "iri"),
    ("tunnelInstallationId", "@ref/tunnelinstallation/tunnelInstallationId", "iri"),
] + _sg_refs(["lod2MultiSurfaceId", "lod3MultiSurfaceId", "lod4MultiSurfaceId"])

# DBTunnelInstallation.java:87-92; graph :83
T_TUNNEL_INSTALLATION = (
    [("id", "@iri", "iri"), ("objectClassId", "@class", "literal")]
    + _CFU_T
    + [
        ("tunnelId", "@ref/tunnel/tunnelId", "iri"),
        ("tunnelHollowSpaceId", "@ref/tunnelhollowspace/tunnelHollowSpaceId", "iri"),
    ]
    + _sg_refs(["lod2BrepId", "lod3BrepId", "lod4BrepId"])
    + _never(["lod2OtherGeom", "lod3OtherGeom", "lod4OtherGeom"])
    + _implicit_block([2, 3, 4])
)

# DBTunnelHollowSpace.java:79-82; graph :75
T_TUNNEL_HOLLOW_SPACE = (
    [("id", "@iri", "iri")]
    + _CFU_T
    + [("tunnelId", "@ref/tunnel/tunnelId", "iri")]
    + _sg_refs(["lod4MultiSurfaceId", "lod4SolidId"])
    + [("objectClassId", "@class", "literal")]
)

# DBTunnelFurniture.java:85-88; graph :81
T_TUNNEL_FURNITURE = (
    [("id", "@iri", "iri")]
    + _CFU_T
    + [("tunnelHollowSpaceId", "@ref/tunnelhollowspace/tunnelHollowSpaceId", "iri")]
    + _sg_refs(["lod4BrepId"])
    + _never(["lod4OtherGeom"])
    + _implicit_block([4])
    + [("objectClassId", "@class", "literal")]
)

# DBTunnelOpening.java:78-82; graph :74
T_TUNNEL_OPENING = (
    [("id", "@iri", "iri"), ("objectClassId", "@class", "literal")]
    + _sg_refs(["lod3MultiSurfaceId", "lod4MultiSurfaceId"])
    + _implicit_block([3, 4])
)

# DBTunnelOpenToThemSrf.java:54-55; graph :50
T_TUNNEL_OPEN_TO_THEM_SRF = [
    ("tunnelOpeningId", "@ref/tunnelopening/tunnelOpeningId", "iri"),
    ("tunnelThematicSurfaceId", "@ref/tunnelthematicsurface/tunnelThematicSurfaceId", "iri"),
]

# group member link rows resolve through the xlink cache
# (XlinkGroupToCityObject.java:59 insert into GROUP_TO_CITYOBJECT)
T_GROUP_TO_CITYOBJECT = [
    ("cityObjectId", "@ref/cityobject/cityObjectId", "iri"),
    ("cityObjectGroupId", "@ref/cityobjectgroup/cityObjectGroupId", "iri"),
    ("role", "role", "literal"),
]

# DBImplicitGeometry.java:77-79 (insert + deferred update columns; NOT a
# city object — no DBCityObject row is imported for it)
T_IMPLICIT_GEOMETRY = [
    ("id", "@iri", "iri"),
    ("referenceToLibrary", "referenceToLibrary", "literal"),
    ("mimeType", "mimeType", "literal"),
    ("relativeBrepId", "@ref/surfacegeometry/relativeBrepId", "iri"),
    ("relativeOtherGeom", None, "literal"),
]

# ---------------------------------------------------------------------------
# span-kind -> list of (graph, template, emits_cityobject_row)
# mirrors which DB* importers fire per feature (DBBuilding.doImport calls
# DBCityObject first — DBBuilding.java:177 — hence the cityobject row)
# ---------------------------------------------------------------------------
KIND_EMISSIONS: dict[str, list[tuple[str, list]]] = {
    "building": [("cityobject", T_CITYOBJECT), ("building", T_BUILDING)],
    "building_part": [("cityobject", T_CITYOBJECT), ("building", T_BUILDING)],
    "surface_geometry": [("surfacegeometry", T_SURFACE_GEOMETRY)],
    "thematic_surface": [("cityobject", T_CITYOBJECT), ("thematicsurface", T_THEMATIC_SURFACE)],
    "room": [("cityobject", T_CITYOBJECT), ("room", T_ROOM)],
    "building_installation": [("cityobject", T_CITYOBJECT), ("buildinginstallation", T_BUILDING_INSTALLATION)],
    "building_furniture": [("cityobject", T_CITYOBJECT), ("buildingfurniture", T_BUILDING_FURNITURE)],
    "opening": [("cityobject", T_CITYOBJECT), ("opening", T_OPENING)],
    "opening_to_them_surface": [("openingtothemsurface", T_OPENING_TO_THEM_SURFACE)],
    "address": [("address", T_ADDRESS), ("addresstobuilding", T_ADDRESS_TO_BUILDING)],
    "street": [("address", T_ADDRESS), ("addresstobuilding", T_ADDRESS_TO_BUILDING)],
    "city_furniture": [("cityobject", T_CITYOBJECT), ("cityfurniture", T_CITY_FURNITURE)],
    "generic_city_object": [("cityobject", T_CITYOBJECT), ("genericcityobject", T_GENERIC_CITY_OBJECT)],
    "generic_attribute": [("cityobjectgenericattrib", T_GENERIC_ATTRIB)],
    "generic_attribute_set": [("cityobjectgenericattrib", T_GENERIC_ATTRIB_SET)],
    "external_reference": [("externalreference", T_EXTERNAL_REFERENCE)],
    "appearance": [("cityobject", T_CITYOBJECT), ("appearance", T_APPEARANCE)],
    "appear_to_surface_data": [("appeartosurfacedata", T_APPEAR_TO_SURFACE_DATA)],
    "surface_data": [("surfacedata", T_SURFACE_DATA)],
    "media": [("teximage", T_TEX_IMAGE)],
    "texture_param": [("textureparam", T_TEXTURE_PARAM)],
    # P25+ SQL-only types (see the template block above); every one except
    # implicit_geometry imports its cityobject row first, same as building
    "bridge": [("cityobject", T_CITYOBJECT), ("bridge", T_BRIDGE)],
    "tunnel": [("cityobject", T_CITYOBJECT), ("tunnel", T_TUNNEL)],
    "transportation_complex": [
        ("cityobject", T_CITYOBJECT),
        ("transportationcomplex", T_TRANSPORTATION_COMPLEX),
    ],
    "relief_feature": [("cityobject", T_CITYOBJECT), ("relieffeature", T_RELIEF_FEATURE)],
    "land_use": [("cityobject", T_CITYOBJECT), ("landuse", T_LAND_USE)],
    "plant_cover": [("cityobject", T_CITYOBJECT), ("plantcover", T_PLANT_COVER)],
    "solitary_vegetation": [
        ("cityobject", T_CITYOBJECT),
        ("solitaryvegetatobject", T_SOLITARY_VEGETAT_OBJECT),
    ],
    "water_body": [("cityobject", T_CITYOBJECT), ("waterbody", T_WATER_BODY)],
    "city_object_group": [
        ("cityobject", T_CITYOBJECT),
        ("cityobjectgroup", T_CITY_OBJECT_GROUP),
    ],
    "group_to_cityobject": [("grouptocityobject", T_GROUP_TO_CITYOBJECT)],
    "implicit_geometry": [("implicitgeometry", T_IMPLICIT_GEOMETRY)],
    # nested sub-feature importers of the P25+ types
    "traffic_area": [("cityobject", T_CITYOBJECT), ("trafficarea", T_TRAFFIC_AREA)],
    "water_boundary_surface": [
        ("cityobject", T_CITYOBJECT),
        ("waterboundarysurface", T_WATER_BOUNDARY_SURFACE),
    ],
    "waterbod_to_waterbnd_srf": [("waterbodtowaterbndsrf", T_WATERBOD_TO_WATERBND_SRF)],
    # a TIN component writes BOTH relief_component and tin_relief rows
    # (DBReliefComponent.doImport -> psReliefComponent + tinStmt)
    "tin_relief": [
        ("cityobject", T_CITYOBJECT),
        ("reliefcomponent", T_RELIEF_COMPONENT),
        ("tinrelief", T_TIN_RELIEF),
    ],
    "relief_feat_to_rel_comp": [("relieffeattorelcomp", T_RELIEF_FEAT_TO_REL_COMP)],
    # bridge / tunnel interior families
    "bridge_part": [("cityobject", T_CITYOBJECT), ("bridge", T_BRIDGE)],
    "tunnel_part": [("cityobject", T_CITYOBJECT), ("tunnel", T_TUNNEL)],
    "bridge_thematic_surface": [
        ("cityobject", T_CITYOBJECT),
        ("bridgethematicsurface", T_BRIDGE_THEMATIC_SURFACE),
    ],
    "bridge_installation": [
        ("cityobject", T_CITYOBJECT),
        ("bridgeinstallation", T_BRIDGE_INSTALLATION),
    ],
    "bridge_room": [("cityobject", T_CITYOBJECT), ("bridgeroom", T_BRIDGE_ROOM)],
    "bridge_furniture": [
        ("cityobject", T_CITYOBJECT),
        ("bridgefurniture", T_BRIDGE_FURNITURE),
    ],
    "bridge_opening": [("cityobject", T_CITYOBJECT), ("bridgeopening", T_BRIDGE_OPENING)],
    "bridge_open_to_them_srf": [("bridgeopentothemsrf", T_BRIDGE_OPEN_TO_THEM_SRF)],
    "bridge_constr_element": [
        ("cityobject", T_CITYOBJECT),
        ("bridgeconstrelement", T_BRIDGE_CONSTR_ELEMENT),
    ],
    "address_to_bridge": [("addresstobridge", T_ADDRESS_TO_BRIDGE)],
    "tunnel_thematic_surface": [
        ("cityobject", T_CITYOBJECT),
        ("tunnelthematicsurface", T_TUNNEL_THEMATIC_SURFACE),
    ],
    "tunnel_installation": [
        ("cityobject", T_CITYOBJECT),
        ("tunnelinstallation", T_TUNNEL_INSTALLATION),
    ],
    "tunnel_hollow_space": [
        ("cityobject", T_CITYOBJECT),
        ("tunnelhollowspace", T_TUNNEL_HOLLOW_SPACE),
    ],
    "tunnel_furniture": [
        ("cityobject", T_CITYOBJECT),
        ("tunnelfurniture", T_TUNNEL_FURNITURE),
    ],
    "tunnel_opening": [("cityobject", T_CITYOBJECT), ("tunnelopening", T_TUNNEL_OPENING)],
    "tunnel_open_to_them_srf": [("tunnelopentothemsrf", T_TUNNEL_OPEN_TO_THEM_SRF)],
}

# kinds whose subject lives in a graph other than the first emission graph
# (features get their IRI minted in their feature graph; the cityobject row
# reuses that same IRI — DBCityObject.java:248 `iriGraphObject + id + "/"`
# uses the *cityobject* graph for the cityobject row. The reference mints a
# DIFFERENT IRI per graph for the same feature: cityobject/<gmlId>/ and
# building/<gmlId>/ are distinct subjects.)
SUBJECT_GRAPH_IS_EMISSION_GRAPH = True


def template_rows() -> list[tuple]:
    """Flatten KIND_EMISSIONS into broadcastable template rows.

    Returns rows (kind, graph, pos, pred, binding, obj_type) with `pos`
    globally ordered per kind across its emission graphs, so sorting by
    (doc_id, span_idx, pos) reproduces the reference emission order
    (cityobject row first, then feature row — DBBuilding.java:177,421).
    """
    rows = []
    for kind, emissions in KIND_EMISSIONS.items():
        pos = 0
        for graph, template in emissions:
            for pred, binding, obj_type in template:
                rows.append((kind, graph, pos, pred, binding, obj_type))
                pos += 1
    return rows


def iri(base: str, graph: str, gml_id: str) -> str:
    """Subject IRI layout: <base>/<graph>/<gmlId>/ (DBCityObject.java:248)."""
    return f"{base}/{graph}/{gml_id}/"
