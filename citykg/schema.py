"""Canonical StructTypes for every stage boundary.

Input shape is the BASELINE.json ``input_hint`` contract:
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

# input_hint shape (Iceberg table of interleaved text + media documents)
DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_SCHEMA), False),
    ]
)

# exploded mention = one span with its position
MENTION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

# output triple row (FIXTURES.md §3); graph mirrors the reference's
# named-graph-per-entity-type layout (SchemaManagerAdapter.java:168-181)
TRIPLE_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType()),
        StructField("obj_type", StringType()),  # 'iri' | 'literal'
        StructField("datatype", StringType()),  # geometry literal datatype IRI
        StructField("graph", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("pos", IntegerType(), False),  # template position (order invariant)
    ]
)

GAZETTEER_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("kind", StringType()),
        StructField("aliases", ArrayType(StringType())),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
    ]
)

# per-partition lineage manifest (FIXTURES.md §4); one row per
# (stage, bucket) work unit — the resume key
MANIFEST_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_range", StringType(), False),
        StructField("input_snapshot", StringType()),
        StructField("row_count", LongType()),
        StructField("status", StringType()),  # 'done' | 'failed'
        StructField("attempt", IntegerType()),
        StructField("wall_ms", LongType()),
    ]
)
