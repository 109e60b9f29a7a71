"""Partition-count invariance: the north_rule's two-cluster-size claim is
only meaningful if results are BIT-IDENTICAL at different parallelism.
Every keyed operator here must produce the same rows whether the input
sits in 2 partitions or 16."""

from pyspark.sql import functions as F

from citykg import extract, link
from citykg.fixtures import synth_docs, synth_gazetteer
from citykg.ops import dedup, packing, sampling
from conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_extract_invariant_to_partitioning(spark):
    docs = synth_docs(spark, SF_SMOKE)
    cols = ["subj", "pred", "obj", "graph", "pos"]
    a = _rows(extract.extract_triples(spark, docs.repartition(2)).select(cols), cols)
    b = _rows(extract.extract_triples(spark, docs.repartition(16)).select(cols), cols)
    assert a == b


def test_fuzzy_link_invariant_to_partitioning(spark):
    docs = synth_docs(spark, SF_SMOKE)
    gaz = synth_gazetteer(spark)
    cols = ["doc_id", "span_idx", "entity_id"]
    m = link.entity_mentions(docs)
    a = _rows(link.link_fuzzy(m.repartition(2), gaz).select(cols), cols)
    b = _rows(link.link_fuzzy(m.repartition(16), gaz).select(cols), cols)
    assert a == b


def test_minhash_pairs_invariant_to_partitioning(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    cols = ["doc_a", "doc_b"]
    a = _rows(dedup.minhash_lsh_pairs(docs.repartition(2)).select(cols), cols)
    b = _rows(dedup.minhash_lsh_pairs(docs.repartition(16)).select(cols), cols)
    assert a == b


def test_pack_sequences_invariant_to_partitioning(spark):
    d = spark.range(500).selectExpr(
        "cast(id as string) as doc_id", "cast(10 + id % 80 as int) as n_tokens"
    )
    cols = ["id", "grp", "bin"]
    a = _rows(packing.pack_sequences(d.repartition(2), "doc_id", "n_tokens").select(cols), cols)
    b = _rows(packing.pack_sequences(d.repartition(16), "doc_id", "n_tokens").select(cols), cols)
    assert a == b


def test_split_invariant_to_partitioning(spark):
    d = spark.range(2000).selectExpr("cast(id as string) as doc_id")
    cols = ["doc_id", "split"]
    a = _rows(sampling.with_split(d.repartition(2), "doc_id").select(cols), cols)
    b = _rows(sampling.with_split(d.repartition(16), "doc_id").select(cols), cols)
    assert a == b
