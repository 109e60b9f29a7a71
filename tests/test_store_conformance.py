"""Storage-adapter conformance suite (r4 VERDICT item 6).

These tests pin exactly the semantics the parquet emulation shares with
a real Iceberg table (citykg/store.py documents the 1:1 method mapping).
An Iceberg-backed adapter must pass this module unchanged (minus the
file-path assertions, which read through adapter metadata methods only).
"""

import os

import pytest
from pyspark.sql import functions as F

from citykg import materialize
from citykg.store import ParquetStoreAdapter


def _frame(spark, subjects, graph="building", obj="v1"):
    return materialize.with_bucket(
        spark.createDataFrame(
            [(s, "ocgml:name", obj, "literal", None, graph, "d", 0, 0) for s in subjects],
            "subj string, pred string, obj string, obj_type string, "
            "datatype string, graph string, doc_id string, span_idx int, pos int",
        ),
        n_buckets=4,
    )


def _file_state(adapter):
    """(graph, bucket) -> sorted [(fname, size, mtime_ns)] — the byte-identity witness."""
    state = {}
    for g, b, _ in adapter.list_partitions():
        d = adapter.partition_dir(g, b)
        state[(g, b)] = sorted(
            (f, os.path.getsize(os.path.join(d, f)),
             os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d) if f.endswith(".parquet")
        )
    return state


@pytest.fixture()
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("conformance"))
    adapter = ParquetStoreAdapter(spark, out)
    adapter.overwrite_partitions(_frame(spark, [f"S{i}" for i in range(40)]))
    return adapter


def test_append_never_touches_existing_files(spark, store):
    """Conformance #1: append = new data files only; every pre-existing
    file stays byte-identical (Iceberg fast-append snapshot)."""
    before = _file_state(store)
    store.append(_frame(spark, ["S1", "S7"], obj="v2"))
    after = _file_state(store)
    for key, files in before.items():
        remaining = {f[0]: f for f in after[key]}
        for fname, size, mtime in files:
            assert fname in remaining and remaining[fname] == (fname, size, mtime), (
                f"append rewrote pre-existing file {fname} in {key}"
            )
    assert sum(len(v) for v in after.values()) > sum(len(v) for v in before.values())


def test_overwrite_touches_only_present_partitions(spark, store):
    """Conformance #2: dynamic overwrite replaces exactly the partitions
    present in the incoming frame; all others stay byte-identical."""
    before = _file_state(store)
    incoming = _frame(spark, ["S1"], obj="v3")
    touched = {(r.graph, r.bucket) for r in incoming.select("graph", "bucket").distinct().collect()}
    store.overwrite_partitions(incoming.sortWithinPartitions("graph", "bucket", "subj"))
    after = _file_state(store)
    for key in before:
        if key in touched:
            assert after[key] != before[key]
        else:
            assert after[key] == before[key], f"overwrite touched unrelated partition {key}"


def test_partition_pruning_at_scan(spark, store):
    """Conformance #3: a (graph, bucket) predicate must prune at the scan
    (PartitionFilters) — not filter after reading every partition."""
    df = store.read().where((F.col("graph") == "building") & (F.col("bucket") == 2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "bucket" in pf and "graph" in pf
    # the compaction group predicate shape — an OR-chain of per-column
    # equality conjunctions — must ALSO prune (the canonical portable
    # partition-filter shape; Spark 4.1 happens to prune the struct-isin
    # spelling too, but that support is newer — this pins the shape
    # compact_store actually emits)
    pred = ((F.col("graph") == "building") & (F.col("bucket") == 2)) | (
        (F.col("graph") == "building") & (F.col("bucket") == 3)
    )
    plan_or = store.read().where(pred)._jdf.queryExecution().executedPlan().toString()
    pf_or = plan_or.split("PartitionFilters", 1)[1][:400]
    assert "bucket" in pf_or and "graph" in pf_or


def test_metadata_ops_match_physical_state(spark, store):
    """Conformance #4: list_partitions / file_counts (the Iceberg
    partitions/files metadata tables) agree with a full read."""
    rows = store.read().groupBy("graph", "bucket").count().collect()
    physical = {(r.graph, r.bucket): r["count"] for r in rows}
    listed = {(g, b) for g, b, _ in store.list_partitions()}
    assert listed == set(physical)
    for (g, b), n in physical.items():
        assert sum(store.file_counts(g, b).values()) == n


def test_commit_protocol_brackets_every_compaction(spark, tmp_path_factory):
    """Conformance #5: every compaction overwrite is bracketed by a
    write-ahead `pending` row (expected count) and a verified `done` row
    — the emulation's unit of atomic visibility. Under Iceberg snapshot
    isolation the same protocol holds trivially (the verify reads the
    committed snapshot)."""
    out = str(tmp_path_factory.mktemp("protocol"))
    materialize.write_triples(
        spark, _frame(spark, [f"P{i}" for i in range(30)]), out, n_buckets=4
    )
    batch = _frame(spark, ["P3", "P5"], obj="v2")
    materialize.upsert_triples(spark, batch.drop("bucket"), out, n_buckets=4)
    compacted = materialize.compact_store(spark, out)
    assert compacted
    m = materialize.read_manifest(spark, out).where(F.col("stage") == "compact").collect()
    pend = {(r.partition_range, r.row_count) for r in m if r.status == "pending"}
    done = {(r.partition_range, r.row_count) for r in m if r.status == "done"}
    assert pend == done and len(pend) == len(compacted)
    # and the recorded counts match the physical footers
    adapter = ParquetStoreAdapter(spark, out)
    for pr, cnt in done:
        g, b = pr.split("/", 1)
        assert sum(adapter.file_counts(g, int(b)).values()) == cnt
