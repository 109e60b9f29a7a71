"""Materialize: bucketed layout, lineage manifests, kill-and-resume."""

import pytest

from pyspark.sql import functions as F

from citykg import materialize
from citykg.extract import extract_triples
from citykg.fixtures import synth_docs
from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def triples(spark):
    return extract_triples(spark, synth_docs(spark, SF_SMOKE)).persist()


def test_full_write_and_roundtrip(spark, triples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("store"))
    materialize.write_triples(spark, triples, out, n_buckets=16, bucket_group=8)
    back = materialize.read_triples(spark, out)
    assert back.count() == triples.count()
    # bucket column is pmod(xxhash64(subj), N) — co-location invariant
    bad = back.where(
        F.col("bucket") != F.pmod(F.xxhash64("subj"), F.lit(16)).cast("int")
    ).count()
    assert bad == 0
    done = materialize.completed_buckets(spark, out, "materialize")
    assert done == set(range(16))


def test_kill_and_resume_no_recompute(spark, triples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume"))
    # crash after 1 group (8 of 16 buckets committed)
    with pytest.raises(RuntimeError, match="injected"):
        materialize.write_triples(
            spark, triples, out, n_buckets=16, bucket_group=8, fail_after_groups=1
        )
    done_after_crash = materialize.completed_buckets(spark, out, "materialize")
    assert len(done_after_crash) == 8

    # resume: completes only the missing buckets
    materialize.write_triples(spark, triples, out, n_buckets=16, bucket_group=8)
    m = materialize.read_manifest(spark, out)
    # first 8 buckets have exactly ONE manifest row each -> not recomputed
    per_bucket = {r.partition_range: r.cnt for r in
                  m.groupBy("partition_range").agg(F.count("*").alias("cnt")).collect()}
    assert all(v == 1 for v in per_bucket.values())
    assert len(per_bucket) == 16

    back = materialize.read_triples(spark, out)
    assert back.count() == triples.count()
    # manifest row counts equal real per-bucket counts (lineage metrics)
    manifest_counts = {
        int(r.partition_range): r.row_count
        for r in m.where(F.col("status") == "done").collect()
    }
    real_counts = {
        int(r.bucket): r.cnt
        for r in back.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert manifest_counts == real_counts


def test_write_is_idempotent(spark, triples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idem"))
    materialize.write_triples(spark, triples, out, n_buckets=8)
    n1 = materialize.read_triples(spark, out).count()
    materialize.write_triples(spark, triples, out, n_buckets=8)  # no-op: all done
    assert materialize.read_triples(spark, out).count() == n1


def test_geometry_datatype_registry(spark, triples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reg"))
    materialize.write_geometry_datatype_registry(spark, triples, out)
    reg = spark.read.parquet(f"{out}/_geometry_datatypes").collect()
    assert {r.datatype for r in reg} == {
        "http://localhost/blazegraph/literals/POLYGON-3-15"
    }


def test_nquads_export(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nq"))
    t = spark.createDataFrame(
        [("http://b/building/x/", "ocgml:id", "http://b/building/x/", "iri", None,
          "building", "d", 0, 0),
         ("http://b/building/x/", "ocgml:name", 'say "hi"', "literal", None,
          "building", "d", 0, 1)],
        "subj string, pred string, obj string, obj_type string, datatype string, "
        "graph string, doc_id string, span_idx int, pos int",
    )
    materialize.export_nquads(t, f"{out}/q", base="http://b")
    lines = sorted(r.value for r in spark.read.text(f"{out}/q").collect())
    assert lines[0] == (
        "<http://b/building/x/> "
        "<http://www.theworldavatar.com/ontology/ontocitygml/citieskg/OntoCityGML.owl#id> "
        "<http://b/building/x/> <http://b/building/> ."
    )
    assert '"say \\"hi\\""' in lines[1]


def test_stage_metrics_rollup(spark, triples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("store_metrics"))
    materialize.write_triples(spark, triples, out, n_buckets=8, input_snapshot="snap1")
    m = materialize.stage_metrics(spark, out).collect()
    assert len(m) == 1
    r = m[0]
    assert r.stage == "materialize"
    assert r.n_partitions == 8
    assert r.rows == triples.count()
    assert r.complete is True
    assert r.max_attempt == 1
    assert r.total_wall_ms > 0


def test_delete_subjects_surgical_rewrite(spark, triples, tmp_path_factory):
    import os

    out = str(tmp_path_factory.mktemp("store_delete"))
    materialize.write_triples(spark, triples, out, n_buckets=8)
    total_before = materialize.read_triples(spark, out).count()

    victims = [r.subj for r in triples.select("subj").distinct().limit(2).collect()]
    # record files of buckets NOT containing the victims
    from pyspark.sql import functions as F

    vb = {
        r.bucket
        for r in materialize.with_bucket(
            spark.createDataFrame([(s,) for s in victims], "subj string"), 8
        ).collect()
    }
    ref_buckets = {
        r.bucket
        for r in materialize.read_triples(spark, out)
        .where(F.col("obj").isin(victims))
        .select("bucket")
        .distinct()
        .collect()
    }
    touched = vb | ref_buckets
    untouched = [b for b in range(8) if b not in touched][:1]
    pre_files = {}
    for b in untouched:
        for root, _, files in os.walk(os.path.join(out, "triples")):
            if f"bucket={b}" in root:
                for f in files:
                    p = os.path.join(root, f)
                    pre_files[p] = os.path.getmtime(p)

    n_removed = materialize.delete_subjects(spark, out, victims, n_buckets=8)
    assert n_removed > 0
    t = materialize.read_triples(spark, out)
    assert t.where(F.col("subj").isin(victims)).count() == 0
    assert t.where(F.col("obj").isin(victims)).count() == 0
    assert t.count() == total_before - n_removed
    # untouched bucket files are byte-identical (never rewritten)
    for p, mtime in pre_files.items():
        assert os.path.getmtime(p) == mtime, p
    # deletion is manifest-tracked
    m = materialize.read_manifest(spark, out).where(F.col("stage") == "delete")
    assert m.count() > 0
    assert sum(r.row_count for r in m.collect()) == n_removed


def test_upsert_replaces_and_appends(spark, triples, tmp_path_factory):
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("store_upsert"))
    materialize.write_triples(spark, triples, out, n_buckets=8, input_snapshot="v1")
    total = materialize.read_triples(spark, out).count()

    victim = triples.select("subj").distinct().limit(1).collect()[0].subj
    # new version of the victim: one replacement triple + one brand-new subject
    batch = spark.createDataFrame(
        [
            (victim, "ocgml:name", "renamed", "literal", None, "cityobject", "d", 0, 0),
            ("iri://new-feature/", "ocgml:id", "iri://new-feature/", "iri", None,
             "building", "d", 0, 1),
        ],
        "subj string, pred string, obj string, obj_type string, datatype string, "
        "graph string, doc_id string, span_idx int, pos int",
    )
    n_old = materialize.read_triples(spark, out).where(F.col("subj") == victim).count()
    materialize.upsert_triples(spark, batch, out, n_buckets=8, input_snapshot="v2")

    t = materialize.read_triples(spark, out)
    got = t.where(F.col("subj") == victim).collect()
    assert len(got) == 1 and got[0].obj == "renamed"  # old rows replaced
    assert t.where(F.col("subj") == "iri://new-feature/").count() == 1
    assert t.count() == total - n_old + 2
    m = materialize.read_manifest(spark, out)
    assert m.where(F.col("stage") == "upsert:v2").count() > 0
    assert m.where(F.col("stage") == "upsert-delete:v2").count() > 0


def test_compact_store(spark, triples, tmp_path_factory):
    """Upserts fragment partitions into many small files; compaction
    restores one subj-sorted file per partition with identical data, is
    manifest-tracked, resumable after a mid-run crash, and a no-op when
    nothing exceeds the threshold."""
    import os

    out = str(tmp_path_factory.mktemp("store_compact"))
    materialize.write_triples(spark, triples, out, n_buckets=8, input_snapshot="v1")
    before = materialize.read_triples(spark, out)
    # two upsert batches re-touching existing subjects -> appended files
    some = [r.subj for r in triples.select("subj").distinct().limit(6).collect()]
    for snap, subjects in (("v2", some[:3]), ("v3", some[3:])):
        batch = spark.createDataFrame(
            [(s, "ocgml:name", f"renamed_{snap}", "literal", None, "cityobject",
              "d", 0, 0) for s in subjects],
            "subj string, pred string, obj string, obj_type string, "
            "datatype string, graph string, doc_id string, span_idx int, pos int",
        )
        materialize.upsert_triples(spark, batch, out, n_buckets=8, input_snapshot=snap)
    expect = sorted(
        map(tuple, materialize.read_triples(spark, out).select(
            "subj", "pred", "obj", "graph").collect())
    )

    path = os.path.join(out, "triples")

    def file_counts():
        c = {}
        for g in os.listdir(path):
            if not g.startswith("graph="):
                continue
            for b in os.listdir(os.path.join(path, g)):
                if b.startswith("bucket="):
                    c[(g, b)] = sum(
                        1 for f in os.listdir(os.path.join(path, g, b))
                        if f.endswith(".parquet")
                    )
        return c

    assert max(file_counts().values()) > 1  # fragmentation happened

    # crash mid-compaction, then resume: finished groups are not redone
    with pytest.raises(RuntimeError):
        materialize.compact_store(spark, out, bucket_group=2, fail_after_groups=1)
    done_after_crash = materialize.read_manifest(spark, out).where(
        (F.col("stage") == "compact") & (F.col("status") == "done")
    ).count()
    assert done_after_crash == 2
    compacted = materialize.compact_store(spark, out, bucket_group=2)
    assert all(n > 1 for _, n in compacted)

    counts = file_counts()
    assert max(counts.values()) == 1  # one file per partition everywhere
    got = sorted(
        map(tuple, materialize.read_triples(spark, out).select(
            "subj", "pred", "obj", "graph").collect())
    )
    assert got == expect  # byte-identical content
    # subj-sorted within the rewritten file (row-group pruning property)
    g, b = next(iter(counts))
    fdir = os.path.join(path, g, b)
    fpath = os.path.join(fdir, next(f for f in os.listdir(fdir) if f.endswith(".parquet")))
    subs = spark.read.parquet(fpath).select("subj").toPandas()["subj"].tolist()
    assert subs == sorted(subs)
    # second run: metadata-only no-op
    assert materialize.compact_store(spark, out) == []
    # a LATER upsert re-fragments an already-compacted partition: it must
    # become eligible again (recurring maintenance, not once-per-stage)
    batch = spark.createDataFrame(
        [(some[0], "ocgml:name", "renamed_v4", "literal", None, "cityobject",
          "d", 0, 0)],
        "subj string, pred string, obj string, obj_type string, "
        "datatype string, graph string, doc_id string, span_idx int, pos int",
    )
    materialize.upsert_triples(spark, batch, out, n_buckets=8, input_snapshot="v4")
    assert max(file_counts().values()) > 1
    recompacted = materialize.compact_store(spark, out, bucket_group=2)
    assert recompacted and max(file_counts().values()) == 1
    again = sorted(
        map(tuple, materialize.read_triples(spark, out).select(
            "subj", "pred", "obj", "graph").collect())
    )
    assert ("renamed_v4" in {o for _, _, o, _ in again}) and len(again) == len(expect)


def test_compact_store_mid_commit_crash(spark, triples, tmp_path_factory):
    """A crash INSIDE the dynamic-partition-overwrite commit can leave a
    partition holding old + new files whose count is at or below the
    threshold — duplicated rows the pre-r5 file-count test accepted
    silently. The write-ahead `pending` manifest row (expected count) +
    footer audit must (a) repair the mixed state by keeping the newest
    complete file, and (b) raise on genuine row loss."""
    import os
    import shutil

    out = str(tmp_path_factory.mktemp("store_crash"))
    materialize.write_triples(spark, triples, out, n_buckets=4, input_snapshot="v1")
    subj = triples.select("subj").distinct().limit(1).collect()[0].subj
    batch = spark.createDataFrame(
        [(subj, "ocgml:name", "renamed_crash", "literal", None, "cityobject",
          "d", 0, 0)],
        "subj string, pred string, obj string, obj_type string, "
        "datatype string, graph string, doc_id string, span_idx int, pos int",
    )
    materialize.upsert_triples(spark, batch, out, n_buckets=4, input_snapshot="v2")

    path = os.path.join(out, "triples")
    # find a partition the upsert fragmented (>1 file)
    g = b = None
    for gdir in sorted(os.listdir(path)):
        if not gdir.startswith("graph="):
            continue
        for bdir in sorted(os.listdir(os.path.join(path, gdir))):
            if bdir.startswith("bucket="):
                d = os.path.join(path, gdir, bdir)
                if sum(1 for f in os.listdir(d) if f.endswith(".parquet")) > 1:
                    g, b = gdir.split("=", 1)[1], int(bdir.split("=", 1)[1])
    assert g is not None
    part_dir = os.path.join(path, f"graph={g}", f"bucket={b}")
    expected_rows = sorted(
        map(tuple, spark.read.parquet(part_dir).select("subj", "pred", "obj").collect())
    )
    expected = len(expected_rows)

    # forge the mid-commit state: the new complete single file landed but
    # the old files were never deleted (duplicated rows), and the cycle's
    # `pending` row is in the manifest with no closing `done`
    tmp = str(tmp_path_factory.mktemp("newfile"))
    spark.read.parquet(part_dir).coalesce(1).write.mode("overwrite").parquet(tmp)
    newf = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copy(os.path.join(tmp, newf), os.path.join(part_dir, "part-99999-repair.parquet"))
    materialize._append_manifest(
        spark, out, [("compact", f"{g}/{b}", "", expected, "pending", 1, 0)]
    )
    assert spark.read.parquet(part_dir).count() > expected  # duplicates live

    materialize.compact_store(spark, out, bucket_group=2)
    counts = materialize._parquet_footer_counts(part_dir)
    assert list(counts.values()) == [expected]  # repaired: one complete file
    got = sorted(
        map(tuple, spark.read.parquet(part_dir).select("subj", "pred", "obj").collect())
    )
    assert got == expected_rows
    # audited pending is closed: a fresh call is a metadata no-op
    assert materialize.compact_store(spark, out) == []

    # row-LOSS state: delete the only file, leave a dangling pending
    materialize._append_manifest(
        spark, out, [("compact", f"{g}/{b}", "", expected, "pending", 3, 0)]
    )
    os.remove(os.path.join(part_dir, next(iter(
        materialize._parquet_footer_counts(part_dir)
    ))))
    with pytest.raises(RuntimeError, match="rows"):
        materialize.compact_store(spark, out)


def test_write_triples_bulk_single_pass(spark, triples, tmp_path_factory):
    """bucket_group=None: one write job, per-bucket manifest rows from
    footer metadata, content identical to the grouped path; refuses to
    resume a partially-written stage."""
    import os

    grouped = str(tmp_path_factory.mktemp("store_grouped"))
    bulk = str(tmp_path_factory.mktemp("store_bulk"))
    materialize.write_triples(spark, triples, grouped, n_buckets=8, input_snapshot="v1")
    materialize.write_triples(
        spark, triples, bulk, n_buckets=8, input_snapshot="v1", bucket_group=None
    )
    key = ["subj", "pred", "obj", "graph"]
    a = sorted(map(tuple, materialize.read_triples(spark, grouped).select(*key).collect()))
    b = sorted(map(tuple, materialize.read_triples(spark, bulk).select(*key).collect()))
    assert a == b and a
    # manifest parity: same per-bucket done rows with identical counts
    def manifest_counts(out):
        return {
            r.partition_range: r.row_count
            for r in materialize.read_manifest(spark, out)
            .where(F.col("stage") == "materialize").collect()
        }
    assert manifest_counts(bulk) == manifest_counts(grouped)
    # a partially-written stage must refuse the bulk path
    partial = str(tmp_path_factory.mktemp("store_partial"))
    with pytest.raises(RuntimeError):
        materialize.write_triples(
            spark, triples, partial, n_buckets=8, bucket_group=2, fail_after_groups=1
        )
    with pytest.raises(ValueError, match="bulk"):
        materialize.write_triples(
            spark, triples, partial, n_buckets=8, bucket_group=None
        )
