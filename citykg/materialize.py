"""Stage 4 — materialize: bucketed triple-store writes with lineage
manifests and resume.

Production target is Iceberg `PARTITIONED BY (graph, bucket(N, subj))` with
snapshot-atomic appends; this sandbox has no Iceberg runtime, so the same
layout is expressed as parquet `partitionBy(graph, bucket)` where
bucket = pmod(xxhash64(subj), N) — identical co-location semantics (every
later join/agg on subj is shuffle-free within a bucket) and a drop-in swap
to `df.writeTo(tbl).append()` on a real cluster.

Resumability (north_rule): work is unit-ized by bucket. Each completed
bucket appends one manifest row (MANIFEST_SCHEMA: stage, partition_range,
row_count, status, attempt, wall_ms). `pending_buckets` anti-joins the
manifest so a re-run recomputes ONLY missing buckets — the reference's
chunk-wise agent pipeline (CityImportAgent.importChunk) with Spark tasks
instead of subprocess chains.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schema import MANIFEST_SCHEMA

DEFAULT_BUCKETS = 64


def with_bucket(triples: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return triples.withColumn(
        "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
    )


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    p = manifest_path(out_dir)
    if not os.path.exists(p) or not any(
        f.endswith(".parquet") for f in os.listdir(p)
    ):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.schema(MANIFEST_SCHEMA).parquet(p)


def completed_buckets(spark: SparkSession, out_dir: str, stage: str) -> set[int]:
    m = read_manifest(spark, out_dir)
    rows = m.where((F.col("stage") == stage) & (F.col("status") == "done")).select(
        "partition_range"
    ).collect()
    return {int(r.partition_range) for r in rows}


def _append_manifest(spark: SparkSession, out_dir: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(
        manifest_path(out_dir)
    )


def _adapter(spark: SparkSession, out_dir: str):
    """The storage seam: ALL physical triple-table IO flows through
    citykg.store.ParquetStoreAdapter — the one-class swap surface for a
    real Iceberg catalog (store.py documents the 1:1 method mapping;
    tests/test_store_conformance.py pins the shared semantics)."""
    from .store import ParquetStoreAdapter

    return ParquetStoreAdapter(spark, out_dir)


def write_triples(
    spark: SparkSession,
    triples: DataFrame,
    out_dir: str,
    stage: str = "materialize",
    n_buckets: int = DEFAULT_BUCKETS,
    input_snapshot: str = "",
    bucket_group: int = 8,
    fail_after_groups: int | None = None,
) -> None:
    """Bucketed, manifest-tracked, resumable write.

    Buckets are processed in groups of `bucket_group` (one Spark write
    each); a group commits its data THEN its manifest rows, so a crash
    between the two re-does at most one group (idempotent: the data dir
    for a bucket is overwritten on retry via dynamic partition overwrite).

    `bucket_group=None` selects the SINGLE-PASS bulk load: one write job
    over the whole frame, per-bucket manifest rows derived afterwards
    from parquet FOOTER metadata (no recompute, no cache). The grouped
    path persists the triple frame and re-reads it per group — fine when
    resume granularity matters, but at a 100 TB fresh load that cache is
    itself a corpus-sized materialization; the bulk path touches the
    data exactly once and leans on Spark task-level retry instead
    (resume granularity = the whole load: nothing is marked done until
    the one commit lands, so a crashed bulk load simply re-runs).

    `fail_after_groups` injects a crash for the resume test.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = completed_buckets(spark, out_dir, stage)
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        return
    if bucket_group is None:
        if done:
            raise ValueError(
                "single-pass bulk write cannot resume a partially-written "
                f"stage ({len(done)} buckets already done) — pass a "
                "bucket_group to finish with the grouped path"
            )
        t0 = time.time()
        adapter = _adapter(spark, out_dir)
        adapter.overwrite_partitions(
            with_bucket(triples, n_buckets).sortWithinPartitions(
                "graph", "bucket", "subj"
            )
        )
        # per-bucket row counts from footer METADATA (the Iceberg files
        # table); the data is never recomputed or re-scanned
        counts: dict[int, int] = {}
        for g, b, _ in adapter.list_partitions():
            counts[b] = counts.get(b, 0) + sum(adapter.file_counts(g, b).values())
        wall = int((time.time() - t0) * 1000)
        _append_manifest(
            spark,
            out_dir,
            [(stage, str(b), input_snapshot, counts.get(b, 0), "done", 1, wall)
             for b in range(n_buckets)],
        )
        return
    bt = with_bucket(triples, n_buckets).persist()
    try:
        groups = [todo[i : i + bucket_group] for i in range(0, len(todo), bucket_group)]
        for gi, grp in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError("injected failure for resume test")
            t0 = time.time()
            part = bt.where(F.col("bucket").isin(grp))
            # subject-sorted files: parquet row-group min/max stats on subj
            # then prune point lookups and keep equal subjects adjacent for
            # downstream merge joins — free at write time, paid back on
            # every read (Iceberg: the table's sort order spec)
            _adapter(spark, out_dir).overwrite_partitions(
                part.sortWithinPartitions("graph", "bucket", "subj")
            )
            counts = {
                int(r.bucket): r.cnt
                for r in part.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
            }
            wall = int((time.time() - t0) * 1000)
            attempt = 1
            _append_manifest(
                spark,
                out_dir,
                [
                    (stage, str(b), input_snapshot, counts.get(b, 0), "done", attempt, wall)
                    for b in grp
                ],
            )
    finally:
        bt.unpersist()


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return _adapter(spark, out_dir).read()


def upsert_triples(
    spark: SparkSession,
    triples: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    input_snapshot: str = "",
) -> None:
    """Re-import semantics (the reference's importer against an existing
    DB: a feature's new version replaces its previous rows): delete every
    subject present in the incoming batch from the store, then APPEND the
    batch as a new manifest-tracked stage keyed by the input snapshot.
    The delete rewrites only the buckets the incoming subjects hash to;
    the append adds files without touching existing ones (Iceberg:
    a DELETE + append in one transaction). The incoming subject set stays
    a DataFrame end-to-end — no driver-side collect of ids."""
    path = os.path.join(out_dir, "triples")
    subj_df = triples.select("subj").distinct()
    if os.path.exists(path):
        _delete_subjects_df(
            spark, out_dir, subj_df, n_buckets=n_buckets,
            drop_references=False, stage=f"upsert-delete:{input_snapshot}",
        )
    bt = with_bucket(triples, n_buckets)
    # keep the subject-sorted file property write_triples establishes —
    # row-group subj min/max pruning must survive upserts too
    _adapter(spark, out_dir).append(bt.sortWithinPartitions("graph", "bucket", "subj"))
    counts = bt.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    _append_manifest(
        spark,
        out_dir,
        [
            (f"upsert:{input_snapshot}", str(int(r.bucket)), input_snapshot,
             r.n, "done", 1, 0)
            for r in sorted(counts, key=lambda r: int(r.bucket))
        ],
    )


def delete_subjects(
    spark: SparkSession,
    out_dir: str,
    subjects: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    drop_references: bool = True,
    stage: str = "delete",
) -> int:
    """The reference's delete operation (impexp-core citygml/deleter:
    per-object cascade delete via DBDeleteWorker) on the bucketed store:
    remove every triple OF the given subject IRIs — and, with
    `drop_references`, every triple POINTING AT them — by rewriting ONLY
    the affected (graph, bucket) partitions. Subject bucketing makes the
    touched-partition set computable up front (partition pruning on
    write); untouched buckets keep their files byte-identical. Appends
    per-bucket manifest rows so the deletion is lineage-tracked like any
    other stage. Returns the number of rows removed.

    (On Iceberg this is `DELETE FROM ... WHERE subj IN (...)` with
    merge-on-read delete files; the parquet emulation rewrites the pruned
    partition set and clears partitions that become empty.)
    """
    return _delete_subjects_df(
        spark,
        out_dir,
        spark.createDataFrame([(s,) for s in subjects], "subj string"),
        n_buckets=n_buckets,
        drop_references=drop_references,
        stage=stage,
    )


def _delete_subjects_df(
    spark: SparkSession,
    out_dir: str,
    subj_df: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    drop_references: bool = True,
    stage: str = "delete",
) -> int:
    """DataFrame-core of delete_subjects — the subject set never passes
    through the driver. The anti-joins carry NO broadcast hint: the
    checkpointed subject set has accurate size stats, so the planner
    broadcasts it when it fits and falls back to a shuffle join when a
    100 TB-scale delete batch doesn't (a mandatory hint would OOM there)."""
    path = os.path.join(out_dir, "triples")
    subj_df = subj_df.select("subj").distinct().localCheckpoint(eager=True)
    t = read_triples(spark, out_dir)
    affected = with_bucket(subj_df, n_buckets).select("bucket").distinct()
    if drop_references:
        refs = t.join(
            subj_df.withColumnRenamed("subj", "obj"), "obj"
        ).select("bucket").distinct()
        affected = affected.union(refs).distinct()
    buckets = sorted(r.bucket for r in affected.collect())
    if not buckets:
        return 0

    part = t.where(F.col("bucket").isin(buckets))
    before = {
        (r.graph, r.bucket): r.n
        for r in part.groupBy("graph", "bucket").agg(F.count("*").alias("n")).collect()
    }
    keep = part.join(subj_df, "subj", "left_anti")
    if drop_references:
        keep = keep.join(
            subj_df.withColumnRenamed("subj", "obj"), "obj", "left_anti"
        )
    # materialize the survivor set BEFORE touching the files it reads from
    # (the overwrite would otherwise invalidate the lazy plan's file list)
    keep = keep.select(*[c for c in t.columns]).localCheckpoint(eager=True)
    after = {
        (r.graph, r.bucket): r.n
        for r in keep.groupBy("graph", "bucket").agg(F.count("*").alias("n")).collect()
    }
    _adapter(spark, out_dir).overwrite_partitions(
        keep.sortWithinPartitions("graph", "bucket", "subj")
    )
    # dynamic overwrite only replaces partitions present in `keep`; a
    # partition whose rows ALL died must be cleared explicitly (Iceberg's
    # snapshot delete would handle this natively)
    import shutil

    for (graph, bucket), n in before.items():
        if (graph, bucket) not in after:
            d = os.path.join(path, f"graph={graph}", f"bucket={bucket}")
            if os.path.exists(d):
                shutil.rmtree(d)
    removed_per_bucket: dict[int, int] = {}
    for (graph, bucket), n in before.items():
        removed_per_bucket[bucket] = removed_per_bucket.get(bucket, 0) + n - after.get(
            (graph, bucket), 0
        )
    _append_manifest(
        spark,
        out_dir,
        [
            (stage, str(b), "", removed, "done", 1, 0)
            for b, removed in sorted(removed_per_bucket.items())
        ],
    )
    return sum(removed_per_bucket.values())


def compact_store(
    spark: SparkSession,
    out_dir: str,
    stage: str = "compact",
    max_files_per_partition: int = 1,
    bucket_group: int = 16,
    fail_after_groups: int | None = None,
) -> list[tuple[str, int]]:
    """Small-file compaction (Iceberg `rewrite_data_files` with the
    table's sort order, binpack-to-one): every upsert appends files, so a
    hot (graph, bucket) partition accumulates many small sorted files —
    each individually subj-sorted, but the scan pays per-file open cost
    and row-group pruning fragments. Compaction rewrites only partitions
    whose file count exceeds `max_files_per_partition`, restoring ONE
    subj-sorted file per partition.

    Scale posture: the needs-compaction decision is a metadata-only
    listing (Iceberg reads it from manifests; the parquet emulation lists
    partition dirs on the driver — no data is read). The rewrite itself
    is `repartition(graph, bucket)` so each partition lands wholly in one
    task -> one output file, with dynamic partition overwrite touching
    ONLY the compacted partitions. Processed in groups; resume after a
    mid-run crash needs no manifest consultation for the COMMON cases
    because it is decided by PHYSICAL state: a group whose overwrite
    committed leaves exactly one file per partition, so the file-count
    test alone excludes it, while a group that crashed pre-commit still
    exceeds the threshold and is redone (idempotent rewrite). Crucially
    this also means a partition re-fragmented by LATER upserts becomes
    eligible again — compaction is recurring maintenance, not
    once-per-stage-name.

    Crash-INSIDE-the-commit guard: dynamic partition overwrite in the
    parquet emulation is delete-then-rename, so a crash mid-commit can
    leave a partition holding a MIX of old and new files whose count
    lands at or below the threshold — duplicated rows the file-count
    test alone would accept. Each group therefore appends `pending`
    manifest rows carrying the EXPECTED per-partition row count before
    the overwrite, verifies the physical state (exactly one file whose
    parquet-footer row count equals the expected count — a metadata
    read, no data scan) before appending `done`, and on entry audits any
    `pending` without a matching `done`: a verified partition is closed,
    a mixed partition is REPAIRED by keeping the newest single file
    whose footer count equals the expected count and deleting the stale
    pre-compaction files, an intact pre-commit partition is re-queued,
    and genuine row loss (the delete won but the rename lost — the one
    state the emulation cannot undo; Iceberg's atomic snapshot commit
    exists precisely to make it unreachable) raises instead of passing
    silently. (`fail_after_groups` injects the crash for the resume
    test.) Returns the compacted (graph/bucket, n_files) list."""
    path = os.path.join(out_dir, "triples")
    adapter = _adapter(spark, out_dir)
    forced = _audit_pending_compactions(spark, out_dir, stage, path)
    todo: list[tuple[str, int, int]] = [
        (g, b, n)
        for g, b, n in adapter.list_partitions()
        if n > max_files_per_partition or (g, b) in forced
    ]
    if not todo:
        return []
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    compacted: list[tuple[str, int]] = []
    groups = [todo[i : i + bucket_group] for i in range(0, len(todo), bucket_group)]
    for gi, grp in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError("injected failure for compaction resume test")
        t0 = time.time()
        keys = {(g, b) for g, b, _ in grp}
        # group predicate as an OR-chain of per-column equality
        # conjunctions: the canonical partition-filter shape every Spark
        # version turns into PartitionFilters. (Spark 4.1 also prunes the
        # struct(graph, bucket).isin([...]) spelling this replaced —
        # probe-verified — but struct-isin pruning is newer and less
        # portable; the explicit conjunction shape is the one the
        # conformance suite pins.)
        pred = None
        for g, b in sorted(keys):
            term = (F.col("graph") == g) & (F.col("bucket") == b)
            pred = term if pred is None else (pred | term)
        part = (
            read_triples(spark, out_dir)
            .where(pred)
            .repartition("graph", "bucket")
            .sortWithinPartitions("graph", "bucket", "subj")
            # materialize BEFORE the overwrite: the rewrite reads the very
            # files dynamic overwrite will delete (Iceberg's snapshot
            # isolation gives this for free; the parquet emulation pins the
            # group in executor memory first)
            .localCheckpoint(eager=True)
        )
        # expected per-partition row counts from the pinned frame — the
        # write-ahead record the post-commit verify and any future resume
        # audit check the physical state against
        expected = {
            (r.graph, int(r.bucket)): int(r.cnt)
            for r in part.groupBy("graph", "bucket").agg(F.count("*").alias("cnt")).collect()
        }
        _append_manifest(
            spark,
            out_dir,
            [(stage, f"{g}/{b}", "", expected.get((g, b), 0), "pending", 1, 0)
             for g, b, _ in grp],
        )
        _adapter(spark, out_dir).overwrite_partitions(part)
        for g, b, _ in grp:
            counts = _parquet_footer_counts(os.path.join(path, f"graph={g}", f"bucket={b}"))
            if len(counts) != 1 or next(iter(counts.values())) != expected.get((g, b), 0):
                raise RuntimeError(
                    f"compaction verify failed for graph={g}/bucket={b}: "
                    f"files={counts}, expected one file of {expected.get((g, b), 0)} rows"
                )
        wall = int((time.time() - t0) * 1000)
        _append_manifest(
            spark,
            out_dir,
            [(stage, f"{g}/{b}", "", expected.get((g, b), 0), "done", 1, wall)
             for g, b, _ in grp],
        )
        compacted.extend((f"{g}/{b}", n) for g, b, n in grp)
    return compacted


def _parquet_footer_counts(part_dir: str) -> dict[str, int]:
    """Per-file row counts from parquet FOOTER metadata — a pure
    metadata read (no column data is scanned), the emulation analog of
    Iceberg's per-data-file record_count manifest field."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    if not os.path.isdir(part_dir):
        return out
    for f in sorted(os.listdir(part_dir)):
        if f.endswith(".parquet"):
            out[f] = pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
    return out


def _audit_pending_compactions(
    spark: SparkSession, out_dir: str, stage: str, path: str
) -> set[tuple[str, int]]:
    """Resume-time audit of compaction groups that appended `pending`
    but never reached `done` (crash inside or just after the overwrite
    commit). Per outstanding partition, decide from physical state +
    the recorded expected row count:

    - exactly one file with the expected rows -> the commit completed,
      only the manifest append was lost: close it with a `done` row;
    - several files where the NEWEST file alone holds the expected rows
      -> mixed old+new state (the mid-commit duplicate window): repair
      by deleting every other file, then close;
    - files summing to the expected rows with no complete single file
      -> the overwrite never started deleting; intact pre-commit state:
      re-queue for compaction (returned as forced keys);
    - anything else -> rows were lost mid-rename; raise. Restore the
      partition from the upstream stage (re-run the upsert batches) —
      this is the non-atomic window the parquet emulation documents and
      a real Iceberg commit removes.

    Counting `pending` vs closing (`done` | `failed`) rows per
    partition_range (instead of ordering manifest rows) keeps the check
    append-order-independent: every cycle contributes one pending and
    one closure (`failed` closes a crashed-pre-commit pending whose
    partition is simply re-queued)."""
    m = read_manifest(spark, out_dir)
    rows = m.where(F.col("stage") == stage).select(
        "partition_range", "status", "row_count"
    ).collect()
    n_pending: dict[str, int] = {}
    n_done: dict[str, int] = {}
    exp: dict[str, set] = {}
    for r in rows:
        if r.status == "pending":
            n_pending[r.partition_range] = n_pending.get(r.partition_range, 0) + 1
            # several cycles can each leave a pending row for this
            # partition (upserts between cycles change the expected
            # count): keep the SET — the physical state decides which
            # cycle's expectation it matches
            exp.setdefault(r.partition_range, set()).add(int(r.row_count))
        elif r.status in ("done", "failed") and "/" in r.partition_range:
            n_done[r.partition_range] = n_done.get(r.partition_range, 0) + 1
    forced: set[tuple[str, int]] = set()
    closures: list[tuple] = []
    for pr, np_ in sorted(n_pending.items()):
        if np_ <= n_done.get(pr, 0):
            continue
        g, b = pr.split("/", 1)
        part_dir = os.path.join(path, f"graph={g}", f"bucket={b}")
        counts = _parquet_footer_counts(part_dir)
        expecteds = exp[pr]
        single_ok = len(counts) == 1 and next(iter(counts.values())) in expecteds
        if single_ok:
            closures.append((stage, pr, "", next(iter(counts.values())), "done", 2, 0))
            continue
        complete = [f for f, n in counts.items() if n in expecteds]
        if complete:
            keep = max(
                complete, key=lambda f: os.path.getmtime(os.path.join(part_dir, f))
            )
            for f in counts:
                if f != keep:
                    os.remove(os.path.join(part_dir, f))
            closures.append((stage, pr, "", counts[keep], "done", 2, 0))
        elif sum(counts.values()) in expecteds:
            # intact pre-commit state: close the dangling pending with a
            # `failed` lineage row and re-queue the partition
            closures.append((stage, pr, "", sum(counts.values()), "failed", 2, 0))
            forced.add((g, int(b)))
        else:
            raise RuntimeError(
                f"compaction crash corrupted graph={g}/bucket={b}: files hold "
                f"{sum(counts.values())} rows, manifest expected one of "
                f"{sorted(expecteds)}; rows were lost mid-commit — restore the "
                f"partition from the upstream stage (re-run its upsert batches) "
                f"before compacting again"
            )
    if closures:
        _append_manifest(spark, out_dir, closures)
    return forced


def stage_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-stage rollup of the lineage manifest — the operator a resume
    coordinator or progress dashboard reads: (stage, n_partitions, rows,
    total_wall_ms, max_attempt, complete). One tiny-table aggregate."""
    from pyspark.sql import Window

    m = read_manifest(spark, out_dir)
    # a partition_range can carry several manifest rows for one stage
    # (retries, or two delete ops sharing the default stage name): reduce
    # to the LATEST attempt per (stage, partition_range) first, else a
    # doubly-reported partition masks a missing one and rows/wall double-count
    latest = (
        m.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("stage", "partition_range").orderBy(
                    F.col("attempt").desc(),
                    # explicit rank: a closure outranks its write-ahead
                    # 'pending' record, and 'done' outranks 'failed'
                    F.when(F.col("status") == "done", 2)
                    .when(F.col("status") == "failed", 1)
                    .otherwise(0)
                    .desc(),
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.groupBy("stage").agg(
        F.countDistinct("partition_range").alias("n_partitions"),
        F.sum("row_count").alias("rows"),
        F.sum("wall_ms").alias("total_wall_ms"),
        F.max("attempt").alias("max_attempt"),
        (
            F.countDistinct(F.when(F.col("status") == "done", F.col("partition_range")))
            == F.countDistinct("partition_range")
        ).alias("complete"),
    )


def write_geometry_datatype_registry(spark: SparkSession, triples: DataFrame, out_dir: str) -> None:
    """The Blazegraph geo-datatype config side-channel
    (BlazegraphConfigBuilder.java:40-77) as a small metadata table of
    observed geometry literal shapes."""
    (
        triples.where(F.col("datatype").isNotNull())
        .select("datatype")
        .distinct()
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "_geometry_datatypes"))
    )


def nquads_lines(triples: DataFrame, base: str | None = None) -> DataFrame:
    """S6: render triples as N-Quads lines (NquadsExporterTask.java:93-123;
    graph IRI = <base>/<graph>/ per the named-graph layout,
    SchemaManagerAdapter.java:168-181). Literal escaping follows the
    N-Triples grammar for the characters that can occur in our values
    (backslash first, then quote, LF, CR, TAB). Returns the input columns
    plus `line`; everything is one JVM-side Project (zero shuffles)."""
    from .vocab import DEFAULT_BASE, OCGML

    base = base or DEFAULT_BASE

    def esc(c):
        for search, repl in (
            ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")
        ):
            c = F.replace(c, F.lit(search), F.lit(repl))
        return c

    # ocgml: CURIEs expand against the ontology IRI; full-IRI predicates
    # (e.g. TBox triples from owlconvert) pass through unchanged
    pred_iri = F.when(
        F.col("pred").startswith("ocgml:"),
        F.concat(F.lit(OCGML), F.expr("substring(pred, 7)")),
    ).otherwise(F.col("pred"))
    line = F.concat(
        F.lit("<"), F.col("subj"), F.lit("> <"),
        pred_iri, F.lit("> "),
        F.when(F.col("obj_type") == "iri", F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
        .otherwise(
            F.concat(
                F.lit('"'), esc(F.col("obj")), F.lit('"'),
                F.when(
                    F.col("datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("datatype"), F.lit(">")),
                ).otherwise(F.lit("")),
            )
        ),
        F.lit(" <"), F.lit(base + "/"), F.col("graph"), F.lit("/> ."),
    )
    return triples.withColumn("line", line)


def export_nquads(triples: DataFrame, path: str, base: str | None = None) -> None:
    """S6 N-Quads export sink: formatted lines to text files (the .gz
    compression the reference applies is a codec option on a cluster)."""
    nquads_lines(triples, base).select(F.col("line").alias("value")).write.mode(
        "overwrite"
    ).text(path)


def turtle_blocks(triples: DataFrame, base: str | None = None) -> DataFrame:
    """Turtle rendering with same-subject grouping — the other RDF text
    serialization the exporter family offers next to N-Quads
    (NquadsExporterTask.java:93-123 is the line-per-statement form; Turtle
    is the predicate-list form of the same statements, W3C Turtle
    grammar `predicateObjectList`). One block per (graph, subj):

      <s> ocgml:p1 "v1" ;
          ocgml:p2 <iri2> .

    Predicates render as `ocgml:` CURIEs (the `@prefix` header is the
    reader-side contract, one constant line the writer prepends per
    file); objects follow the same IRI / escaped-literal / `^^`datatype
    rules as nquads_lines. Determinism: the predicate-object list sorts
    by (pred, rendered object) via array_sort on structs, so the block
    text is partition-order independent. Plan: one JVM Project to render
    each statement fragment, ONE map-side-combinable collect_list
    aggregate per (graph, subj), then a pure Project concatenates the
    block — no window, no driver collect; at 100 TB the aggregate
    partitions by subject hash exactly like the store layout, so the
    shuffle is the same one the bucketed write already pays."""
    from .vocab import OCGML

    def esc(c):
        for search, repl in (
            ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")
        ):
            c = F.replace(c, F.lit(search), F.lit(repl))
        return c

    # Rendering happens AFTER the aggregate: the pre-shuffle Project adds
    # only a raw 4-field struct to the extract stage (whose template
    # expression is already near janino's method-size ceiling — fusing
    # the concat/escape chain there pushes the generated processNext()
    # past it and the whole stage falls back to interpreted mode, extract
    # included). Post-shuffle, the per-subject lists are small and the
    # render runs once per statement inside two HOF lambdas.
    po = triples.select(
        "graph",
        "subj",
        F.struct("pred", "obj", "obj_type", "datatype").alias("po"),
    )
    agg = po.groupBy("graph", "subj").agg(F.collect_list("po").alias("raw"))
    esc_sql = "replace(replace(replace(replace(replace(e.obj, "
    esc_sql += "chr(92), concat(chr(92), chr(92))), "
    esc_sql += "'\"', concat(chr(92), '\"')), "
    esc_sql += "chr(10), concat(chr(92), 'n')), "
    esc_sql += "chr(13), concat(chr(92), 'r')), "
    esc_sql += "chr(9), concat(chr(92), 't'))"
    p_sql = (
        "CASE WHEN e.pred LIKE 'ocgml:%' THEN e.pred "
        "ELSE concat('<', e.pred, '>') END"
    )
    o_sql = (
        "CASE WHEN e.obj_type = 'iri' THEN concat('<', e.obj, '>') "
        f"ELSE concat('\"', {esc_sql}, '\"', "
        "CASE WHEN e.datatype IS NOT NULL "
        "THEN concat('^^<', e.datatype, '>') ELSE '' END) END"
    )
    rendered = agg.withColumn(
        "pos",
        F.expr(
            f"array_sort(transform(raw, e -> struct({p_sql} as p, {o_sql} as o)))"
        ),
    )
    block = F.concat(
        F.lit("<"), F.col("subj"), F.lit("> "),
        F.array_join(
            F.expr("transform(pos, e -> concat(e.p, ' ', e.o))"),
            " ;\n    ",
        ),
        F.lit(" ."),
    )
    return rendered.select(
        "graph",
        "subj",
        F.size("pos").cast("bigint").alias("n_statements"),
        block.alias("block"),
    )
