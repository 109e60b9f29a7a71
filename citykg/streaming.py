"""Structured Streaming ingestion (the reference's file-watcher agent,
CityImportAgent.listenToImport:238-264, re-expressed as a readStream).

The reference polls a directory and kicks a chunk pipeline per file; in
Spark that is exactly `readStream` over the landing directory with the SAME
batch extraction plan applied per micro-batch, checkpointed so restarts
resume at the last committed batch — the streaming twin of the manifest
resume in materialize.py.

Trigger.AvailableNow drains the backlog and stops (the agent's
one-shot import); omit for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .extract import extract_triples
from .schema import DOC_SCHEMA
from .vocab import DEFAULT_BASE


def stream_windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window_dur: str = "10 minutes",
    watermark_dur: str = "30 minutes",
) -> DataFrame:
    """Watermarked event-time windowed counts (late data beyond
    `watermark_dur` is dropped; a window emits once the watermark passes
    its end — the standard Structured Streaming pattern for the
    reference's per-type import counters, DBImportWorker.updateImportContext,
    under continuous arrival)."""
    from pyspark.sql import functions as F

    # event-time columns must be TIMESTAMP (watermarks reject NTZ)
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark_dur)
        .groupBy(F.window(ts_col, window_dur).alias("win"), F.col(key_col))
        .count()
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "count",
        )
    )


def stream_dedup_first_seen(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Streaming UID-cache dedup (L1, UIDCache.lookupAndPut:80-100 as a
    stateful operator): per key, emit ONLY the first row ever seen across
    all micro-batches; later occurrences are swallowed. State is one flag
    per key, partitioned by the key — the exact semantics of the
    reference's in-memory gmlId cache, with Spark's state store standing
    in for the cache-table spill (L2)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream_df.schema

    def first_only(key, pdfs, state):
        if state.exists:
            for _ in pdfs:
                pass
            return
        state.update((1,))
        for pdf in pdfs:
            if len(pdf):
                yield pdf.head(1)
                break
        for _ in pdfs:
            pass

    return stream_df.groupBy(key_col).applyInPandasWithState(
        first_only, out_schema, "seen int", "append", GroupStateTimeout.NoTimeout
    )


def stream_docs(spark: SparkSession, landing_dir: str, max_files_per_batch: int = 64) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(landing_dir)
    )


def stream_extract_to_store(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    base: str = DEFAULT_BASE,
    available_now: bool = True,
):
    """landing docs parquet -> streaming triple extraction -> parquet sink.
    Returns the StreamingQuery (caller awaits termination)."""
    docs = stream_docs(spark, landing_dir)
    triples = extract_triples(spark, docs, base=base)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_canonicalize(
    spark: SparkSession,
    landing_dir: str,
    registry_dir: str,
    checkpoint_dir: str,
    groups_fn,
    available_now: bool = True,
    max_files_per_batch: int = 64,
):
    """Streaming canonicalization: maintain the canonical-entity registry
    ACROSS micro-batches with canon.incremental_components — the streaming
    twin of the batch CC stage, and the shape a 10^12-doc deployment
    actually runs (per-batch global CC is unaffordable; folding each batch
    into the registry is O(batch + touched components)).

    Per micro-batch (foreachBatch, exactly-once via the checkpointed
    batch id + idempotent overwrite):
      1. `groups_fn(batch_docs) -> (entity_id, member)` — the caller's
         linking step (mentions joined to the gazetteer).
      2. bridge the batch to history: union the registry-side per-entity
         anchors (min member per entity, kept in `<registry_dir>/hubs`)
         so a known entity's new mentions connect to its existing
         component, then star-compress to edges.
      3. `incremental_components(registry, edges)` -> overwrite the
         registry + refreshed hubs.

    The registry lives as parquet (`<registry_dir>/labels`): (id,
    component). Overwrite-per-batch is the sandbox stand-in for an
    Iceberg MERGE; the write is deterministic, so replaying a batch after
    a crash converges to the same registry (resume-safe)."""
    import os

    from pyspark.sql import functions as F

    from . import canon

    labels_path = os.path.join(registry_dir, "labels")
    hubs_path = os.path.join(registry_dir, "hubs")

    def fold_batch(batch_docs: DataFrame, batch_id: int) -> None:
        groups = groups_fn(batch_docs).localCheckpoint(eager=True)
        if groups.isEmpty():
            return
        sp = groups.sparkSession
        if os.path.exists(labels_path):
            registry = sp.read.parquet(labels_path).localCheckpoint(eager=True)
            hubs = sp.read.parquet(hubs_path)
            bridged = groups.unionByName(
                hubs.select("entity_id", F.col("hub").alias("member"))
            )
            edges = canon.same_as_edges(bridged, "entity_id", "member")
            labels = canon.incremental_components(registry, edges)
        else:
            edges = canon.same_as_edges(groups, "entity_id", "member")
            labels = canon.connected_components(edges)
        labels = labels.localCheckpoint(eager=True)
        new_hubs = groups.groupBy("entity_id").agg(F.min("member").alias("hub"))
        if os.path.exists(hubs_path):
            old = sp.read.parquet(hubs_path).localCheckpoint(eager=True)
            new_hubs = (
                old.unionByName(new_hubs)
                .groupBy("entity_id")
                .agg(F.min("hub").alias("hub"))
            )
            new_hubs = new_hubs.localCheckpoint(eager=True)
        labels.write.mode("overwrite").parquet(labels_path)
        new_hubs.write.mode("overwrite").parquet(hubs_path)

    docs = stream_docs(spark, landing_dir, max_files_per_batch)
    writer = docs.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
