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
