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
