"""Storage-adapter seam for the triple store (r4 VERDICT item 6).

`materialize.py` emulates an Iceberg table with partitioned parquet +
lineage manifests because the real Iceberg runtime cannot be installed
in this environment (materialize.py:1-17). This module makes the
engine-swap surface EXPLICIT: one class — `ParquetStoreAdapter` — owns
every physical read/write the store performs, and swapping in Iceberg
means implementing the same five methods against a catalog table. The
conformance tests (tests/test_store_conformance.py) pin exactly the
semantics both implementations must share, so the swap is a conformance
run, not a leap of faith.

Mapping table (parquet emulation -> Iceberg):

| adapter method          | parquet emulation                          | Iceberg call                                  |
|-------------------------|--------------------------------------------|-----------------------------------------------|
| append(df)              | write.mode('append').partitionBy(g, b)     | df.writeTo(tbl).append()                      |
| overwrite_partitions(df)| dynamic partitionOverwriteMode + overwrite | df.writeTo(tbl).overwritePartitions()         |
| read()                  | spark.read.parquet(root/triples)           | spark.table(tbl)                              |
| list_partitions()       | driver-side directory listing              | SELECT ... FROM tbl.partitions (metadata)     |
| file_counts(graph, b)   | parquet FOOTER num_rows per file           | tbl.files metadata table (record_count)       |

Semantics the conformance suite asserts on BOTH sides of the swap:

1. append adds files only — pre-existing files stay byte-identical
   (Iceberg: a new snapshot referencing old manifests + new data files).
2. overwrite_partitions touches ONLY the partitions present in the
   incoming frame; all other partitions stay byte-identical (Iceberg:
   REPLACE of matching partition tuples in one commit).
3. partition pruning: a (graph, bucket) predicate must prune at the
   scan (PartitionFilters in the plan; Iceberg: partition-spec pruning
   via manifests) — a store read that scans every partition for a
   single-bucket lookup fails conformance.
4. commit visibility: the emulation's unit of atomicity is the
   partition directory guarded by the manifest write-ahead protocol
   (pending -> data -> verify -> done, materialize.compact_store);
   Iceberg's is the whole-table snapshot. The conformance test asserts
   the PROTOCOL (every overwrite is bracketed by pending/done with a
   verified row count), which holds trivially under snapshot isolation.
5. lineage/snapshots: per-stage manifest rows (stage, partition_range,
   row_count, status) must reconstruct what changed when — the
   emulation's `_manifest` parquet; Iceberg's snapshots + summary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetStoreAdapter:
    """The parquet emulation of the Iceberg triple table. All physical
    IO of materialize.py flows through these methods."""

    partition_cols = ("graph", "bucket")

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.root = out_dir
        self.path = os.path.join(out_dir, "triples")

    # -- writes ---------------------------------------------------------
    def append(self, df: DataFrame) -> None:
        """Add data files without touching existing ones (Iceberg:
        writeTo(...).append() — fast-append snapshot)."""
        df.write.mode("append").partitionBy(*self.partition_cols).parquet(self.path)

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Replace exactly the partitions present in `df` (Iceberg:
        writeTo(...).overwritePartitions() — dynamic REPLACE commit)."""
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*self.partition_cols).parquet(self.path)

    # -- reads ----------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    # -- metadata (Iceberg: the partitions / files metadata tables) -----
    def list_partitions(self) -> list[tuple[str, int, int]]:
        """(graph, bucket, n_files) per live partition — a metadata-only
        operation (Iceberg reads it from manifests; the emulation lists
        directories on the driver, no data IO)."""
        out: list[tuple[str, int, int]] = []
        if not os.path.exists(self.path):
            return out
        for gdir in sorted(os.listdir(self.path)):
            if not gdir.startswith("graph="):
                continue
            for bdir in sorted(os.listdir(os.path.join(self.path, gdir))):
                if not bdir.startswith("bucket="):
                    continue
                full = os.path.join(self.path, gdir, bdir)
                n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
                out.append((gdir.split("=", 1)[1], int(bdir.split("=", 1)[1]), n))
        return out

    def file_counts(self, graph: str, bucket: int) -> dict[str, int]:
        """Per-file row counts from parquet footers (Iceberg: the files
        metadata table's record_count) — no column data scanned."""
        from .materialize import _parquet_footer_counts

        return _parquet_footer_counts(
            os.path.join(self.path, f"graph={graph}", f"bucket={bucket}")
        )

    def partition_dir(self, graph: str, bucket: int) -> str:
        return os.path.join(self.path, f"graph={graph}", f"bucket={bucket}")
