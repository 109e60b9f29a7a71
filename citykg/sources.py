"""Source connectors (reference operators S1-S4).

The reference streams XML through a SAX chunker into a worker queue
(CityGMLReader.java:80-94) and shells out to a python splitter for 50-feature
chunks (CityImportAgent.java:304-338). In Spark both collapse into:
partitioned file scan -> mapInPandas(parse) -> docs DataFrame. Parallelism
comes from input splits, not threads; `repartition(n)` replaces the chunk
splitter when one giant file must fan out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .citygml import parse_citygml
from .schema import DOC_SCHEMA


def read_citygml(spark: SparkSession, path: str, fanout: int | None = None) -> DataFrame:
    """CityGML file(s) -> input_hint docs DataFrame.

    `wholetext` keeps one file per row; parsing runs Arrow-batched inside
    mapInPandas (S2's SAX-chunk-per-worker analog — each task parses its
    files and emits one row per cityObjectMember).
    """
    files = spark.read.text(path, wholetext=True)
    if fanout:
        files = files.repartition(fanout)

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for xml_text in pdf["value"]:
                for doc_id, spans in parse_citygml(xml_text):
                    rows.append(
                        (
                            doc_id,
                            [
                                {"kind": k, "text": t, "media_ref": m, "offset": o}
                                for k, t, m, o in spans
                            ],
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return files.mapInPandas(parse_batches, DOC_SCHEMA)


def read_docs_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Iceberg/parquet docs table scan (S5 staging analog)."""
    return spark.read.parquet(path)
