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


def docs_from_text(files: DataFrame, parse_fn, errors: str = "keep") -> DataFrame:
    """Text rows (`value` column) -> docs DataFrame via an Arrow-batched
    parser (parse_fn: text -> [(doc_id, spans)]). The shared execution
    shape of S2/S3: each task parses its rows and emits one doc row per
    feature; parallelism comes from input splits.

    Web-scale robustness: a malformed input must fail THAT input, never
    the job. errors='keep' (default) emits one reject row per failed text
    — doc_id `_reject_<sha1(text)[:16]>` with a single `_error` span
    carrying the exception — so rejects are countable/auditable lineage
    (split them off with `where(spans[0].kind != '_error')`).
    errors='skip' drops them silently; errors='raise' propagates (tests).
    """

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                try:
                    parsed = parse_fn(text)
                except Exception as e:  # noqa: BLE001 — reject, don't kill the task
                    if errors == "raise":
                        raise
                    if errors == "keep":
                        h = hashlib.sha1((text or "")[:4096].encode("utf-8", "replace")).hexdigest()[:16]
                        rows.append(
                            (
                                f"_reject_{h}",
                                [{"kind": "_error", "text": f"{type(e).__name__}: {e}"[:500],
                                  "media_ref": "", "offset": 0}],
                            )
                        )
                    continue
                for doc_id, spans in parsed:
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


def validate_docs(files: DataFrame, parse_fn) -> DataFrame:
    """The reference's standalone validate operation (citygml/validator
    Validator + ValidationErrorHandler: per-file schema check and error
    report, no DB writes): parse every input, report one row per input —
    (input_id, ok, n_features, error). input_id = md5 of the text so the
    report joins back to any engine's view of the same inputs; the error
    column carries the parser's message (engine-specific, excluded from
    cross-engine comparisons)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                h = hashlib.md5((text or "").encode("utf-8", "replace")).hexdigest()
                try:
                    parsed = parse_fn(text)
                    rows.append((h, True, len(parsed), None))
                except Exception as e:  # noqa: BLE001 — report, don't kill the task
                    rows.append((h, False, 0, f"{type(e).__name__}: {e}"[:500]))
            yield pd.DataFrame(
                rows, columns=["input_id", "ok", "n_features", "error"]
            )

    return files.mapInPandas(
        run, "input_id string, ok boolean, n_features int, error string"
    )


def split_rejects(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_docs, rejects) from a docs_from_text(errors='keep') frame."""
    is_reject = "size(spans) = 1 AND spans[0].kind = '_error'"
    return docs.where(f"NOT ({is_reject})"), docs.where(is_reject)


def read_citygml(spark: SparkSession, path: str, fanout: int | None = None) -> DataFrame:
    """CityGML file(s) -> input_hint docs DataFrame (S2).

    `wholetext` keeps one file per row; parsing runs Arrow-batched inside
    mapInPandas (S2's SAX-chunk-per-worker analog — each task parses its
    files and emits one row per cityObjectMember).
    """
    files = spark.read.text(path, wholetext=True)
    if fanout:
        files = files.repartition(fanout)
    return docs_from_text(files, parse_citygml)


def read_cityjson(spark: SparkSession, path: str, fanout: int | None = None) -> DataFrame:
    """CityJSON file(s) -> input_hint docs DataFrame (S3). Same shape and
    execution pattern as read_citygml: wholetext scan, Arrow-batched parse."""
    from .cityjson import parse_cityjson

    files = spark.read.text(path, wholetext=True)
    if fanout:
        files = files.repartition(fanout)
    return docs_from_text(files, parse_cityjson)


def read_docs_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Iceberg/parquet docs table scan (S5 staging analog)."""
    return spark.read.parquet(path)
