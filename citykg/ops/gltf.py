"""S8 — glTF 2.0 export (the second half of the reference's KML/COLLADA
plugin output; the reference shells out to an external collada2gltf
binary for this step — impexp-kml-collada-plugin's ColladaBundle path —
so this module is the from-scratch Spark-native replacement, not a port).

Document shape per feature: a complete, spec-valid glTF 2.0 JSON asset —
scene -> node -> mesh -> one triangles primitive, POSITION accessor
(float32 VEC3 with the REQUIRED min/max) + index accessor (uint16
SCALAR), two bufferViews over ONE buffer referenced by external uri
`<id>.bin` (positions first, 4-byte aligned by construction; indices
after). Geometry semantics mirror ops.collada: vertices are the closed
ring minus its closing repeat, triangulated as the polygon fan
(0, i, i+1).

Engine-exactness: the JSON document is assembled in ONE JVM string
Project — every number is either an integer (counts/offsets/lengths) or
an ORIGINAL '#'-literal token (the accessor min/max are the token
strings of the extremal coordinates, selected by a fold — no double
re-rendering anywhere), so a DuckDB oracle reproduces the JSON
byte-for-byte. The binary buffer itself (float32/uint16 little-endian
packing) is NOT SQL-expressible; `gltf_buffers` packs it in an
Arrow-batched kernel and tests/test_geometry.py round-trips the bytes
against the parsed coordinates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _minmax_token(t: str, axis: int, is_min: bool) -> str:
    """Spark SQL: the ORIGINAL token of the extremal coordinate on `axis`
    (0=x,1=y,2=z) of token array expr `t` — strict-compare fold, first
    occurrence wins on ties (same semantics as the DuckDB oracle's
    list_reduce)."""
    structs = (
        f"filter(transform({t}, (tok, i) -> "
        "named_struct('v', try_cast(tok as double), 't', tok, 'i', i)), "
        f"s -> s.i % 3 = {axis})"
    )
    init_v = "'Infinity'" if is_min else "'-Infinity'"
    cmp = "<" if is_min else ">"
    init = f"named_struct('v', cast({init_v} as double), 't', '', 'i', -1)"
    return f"aggregate({structs}, {init}, (acc, s) -> IF(s.v {cmp} acc.v, s, acc)).t"


def gltf_document(df: DataFrame, id_col: str, lit_col: str, out: str = "gltf") -> DataFrame:
    """Adds a complete glTF 2.0 JSON document per row (external-uri
    buffer). All byte offsets/lengths are integers derived from the
    vertex count; POSITION min/max reuse literal tokens."""
    t = f"split({lit_col}, '#')"
    npts = f"(int(size({t}) / 3) - 1)"
    n_idx = f"(3 * ({npts} - 2))"
    pos_len = f"(12 * {npts})"
    mn = [_minmax_token(t, a, True) for a in (0, 1, 2)]
    mx = [_minmax_token(t, a, False) for a in (0, 1, 2)]
    parts = [
        "'{\"asset\":{\"version\":\"2.0\",\"generator\":\"citykg\"},'",
        "'\"scene\":0,\"scenes\":[{\"nodes\":[0]}],'",
        "'\"nodes\":[{\"mesh\":0,\"name\":\"'",
        id_col,
        "'\"}],'",
        "'\"meshes\":[{\"primitives\":[{\"attributes\":{\"POSITION\":0},"
        "\"indices\":1,\"mode\":4}]}],'",
        "'\"accessors\":[{\"bufferView\":0,\"componentType\":5126,\"count\":'",
        npts,
        "',\"type\":\"VEC3\",\"min\":['",
        mn[0], "','", mn[1], "','", mn[2],
        "'],\"max\":['",
        mx[0], "','", mx[1], "','", mx[2],
        "']},{\"bufferView\":1,\"componentType\":5123,\"count\":'",
        n_idx,
        "',\"type\":\"SCALAR\"}],'",
        "'\"bufferViews\":[{\"buffer\":0,\"byteOffset\":0,\"byteLength\":'",
        pos_len,
        "',\"target\":34962},{\"buffer\":0,\"byteOffset\":'",
        pos_len,
        "',\"byteLength\":'",
        f"2 * {n_idx}",
        "',\"target\":34963}],'",
        "'\"buffers\":[{\"uri\":\"'",
        id_col,
        "'.bin\",\"byteLength\":'",
        f"{pos_len} + 2 * {n_idx}",
        "'}]}'",
    ]
    return df.withColumn(out, F.expr("concat(" + ", ".join(parts) + ")"))


def gltf_buffers(df: DataFrame, id_col: str, lit_col: str) -> DataFrame:
    """(id, bin) per feature: the packed buffer the JSON references —
    float32 little-endian positions (ring minus closing repeat) followed
    by uint16 little-endian fan indices. Arrow-batched numpy packing."""
    import numpy as np

    src = df.select(F.col(id_col).alias("id"), F.col(lit_col).alias("_lit"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid, lit in zip(pdf["id"], pdf["_lit"]):
                toks = [x for x in str(lit).split("#")]
                try:
                    vals = np.array([float(x) for x in toks], dtype=np.float64)
                except ValueError:
                    rows.append((gid, None))
                    continue
                npts = len(vals) // 3 - 1
                if npts < 3:
                    rows.append((gid, None))
                    continue
                pos = vals[: 3 * npts].astype("<f4").tobytes()
                fan = np.array(
                    [(0, i, i + 1) for i in range(1, npts - 1)], dtype="<u2"
                ).tobytes()
                rows.append((gid, pos + fan))
            yield pd.DataFrame(rows, columns=["id", "bin"])

    return src.mapInPandas(run, "id string, bin binary")


def export_gltf(df: DataFrame, id_col: str, lit_col: str, path: str) -> None:
    """Sink: one JSON line per feature to `path`/docs (assemble into
    per-feature .gltf files driver- or downstream-side) and the packed
    buffers to `path`/bin as (id, bin) parquet."""
    gltf_document(df, id_col, lit_col).select(F.col("gltf").alias("value")).write.mode(
        "overwrite"
    ).text(f"{path}/docs")
    gltf_buffers(df, id_col, lit_col).write.mode("overwrite").parquet(f"{path}/bin")
