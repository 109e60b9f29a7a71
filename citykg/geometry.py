"""Geometry literal codec — the reference's one custom datatype.

Reproduces GeometryConverterAdapter.getDatabaseObject
(/root/reference/impexp-core/src/main/java/org/citydb/database/adapter/
blazegraph/GeometryConverterAdapter.java:256-288):

* lexical form: all coordinates of all rings, '#'-separated, trailing '#'
  stripped; each double rendered Java-Double.toString-style
* datatype URI: BASE_URL_LITERALS + <GEOMTYPE>-<dim>-<len(ring0)>[-<len(ring1)>...]

and the 5-point envelope-ring convention (DBCityObject.java:316-331):
bbox (x0,y0,z0, x1,y1,z1) ->
ring (x0,y0,z0),(x1,y0,z0),(x1,y1,z1),(x0,y1,z1),(x0,y0,z0).

The decode contract mirrors GeoSpatialProcessor.GeomDataType
(GeoSpatialProcessor.java:26-43): split value on '#', datatype suffix on '-'.

These helpers run driver-side / in tests and inside Arrow batches. The hot
extraction path never re-encodes: spans carry literals pre-encoded by the
reader (citygml.py) or synthesizer, so the pipeline stays JVM-side.
"""

from __future__ import annotations

import math

from .vocab import BASE_URL_LITERALS


def fmt_double(v: float) -> str:
    """Java Double.toString-compatible rendering for the common range.

    Java prints the shortest decimal that round-trips, always with a
    decimal point (384000.0 -> "384000.0"), scientific notation only
    outside [1e-3, 1e7). Python's repr matches on the shortest-decimal
    part; we add the exponent-range handling.
    """
    if v != v or math.isinf(v):  # NaN/Inf
        return str(v)
    a = abs(v)
    if a != 0 and (a < 1e-3 or a >= 1e7):
        s = repr(v)
        if "e" in s or "E" in s:
            mant, exp = s.split("e")
            if "." not in mant:
                mant += ".0"
            return f"{mant}E{int(exp)}"
        # repr stayed positional; build Java's E-notation by shifting the
        # decimal point in repr's digit string — never re-derive the
        # mantissa with float arithmetic (that loses the last ulp and
        # breaks shortest-roundtrip).
        neg = s.startswith("-")
        if neg:
            s = s[1:]
        int_part, _, frac_part = s.partition(".")
        digits = int_part + frac_part
        first = next(i for i, c in enumerate(digits) if c != "0")
        exp = len(int_part) - 1 - first
        mant_digits = digits[first:].rstrip("0") or "0"
        ms = mant_digits[0] + "." + (mant_digits[1:] or "0")
        return f"{'-' if neg else ''}{ms}E{exp}"
    s = repr(float(v))
    return s


def encode_rings(geom_type: str, rings: list[list[float]], dim: int = 3) -> tuple[str, str]:
    """(lexical, datatype_uri) for a ring list, ref-exact.

    `rings` is a list of flat coordinate arrays (the reference's
    double[][] coordinates).
    """
    lens = "-".join(str(len(r)) for r in rings)
    datatype = f"{BASE_URL_LITERALS}{geom_type}-{dim}-{lens}"
    lexical = "#".join(fmt_double(v) for ring in rings for v in ring)
    return lexical, datatype


def decode_literal(lexical: str, datatype_uri: str) -> tuple[str, int, list[list[float]]]:
    """Inverse of encode_rings (GeometryType.java:73-81 contract)."""
    suffix = datatype_uri.rsplit("/", 1)[-1]
    parts = suffix.split("-")
    geom_type = parts[0]
    dim = int(parts[1])
    ring_lens = [int(x) for x in parts[2:]]
    flat = [float(x) for x in lexical.split("#")]
    rings, i = [], 0
    for n in ring_lens:
        rings.append(flat[i : i + n])
        i += n
    return geom_type, dim, rings


def envelope_ring(x0: float, y0: float, z0: float, x1: float, y1: float, z1: float) -> list[float]:
    """5-point closed bbox ring (DBCityObject.java:324-331)."""
    return [x0, y0, z0, x1, y0, z0, x1, y1, z1, x0, y1, z1, x0, y0, z0]


def encode_envelope(x0, y0, z0, x1, y1, z1) -> tuple[str, str]:
    """Envelope as POLYGON-3-15 literal (DBCityObject.java:316-333)."""
    return encode_rings("POLYGON", [envelope_ring(x0, y0, z0, x1, y1, z1)], 3)


def compute_bounds(rings: list[list[float]], dim: int = 3) -> tuple[float, ...]:
    """Min/max fold over coordinates (EnvelopeType.computeBounds:35-50)."""
    xs, ys, zs = [], [], []
    for ring in rings:
        for i in range(0, len(ring) - dim + 1, dim):
            xs.append(ring[i])
            ys.append(ring[i + 1])
            if dim > 2:
                zs.append(ring[i + 2])
    if dim > 2:
        return min(xs), min(ys), min(zs), max(xs), max(ys), max(zs)
    return min(xs), min(ys), max(xs), max(ys)


def centroid(rings: list[list[float]], dim: int = 3) -> tuple[float, ...]:
    """Unweighted vertex centroid (GeometryType.computeCentroid:139-167)."""
    n = 0
    acc = [0.0] * dim
    for ring in rings:
        for i in range(0, len(ring) - dim + 1, dim):
            for d in range(dim):
                acc[d] += ring[i + d]
            n += 1
    return tuple(a / n for a in acc)
