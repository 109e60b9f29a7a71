"""Geometry literal codec tests (GeometryConverterAdapter semantics)."""

from citykg.geometry import (
    centroid,
    compute_bounds,
    decode_literal,
    encode_envelope,
    encode_rings,
    fmt_double,
)
from citykg.vocab import BASE_URL_LITERALS


def test_fmt_double_java_style():
    assert fmt_double(384917.886) == "384917.886"
    assert fmt_double(32.06) == "32.06"
    assert fmt_double(384000.0) == "384000.0"  # Java keeps the .0
    assert fmt_double(0.5) == "0.5"
    assert fmt_double(-41.98) == "-41.98"
    assert fmt_double(1e7) == "1.0E7"
    assert fmt_double(0.0001) == "1.0E-4"


def test_encode_single_ring():
    ring = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
    lex, dt = encode_rings("POLYGON", [ring], 3)
    assert dt == BASE_URL_LITERALS + "POLYGON-3-15"
    assert lex == "#".join(fmt_double(v) for v in ring)
    assert not lex.endswith("#")  # trailing '#' stripped (line 280)


def test_encode_multi_ring_datatype_suffix():
    ext = [0.0] * 24
    hole1 = [1.0] * 15
    hole2 = [2.0] * 15
    _, dt = encode_rings("POLYGON", [ext, hole1, hole2], 3)
    # exterior + 2 interior rings -> POLYGON-3-24-15-15 (SURVEY §1.3)
    assert dt == BASE_URL_LITERALS + "POLYGON-3-24-15-15"


def test_decode_roundtrip():
    rings = [[1.5, 2.5, 3.5, 4.5, 5.5, 6.5], [7.0, 8.0, 9.0]]
    lex, dt = encode_rings("POLYGON", rings, 3)
    gt, dim, back = decode_literal(lex, dt)
    assert gt == "POLYGON" and dim == 3 and back == rings


def test_envelope_ring_convention():
    # DBCityObject.java:324-331 corner order
    lex, dt = encode_envelope(384917.886, 5823073.597, 32.06, 384926.869, 5823082.135, 36.563)
    assert dt.endswith("POLYGON-3-15")
    assert lex == (
        "384917.886#5823073.597#32.06#"
        "384926.869#5823073.597#32.06#"
        "384926.869#5823082.135#36.563#"
        "384917.886#5823082.135#36.563#"
        "384917.886#5823073.597#32.06"
    )


def test_compute_bounds_and_centroid():
    rings = [[0.0, 0.0, 0.0, 2.0, 0.0, 4.0, 2.0, 6.0, 8.0]]
    assert compute_bounds(rings, 3) == (0.0, 0.0, 0.0, 2.0, 6.0, 8.0)
    cx, cy, cz = centroid(rings, 3)
    assert (cx, cy, cz) == (4.0 / 3.0, 2.0, 4.0)
