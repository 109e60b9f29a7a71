"""Property-based tests (hypothesis): codec round-trips the reference's
golden tests can't cover — arbitrary rings, arbitrary literal content.
Driver-side only (no Spark session) so they run in milliseconds."""

import math

from hypothesis import given, settings, strategies as st

from citykg.geometry import (
    compute_bounds,
    decode_literal,
    encode_rings,
    fmt_double,
)
from citykg.ops.crs import utm_to_wgs84, wgs84_to_utm

finite = st.floats(
    min_value=-1e6, max_value=1e7, allow_nan=False, allow_infinity=False, width=64
)


def ring_strategy(dim=3):
    # a ring = n points of dim coords, n >= 3
    return st.lists(finite, min_size=3 * dim, max_size=12 * dim).map(
        lambda v: v[: (len(v) // dim) * dim]
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(ring_strategy(), min_size=1, max_size=4))
def test_geometry_codec_roundtrip(rings):
    lexical, datatype = encode_rings("POLYGON", rings, 3)
    gtype, dim, back = decode_literal(lexical, datatype)
    assert gtype == "POLYGON" and dim == 3
    assert len(back) == len(rings)
    for r0, r1 in zip(rings, back):
        assert len(r0) == len(r1)
        for a, b in zip(r0, r1):
            # Java-Double.toString rendering is shortest-roundtrip: exact
            assert a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)


@settings(max_examples=300, deadline=None)
@given(finite)
def test_fmt_double_roundtrips(v):
    assert float(fmt_double(v)) == v


@settings(max_examples=100, deadline=None)
@given(st.lists(ring_strategy(), min_size=1, max_size=3))
def test_bounds_contain_all_points(rings):
    b = compute_bounds(rings, 3)
    for r in rings:
        for i in range(0, len(r), 3):
            assert b[0] <= r[i] <= b[3]
            assert b[1] <= r[i + 1] <= b[4]
            assert b[2] <= r[i + 2] <= b[5]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=12.5, max_value=17.5, allow_nan=False),
    st.floats(min_value=-80.0, max_value=80.0, allow_nan=False),
)
def test_crs_roundtrip_property(lon, lat):
    import numpy as np

    e, n = wgs84_to_utm(np.array([lon]), np.array([lat]), 33)
    lo, la = utm_to_wgs84(e, n, 33)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def _nq_escape(s: str) -> str:
    # mirror of materialize.nquads_lines escaping (same order)
    for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(a, b)
    return s


def _nq_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}[nxt])
            i += 2
        else:
            assert c not in ('"', "\n", "\r", "\t")  # grammar: must be escaped
            out.append(c)
            i += 1
    return "".join(out)


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=80))
def test_nquads_escape_roundtrip(s):
    assert _nq_unescape(_nq_escape(s)) == s


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-5.9, max_value=5.9, allow_nan=False, width=64),
    st.floats(min_value=-84.0, max_value=84.0, allow_nan=False, width=64),
)
def test_epsg_tm_roundtrip_property(dlon, lat):
    """TM (Krüger) round-trip for arbitrary points within the zone band:
    projected -> geographic -> projected agrees to < 1e-6 m."""
    import numpy as np

    from citykg.ops.crs import from_geographic, to_geographic

    lon = 15.0 + dlon  # zone 33 central meridian ± 5.9°
    for code in (25833, 32633):
        x, y = from_geographic(np.array([lon]), np.array([lat]), code)
        lo, la = to_geographic(x, y, code)
        x2, y2 = from_geographic(lo, la, code)
        assert abs(x2[0] - x[0]) < 1e-6 and abs(y2[0] - y[0]) < 1e-6


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=64),
    st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64),
)
def test_epsg_webmerc_lcc_roundtrip_property(lon, lat):
    """Web Mercator (anywhere) and Lambert-93 (its latitude band)
    geographic round-trips stay below 1e-9 degrees."""
    import numpy as np

    from citykg.ops.crs import from_geographic, to_geographic

    x, y = from_geographic(np.array([lon]), np.array([lat]), 3857)
    lo, la = to_geographic(x, y, 3857)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
    if -20.0 <= lon <= 25.0 and 20.0 <= lat <= 75.0:
        x, y = from_geographic(np.array([lon]), np.array([lat]), 2154)
        lo, la = to_geographic(x, y, 2154)
        assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
