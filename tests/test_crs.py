"""A4 CRS transform: Krueger-series UTM<->WGS84 vs round-trip, anchor
points, and an independent Snyder-formula implementation."""

import numpy as np

from citykg.ops.crs import transform_df, utm_to_wgs84, wgs84_to_utm


def _snyder_tm(lon_deg, lat_deg, zone):
    """Independent check implementation (Snyder 1987 eq. 8-9..8-15 —
    a different series than the Krueger n-series used by the op)."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    lon0 = np.radians(zone * 6 - 183)
    n = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    t = np.tan(lat) ** 2
    c = ep2 * np.cos(lat) ** 2
    aa = (lon - lon0) * np.cos(lat)
    m = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    east = 500000 + k0 * n * (
        aa + (1 - t + c) * aa**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * aa**5 / 120
    )
    north = k0 * (
        m
        + n
        * np.tan(lat)
        * (
            aa**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * aa**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * aa**6 / 720
        )
    )
    return east, north


def test_roundtrip_machine_precision():
    rng = np.random.RandomState(0)
    lons = rng.uniform(12.0, 18.0, 500)
    lats = rng.uniform(45.0, 60.0, 500)
    e, n = wgs84_to_utm(lons, lats, 33)
    lo, la = utm_to_wgs84(e, n, 33)
    assert np.abs(lo - lons).max() < 1e-12
    assert np.abs(la - lats).max() < 1e-12


def test_anchor_points():
    # central meridian of zone 33 (15E) at the equator: E=500000, N=0 exactly
    e, n = wgs84_to_utm(np.array([15.0]), np.array([0.0]), 33)
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # the fixture corner (384000, 5820000) must land in Berlin
    lon, lat = utm_to_wgs84(np.array([384000.0]), np.array([5820000.0]), 33)
    assert 13.2 < lon[0] < 13.4 and 52.4 < lat[0] < 52.6


def test_agrees_with_independent_series():
    rng = np.random.RandomState(7)
    lons = rng.uniform(12.0, 18.0, 200)
    lats = rng.uniform(45.0, 60.0, 200)
    e1, n1 = wgs84_to_utm(lons, lats, 33)
    e2, n2 = _snyder_tm(lons, lats, 33)
    # Snyder's truncated series is the limiting factor (~1 mm)
    assert np.abs(e1 - e2).max() < 0.01
    assert np.abs(n1 - n2).max() < 0.01


def test_transform_df(spark):
    df = spark.createDataFrame(
        [("a", 384000.0, 5820000.0), ("b", 500000.0, 0.0)], "id string, x double, y double"
    )
    out = {r.id: (r.lon, r.lat) for r in transform_df(df, "x", "y", zone=33).collect()}
    assert 13.2 < out["a"][0] < 13.4 and 52.4 < out["a"][1] < 52.6
    assert abs(out["b"][0] - 15.0) < 1e-9 and abs(out["b"][1]) < 1e-9


def test_epsg_roundtrips_all_registered_horizontal():
    """General per-EPSG pipeline (r4 VERDICT item 2): every registered
    horizontal CRS round-trips geographic -> projected -> geographic to
    < 1e-12 degrees over its use band."""
    from citykg.ops.crs import EPSG_PARAMS, from_geographic, to_geographic

    lons = np.array([3.0, 7.5, 9.9, 13.07, 15.0])
    lats = np.array([41.0, 46.5, 49.9, 52.4, 44.4])
    for code, p in EPSG_PARAMS.items():
        if p["proj"] in ("geographic", "vertical"):
            continue
        x, y = from_geographic(lons, lats, code)
        lo, la = to_geographic(x, y, code)
        # same-datum CRSs round-trip to float noise; a cross-datum CRS
        # additionally pays the small-parameter Helmert reversal
        # residual (~1e-7 deg ~ cm — documented, far below the single-
        # Helmert ~3 m accuracy)
        tol = 1e-6 if "datum" in p else 1e-12
        assert np.abs(lo - lons).max() < tol, code
        assert np.abs(la - lats).max() < tol, code


def test_epsg_anchor_points():
    """Published anchor values: Lambert-93 false origin, Web Mercator's
    exact spherical closed form, and the 25833/32633 ellipsoid twin-check
    (GRS80 vs WGS84 flattening differs ~0.1 mm in northing)."""
    from citykg.ops.crs import from_geographic, transform_epsg_arrays

    x, y = from_geographic(np.array([3.0]), np.array([46.5]), 2154)
    assert abs(x[0] - 700000.0) < 1e-6 and abs(y[0] - 6600000.0) < 1e-6
    x, y = from_geographic(np.array([1.0]), np.array([0.0]), 3857)
    assert abs(x[0] - 6378137.0 * np.radians(1.0)) < 1e-9 and abs(y[0]) < 1e-9
    a = transform_epsg_arrays(np.array([13.0666]), np.array([52.4]), 4326, 25833)
    b = transform_epsg_arrays(np.array([13.0666]), np.array([52.4]), 4326, 32633)
    assert abs(a[0][0] - b[0][0]) < 1e-3 and abs(a[1][0] - b[1][0]) < 1e-3
    # the fixture SRS: 25833 puts the Berlin corner where zone-33 UTM does
    assert abs(a[0][0] - 384000) < 20000 and abs(a[1][0] - 5807000) < 20000


def test_epsg_unknown_code_and_vertical_raise():
    import pytest as _pytest

    from citykg.ops.crs import to_geographic

    with _pytest.raises(ValueError, match="EPSG_PARAMS"):
        to_geographic(np.array([0.0]), np.array([0.0]), 31370)
    with _pytest.raises(ValueError, match="not a horizontal"):
        to_geographic(np.array([0.0]), np.array([0.0]), 5783)


def test_transform_epsg_df(spark):
    """Arrow-batched general transform: 4326 -> 2154 lands the Lambert-93
    false origin; chained transforms keep pass-through columns."""
    from citykg.ops.crs import transform_epsg_df

    df = spark.createDataFrame(
        [("o", 3.0, 46.5), ("b", 13.0666, 52.4)], "id string, x double, y double"
    )
    out = {r.id: (r.tx, r.ty) for r in transform_epsg_df(df, 4326, 2154).collect()}
    assert abs(out["o"][0] - 700000.0) < 1e-6 and abs(out["o"][1] - 6600000.0) < 1e-6
    # identity short-circuit
    same = transform_epsg_df(df, 4326, 4326).collect()
    assert all(abs(r.tx - r.x) < 1e-12 and abs(r.ty - r.y) < 1e-12 for r in same)


def test_epsg_27700_os_worked_example():
    """British National Grid (TM with latitude-of-origin on Airy 1830):
    the Ordnance Survey's published worked example ('A guide to
    coordinate systems in Great Britain'): OSGB36 52°39'27.2531"N,
    1°43'4.5177"E <-> E 651409.903, N 313177.270 — authoritative to mm,
    datum-free (tests the projection math alone)."""
    from citykg.ops.crs import EPSG_PARAMS, _tm_forward, _tm_inverse

    phi = 52 + 39 / 60 + 27.2531 / 3600
    lam = 1 + 43 / 60 + 4.5177 / 3600
    p = EPSG_PARAMS[27700]
    e, n = _tm_forward(np.array([lam]), np.array([phi]), p)
    assert abs(e[0] - 651409.903) < 0.001 and abs(n[0] - 313177.270) < 0.001
    lo, la = _tm_inverse(e, n, p)
    assert abs(lo[0] - lam) < 1e-12 and abs(la[0] - phi) < 1e-12


def test_epsg_27700_datum_pipeline():
    """Cross-datum path (7-param Helmert, EPSG method 9606): WGS84
    London projects to the known central-London grid square; the
    OSGB36<->WGS84 shift is the published ~100 m magnitude; round-trip
    residual stays at the documented small-parameter-reversal level
    (~1e-7 deg ~ cm), far below the single-Helmert ~3 m accuracy."""
    from citykg.ops.crs import EPSG_PARAMS, _tm_forward, from_geographic, to_geographic

    lon, lat = np.array([-0.1276]), np.array([51.5072])
    x, y = from_geographic(lon, lat, 27700)
    assert abs(x[0] - 530043) < 50 and abs(y[0] - 180358) < 50
    lo, la = to_geographic(x, y, 27700)
    assert abs(lo[0] - lon[0]) < 1e-6 and abs(la[0] - lat[0]) < 1e-6
    # datum shift magnitude: project the same lon/lat AS IF it were
    # OSGB36 (datum-free TM) and compare — OSGB36 vs WGS84 differ by
    # ~70-120 m over Britain
    e36, n36 = _tm_forward(lon, lat, EPSG_PARAMS[27700])
    shift = ((x[0] - e36[0]) ** 2 + (y[0] - n36[0]) ** 2) ** 0.5
    assert 50 < shift < 200
