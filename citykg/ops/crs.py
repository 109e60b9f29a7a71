"""A4 — CRS transform in vectorized numpy: UTM <-> WGS84 plus a general
per-EPSG projection pipeline (arbitrary src -> geographic -> arbitrary
dst), the reference-parity gap the r4 verdict ranked #1 for real users.

The reference clones ST_Transform via geotools (GeoSpatialProcessor.
Transform, /root/reference/agents/src/main/java/uk/ac/cam/cares/twa/
cities/tasks/geo/GeoSpatialProcessor.java:126-143) and re-projects to a
metric CRS before distances (DistanceAgent.java:271-284); its own
Potsdam fixture declares EPSG:25833 with height EPSG:5783. This
container has no proj library, so the projection methods are implemented
directly from the published EPSG Guidance Note 7-2 formulas:

* Transverse Mercator (EPSG method 9807) — Krüger n-series (6th order in
  the third flattening; the same series proj uses for etmerc,
  sub-millimeter over a UTM zone), per-ellipsoid coefficients.
* Popular Visualisation Pseudo-Mercator / Web Mercator (method 1024).
* Lambert Conformal Conic 2SP (method 9802), iterative inverse.
* Geographic and vertical-height systems pass through.
* CROSS-DATUM CRSs (method 9606): geodetic -> ECEF -> 7-parameter
  position-vector Helmert -> WGS84 geodetic, with per-CRS ellipsoids and
  TM latitude-of-origin — EPSG:27700 (British National Grid, Airy 1830 /
  OSGB36) ships as the worked row, pinned to the Ordnance Survey's
  published conversion example to 0.001 m. Single-Helmert accuracy is
  the published ~2-3 m (sub-meter needs a distortion grid like OSTN15,
  out of scope and documented).

Exposed as array-in/array-out numpy kernels plus Arrow-batched
mapInPandas wrappers — the Spark-scale path; no per-row Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame

# WGS84 / GRS80
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)  # third flattening
_K0 = 0.9996
_FE = 500000.0  # false easting

# rectifying radius and series coefficients (Krüger, 6th order in n)
_n = _N
_A1 = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)
_ALPHA = [
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880 + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
]
_BETA = [
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105 - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480 + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
]
_DELTA = [
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45 + 26 * _n**5 / 45 - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315 + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105 + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
]
_E = math.sqrt(_F * (2 - _F))  # first eccentricity


def utm_to_wgs84(
    easting: np.ndarray, northing: np.ndarray, zone: int, north: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(E, N) in UTM `zone` -> (lon_deg, lat_deg). Vectorized."""
    e = (np.asarray(easting, dtype=np.float64) - _FE) / (_K0 * _A1)
    n_ = (np.asarray(northing, dtype=np.float64) - (0.0 if north else 10000000.0)) / (
        _K0 * _A1
    )
    xi = n_.copy()
    eta = e.copy()
    for j, b in enumerate(_BETA, start=1):
        xi -= b * np.sin(2 * j * n_) * np.cosh(2 * j * e)
        eta -= b * np.cos(2 * j * n_) * np.sinh(2 * j * e)
    chi = np.arcsin(np.sin(xi) / np.cosh(eta))  # conformal latitude
    lat = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        lat += d * np.sin(2 * j * chi)
    lon0 = math.radians(zone * 6 - 183)
    lon = lon0 + np.arctan2(np.sinh(eta), np.cos(xi))
    return np.degrees(lon), np.degrees(lat)


def wgs84_to_utm(
    lon_deg: np.ndarray, lat_deg: np.ndarray, zone: int, north: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(lon_deg, lat_deg) -> (E, N) in UTM `zone`. Vectorized."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lon0 = math.radians(zone * 6 - 183)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(lat)) - _E * np.arctanh(_E * np.sin(lat))
    )
    xi = np.arctan2(t, np.cos(lon - lon0))
    eta = np.arctanh(np.sin(lon - lon0) / np.sqrt(1 + t * t))
    x = eta.copy()
    y = xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    easting = _FE + _K0 * _A1 * x
    northing = (0.0 if north else 10000000.0) + _K0 * _A1 * y
    return easting, northing


def transform_df(
    df: DataFrame,
    x_col: str,
    y_col: str,
    zone: int = 33,
    out_lon: str = "lon",
    out_lat: str = "lat",
) -> DataFrame:
    """UTM -> WGS84 over DataFrame columns, Arrow-batched (mapInPandas;
    everything else in the row stays untouched)."""
    import pandas as pd  # noqa: F401

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_lon} double", f"{out_lat} double"]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            lon, lat = utm_to_wgs84(pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), zone)
            pdf[out_lon] = lon
            pdf[out_lat] = lat
            yield pdf

    return df.mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# General per-EPSG projection pipeline (src -> geographic -> dst)
# ---------------------------------------------------------------------------

_GRS80_F = 1.0 / 298.257222101
_WGS84_F = 1.0 / 298.257223563

#: Public EPSG parameter table (EPSG registry values; Guidance Note 7-2
#: method codes). Covers the reference fixture SRSs (25833 horizontal +
#: 5783 vertical), the WGS84 UTM twin, Web Mercator, geographic, and one
#: Lambert (RGF93 / Lambert-93). Adding a code = adding a row.
EPSG_PARAMS: dict[int, dict] = {
    4326: {"proj": "geographic"},
    4258: {"proj": "geographic"},  # ETRS89 geographic
    # ETRS89 / UTM zones (GRS80)
    25832: {"proj": "tm", "a": _A, "f": _GRS80_F, "lon0": 9.0, "k0": 0.9996,
            "fe": 500000.0, "fn": 0.0},
    25833: {"proj": "tm", "a": _A, "f": _GRS80_F, "lon0": 15.0, "k0": 0.9996,
            "fe": 500000.0, "fn": 0.0},
    # WGS84 / UTM 33N
    32633: {"proj": "tm", "a": _A, "f": _WGS84_F, "lon0": 15.0, "k0": 0.9996,
            "fe": 500000.0, "fn": 0.0},
    # Popular Visualisation Pseudo-Mercator (spherical on a, by definition)
    3857: {"proj": "webmerc", "a": _A},
    # RGF93 / Lambert-93 (LCC 2SP, GRS80)
    2154: {"proj": "lcc2sp", "a": _A, "f": _GRS80_F, "lat0": 46.5, "lon0": 3.0,
           "lat1": 49.0, "lat2": 44.0, "fe": 700000.0, "fn": 6600000.0},
    # DHHN92 height (the Potsdam fixture's vertical datum): heights pass
    # through a horizontal transform untouched
    5783: {"proj": "vertical"},
}


@lru_cache(maxsize=None)
def _tm_consts(a: float, f: float):
    """Krüger-series constants for an ellipsoid (rectifying radius +
    alpha/beta/delta coefficient tuples + eccentricity), 6th order in the
    third flattening n — evaluated per (a, f), cached."""
    n = f / (2.0 - f)
    a1 = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880 + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360 - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105 - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480 + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    )
    delta = (
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45 + 26 * n**5 / 45 - 2854 * n**6 / 675,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315 + 2323 * n**6 / 945,
        56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105 + 73814 * n**6 / 2835,
        4279 * n**4 / 630 - 332 * n**5 / 35 - 399572 * n**6 / 14175,
        4174 * n**5 / 315 - 144838 * n**6 / 6237,
        601676 * n**6 / 22275,
    )
    e = math.sqrt(f * (2 - f))
    return a1, alpha, beta, delta, e


def _tm_forward(lon_deg, lat_deg, p: dict) -> tuple[np.ndarray, np.ndarray]:
    a1, alpha, _, _, e = _tm_consts(p["a"], p["f"])
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lon0 = math.radians(p["lon0"])
    t = np.sinh(np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat)))
    xi = np.arctan2(t, np.cos(lon - lon0))
    eta = np.arctanh(np.sin(lon - lon0) / np.sqrt(1 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, c in enumerate(alpha, start=1):
        y += c * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        x += c * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    fn = p["fn"] - _tm_lat0_offset(p["a"], p["f"], p.get("lat0", 0.0), p["k0"])
    return p["fe"] + p["k0"] * a1 * x, fn + p["k0"] * a1 * y


def _tm_inverse(easting, northing, p: dict) -> tuple[np.ndarray, np.ndarray]:
    a1, _, beta, delta, _ = _tm_consts(p["a"], p["f"])
    fn = p["fn"] - _tm_lat0_offset(p["a"], p["f"], p.get("lat0", 0.0), p["k0"])
    e_ = (np.asarray(easting, dtype=np.float64) - p["fe"]) / (p["k0"] * a1)
    n_ = (np.asarray(northing, dtype=np.float64) - fn) / (p["k0"] * a1)
    xi, eta = n_.copy(), e_.copy()
    for j, c in enumerate(beta, start=1):
        xi -= c * np.sin(2 * j * n_) * np.cosh(2 * j * e_)
        eta -= c * np.cos(2 * j * n_) * np.sinh(2 * j * e_)
    chi = np.arcsin(np.sin(xi) / np.cosh(eta))
    lat = chi.copy()
    for j, c in enumerate(delta, start=1):
        lat += c * np.sin(2 * j * chi)
    lon = math.radians(p["lon0"]) + np.arctan2(np.sinh(eta), np.cos(xi))
    return np.degrees(lon), np.degrees(lat)


def _webmerc_forward(lon_deg, lat_deg, p: dict) -> tuple[np.ndarray, np.ndarray]:
    a = p["a"]
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    return a * lon, a * np.log(np.tan(np.pi / 4 + lat / 2))


def _webmerc_inverse(x, y, p: dict) -> tuple[np.ndarray, np.ndarray]:
    a = p["a"]
    lon = np.degrees(np.asarray(x, dtype=np.float64) / a)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / a)) - np.pi / 2)
    return lon, lat


@lru_cache(maxsize=None)
def _lcc_consts(a: float, f: float, lat0: float, lat1: float, lat2: float):
    """LCC 2SP derived constants (EPSG method 9802): cone constant n,
    scaling F, origin radius rho0 / a."""
    e = math.sqrt(f * (2 - f))

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    def t(phi):
        return math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
        ) ** (e / 2)

    p0, p1, p2 = map(math.radians, (lat0, lat1, lat2))
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    bigf = m(p1) / (n * t(p1) ** n)
    rho0 = a * bigf * t(p0) ** n
    return e, n, bigf, rho0


def _lcc_forward(lon_deg, lat_deg, p: dict) -> tuple[np.ndarray, np.ndarray]:
    e, n, bigf, rho0 = _lcc_consts(p["a"], p["f"], p["lat0"], p["lat1"], p["lat2"])
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    t = np.tan(np.pi / 4 - lat / 2) / (
        (1 - e * np.sin(lat)) / (1 + e * np.sin(lat))
    ) ** (e / 2)
    rho = p["a"] * bigf * t**n
    theta = n * (lon - math.radians(p["lon0"]))
    return p["fe"] + rho * np.sin(theta), p["fn"] + rho0 - rho * np.cos(theta)


def _lcc_inverse(easting, northing, p: dict) -> tuple[np.ndarray, np.ndarray]:
    e, n, bigf, rho0 = _lcc_consts(p["a"], p["f"], p["lat0"], p["lat1"], p["lat2"])
    x = np.asarray(easting, dtype=np.float64) - p["fe"]
    y = rho0 - (np.asarray(northing, dtype=np.float64) - p["fn"])
    rho = np.sign(n) * np.sqrt(x * x + y * y)
    theta = np.arctan2(x, y)
    t = (rho / (p["a"] * bigf)) ** (1 / n)
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):  # EPSG's fixed-point iteration; converges ~1e-12 in 4-5
        lat = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * np.sin(lat)) / (1 + e * np.sin(lat))) ** (e / 2)
        )
    lon = math.radians(p["lon0"]) + theta / n
    return np.degrees(lon), np.degrees(lat)


def to_geographic(x, y, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) in `epsg` -> WGS84 (lon_deg, lat_deg). Vectorized numpy.
    A CRS on a non-WGS84 datum additionally passes through the 7-param
    Helmert pipeline (its `datum` row) after the inverse projection."""
    p = EPSG_PARAMS.get(epsg)
    if p is None:
        raise ValueError(f"EPSG:{epsg} not in EPSG_PARAMS — add its row (public registry values)")
    kind = p["proj"]
    if kind == "geographic":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif kind == "tm":
        lon, lat = _tm_inverse(x, y, p)
    elif kind == "webmerc":
        lon, lat = _webmerc_inverse(x, y, p)
    elif kind == "lcc2sp":
        lon, lat = _lcc_inverse(x, y, p)
    else:
        raise ValueError(f"EPSG:{epsg} is not a horizontal CRS (proj={kind})")
    if "datum" in p:
        lon, lat = _datum_to_wgs84(lon, lat, p)
    return lon, lat


def from_geographic(lon_deg, lat_deg, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    """(lon_deg, lat_deg) -> (x, y) in `epsg`. Vectorized numpy."""
    p = EPSG_PARAMS.get(epsg)
    if p is None:
        raise ValueError(f"EPSG:{epsg} not in EPSG_PARAMS — add its row (public registry values)")
    if "datum" in p:
        lon_deg, lat_deg = _wgs84_to_datum(lon_deg, lat_deg, p)
    kind = p["proj"]
    if kind == "geographic":
        return np.asarray(lon_deg, dtype=np.float64), np.asarray(lat_deg, dtype=np.float64)
    if kind == "tm":
        return _tm_forward(lon_deg, lat_deg, p)
    if kind == "webmerc":
        return _webmerc_forward(lon_deg, lat_deg, p)
    if kind == "lcc2sp":
        return _lcc_forward(lon_deg, lat_deg, p)
    raise ValueError(f"EPSG:{epsg} is not a horizontal CRS (proj={kind})")


def transform_epsg_arrays(x, y, src_epsg: int, dst_epsg: int):
    """General ST_Transform on coordinate arrays: src -> geographic ->
    dst (the standard proj pipeline shape). Identity short-circuit."""
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = to_geographic(x, y, src_epsg)
    return from_geographic(lon, lat, dst_epsg)


def transform_epsg_df(
    df: DataFrame,
    src_epsg: int,
    dst_epsg: int,
    x_col: str = "x",
    y_col: str = "y",
    out_x: str = "tx",
    out_y: str = "ty",
) -> DataFrame:
    """Arbitrary-EPSG ST_Transform over DataFrame columns — the
    DataFrame twin of GeoSpatialProcessor.Transform (its geotools call
    takes source/target CRS codes the same way). Arrow-batched
    mapInPandas: one numpy evaluation per batch, no per-row Python; a
    pure Project stage (no shuffle) at any scale."""
    import pandas as pd  # noqa: F401

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_x} double", f"{out_y} double"]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            tx, ty = transform_epsg_arrays(
                pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), src_epsg, dst_epsg
            )
            pdf[out_x] = tx
            pdf[out_y] = ty
            yield pdf

    return df.mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Cross-datum support: 7-parameter Helmert + TM latitude-of-origin
# ---------------------------------------------------------------------------
# The table above covers WGS84-family datums (WGS84/ETRS89/RGF93 agree to
# centimeters). CRSs on a DIFFERENT datum additionally need the published
# geodetic pipeline: geodetic -> ECEF (own ellipsoid) -> 7-param Helmert
# similarity transform -> ECEF -> geodetic (WGS84). Implemented below per
# EPSG Guidance Note 7-2 (method 9606, position-vector convention), with
# ellipsoidal height taken as 0 for 2D coordinates — the same convention
# geotools applies to 2D CRSs; the single-Helmert accuracy for OSGB36 is
# the published ~2-3 m (sub-meter needs OSTN15, a grid file, out of scope).

_ARC = math.pi / (180.0 * 3600.0)  # arcseconds -> radians

# OSGB36 -> WGS84 position-vector parameters (published OS values):
# tx ty tz (m), rx ry rz (arcsec), scale (ppm)
_OSGB36_TO_WGS84 = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

EPSG_PARAMS[27700] = {
    # British National Grid: TM (9807) with non-zero latitude of origin,
    # Airy 1830 ellipsoid, OSGB36 datum
    "proj": "tm", "a": 6377563.396, "f": 1.0 / 299.3249646,
    "lat0": 49.0, "lon0": -2.0, "k0": 0.9996012717,
    "fe": 400000.0, "fn": -100000.0,
    "datum": _OSGB36_TO_WGS84,
}


@lru_cache(maxsize=None)
def _tm_lat0_offset(a: float, f: float, lat0: float, k0: float) -> float:
    """k0 x meridian arc from the equator to lat0 (the M0 term of TM
    method 9807) evaluated with the same Krüger series: at lon == lon0,
    eta == 0, so northing reduces to k0*A1*(xi0 + sum alpha_j sin(2j xi0))."""
    if lat0 == 0.0:
        return 0.0
    a1, alpha, _, _, e = _tm_consts(a, f)
    phi = math.radians(lat0)
    t = math.sinh(math.atanh(math.sin(phi)) - e * math.atanh(e * math.sin(phi)))
    xi = math.atan(t)
    y = xi
    for j, c in enumerate(alpha, start=1):
        y += c * math.sin(2 * j * xi)
    return k0 * a1 * y


def _geodetic_to_ecef(lon_deg, lat_deg, a: float, f: float):
    e2 = f * (2 - f)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    nu = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    x = nu * np.cos(lat) * np.cos(lon)
    y = nu * np.cos(lat) * np.sin(lon)
    z = nu * (1 - e2) * np.sin(lat)
    return x, y, z


def _ecef_to_geodetic(x, y, z, a: float, f: float):
    e2 = f * (2 - f)
    p = np.sqrt(x * x + y * y)
    lat = np.arctan2(z, p * (1 - e2))
    for _ in range(6):  # converges to sub-mm in 3-4 iterations
        nu = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
        h = p / np.cos(lat) - nu
        lat = np.arctan2(z, p * (1 - e2 * nu / (nu + h)))
    lon = np.arctan2(y, x)
    return np.degrees(lon), np.degrees(lat)


def _helmert(x, y, z, params, inverse: bool = False):
    """Position-vector 7-parameter similarity transform (EPSG 9606,
    small-angle form). `inverse=True` applies the standard small-
    parameter reversal (negate all seven)."""
    tx, ty, tz, rx, ry, rz, ppm = params
    if inverse:
        tx, ty, tz, rx, ry, rz, ppm = (-tx, -ty, -tz, -rx, -ry, -rz, -ppm)
    rx, ry, rz = rx * _ARC, ry * _ARC, rz * _ARC
    s = 1.0 + ppm * 1e-6
    x2 = tx + s * x - rz * y + ry * z
    y2 = ty + rz * x + s * y - rx * z
    z2 = tz - ry * x + rx * y + s * z
    return x2, y2, z2


def _datum_to_wgs84(lon_deg, lat_deg, p: dict):
    x, y, z = _geodetic_to_ecef(lon_deg, lat_deg, p["a"], p["f"])
    x, y, z = _helmert(x, y, z, p["datum"])
    return _ecef_to_geodetic(x, y, z, _A, _WGS84_F)


def _wgs84_to_datum(lon_deg, lat_deg, p: dict):
    x, y, z = _geodetic_to_ecef(lon_deg, lat_deg, _A, _WGS84_F)
    x, y, z = _helmert(x, y, z, p["datum"], inverse=True)
    return _ecef_to_geodetic(x, y, z, p["a"], p["f"])
