"""A4 — CRS transform (UTM <-> WGS84 geographic) in vectorized numpy.

The reference clones ST_Transform via geotools (GeoSpatialProcessor.
Transform, /root/reference/agents/src/main/java/uk/ac/cam/cares/twa/
cities/tasks/geo/GeoSpatialProcessor.java:126-143) and re-projects to a
metric CRS before distances (DistanceAgent.java:271-284). This container
has no proj library, so the transverse-Mercator mapping is implemented
directly with the standard Krüger n-series (6th order in the third
flattening n — the same series proj uses for etmerc; sub-millimeter over
a UTM zone), GRS80/WGS84 ellipsoid.

Exposed as array-in/array-out numpy kernels plus an Arrow-batched
mapInPandas wrapper — the Spark-scale path; no per-row Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

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
