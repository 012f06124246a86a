"""Coordinate transforms, vectorized (reference utilities/transform.py
M15 — which loops TransformPoint per point; here pure-numpy arrays).

Implements the spherical (EPSG:3857 / web-mercator) forward and inverse
transforms — the projection the reference hard-codes for bbox math
(utilities/geo.py:62-65). Formulas are the published EPSG ones and are
mirrored expression-by-expression in the SQL oracle.
"""

from __future__ import annotations

import numpy as np

R_MAJOR = 6378137.0  # WGS84 semi-major axis (EPSG:3857 sphere radius)


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → EPSG:3857 meters (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * np.pi / 180.0 * R_MAJOR
    y = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) * R_MAJOR
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters → lon/lat degrees (vectorized inverse)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / R_MAJOR * 180.0 / np.pi
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MAJOR)) - np.pi / 2.0)
    return lon, lat


def bbox_to_webmercator(bbox: tuple[float, float, float, float]) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) lon/lat → 3857 (corner transform —
    exact for this projection since axes are independent)."""
    xs, ys = lonlat_to_webmercator(
        np.array([bbox[0], bbox[2]]), np.array([bbox[1], bbox[3]])
    )
    return (float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1]))
