"""Coordinate transforms, vectorized (reference utilities/transform.py
M15 — which loops OSR TransformPoint per point; here pure-numpy arrays).

Implements:
- EPSG:3857 web-mercator forward/inverse — the projection the reference
  hard-codes for bbox math (utilities/geo.py:62-65);
- WGS84 UTM zones (EPSG:326xx/327xx) forward/inverse via the Krüger /
  Karney series (Karney 2011, "Transverse Mercator with an accuracy of
  a few nanometers" — the algorithm PROJ itself uses), truncated at
  n⁶ (sub-µm for UTM longitudes);
- sinusoidal (MODIS grid SR-ORG:6974, R = 6371007.181; ESRI:54008 on
  the WGS84 semi-major) forward/inverse — the reference's own MODIS
  test corpus CRS (tests/stitching/s3/test_grid_file.py);
- :func:`transform_points` / :func:`transform_bbox` — the arbitrary
  EPSG→EPSG dispatcher matching the reference's
  utilities/transform.py:8-52 API (source→4326→target through the
  geographic hub, exactly like an OSR pipeline).

Formulas are the published ones and are mirrored
expression-by-expression in the SQL oracles; transcendental
compositions with no DuckDB builtin (sinh/cosh/atanh) are spelled out
via exp/ln IDENTICALLY on both sides (`_sinh`/`_cosh`/`_atanh` below)
so numpy and DuckDB make the very same libm calls.
"""

from __future__ import annotations

import numpy as np

R_MAJOR = 6378137.0  # WGS84 semi-major axis (EPSG:3857 sphere radius)
R_MODIS = 6371007.181  # MODIS sinusoidal sphere radius (SR-ORG:6974)
WGS84_F = 1.0 / 298.257223563  # WGS84 flattening
UTM_K0 = 0.9996
UTM_FE = 500000.0
UTM_FN_SOUTH = 10000000.0


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


# --- transcendental mirrors -------------------------------------------------
# DuckDB has no sinh/cosh/atanh; these exp/ln compositions are used on
# BOTH sides (numpy here, the literal same expression in the SQL
# oracles) so each evaluates the identical libm call chain.


def _sinh(x):
    return (np.exp(x) - np.exp(-x)) / 2.0


def _cosh(x):
    return (np.exp(x) + np.exp(-x)) / 2.0


def _atanh(x):
    return 0.5 * np.log((1.0 + x) / (1.0 - x))


# --- UTM (Krüger/Karney series, WGS84) --------------------------------------

_N = WGS84_F / (2.0 - WGS84_F)  # third flattening


def _poly(*coef: float) -> float:
    """Σ coef[i] · n^(i+1+offset) helper — evaluated at module import."""
    return float(sum(c * _N ** (i + 1) for i, c in enumerate(coef)))


# rectifying radius A and the Krüger forward (α), inverse (β) and
# conformal→geographic (δ) coefficients, truncated at n⁶ (Karney 2011
# eqs. 12, 35, 36; Kawase 2011 for δ)
UTM_A = (R_MAJOR / (1.0 + _N)) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
UTM_ALPHA = (
    _poly(1 / 2, -2 / 3, 5 / 16, 41 / 180, -127 / 288, 7891 / 37800),
    _poly(0, 13 / 48, -3 / 5, 557 / 1440, 281 / 630, -1983433 / 1935360),
    _poly(0, 0, 61 / 240, -103 / 140, 15061 / 26880, 167603 / 181440),
    _poly(0, 0, 0, 49561 / 161280, -179 / 168, 6601661 / 7257600),
    _poly(0, 0, 0, 0, 34729 / 80640, -3418889 / 1995840),
    _poly(0, 0, 0, 0, 0, 212378941 / 319334400),
)
UTM_BETA = (
    _poly(1 / 2, -2 / 3, 37 / 96, -1 / 360, -81 / 512, 96199 / 604800),
    _poly(0, 1 / 48, 1 / 15, -437 / 1440, 46 / 105, -1118711 / 3870720),
    _poly(0, 0, 17 / 480, -37 / 840, -209 / 4480, 5569 / 90720),
    _poly(0, 0, 0, 4397 / 161280, -11 / 504, -830251 / 7257600),
    _poly(0, 0, 0, 0, 4583 / 161280, -108847 / 3991680),
    _poly(0, 0, 0, 0, 0, 20648693 / 638668800),
)
UTM_DELTA = (
    _poly(2, -2 / 3, -2, 116 / 45, 26 / 45, -2854 / 675),
    _poly(0, 7 / 3, -8 / 5, -227 / 45, 2704 / 315, 2323 / 945),
    _poly(0, 0, 56 / 15, -136 / 35, -1262 / 105, 73814 / 2835),
    _poly(0, 0, 0, 4279 / 630, -332 / 35, -399572 / 14175),
    _poly(0, 0, 0, 0, 4174 / 315, -144838 / 6237),
    _poly(0, 0, 0, 0, 0, 601676 / 22275),
)
# 2√n/(1+n) — the conformal-latitude constant in the forward transform
UTM_CONF = float(2.0 * np.sqrt(_N) / (1.0 + _N))


def utm_zone(lon: np.ndarray) -> np.ndarray:
    """Standard UTM zone 1-60 for longitudes in [-180, 180]."""
    lon = np.asarray(lon, dtype=np.float64)
    return np.clip(np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1, 1, 60)


def utm_forward(
    lon: np.ndarray, lat: np.ndarray, zone: np.ndarray | int, south: np.ndarray | bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → UTM easting/northing meters, vectorized
    (``zone`` and ``south`` may vary per point)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = np.broadcast_to(np.asarray(zone, dtype=np.float64), lon.shape)
    lon0 = zone * 6.0 - 183.0
    phi = lat * np.pi / 180.0
    dlam = (lon - lon0) * np.pi / 180.0
    s = np.sin(phi)
    t = _sinh(_atanh(s) - UTM_CONF * _atanh(UTM_CONF * s))
    xip = np.arctan2(t, np.cos(dlam))
    etap = _atanh(np.sin(dlam) / np.sqrt(1.0 + t * t))
    xi, eta = xip.copy(), etap.copy()
    for j, a in enumerate(UTM_ALPHA, start=1):
        xi = xi + a * np.sin(2.0 * j * xip) * _cosh(2.0 * j * etap)
        eta = eta + a * np.cos(2.0 * j * xip) * _sinh(2.0 * j * etap)
    fn = np.where(np.asarray(south, dtype=bool), UTM_FN_SOUTH, 0.0)
    return UTM_FE + UTM_K0 * UTM_A * eta, fn + UTM_K0 * UTM_A * xi


def utm_inverse(
    e: np.ndarray, n: np.ndarray, zone: np.ndarray | int, south: np.ndarray | bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """UTM easting/northing meters → lon/lat degrees (vectorized)."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    zone = np.broadcast_to(np.asarray(zone, dtype=np.float64), e.shape)
    fn = np.where(np.asarray(south, dtype=bool), UTM_FN_SOUTH, 0.0)
    xi = (n - fn) / (UTM_K0 * UTM_A)
    eta = (e - UTM_FE) / (UTM_K0 * UTM_A)
    xip, etap = xi.copy(), eta.copy()
    for j, b in enumerate(UTM_BETA, start=1):
        xip = xip - b * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        etap = etap - b * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xip) / _cosh(etap))
    phi = chi.copy()
    for j, d in enumerate(UTM_DELTA, start=1):
        phi = phi + d * np.sin(2.0 * j * chi)
    lam = np.arctan2(_sinh(etap), np.cos(xip))
    lon0 = zone * 6.0 - 183.0
    return lon0 + lam * 180.0 / np.pi, phi * 180.0 / np.pi


# --- sinusoidal (MODIS grid / ESRI:54008) ------------------------------------


def sinusoidal_forward(
    lon: np.ndarray, lat: np.ndarray, radius: float = R_MODIS
) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → spherical sinusoidal meters (equal-area;
    x = R·λ·cosφ, y = R·φ — Snyder eq. 30-1/30-2)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = lat * np.pi / 180.0
    x = radius * (lon * np.pi / 180.0) * np.cos(phi)
    y = radius * phi
    return x, y


def sinusoidal_inverse(
    x: np.ndarray, y: np.ndarray, radius: float = R_MODIS
) -> tuple[np.ndarray, np.ndarray]:
    """Spherical sinusoidal meters → lon/lat degrees (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phi = y / radius
    lon = np.where(
        np.abs(np.cos(phi)) < 1e-12, 0.0, x / (radius * np.cos(phi))
    ) * 180.0 / np.pi
    return lon, phi * 180.0 / np.pi


# --- arbitrary EPSG→EPSG dispatcher ------------------------------------------

# code → (forward from 4326, inverse to 4326); UTM handled by range
_SINU_RADII = {6974: R_MODIS, 54008: R_MAJOR}


def _supported(code: int) -> bool:
    return (
        code in (4326, 3857)
        or code in _SINU_RADII
        or 32601 <= code <= 32660
        or 32701 <= code <= 32760
    )


def _to_4326(x: np.ndarray, y: np.ndarray, code: int) -> tuple[np.ndarray, np.ndarray]:
    if code == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if code == 3857:
        return webmercator_to_lonlat(x, y)
    if code in _SINU_RADII:
        return sinusoidal_inverse(x, y, radius=_SINU_RADII[code])
    if 32601 <= code <= 32660:
        return utm_inverse(x, y, zone=code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm_inverse(x, y, zone=code - 32700, south=True)
    raise ValueError(f"unsupported EPSG:{code}")


def _from_4326(lon: np.ndarray, lat: np.ndarray, code: int) -> tuple[np.ndarray, np.ndarray]:
    if code == 4326:
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if code == 3857:
        return lonlat_to_webmercator(lon, lat)
    if code in _SINU_RADII:
        return sinusoidal_forward(lon, lat, radius=_SINU_RADII[code])
    if 32601 <= code <= 32660:
        return utm_forward(lon, lat, zone=code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm_forward(lon, lat, zone=code - 32700, south=True)
    raise ValueError(f"unsupported EPSG:{code}")


def transform_points(
    x: np.ndarray, y: np.ndarray, source_epsg: int, target_epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """Arbitrary EPSG→EPSG point transform, vectorized — the
    counterpart of the reference's OSR-backed
    ``utilities/transform.py:transform_coordinates`` (which loops
    TransformPoint per point). Routes source → EPSG:4326 → target, the
    same geographic-hub pipeline OSR builds for these CRS pairs.

    Supported codes: 4326, 3857 (web mercator), 32601-32660 /
    32701-32760 (WGS84 UTM north/south), 6974 (MODIS sinusoidal,
    R=6371007.181 — the reference's MODIS test-corpus grid) and 54008
    (world sinusoidal on the WGS84 semi-major)."""
    if not _supported(source_epsg):
        raise ValueError(f"unsupported source EPSG:{source_epsg}")
    if not _supported(target_epsg):
        raise ValueError(f"unsupported target EPSG:{target_epsg}")
    if source_epsg == target_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_4326(x, y, source_epsg)
    return _from_4326(lon, lat, target_epsg)


def transform_bbox(
    xmin: float, ymin: float, xmax: float, ymax: float,
    source_epsg: int, target_epsg: int, densify: int = 21,
) -> tuple[float, float, float, float]:
    """Bbox reprojection — reference utilities/transform.py:56-80
    transforms only the two corners, which UNDER-COVERS curved edges
    (e.g. the equator bulge in sinusoidal→4326); here each edge is
    densified with ``densify`` samples and the output box is the
    min/max envelope of all transformed edge points (densify=2 ≡ the
    reference's corner behavior)."""
    d = max(int(densify), 2)
    xs = np.linspace(xmin, xmax, d)
    ys = np.linspace(ymin, ymax, d)
    ex = np.concatenate([xs, xs, np.full(d, xmin), np.full(d, xmax)])
    ey = np.concatenate([np.full(d, ymin), np.full(d, ymax), ys, ys])
    tx, ty = transform_points(ex, ey, source_epsg, target_epsg)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())
