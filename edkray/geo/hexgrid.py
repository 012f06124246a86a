"""H3-style hexagonal hierarchical index (aperture 7), vectorized numpy.

The north-star pipeline indexes pages by hexagonal cells at resolutions
7-9. The Uber H3 library is not available in this environment, so this
is an honest from-scratch hexagonal hierarchy with H3's key semantics —
NOT bit-compatible with Uber H3 ids:

- aperture 7: each resolution step shrinks cell area ×7 and rotates the
  lattice by ``atan(sqrt(3)/5) ≈ 19.1066°`` (H3's Class II/III rotation),
  so every res-r hex has exactly one "center child" and its parent is
  the res-(r-1) hex containing its center — the same parent rule H3 uses.
- pointy-top axial coordinates on an equirectangular lon/lat plane
  (a real-Earth deployment would swap in an equal-area projection; the
  lattice/hierarchy math is projection-agnostic).

Cell id layout (int64): ``res(4b) << 54 | (q + 2^26) << 27 | (r + 2^26)``.

Used as the shuffle key for the tiling groupby (SURVEY.md §7: groupby
key = res-7 parent of the res-9 cell).
"""

from __future__ import annotations

import numpy as np

_RES_SHIFT = 54
_AX_SHIFT = 27
_AX_OFF = 1 << 26
_SQRT7 = np.sqrt(7.0)
_ROT = np.arctan(np.sqrt(3.0) / 5.0)  # aperture-7 lattice rotation per res
_R0 = 24.0  # res-0 hex circumradius in degrees (~res scaling picked so res 7-9 ≈ km-scale)


def _res_params(res: int) -> tuple[float, float, float]:
    """(circumradius, cos θ, sin θ) of the res-``res`` lattice."""
    size = _R0 / _SQRT7**res
    th = res * _ROT
    return size, np.cos(th), np.sin(th)


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-coordinate rounding of fractional axial coords (vectorized)."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hexcell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lon/lat → hex cell id at resolution ``res`` (0..15)."""
    size, c, s = _res_params(res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    xr = c * x + s * y  # rotate into the res-r lattice frame
    yr = -s * x + c * y
    qf = (np.sqrt(3.0) / 3.0 * xr - yr / 3.0) / size
    rf = (2.0 / 3.0 * yr) / size
    q, r = _axial_round(qf, rf)
    return (np.int64(res) << _RES_SHIFT) | ((q + _AX_OFF) << _AX_SHIFT) | (r + _AX_OFF)


def hexcell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _RES_SHIFT
    q = ((cell >> _AX_SHIFT) & ((1 << _AX_SHIFT) - 1)) - _AX_OFF
    r = (cell & ((1 << _AX_SHIFT) - 1)) - _AX_OFF
    return res, q, r


def hexcell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → center lon/lat (vectorized; cells may span resolutions)."""
    res, q, r = hexcell_decode(cell)
    size = _R0 / _SQRT7 ** res.astype(np.float64)
    th = res.astype(np.float64) * _ROT
    c, s = np.cos(th), np.sin(th)
    xr = size * np.sqrt(3.0) * (q + r / 2.0)
    yr = size * 1.5 * r
    return c * xr - s * yr, s * xr + c * yr  # un-rotate


def hexcell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Hex at res r → the res-``parent_res`` hex containing its center
    (H3's parent rule; aperture-7 hexes don't nest exactly)."""
    lon, lat = hexcell_center(cell)
    return hexcell(lon, lat, parent_res)
