"""Quadtree lon/lat cells — the engine's SQL-reproducible spatial key.

A res-``r`` cell splits the world into ``2^r × 2^r`` tiles over
lon ∈ [-180, 180), lat ∈ [-90, 90). Cell id packs
``(res << 58) | (ix << 29) | iy`` into int64 so ids at different
resolutions never collide and ``parent`` is a pure bit/arithmetic op.

This plays the role of the reference's MODIS h/v grid keys
(tests/fixtures/modis.kml, engines/s3.py:183-221): a deterministic
point → grid-cell assignment that later drives the cell→tile groupby.
Chosen to be exactly reproducible in ANSI SQL
(``floor((lon+180)/360*2^r)`` …) so the DuckDB oracle can recompute it.

Edge rule (documented, golden-tested): points at lon=180 or lat=90 clamp
into the last cell (half-open cells, right/top edge closed at the
domain boundary) — mirroring the reference's closed query bboxes
(utilities/geo.py:160-163 uses shapely ``intersects``, closed edges).
"""

from __future__ import annotations

import numpy as np

RES_SHIFT = 58
X_SHIFT = 29


def quadcell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lon/lat → cell id at resolution ``res`` (0..15)."""
    n = 1 << res
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return (np.int64(res) << RES_SHIFT) | (ix << X_SHIFT) | iy


def quadcell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, ix, iy)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> RES_SHIFT
    ix = (cell >> X_SHIFT) & ((1 << X_SHIFT) - 1)
    iy = cell & ((1 << X_SHIFT) - 1)
    return res, ix, iy


def quadcell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """cell at res r → containing cell at coarser ``parent_res``."""
    res, ix, iy = quadcell_decode(cell)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return (np.int64(parent_res) << RES_SHIFT) | ((ix >> shift) << X_SHIFT) | (iy >> shift)


def quadcell_lonlat(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center lon/lat."""
    res, ix, iy = quadcell_decode(cell)
    n = (1 << res).astype(np.float64) if isinstance(res, np.ndarray) else float(1 << res)
    n = np.power(2.0, res.astype(np.float64))
    lon = (ix + 0.5) / n * 360.0 - 180.0
    lat = (iy + 0.5) / n * 180.0 - 90.0
    return lon, lat


def quadcell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of one cell (driver-side helper)."""
    res, ix, iy = quadcell_decode(np.asarray([cell]))
    n = float(1 << int(res[0]))
    xmin = ix[0] / n * 360.0 - 180.0
    ymin = iy[0] / n * 180.0 - 90.0
    return (xmin, ymin, xmin + 360.0 / n, ymin + 180.0 / n)


def quadcell_kring(cell: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-ring: every grid cell within Chebyshev distance
    ``k`` of each input cell (the H3 ``grid_disk`` analogue on the
    quadtree grid — neighbor expansion for proximity joins and box
    smoothing). Returns ``(src_idx, neighbor_id)`` pair arrays; edge
    cells emit only their in-grid neighbors (no wrap — same clamped
    half-open domain rule as :func:`quadcell`). Pure bit/array
    arithmetic, SQL-reproducible via a (dx, dy) cross join."""
    res, ix, iy = quadcell_decode(cell)
    n = np.int64(1) << res
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.repeat(offs, 2 * k + 1)
    dy = np.tile(offs, 2 * k + 1)
    nx = ix[:, None] + dx[None, :]
    ny = iy[:, None] + dy[None, :]
    valid = (nx >= 0) & (nx < n[:, None]) & (ny >= 0) & (ny < n[:, None])
    nbr = (res[:, None] << RES_SHIFT) | (nx << X_SHIFT) | ny
    src = np.broadcast_to(
        np.arange(len(np.asarray(cell)), dtype=np.int64)[:, None], nbr.shape
    )
    return src[valid], nbr[valid]
