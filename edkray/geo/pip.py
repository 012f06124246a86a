"""Point-in-polygon + bbox spatial index, vectorized numpy.

Replaces the reference's shapely usage (``geo.tile_intersects``,
utilities/geo.py:160-163; grid semi-join engines/s3.py:199-221) and the
STRtree the SURVEY plans for the admin-polygon join. Works on arbitrary
simple polygons (convex or not) via even-odd ray casting.

Semantics (documented + golden-tested):
- half-open boundary rule: for an axis-aligned box, points on the
  left/bottom edges are inside, right/top edges are outside (standard
  even-odd ray casting with a +x ray and ``px < xint``) — consistent
  with the half-open quadcell tiling so a point on a shared polygon
  edge is assigned to exactly one polygon,
- when a point is inside ≥2 overlapping polygons, the match with the
  lexicographically-largest id wins ("last-source-wins", mirroring
  gdal.BuildVRT overlap resolution, reference dataset.py:543-552).
"""

from __future__ import annotations

import struct

import numpy as np


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-casting test of many points against one ring.

    ``ring``: (N, 2) array of exterior coordinates (closed or open).
    Returns boolean mask. Vectorized over points; loops over edges
    (polygon vertex counts are small).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    n = len(ring)
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for k in range(n):
        crosses = (y1[k] > py) != (y2[k] > py)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2[k] - x1[k]) * (py - y1[k]) / (y2[k] - y1[k]) + x1[k]
        inside ^= crosses & (px < xint)
    return inside


class PolygonIndex:
    """Bbox-prefiltered PIP index over a set of polygons.

    Built once per actor (``__init__`` of the PIP join stage) from a
    broadcast polygon table; ``query`` assigns each point the id of the
    containing polygon (last-wins on overlap) or ``None``.

    The prefilter is each polygon's bbox — with O(100-1k) polygons the
    per-polygon vectorized scan beats a tree in numpy. For larger
    polygon sets, pass ``grid_res``: polygons are bucketed by the
    res-``grid_res`` quad cells their bbox overlaps, and each point only
    tests polygons sharing its coarse cell — sub-linear in the polygon
    count (the STRtree role, SURVEY §2.3b, at 10k+ polygons).
    """

    def __init__(self, ids: list[str], rings: list[np.ndarray], grid_res: int | None = None):
        order = np.argsort(np.asarray(ids, dtype=object))  # lexicographic; later = wins
        self.ids = [ids[i] for i in order]
        self.rings = [np.asarray(rings[i], dtype=np.float64) for i in order]
        self.bboxes = np.array(
            [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in self.rings]
        )
        self.grid_res = grid_res
        if grid_res is not None:
            n = 1 << grid_res
            polys, keys = [], []
            for pidx, (xmin, ymin, xmax, ymax) in enumerate(self.bboxes):
                ix0, ix1 = self._cell_range(xmin, xmax, -180.0, 360.0, n)
                iy0, iy1 = self._cell_range(ymin, ymax, -90.0, 180.0, n)
                ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
                iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
                cell = (ix[:, None] * n + iy[None, :]).reshape(-1)
                keys.append(cell)
                polys.append(np.full(len(cell), pidx, dtype=np.int64))
            # flat (cell, poly) pairs sorted by (poly, cell) — poly-major
            # so the query's pair stream comes out poly-ascending, which
            # the last-wins overwrite below relies on
            self._pc_poly = np.concatenate(polys) if polys else np.empty(0, np.int64)
            self._pc_cell = np.concatenate(keys) if keys else np.empty(0, np.int64)
            self._ids_arr = np.asarray(self.ids, dtype=object)
            # padded per-polygon edge tables so the even-odd test runs
            # vectorized over the whole candidate (poly, point) stream
            norm = []
            for r in self.rings:
                rr = r[:-1] if np.allclose(r[0], r[-1]) else r
                norm.append(rr)
            emax = max(len(r) for r in norm) if norm else 0
            np_ = len(norm)
            self._ex1 = np.zeros((np_, emax))
            self._ey1 = np.zeros((np_, emax))
            self._ex2 = np.zeros((np_, emax))
            self._ey2 = np.zeros((np_, emax))
            self._ev = np.zeros((np_, emax), dtype=bool)
            for i, r in enumerate(norm):
                k = len(r)
                self._ex1[i, :k] = r[:, 0]
                self._ey1[i, :k] = r[:, 1]
                self._ex2[i, :k] = np.roll(r[:, 0], -1)
                self._ey2[i, :k] = np.roll(r[:, 1], -1)
                self._ev[i, :k] = True

    @staticmethod
    def _cell_range(lo: float, hi: float, origin: float, span: float, n: int) -> tuple[int, int]:
        i0 = int(np.clip(np.floor((lo - origin) / span * n), 0, n - 1))
        i1 = int(np.clip(np.floor((hi - origin) / span * n), 0, n - 1))
        return i0, i1

    def query(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized point → containing polygon id (object array, None if none)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.full(lon.shape, None, dtype=object)
        if self.grid_res is None:
            for pid, ring, (xmin, ymin, xmax, ymax) in zip(self.ids, self.rings, self.bboxes):
                cand = (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
                if not cand.any():
                    continue
                idx = np.nonzero(cand)[0]
                hit = points_in_polygon(lon[idx], lat[idx], ring)
                out[idx[hit]] = pid  # later (lexicographically larger) id overwrites
            return out
        # bucketed path: points grouped by coarse cell once; each polygon
        # then tests only the points in ITS cells (a containing polygon's
        # bbox contains the point, hence overlaps the point's cell — no
        # false negatives). Ascending polygon iteration keeps last-wins.
        n = 1 << self.grid_res
        ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
        key = ix * n + iy
        order = np.argsort(key, kind="stable")
        ks = key[order]
        if len(ks) == 0 or len(self._pc_cell) == 0:
            return out
        # vectorized equi-join of (poly, cell) pairs against sorted point
        # cells: searchsorted gives each pair's point range; expand to a
        # flat candidate (poly, point) stream with no per-poly Python
        left = np.searchsorted(ks, self._pc_cell, side="left")
        right = np.searchsorted(ks, self._pc_cell, side="right")
        counts = right - left
        nz = counts > 0
        if not nz.any():
            return out
        left, counts, pairs_poly = left[nz], counts[nz], self._pc_poly[nz]
        tot = int(counts.sum())
        cum = np.concatenate([[0], np.cumsum(counts)])
        intra = np.arange(tot, dtype=np.int64) - np.repeat(cum[:-1], counts)
        cand_pt = order[np.repeat(left, counts) + intra]
        cand_poly = np.repeat(pairs_poly, counts)
        # bbox filter on the whole pair stream at once
        bb = self.bboxes[cand_poly]
        plon, plat = lon[cand_pt], lat[cand_pt]
        m = (plon >= bb[:, 0]) & (plon <= bb[:, 2]) & (plat >= bb[:, 1]) & (plat <= bb[:, 3])
        cand_pt, cand_poly = cand_pt[m], cand_poly[m]
        if len(cand_pt) == 0:
            return out
        # exact even-odd ring test vectorized over the WHOLE pair stream
        # (padded per-polygon edge tables; identical math to
        # points_in_polygon). Pairs are poly-ascending, and numpy fancy
        # assignment applies duplicates in order → last-wins preserved.
        grp = np.argsort(cand_poly, kind="stable")
        cand_pt, cand_poly = cand_pt[grp], cand_poly[grp]
        plon, plat = lon[cand_pt], lat[cand_pt]
        inside = np.zeros(len(cand_pt), dtype=bool)
        for k in range(self._ex1.shape[1]):
            y1 = self._ey1[cand_poly, k]
            y2 = self._ey2[cand_poly, k]
            crosses = self._ev[cand_poly, k] & ((y1 > plat) != (y2 > plat))
            if not crosses.any():
                continue
            x1 = self._ex1[cand_poly, k]
            x2 = self._ex2[cand_poly, k]
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (plat - y1) / (y2 - y1) + x1
            inside ^= crosses & (plon < xint)
        out[cand_pt[inside]] = self._ids_arr[cand_poly[inside]]
        return out


def bbox_intersects(
    axmin, aymin, axmax, aymax, bxmin: float, bymin: float, bxmax: float, bymax: float
) -> np.ndarray:
    """Vectorized closed-interval bbox intersection (shapely ``intersects``
    analogue, reference utilities/geo.py:160-163)."""
    return (
        (np.asarray(axmin) <= bxmax)
        & (np.asarray(axmax) >= bxmin)
        & (np.asarray(aymin) <= bymax)
        & (np.asarray(aymax) >= bymin)
    )


# --- minimal WKB polygon codec (fixtures store geometry as WKB binary) ---

_WKB_POLYGON = 3


def ring_to_wkb(ring: np.ndarray) -> bytes:
    """(N,2) exterior ring → little-endian WKB Polygon (auto-closes)."""
    ring = np.asarray(ring, dtype=np.float64)
    if not np.allclose(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    out = [struct.pack("<BII", 1, _WKB_POLYGON, 1), struct.pack("<I", len(ring))]
    out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_to_ring(wkb: bytes) -> np.ndarray:
    """WKB Polygon (first/exterior ring only) → (N,2) array."""
    byte_order, gtype = struct.unpack_from("<BI", wkb, 0)
    if byte_order != 1 or (gtype & 0xFF) != _WKB_POLYGON:
        raise ValueError(f"unsupported WKB (order={byte_order}, type={gtype})")
    (nrings,) = struct.unpack_from("<I", wkb, 5)
    if nrings < 1:
        raise ValueError("empty polygon")
    (npts,) = struct.unpack_from("<I", wkb, 9)
    return np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)
