"""Great-circle distance and brute-force kNN kernels (numpy).

Replaces the BallTree the SURVEY planned for the kNN actor stage
(sklearn is absent here). Brute force over unit vectors is a dense
matmul — excellent vectorization and exactly correct; the scale path
buckets references by coarse quadcell so each query only scans nearby
buckets (see ``edkray.ops.joins.KnnJoiner``).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def lonlat_to_unit(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(n,) lon/lat degrees → (n, 3) unit vectors."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([np.cos(lam) * cp, np.sin(lam) * cp, np.sin(phi)], axis=1)


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized haversine distance in km."""
    lon1, lat1 = np.radians(lon1), np.radians(lat1)
    lon2, lat2 = np.radians(lon2), np.radians(lat2)
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def knn_haversine(
    qlon: np.ndarray,
    qlat: np.ndarray,
    rlon: np.ndarray,
    rlat: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact k nearest reference points per query by great-circle distance.

    Returns (indices (n,k) into the reference arrays, distances_km (n,k)),
    each row sorted nearest-first; ties broken by reference index
    (deterministic). Dot product of unit vectors is monotone in
    great-circle distance, so top-k on cosine == top-k on haversine.
    """
    q = lonlat_to_unit(qlon, qlat)  # (n,3)
    r = lonlat_to_unit(rlon, rlat)  # (m,3)
    cos = q @ r.T  # (n,m)
    k = min(k, r.shape[0])
    # stable deterministic top-k: sort by (-cos, ref_idx)
    part = np.argpartition(-cos, kth=k - 1, axis=1)[:, :k]
    pcos = np.take_along_axis(cos, part, axis=1)
    order = np.lexsort((part, -pcos), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    best = np.take_along_axis(cos, idx, axis=1)
    dist = EARTH_RADIUS_KM * np.arccos(np.clip(best, -1.0, 1.0))
    return idx, dist
