"""Deterministic synthetic fixtures per FIXTURES.md (seed=42, offline).

Replaces the reference's live test corpus (MODIS tiles + modis.kml grid
+ Natural-Earth bboxes, SURVEY §5) with generated Parquet of exactly the
BASELINE.json input_hint shape. The geocode rule (md5(domain) → lon/lat)
is shared between generator and engine so an independent oracle can
recompute every assignment.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from edkray.geo.pip import ring_to_wkb

SEED = 42
T0 = dt.datetime(2017, 1, 1)
T1 = dt.datetime(2017, 1, 8)

_WORDS = (
    "the quick brown fox jumps over lazy dog web page corpus crawl data "
    "spatial join tile cell index stream batch arrow ray shuffle actor "
    "der die das und nicht le la les est un el los que"
).split()


def domain_lonlat(domain: str) -> tuple[float, float]:
    """FIXTURES.md §1 geocode rule: md5(domain) → lon/lat (shared with
    the engine's geocode stage and the test oracles)."""
    h = hashlib.md5(domain.encode()).hexdigest()
    lon = (int(h[:8], 16) % 360000) / 1000.0 - 180.0
    lat = (int(h[8:16], 16) % 170000) / 1000.0 - 85.0
    return lon, lat


def make_pages(n: int = 10_000, seed: int = SEED, hot_frac: float = 0.2,
               dup_frac: float = 0.01) -> pa.Table:
    """pages(url, warc_ts, html, text, lang) with hot-cell skew and dups.

    - ~200 registered domains; 20% of rows share one "dense urban"
      domain cluster (domains geocoding into one res-7 quadcell),
    - ~1% duplicated urls with differing warc_ts (dedup fixture),
    - text is deterministic per url (byte-identity invariant column).
    """
    rng = np.random.default_rng(seed)
    domains = [f"site{i:03d}.example" for i in range(200)]
    # hot cluster: one domain reused for hot_frac of rows
    hot_domain = "hotcity.example"
    n_hot = int(n * hot_frac)
    dom_idx = rng.integers(0, len(domains), size=n - n_hot)
    doms = np.array([domains[i] for i in dom_idx] + [hot_domain] * n_hot, dtype=object)
    rng.shuffle(doms)

    paths = rng.integers(0, 1 << 40, size=n)
    urls = np.array([f"https://{d}/p/{p:011x}" for d, p in zip(doms, paths)], dtype=object)
    # duplicates: repeat ~dup_frac of urls with a different timestamp
    n_dup = int(n * dup_frac)
    dup_src = rng.choice(n, size=n_dup, replace=False)
    urls = np.concatenate([urls, urls[dup_src]])
    doms = np.concatenate([doms, doms[dup_src]])

    total = len(urls)
    span_us = int((T1 - T0).total_seconds() * 1e6)
    ts_us = rng.integers(0, span_us, size=total)
    warc_ts = np.array([T0 + dt.timedelta(microseconds=int(u)) for u in ts_us])

    langs = np.array(
        [("en", "de", "fr", "es", "zh")[int(hashlib.md5(d.encode()).hexdigest()[16:18], 16) % 5]
         for d in doms], dtype=object)

    texts = np.empty(total, dtype=object)
    htmls = np.empty(total, dtype=object)
    for i, u in enumerate(urls):
        h = hashlib.md5(u.encode()).hexdigest()
        k = int(h[:4], 16)
        words = " ".join(_WORDS[(k + j) % len(_WORDS)] for j in range(20 + k % 30))
        texts[i] = f"{h} {words}"
        htmls[i] = (f"<html><body>{texts[i]}</body></html>".encode() * (1 + k % 4))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def make_grid() -> pa.Table:
    """10°×10° lattice grid (modis.kml h/v analogue, FIXTURES.md §2)."""
    rows = {"h": [], "v": [], "wkb_geometry": [],
            "xmin": [], "ymin": [], "xmax": [], "ymax": []}
    for hi, x0 in enumerate(range(-180, 180, 10)):
        for vi, y0 in enumerate(range(-80, 80, 10)):
            ring = np.array([[x0, y0], [x0 + 10, y0], [x0 + 10, y0 + 10], [x0, y0 + 10]],
                            dtype=np.float64)
            rows["h"].append(f"{hi:02d}")
            rows["v"].append(f"{vi:02d}")
            rows["wkb_geometry"].append(ring_to_wkb(ring))
            rows["xmin"].append(float(x0))
            rows["ymin"].append(float(y0))
            rows["xmax"].append(float(x0 + 10))
            rows["ymax"].append(float(y0 + 10))
    return pa.table(rows)


def make_admin(seed: int = SEED) -> pa.Table:
    """~60 jittered convex quadrilaterals (country-bbox analogue,
    FIXTURES.md §3). Deliberately leaves slivers/gaps at jittered edges
    (PIP edge cases); polygons carry bbox prefilter columns."""
    rng = np.random.default_rng(seed + 1)
    rows = {"admin_id": [], "name": [], "wkb_geometry": [],
            "bbox_xmin": [], "bbox_ymin": [], "bbox_xmax": [], "bbox_ymax": []}
    k = 0
    for x0 in range(-180, 180, 36):
        for y0 in range(-85, 85, 34):
            x1, y1 = x0 + 36, min(y0 + 34, 85)
            jit = rng.uniform(-2.0, 2.0, size=8)
            ring = np.array(
                [
                    [x0 + abs(jit[0]), y0 + abs(jit[1])],
                    [x1 - abs(jit[2]), y0 + abs(jit[3])],
                    [x1 - abs(jit[4]), y1 - abs(jit[5])],
                    [x0 + abs(jit[6]), y1 - abs(jit[7])],
                ],
                dtype=np.float64,
            )
            aid = chr(ord("A") + k // 26) + chr(ord("A") + k % 26)
            rows["admin_id"].append(aid)
            rows["name"].append(f"Region {aid}")
            rows["wkb_geometry"].append(ring_to_wkb(ring))
            rows["bbox_xmin"].append(ring[:, 0].min())
            rows["bbox_ymin"].append(ring[:, 1].min())
            rows["bbox_xmax"].append(ring[:, 0].max())
            rows["bbox_ymax"].append(ring[:, 1].max())
            k += 1
    return pa.table(rows)


def make_knn_refs(n: int = 5000, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed + 2)
    return pa.table(
        {
            "ref_id": pa.array([f"ref{i:05d}" for i in range(n)]),
            "lon": pa.array(rng.uniform(-180.0, 180.0, size=n)),
            "lat": pa.array(rng.uniform(-85.0, 85.0, size=n)),
        }
    )


QUERY_BBOXES = {
    "europe": (-10.0, 35.0, 30.0, 60.0),
    "africa": (-20.0, -35.0, 50.0, 35.0),
    "namerica": (-130.0, 25.0, -60.0, 55.0),
    "samerica": (-80.0, -55.0, -35.0, 10.0),
    "asia": (60.0, 5.0, 140.0, 55.0),
    "oceania": (110.0, -45.0, 180.0, -10.0),
    "atlantic": (-40.0, -20.0, -20.0, 20.0),
    "arctic_sliver": (-180.0, 84.0, 180.0, 85.0),
    "empty_pole": (-1.0, 89.5, 1.0, 90.0),  # matches zero pages (no-tiles case)
    "global": (-180.0, -85.0, 180.0, 85.0),
}


def write_fixture_dir(out_dir: str, n_pages: int = 10_000, seed: int = SEED) -> dict[str, str]:
    """Write pages/grid/admin/knn_refs parquet under ``out_dir``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, table in (
        ("pages", make_pages(n_pages, seed)),
        ("grid", make_grid()),
        ("admin", make_admin(seed)),
        ("knn_refs", make_knn_refs(seed=seed)),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = p
    return paths
