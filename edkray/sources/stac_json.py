"""Offline STAC-style JSON-catalog Source — the second registry engine.

Reproduces the reference's STAC scan semantics (engines/stac.py:67-91:
catalog search with bbox + datetime pushdown, one row per item) and its
asset-expansion + signing behavior (formats/stac_asset.py:25-247:
per-item asset iteration, media-type/role filtering, href → access-path
rewrite incl. the Planetary-Computer signing prefix at
stac_asset.py:152-156) against a LOCAL JSON catalog, so the plugin
surface a real user hits first — credentialed, predicate-pushdown scan
through the registry — is exercised end-to-end offline.

Catalog format (one JSON file per collection):

    {"collection": "name",
     "items": [{"id": "...", "datetime": "2017-01-01T00:00:00",
                "bbox": [xmin, ymin, xmax, ymax],
                "assets": {"data": {"href": "...", "media_type":
                           "application/x-parquet", "roles": ["data"]}}}]}

Pushdown happens at the CATALOG level: items outside the datetime range
or not intersecting the query bbox are dropped before any data file is
opened — the Ray read only ever sees matching assets (the reference's
server-side ``SetSpatialFilterRect``/search-params analogue).
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Callable

import pyarrow as pa
import ray.data

from edkray.sources.registry import register_source
from edkray.sources.templates import GridCell

# media types the asset expansion keeps (reference is_asset_allowed,
# formats/stac_asset.py — COG/TIFF there, parquet here)
ALLOWED_MEDIA_TYPES = {"application/x-parquet", "application/parquet"}


def identity_signer(href: str) -> str:
    return href


def make_prefix_signer(token: str) -> Callable[[str], str]:
    """Planetary-Computer-style signing hook: rewrites each asset href
    with a credential before access (stac_asset.py:152-156 builds
    ``/vsicurl?pc_url_signing=yes&...&url={href}``). Offline analogue:
    strips a ``signed+`` scheme prefix that unsigned hrefs carry, after
    checking the token — proving the hook runs on every asset path."""

    def _sign(href: str) -> str:
        if href.startswith("signed+"):
            if not token:
                raise PermissionError(f"asset requires signing: {href}")
            return href[len("signed+"):]
        return href

    return _sign


class JsonCatalogSource:
    """STAC-like catalog scan with bbox/datetime pushdown + signing.

    ``signer`` is applied to every kept asset href (credential hook);
    ``cache_dir`` enables the probe-resume download/cache stage
    (edkray.sources.cache) before the Parquet read — the reference's
    ``sync`` step (engines/stac.py:93-158: fetch-if-not-openable)."""

    def __init__(self, signer: Callable[[str], str] | None = None,
                 cache_dir: str | None = None):
        self.signer = signer or identity_signer
        self.cache_dir = cache_dir

    def _search(
        self,
        catalog_path: str,
        time_range: tuple[dt.datetime, dt.datetime] | None,
        query_bbox: tuple[float, float, float, float] | None,
    ) -> list[dict]:
        with open(catalog_path) as f:
            catalog = json.load(f)
        kept = []
        for item in catalog.get("items", []):
            when = dt.datetime.fromisoformat(item["datetime"])
            if time_range is not None and not (time_range[0] <= when < time_range[1]):
                continue  # datetime pushdown (left-inclusive, engines/commons.py)
            if query_bbox is not None and "bbox" in item:
                xmin, ymin, xmax, ymax = item["bbox"]
                qxmin, qymin, qxmax, qymax = query_bbox
                if xmin > qxmax or xmax < qxmin or ymin > qymax or ymax < qymin:
                    continue  # bbox pushdown (closed intersects, geo.py:160-163)
            kept.append({**item, "__when": when})
        return kept

    def scan(
        self,
        source: str,
        time_range: tuple[dt.datetime, dt.datetime] | None = None,
        grid: list[GridCell] | None = None,
        query_bbox: tuple[float, float, float, float] | None = None,
        columns: list[str] | None = None,
    ) -> ray.data.Dataset:
        items = self._search(source, time_range, query_bbox)
        rows: list[tuple[str, str, dt.datetime]] = []  # (path, item_id, date)
        for item in items:
            for key, asset in item.get("assets", {}).items():
                mt = asset.get("media_type")
                roles = asset.get("roles") or []
                if mt not in ALLOWED_MEDIA_TYPES or "data" not in roles:
                    continue  # media-type/role filter (stac_asset.py:25-60)
                rows.append((self.signer(asset["href"]), item["id"], item["__when"]))
        if not rows:
            raise ValueError(
                f"no assets matched catalog {source!r} with the given filters"
            )  # zero-result check (dataset.py:276-277)
        if self.cache_dir is not None:
            from edkray.sources.cache import fetch_all

            local = fetch_all([p for p, _, _ in rows], self.cache_dir)
            rows = [(lp, tid, d) for lp, (_, tid, d) in zip(local, rows)]

        meta = {p: (tid, d) for p, tid, d in rows}
        ds = ray.data.read_parquet([p for p, _, _ in rows], columns=columns,
                                   include_paths=True)

        def _attach(batch: pa.Table) -> pa.Table:
            tids, dates = [], []
            for p in batch["path"].to_pylist():
                tid, d = meta.get(p, (None, None))
                tids.append(tid)
                dates.append(d)
            batch = batch.drop_columns(["path"])
            batch = batch.append_column("tile_name", pa.array(tids, type=pa.string()))
            return batch.append_column("date", pa.array(dates, type=pa.timestamp("us")))

        return ds.map_batches(_attach, batch_format="pyarrow")


register_source("stac_json", JsonCatalogSource)


class PlanetaryJsonSource:
    """Fourth registry engine — signing-always-on catalog scan.

    The reference's PlanetaryComputer engine (engines/
    planetary_computer.py:8-39) is composition over its STAC engine
    with URL signing enabled on every scan; this is the same shape over
    :class:`JsonCatalogSource`. The token defaults to the anonymous
    credential (Planetary Computer signs anonymously too); pass
    ``token=""`` to prove the hook rejects unsigned access."""

    def __init__(self, token: str | None = None, cache_dir: str | None = None):
        self._stac = JsonCatalogSource(
            signer=make_prefix_signer("anon" if token is None else token),
            cache_dir=cache_dir,
        )

    def scan(self, *args, **kwargs) -> ray.data.Dataset:
        return self._stac.scan(*args, **kwargs)


register_source("pc_json", PlanetaryJsonSource)
