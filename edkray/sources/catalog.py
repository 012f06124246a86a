"""Catalog construction — the ``Dataset.discover()`` analogue.

The reference fetches per-tile GDAL metadata in a thread pool and
persists ``catalog.csv`` with JSON-encoded nested columns
(dataset.py:183-284). Here discovery is a Ray pipeline over file paths:
each task reads only the Parquet FOOTER (row counts + column min/max
stats — the remote-metadata analogue of gdal.Open) and the catalog is
typed Parquet (no stringly CSV, SURVEY §2.1 S9).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _file_meta(batch: pa.Table) -> pa.Table:
    """Per-path footer scan: rows, bytes, lon/lat/time bounds if present."""
    out = {
        "path": [], "n_rows": [], "n_bytes": [], "n_row_groups": [],
        "lon_min": [], "lon_max": [], "lat_min": [], "lat_max": [],
        "ts_min": [], "ts_max": [],
    }
    for path in batch["path"].to_pylist():
        md = pq.ParquetFile(path).metadata
        bounds = {c: [None, None] for c in ("lon", "lat", "warc_ts")}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in bounds and col.statistics and col.statistics.has_min_max:
                    lo, hi = bounds[name]
                    mn, mx = col.statistics.min, col.statistics.max
                    bounds[name] = [mn if lo is None else min(lo, mn),
                                    mx if hi is None else max(hi, mx)]
        out["path"].append(path)
        out["n_rows"].append(md.num_rows)
        out["n_bytes"].append(os.path.getsize(path))
        out["n_row_groups"].append(md.num_row_groups)
        out["lon_min"].append(bounds["lon"][0])
        out["lon_max"].append(bounds["lon"][1])
        out["lat_min"].append(bounds["lat"][0])
        out["lat_max"].append(bounds["lat"][1])
        out["ts_min"].append(bounds["warc_ts"][0])
        out["ts_max"].append(bounds["warc_ts"][1])
    return pa.table(out)


def explode_bands(ds: ray.data.Dataset, bands_col: str = "bands") -> ray.data.Dataset:
    """Catalog tile rows → one row per band (the reference's band
    explosion, dataset.py:349-368, S6/S7/S8 subdataset expansion shape:
    1 row → N rows via flat_map semantics inside map_batches).

    ``bands_col`` is a ``list<struct<...>>`` column; each struct's
    fields become top-level columns suffixed onto the tile row.
    """
    import polars as pl

    def _explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.explode(bands_col).unnest(bands_col).to_arrow()

    return ds.map_batches(_explode, batch_format="pyarrow")


def validate_homogeneous(ds: ray.data.Dataset, group_cols: list[str], value_cols: list[str]) -> None:
    """Raise if any ``group_cols`` group has >1 distinct value in any of
    ``value_cols`` (reference M9 property validation, dataset.py:434-469:
    unique dtype/crs/resolution per band unless overrides given)."""
    from edkray.ops.aggregate import count_distinct

    for col in value_cols:
        nd = count_distinct(ds, group_cols, col, alias="__nd").to_pandas()
        bad = nd[nd["__nd"] > 1]
        if len(bad):
            raise ValueError(
                f"non-homogeneous {col!r} within {group_cols}: "
                f"{bad[group_cols].to_dict('records')[:5]}"
            )


def global_min_max(ds: ray.data.Dataset, col: str) -> tuple[float, float]:
    """Global min/max of a column (reference A6 — colormap/rescale
    bounds) via Ray's partial+final aggregate; feeds rescale_255."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    return float(row["lo"]), float(row["hi"])


def discover(paths: list[str], catalog_path: str | None = None) -> ray.data.Dataset:
    """Scan parquet shards' footers in parallel → catalog Dataset.

    ``catalog_path`` persists the catalog as Parquet (the catalog.csv
    sink/source S9 — read back with ``ray.data.read_parquet``).
    """
    ds = ray.data.from_items([{"path": p} for p in paths])
    cat = ds.map_batches(_file_meta, batch_format="pyarrow", batch_size=64)
    if catalog_path:
        cat.write_parquet(catalog_path)
        return ray.data.read_parquet(catalog_path)
    return cat
