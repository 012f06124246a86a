"""Flagship pipeline: spatial-join + tiling over Common-Crawl-style pages.

The Ray-Data re-expression of the reference's discover → mosaic → save
lifecycle (SURVEY §3, §7) over ``pages(url, warc_ts, html, text, lang)``:

read (html pruned at the read) → partition-id + resume filter →
exact URL dedup (the single wide shuffle that carries text) →
geocode (md5-of-domain, FIXTURES.md §1) → quad/hex/S2 cells →
temporal bucketing → grid-cell → tile assignment (modis h/v analogue)
→ STRtree-analogue PIP join vs admin polygons (actor pool) →
[optional kNN actor stage] → write enriched pages partitioned by
part_id + manifest; then a NARROW ranking shuffle (url, tile_id, ts
only — text never shuffles twice) computes the explicit deterministic
per-tile rank that replaces gdal.BuildVRT's implicit last-source-wins
ordering (reference dataset.py:543-552): rank ascending by
(warc_ts, url); the winner of a tile is the MAX rank. Hot tiles
(count > salt_threshold, count-driven) are salted into sub-groups and
ranks recombined via prefix offsets — no single group ever holds a
whole hot cell.

Scale notes: the only full-width exchange is the dedup groupby; the
ranking shuffle carries ~60 bytes/row; admin polygons and the grid are
broadcast once via ray.put; all per-batch kernels are numpy/pyarrow.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from edkray.geo.cells import quadcell
from edkray.geo.hexgrid import hexcell
from edkray.geo.s2 import s2_cellid, s2_token
from edkray.ops.dedup import exact_dedup
from edkray.ops.joins import KnnJoin, PipJoin
from edkray.pipelines.manifest import RunManifest


def geocode_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """url → registered domain → md5-derived lon/lat.

    md5 is computed once per UNIQUE domain in the batch (domains are
    ~10^2-10^5; rows are 10^6+ per batch) then mapped — no per-row
    digest. Rule shared with edkray.fixtures.domain_lonlat.
    """
    urls = pl.from_arrow(batch[url_col])
    doms = urls.str.extract(r"^[a-z0-9+.-]+://([^/]+)", 1).fill_null("")
    uniq = doms.unique()
    lons, lats = {}, {}
    for d in uniq:
        h = hashlib.md5(d.encode()).hexdigest()
        lons[d] = (int(h[:8], 16) % 360000) / 1000.0 - 180.0
        lats[d] = (int(h[8:16], 16) % 170000) / 1000.0 - 85.0
    lon = doms.replace_strict(lons, return_dtype=pl.Float64).rename("lon")
    lat = doms.replace_strict(lats, return_dtype=pl.Float64).rename("lat")
    batch = batch.append_column("domain", doms.to_arrow())
    batch = batch.append_column("lon", lon.to_arrow())
    return batch.append_column("lat", lat.to_arrow())


def add_cell_columns(batch: pa.Table) -> pa.Table:
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    batch = batch.append_column("cell_7", pa.array(quadcell(lon, lat, 7)))
    batch = batch.append_column("cell_9", pa.array(quadcell(lon, lat, 9)))
    batch = batch.append_column("hex_8", pa.array(hexcell(lon, lat, 8)))
    batch = batch.append_column("s2_token", pa.array(s2_token(s2_cellid(lon, lat, 12))))
    return batch


def assign_grid_tile(batch: pa.Table, freq: str = "day") -> pa.Table:
    """Deterministic cell→tile assignment (grid-file semantics).

    The 10°×10° lattice (edkray.fixtures.make_grid) assigns h/v by
    floor division — a point on a shared cell edge lands in the
    higher-h/v cell, i.e. the lexicographically-LAST (h,v), the
    documented overlap rule (FIXTURES.md §5, mirroring BuildVRT
    last-source-wins). Points with |lat| ≥ 80 fall outside the grid →
    null tile (the reference's "no intersecting grid cell" case).
    ``tile_id = "{h}{v}_{date_bucket:%Y%m%d}"``.
    """
    import pyarrow.compute as pc

    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    h = np.clip(np.floor((lon + 180.0) / 10.0), 0, 35).astype(np.int64)
    v = np.floor((lat + 80.0) / 10.0).astype(np.int64)
    in_grid = (lat >= -80.0) & (lat < 80.0)
    bucket = pc.strftime(batch["date_bucket"], format="%Y%m%d").to_pandas().to_numpy()
    tiles = np.where(
        in_grid,
        np.char.add(
            np.char.add(np.char.zfill(h.astype(str), 2), np.char.zfill(np.clip(v, 0, 15).astype(str), 2)),
            np.char.add("_", bucket.astype(str)),
        ),
        None,
    )
    return batch.append_column("tile_id", pa.array(tiles.tolist(), type=pa.string()))


def run_spatial_pipeline(
    pages_path: str,
    admin: pa.Table,
    out_dir: str,
    *,
    knn_refs: pa.Table | None = None,
    k: int = 3,
    num_partitions: int = 16,
    time_range: tuple[dt.datetime, dt.datetime] = (dt.datetime(2017, 1, 1), dt.datetime(2017, 1, 8)),
    freq: str = "day",
    salt_threshold: int = 50_000,
    num_salts: int = 8,
    query_bbox: tuple[float, float, float, float] | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 65536,
    resume: bool = True,
) -> dict:
    """Run the full pipeline; returns the manifest metrics dict.

    Outputs under ``out_dir``:
    - ``pages/part_id=N/``       enriched deduped pages (url, warc_ts,
                                 text, lang, domain, lon, lat, cells,
                                 date_bucket, tile_id, admin_id[,
                                 neighbor_ids])
    - ``assignments/part_id=N/`` (url, tile_id, cell_7, cell_9,
                                 s2_token, admin_id, date_bucket, rank)
    - ``_manifest.json``         fingerprint + per-partition rows/status
    """
    import pyarrow.compute as pc

    fingerprint = hashlib.md5(
        repr(
            (
                pages_path,
                num_partitions,
                time_range,
                freq,
                query_bbox,
                k if knn_refs is not None else None,
                pl.__version__,  # part_id hash stability domain
            )
        ).encode()
    ).hexdigest()
    manifest = RunManifest.load(out_dir, fingerprint)
    pages_dir = os.path.join(out_dir, "pages")
    assign_dir = os.path.join(out_dir, "assignments")
    if resume:
        manifest.purge_incomplete([pages_dir, assign_dir], num_partitions)
    else:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        manifest = RunManifest.load(out_dir, fingerprint)
    done = manifest.done_partitions() if resume else set()
    todo = [p for p in range(num_partitions) if p not in done]
    if not todo:
        return manifest.metrics

    # 1. read — html pruned at the read (never leaves storage)
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "text", "lang"])

    # 2. partition id + resume filter (vectorized, before any wide work)
    todo_arr = np.zeros(num_partitions, dtype=bool)
    todo_arr[todo] = True

    def _part_filter(batch: pa.Table) -> pa.Table:
        pid = (
            pl.from_arrow(batch["url"]).hash(seed=7) % np.uint64(num_partitions)
        ).to_numpy().astype(np.int64)
        batch = batch.append_column("part_id", pa.array(pid))
        return batch.filter(pa.array(todo_arr[pid]))

    ds = ds.map_batches(_part_filter, batch_format="pyarrow", batch_size=batch_size)

    # 3. exact dedup by url — first by (warc_ts, text); the one wide shuffle
    ds = exact_dedup(ds, ["url"], ["warc_ts", "text"], batch_size=batch_size)

    # 4. geocode + cells
    ds = ds.map_batches(
        lambda b: add_cell_columns(geocode_batch(b)), batch_format="pyarrow", batch_size=batch_size
    )
    if query_bbox is not None:
        from edkray.ops.stages import bbox_filter

        ds = ds.map_batches(
            lambda b: bbox_filter(b, query_bbox), batch_format="pyarrow", batch_size=batch_size
        )

    # 5. temporal bucket (drop out-of-range, reference rule pinned in SURVEY §2.11)
    from edkray.ops.stages import temporal_bucket

    ds = ds.map_batches(
        lambda b: temporal_bucket(b, "warc_ts", freq, start=time_range[0], end=time_range[1]),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    # 6. tile assignment + PIP join (admin broadcast once; index per actor)
    ds = ds.map_batches(
        lambda b: assign_grid_tile(b, freq), batch_format="pyarrow", batch_size=batch_size
    )
    admin_ref = ray.put(admin)
    ds = ds.map_batches(
        PipJoin,
        fn_constructor_kwargs=dict(polygons_ref=admin_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if knn_refs is not None:
        refs_ref = ray.put(knn_refs)
        ds = ds.map_batches(
            KnnJoin,
            fn_constructor_kwargs=dict(refs_ref=refs_ref, k=k),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # 7. write enriched pages (partitioned by part_id → resumable)
    ds.write_parquet(pages_dir, partition_cols=["part_id"])

    # 8. NARROW rank shuffle from the written pages (re-read projects
    #    only ~60B/row; text does not shuffle again)
    narrow = ray.data.read_parquet(
        pages_dir, columns=["url", "warc_ts", "tile_id", "cell_7", "cell_9", "s2_token", "admin_id", "date_bucket", "part_id"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b["tile_id"])), batch_format="pyarrow"
    )

    # 8a. count-driven salting: per-tile counts (combiner pre-agg) → hot set
    from edkray.ops.aggregate import grouped_agg

    counts = grouped_agg(narrow, ["tile_id"], [("count", None, "n")]).to_pandas()
    hot = set(counts.loc[counts["n"] > salt_threshold, "tile_id"])
    manifest.metrics["hot_tiles"] = sorted(hot)

    def _salt(batch: pa.Table) -> pa.Table:
        tid = batch["tile_id"].to_pandas().to_numpy()
        uh = pl.from_arrow(batch["url"]).hash(seed=13).to_numpy()
        is_hot = np.isin(tid, list(hot)) if hot else np.zeros(len(tid), dtype=bool)
        salt = np.where(is_hot, (uh % np.uint64(num_salts)).astype(np.int64), 0)
        return batch.append_column("salt", pa.array(salt))

    salted = narrow.map_batches(_salt, batch_format="pyarrow", batch_size=batch_size)

    # 8b. per-(tile, salt) counts → prefix offsets (driver-side: small)
    sc = grouped_agg(salted, ["tile_id", "salt"], [("count", None, "n")]).to_pandas()
    sc = sc.sort_values(["tile_id", "salt"])
    sc["offset"] = sc.groupby("tile_id")["n"].cumsum() - sc["n"]
    offsets_tbl = pa.table(
        {
            "tile_id": sc["tile_id"].to_numpy(),
            "salt": sc["salt"].to_numpy().astype(np.int64),
            "__offset": sc["offset"].to_numpy().astype(np.int64),
        }
    )
    offsets_ref = ray.put(offsets_tbl)

    from edkray.ops.shuffle import bucketed_group_map

    def _rank_bucket(table: pa.Table) -> pa.Table:
        # one bucket = many whole (tile_id, salt) groups; vectorized rank
        off = pl.from_arrow(ray.get(offsets_ref))
        df = pl.from_arrow(table).sort(["tile_id", "salt", "warc_ts", "url"])
        df = df.with_columns(
            pl.int_range(pl.len()).over(["tile_id", "salt"]).alias("__local")
        ).join(off, on=["tile_id", "salt"], how="left")
        df = df.with_columns(
            (pl.col("__local") + pl.col("__offset").fill_null(0)).alias("rank")
        ).drop(["__local", "__offset", "salt", "warc_ts"])
        return df.to_arrow()

    # NOTE: with salting, ranks are deterministic but ordered by
    # (salt-bucket, warc_ts, url) within a hot tile — the ordering RULE
    # (explicit, reproducible) replaces BuildVRT's catalog order.
    ranked = bucketed_group_map(salted, ["tile_id", "salt"], _rank_bucket, num_buckets=64)
    ranked.write_parquet(assign_dir, partition_cols=["part_id"])

    # 9. finalize manifest: per-partition row counts from footers (cheap)
    total_rows = 0
    for p in todo:
        part_dir = os.path.join(pages_dir, f"part_id={p}")
        rows = 0
        if os.path.exists(part_dir):
            for f in os.listdir(part_dir):
                if f.endswith(".parquet"):
                    rows += pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
        manifest.mark_done(p, rows)
        total_rows += rows
    manifest.metrics.update(
        {
            "partitions_processed": len(todo),
            "partitions_skipped": len(done),
            "rows_written_this_run": total_rows,
            "num_partitions": num_partitions,
        }
    )
    manifest.save()
    return manifest.metrics
