"""Flagship pipeline: spatial-join + tiling over Common-Crawl-style pages.

The Ray-Data re-expression of the reference's discover → mosaic → save
lifecycle (SURVEY §3, §7) over ``pages(url, warc_ts, html, text, lang)``:

read (html pruned at the read) → partition-id + resume filter →
exact URL dedup (the single wide shuffle that carries text) →
ONE FUSED TASK STAGE [geocode (md5-of-domain, FIXTURES.md §1) →
quad/hex/S2 cells → temporal bucketing → grid-cell → tile assignment
(modis h/v analogue) → STRtree-analogue PIP join vs broadcast admin
polygons → optional kNN] → write enriched pages partitioned by
part_id + manifest; then a NARROW ranking pass (url, tile_id, ts only
— text never shuffles twice): ONE per-(tile, salt) count job feeds
both count-driven hot-tile detection and rank prefix offsets, then a
bucketed shuffle computes the explicit deterministic per-tile rank
that replaces gdal.BuildVRT's implicit last-source-wins ordering
(reference dataset.py:543-552): rank ascending by (warc_ts, url);
the winner of a tile is the MAX rank. Hot tiles (count >
salt_threshold) keep their salt sub-groups (rank order (salt,
warc_ts, url), documented) so no single task ever holds a whole hot
cell; cold tiles collapse to one group with exact (warc_ts, url)
order.

Scale notes: the only full-width exchange is the dedup groupby; the
ranking shuffle carries ~60 bytes/row; admin polygons / kNN refs are
broadcast once via ray.put and built once per worker process
(process_cached) so the post-shuffle chain stays one fused task; all
per-batch kernels are numpy/pyarrow/polars. Shuffle width is sized at
~2 blocks per CPU (see BASELINE.md for measured scaling).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import time

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


@ray.remote(num_cpus=0)
class _ClaimRegistry:
    """Tiny shared claim set resolving cross-block IDENTICAL-row dedup in
    narrow mode — the one semantics the Dataset API can't express without
    a second wide shuffle (a shared mutable index, SURVEY §1.3). Only the
    rare multi-copy winner keys ever reach it, so contention is bounded
    by the number of exact full-row duplicates, not the corpus. First
    claimant keeps the row; a retried task passes the same owner token
    (block content hash) and re-claims its own keys idempotently."""

    def __init__(self):
        self._owner: dict[int, int] = {}

    def claim(self, keys: list[int], owner: int) -> list[bool]:
        return [self._owner.setdefault(k, owner) == owner for k in keys]


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
    """Quad 7/9, hex 7/8/9 and S2 cell columns (north_star: H3-style res
    7-9). The documented shuffle key rule (SURVEY §7): any hex-keyed
    groupby uses the res-7 PARENT of the res-9 cell — computed here as
    ``hex_7`` directly from lon/lat, which equals
    ``hexcell_parent(hex_9 → 8 → 7)`` for cell centers (aperture-7
    parents don't nest exactly at cell edges; the parent-rule test pins
    the center-containment invariant)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    batch = batch.append_column("cell_7", pa.array(quadcell(lon, lat, 7)))
    batch = batch.append_column("cell_9", pa.array(quadcell(lon, lat, 9)))
    for r in (7, 8, 9):
        batch = batch.append_column(f"hex_{r}", pa.array(hexcell(lon, lat, r)))
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
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    h = np.clip(np.floor((lon + 180.0) / 10.0), 0, 35).astype(np.int64)
    v = np.clip(np.floor((lat + 80.0) / 10.0), 0, 15).astype(np.int64)
    in_grid = (lat >= -80.0) & (lat < 80.0)
    # string assembly in polars (vectorized Rust) — np.char measured
    # 4.4 µs/row, this path ~0.4 µs/row
    df = pl.DataFrame(
        {
            "h": h,
            "v": v,
            "in": in_grid,
            "bucket": pl.from_arrow(
                batch["date_bucket"].combine_chunks()
                if isinstance(batch["date_bucket"], pa.ChunkedArray)
                else batch["date_bucket"]
            ),
        }
    )
    tiles = df.select(
        pl.when(pl.col("in"))
        .then(
            pl.col("h").cast(pl.Utf8).str.zfill(2)
            + pl.col("v").cast(pl.Utf8).str.zfill(2)
            + "_"
            + pl.col("bucket").dt.strftime("%Y%m%d")
        )
        .otherwise(None)
        .alias("tile_id")
    )["tile_id"]
    return batch.append_column("tile_id", tiles.to_arrow().cast(pa.string()))


def _partitioned_winner_filter(
    ds: ray.data.Dataset,
    win_ds: ray.data.Dataset,
    pages_path: str,
    num_buckets: int,
    batch_size: int,
) -> ray.data.Dataset:
    """Winner-key filter without the broadcast: pages and winner keys
    co-shuffle on url-hash, each bucket filters its own pages against
    its own (sorted) key slice. Costs one wide shuffle of the pages —
    like ``dedup_mode="wide"`` — but keeps the narrow tiebreak
    semantics, and because ALL copies of a url share a bucket, a single
    in-bucket unique resolves cross-block identical rows with no claim
    actor. This is the 10^12-url path where the 8 B/url broadcast
    (~8 TB) would blow the object store."""
    from edkray.ops.shuffle import bucketed_group_map
    from edkray.utils import fnv1a64_int

    DSIDE = "__dside"
    from edkray.utils import scrubbed_schema

    cols = ["url", "warc_ts", "text", "lang"]
    base_sch = scrubbed_schema(pages_path, cols)
    if base_sch is None:  # hive tree or opaque layout — fetch via Ray
        s = ray.data.read_parquet(pages_path, columns=cols).schema()
        base_sch = pa.schema(list(zip(s.names, s.types)))
    page_fields = [(f.name, f.type) for f in base_sch] + [("part_id", pa.int64())]
    page_cols = [n for n, _ in page_fields]
    all_fields = [("uh", pa.uint64()), ("wk", pa.uint64())] + page_fields

    def _tag(t: pa.Table, side: int) -> pa.Table:
        cols = {}
        for name, typ in all_fields:
            if name in t.schema.names:
                c = t[name]
                cols[name] = c.cast(typ) if c.type != typ else c
            else:
                cols[name] = pa.nulls(len(t), typ)
        cols[DSIDE] = pa.array(np.full(len(t), side, dtype=np.int8))
        return pa.table(cols)

    def _tag_pages(b: pa.Table) -> pa.Table:
        uh = pl.from_arrow(b["url"]).hash(seed=3).to_numpy().astype(np.uint64)
        return _tag(b.append_column("uh", pa.array(uh)), 1)

    tagged = win_ds.map_batches(
        lambda t: _tag(t, 0), batch_format="pyarrow", batch_size=batch_size
    ).union(ds.map_batches(_tag_pages, batch_format="pyarrow", batch_size=batch_size))

    def _part_dedup(table: pa.Table) -> pa.Table:
        side = table[DSIDE].to_numpy(zero_copy_only=False)
        wtab = table.filter(pa.array(side == 0))
        pages = table.filter(pa.array(side == 1))
        keys = np.sort(wtab["wk"].to_numpy(zero_copy_only=False).astype(np.uint64))
        uh = pages["uh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        th = pl.from_arrow(pages["text"]).hash(seed=5).to_numpy().astype(np.uint64)
        ts = pages["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        kk = fnv1a64_int(uh) ^ fnv1a64_int(ts, seed=1) ^ fnv1a64_int(th, seed=2)
        pos = np.searchsorted(keys, kk)
        keep = (pos < len(keys)) & (len(keys) > 0)
        if len(keys):
            keep &= keys[np.minimum(pos, len(keys) - 1)] == kk
        kept = pages.filter(pa.array(keep)).select(page_cols)
        # every copy of a url is in this bucket: one unique pass resolves
        # within- AND cross-block identical winning rows
        return (
            pl.from_arrow(kept)
            .unique(subset=["url", "warc_ts", "text"], keep="first", maintain_order=True)
            .to_arrow()
        )

    return bucketed_group_map(
        tagged, ["uh"], _part_dedup, num_buckets=num_buckets, batch_size=batch_size
    )


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
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 65536,
    resume: bool = True,
    dedup_mode: str = "wide",
    wk_mode: str = "auto",
    wk_broadcast_max: int = 150_000_000,
    read_cache: str = "reread",
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

    ``wk_mode`` (narrow dedup only) picks the winner-key filter:
    ``"broadcast"`` ships the sorted key array via ``ray.put`` (8 B per
    unique url — fastest while it fits the object store);
    ``"partitioned"`` co-shuffles pages and winner keys on url-hash and
    filters per bucket (one wide shuffle, no broadcast — the 10^12-url
    path); ``"auto"`` counts winners and picks broadcast below
    ``wk_broadcast_max`` keys (default 150M ≈ 1.2 GB).

    ``read_cache`` (narrow dedup only) controls the double pass the
    decision shuffle implies: ``"reread"`` (default) streams the
    parquet source twice — no object-store residency beyond the
    executing stages, the right choice when the projected working set
    is corpus-sized; ``"materialize"`` pins the read once in the object
    store (spill-backed) and runs both the decision pass and the
    winner-filter+enrich pass over the SAME blocks — one parquet decode
    instead of two, and plasma re-reads are zero-copy mmap of
    already-provisioned pages (measured 2.6× on the double pass in this
    sandbox). Use it when the per-run partition subset fits the object
    store + spill budget.
    """
    import pyarrow.compute as pc

    cluster_cpus = max(4, int(ray.cluster_resources().get("CPU", 8)))
    if concurrency is None:
        # actor pools sized to the cluster so no stage caps parallelism
        concurrency = (1, cluster_cpus)
    # ~2 blocks per CPU: enough parallelism without drowning the sort
    # shuffle in tiny per-(map, reduce) objects (128×128 slices measured
    # 2× slower than 64×64 on the same data)
    num_blocks = 2 * cluster_cpus
    num_buckets = 2 * cluster_cpus

    fingerprint = hashlib.md5(
        repr(
            (
                pages_path,
                num_partitions,
                time_range,
                freq,
                query_bbox,
                k if knn_refs is not None else None,
                dedup_mode,
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
    phase_times: dict[str, float] = {}
    t_phase = time.time()

    # 1. read — html pruned at the read (never leaves storage); schema
    # scrubbed of pandas metadata so read blocks hash cleanly
    from edkray.utils import scrubbed_schema

    _page_cols = ["url", "warc_ts", "text", "lang"]
    ds = ray.data.read_parquet(
        pages_path, columns=_page_cols,
        schema=scrubbed_schema(pages_path, _page_cols),
        override_num_blocks=num_blocks,
    )

    # 2. partition id + resume filter (vectorized, before any wide work)
    todo_arr = np.zeros(num_partitions, dtype=bool)
    todo_arr[todo] = True

    def _part_filter(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)  # unhashable-dict metadata breaks Ray's schema dedup
        pid = (
            pl.from_arrow(batch["url"]).hash(seed=7) % np.uint64(num_partitions)
        ).to_numpy().astype(np.int64)
        batch = batch.append_column("part_id", pa.array(pid))
        return batch.filter(pa.array(todo_arr[pid]))

    ds = ds.map_batches(_part_filter, batch_format="pyarrow", batch_size=batch_size)

    if read_cache not in ("reread", "materialize"):
        raise ValueError(f"read_cache must be reread|materialize, got {read_cache!r}")
    if read_cache == "materialize" and dedup_mode == "narrow":
        # one parquet decode for BOTH the decision pass and the
        # winner-filter+enrich pass (see docstring)
        ds = ds.materialize()

    # 3. exact dedup by url — first by (warc_ts, text)
    if dedup_mode == "wide":
        # general path: one wide shuffle carries full rows
        ds = exact_dedup(ds, ["url"], ["warc_ts", "text"], num_buckets=num_buckets,
                         batch_size=batch_size)
    elif dedup_mode == "narrow":
        # scale path: the dedup DECISION shuffles only ~24 B/row
        # (url-hash, ts, text-hash); the wide rows never shuffle — each
        # task filters itself against the broadcast winner-key set, so
        # read → filter → enrich → write is one fused, all-to-all-free
        # stage. Tiebreak is (warc_ts, xxh64(text)) instead of
        # (warc_ts, text) — equal except under 64-bit hash collision
        # (the only remaining semantic gap vs "wide"; documented in
        # BASELINE.md). Fully identical (url, ts, text) rows in
        # DIFFERENT blocks are resolved by a tiny claim-registry actor:
        # the decision shuffle counts exact copies of each winning row,
        # and only the (rare) multi-copy keys go through the actor —
        # first claimant keeps the row, retries are idempotent via a
        # block-content owner token. Winner keys are 8 B/unique-url; at
        # corpus sizes where they exceed the object store, wk_mode
        # switches to _partitioned_winner_filter (co-shuffle on
        # url-hash, no broadcast, no claim actor).
        def _decision(batch: pa.Table) -> pa.Table:
            uh = pl.from_arrow(batch["url"]).hash(seed=3).to_numpy().astype(np.uint64)
            th = pl.from_arrow(batch["text"]).hash(seed=5).to_numpy().astype(np.uint64)
            ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({"uh": pa.array(uh), "ts": pa.array(ts), "th": pa.array(th)})

        from edkray.ops.shuffle import bucketed_group_map
        from edkray.utils import fnv1a64_int

        dec = ds.map_batches(_decision, batch_format="pyarrow", batch_size=batch_size)

        def _winners(table: pa.Table) -> pa.Table:
            df = pl.from_arrow(table)
            win = (
                df.sort(["ts", "th"], maintain_order=True)
                .unique(subset=["uh"], keep="first", maintain_order=True)
            )
            # how many exact copies of the winning (ts, th) row exist —
            # >1 means identical full rows that may span blocks
            cnt = (
                df.join(win, on=["uh", "ts", "th"], how="semi")
                .group_by("uh")
                .agg(pl.len().cast(pl.Int64).alias("cnt"))
            )
            w = win.join(cnt, on="uh")
            # fold the winner key IN the reduce task (parallel) so the
            # driver only concat+sorts 8 B/unique-url — the driver-side
            # pandas collect + fnv over every unique url was the one
            # serial term in the wide job
            wk = (
                fnv1a64_int(w["uh"].to_numpy().astype(np.uint64))
                ^ fnv1a64_int(w["ts"].to_numpy().astype(np.uint64), seed=1)
                ^ fnv1a64_int(w["th"].to_numpy().astype(np.uint64), seed=2)
            )
            # uh rides along for the partitioned path's co-shuffle key
            return pa.table({"uh": pa.array(w["uh"].to_numpy().astype(np.uint64)),
                             "wk": pa.array(wk), "cnt": pa.array(w["cnt"].to_numpy())})

        t_dec = time.time()
        win_ds = bucketed_group_map(dec, ["uh"], _winners, num_buckets=num_buckets)
        if wk_mode == "auto":
            win_ds = win_ds.materialize()  # narrow 24 B/key rows, distributed
            partitioned = win_ds.count() > wk_broadcast_max
        elif wk_mode in ("broadcast", "partitioned"):
            partitioned = wk_mode == "partitioned"
        else:
            raise ValueError(f"wk_mode must be auto|broadcast|partitioned, got {wk_mode!r}")

        if partitioned:
            # documented 10^12-url fallback (VERDICT r2 item 3): no
            # broadcast — pages and winner keys co-shuffle on url-hash
            ds = _partitioned_winner_filter(ds, win_ds, pages_path, num_buckets, batch_size)
            phase_times["wide_write.dedup_decide"] = round(time.time() - t_dec, 3)
        else:
            # empty shuffle partitions surface as zero-column tables — drop
            tabs = [t for t in ray.get(win_ds.select_columns(["wk", "cnt"]).to_arrow_refs())
                    if t.num_columns]
            wt = (
                pa.concat_tables(tabs).combine_chunks()
                if tabs
                else pa.table({"wk": pa.array([], pa.uint64()), "cnt": pa.array([], pa.int64())})
            )
            wk = wt["wk"].to_numpy(zero_copy_only=False).astype(np.uint64)
            wk_ref = ray.put(np.sort(wk))
            dup_wk = np.sort(wk[wt["cnt"].to_numpy(zero_copy_only=False) > 1])
            claim_actor = _ClaimRegistry.remote() if len(dup_wk) else None
            dup_ref = ray.put(dup_wk)
            # decision shuffle + winner collect/broadcast runs EAGERLY (the
            # enrich+write execution below can't start without wk_ref), so
            # time it as its own phase — it contains the only driver-serial
            # work in the wide job (winner sort + ray.put)
            phase_times["wide_write.dedup_decide"] = round(time.time() - t_dec, 3)

            def _winner_filter(batch: pa.Table) -> pa.Table:
                keys = ray.get(wk_ref)
                uh = pl.from_arrow(batch["url"]).hash(seed=3).to_numpy().astype(np.uint64)
                th = pl.from_arrow(batch["text"]).hash(seed=5).to_numpy().astype(np.uint64)
                ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
                k = fnv1a64_int(uh) ^ fnv1a64_int(ts, seed=1) ^ fnv1a64_int(th, seed=2)
                pos = np.searchsorted(keys, k)
                keep = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == k)
                batch = batch.filter(pa.array(keep))
                kf = k[keep]
                # drop within-block copies of the same winning row
                df = pl.from_arrow(batch).with_columns(pl.Series("__k", kf)).unique(
                    subset=["url", "warc_ts", "text"], keep="first", maintain_order=True
                )
                if claim_actor is not None:
                    dups = ray.get(dup_ref)
                    kk = df["__k"].to_numpy()
                    p = np.searchsorted(dups, kk)
                    is_dup = (p < len(dups)) & (dups[np.minimum(p, len(dups) - 1)] == kk)
                    if is_dup.any():
                        # identical rows across blocks: exactly one block may
                        # keep each key. Owner token = block content hash so a
                        # retried task re-claims its own keys (idempotent).
                        owner = int(np.bitwise_xor.reduce(uh)) ^ len(uh)
                        granted = ray.get(
                            claim_actor.claim.remote([int(x) for x in kk[is_dup]], owner)
                        )
                        drop = np.zeros(len(kk), dtype=bool)
                        drop[np.nonzero(is_dup)[0][~np.asarray(granted)]] = True
                        df = df.filter(pl.Series(~drop))
                return df.drop("__k").to_arrow()

            ds = ds.map_batches(_winner_filter, batch_format="pyarrow", batch_size=batch_size)
    else:
        raise ValueError(f"dedup_mode must be 'wide' or 'narrow', got {dedup_mode!r}")

    # 4-6. ONE fused task stage: geocode + cells + [bbox] + temporal
    # bucket + tile + PIP [+ kNN]. Task-based (not actor-pool) so Ray
    # fuses shuffle-reduce → enrich → write into a single task with no
    # object-store hop; the PIP/kNN state is built once per worker
    # process from the broadcast table (process_cached — the index
    # build is O(polygons), far cheaper than an actor boundary).
    from edkray.ops.joins import process_cached
    from edkray.ops.stages import bbox_filter, temporal_bucket

    admin_ref = ray.put(admin)
    refs_ref = ray.put(knn_refs) if knn_refs is not None else None

    def _enrich(b: pa.Table) -> pa.Table:
        b = add_cell_columns(geocode_batch(b))
        if query_bbox is not None:
            b = bbox_filter(b, query_bbox)
        b = temporal_bucket(b, "warc_ts", freq, start=time_range[0], end=time_range[1])
        b = assign_grid_tile(b, freq)
        pip = process_cached(admin_ref, lambda t: PipJoin(t))
        b = pip(b)
        if refs_ref is not None:
            knn = process_cached(refs_ref, lambda t: KnnJoin(t, k=k))
            b = knn(b)
        return b

    ds = ds.map_batches(_enrich, batch_format="pyarrow", batch_size=batch_size)

    # 7. write enriched pages (partitioned by part_id → resumable)
    ds.write_parquet(pages_dir, partition_cols=["part_id"])
    phase_times["wide_write"] = round(time.time() - t_phase, 3)
    t_phase = time.time()

    # 8. NARROW rank shuffle from the written pages (re-read projects
    #    only ~60B/row; text does not shuffle again)
    def _salt(batch: pa.Table) -> pa.Table:
        """Pre-salt EVERY row (hash(url) % num_salts); whether the salt
        takes effect is decided after the count pass — this lets one
        count job serve both hot-tile detection and prefix offsets."""
        batch = batch.filter(pc.is_valid(batch["tile_id"]))
        uh = pl.from_arrow(batch["url"]).hash(seed=13).to_numpy()
        salt = (uh % np.uint64(num_salts)).astype(np.int64)
        return batch.append_column("salt", pa.array(salt))

    def _narrow():
        return ray.data.read_parquet(
            pages_dir,
            columns=["url", "warc_ts", "tile_id", "cell_7", "cell_9", "s2_token",
                     "admin_id", "date_bucket", "part_id"],
            override_num_blocks=num_blocks,
        ).map_batches(_salt, batch_format="pyarrow", batch_size=batch_size)

    # 8a. ONE count job: per-(tile, salt) partial counts combined
    # driver-side (tiles × salts is small; skips a Ray shuffle).
    # The narrow projection is materialized ONCE and reused by the rank
    # shuffle below — same ~60 B/row bytes the shuffle's map outputs
    # would pin in the object store anyway, but the parquet planning
    # (footer scan over every written file) and read+decompress are
    # paid once instead of twice.
    from edkray.ops.aggregate import grouped_agg, grouped_agg_small

    narrow = _narrow().materialize()
    try:
        sc = grouped_agg_small(narrow, ["tile_id", "salt"], [("count", None, "n")])
    except ValueError:
        # partial rows (blocks × tiles × salts) exceed the driver-side
        # bound at high doc counts — distributed combine instead; the
        # FINAL result (tiles × salts) is still tiny, so collecting it
        # is safe. narrow is materialized: the retry re-reads object
        # store blocks, not parquet.
        sc = grouped_agg(narrow, ["tile_id", "salt"], [("count", None, "n")]).to_pandas()
    totals = sc.groupby("tile_id")["n"].sum()
    hot = set(totals[totals > salt_threshold].index)
    manifest.metrics["hot_tiles"] = sorted(hot)
    phase_times["count_job"] = round(time.time() - t_phase, 3)
    t_phase = time.time()

    # cold tiles collapse to salt 0 (one group, exact (warc_ts, url)
    # order); hot tiles keep their salt groups with prefix offsets
    sc["salt"] = np.where(sc["tile_id"].isin(hot), sc["salt"], 0)
    sc = sc.groupby(["tile_id", "salt"], as_index=False)["n"].sum().sort_values(["tile_id", "salt"])
    sc["offset"] = sc.groupby("tile_id")["n"].cumsum() - sc["n"]
    offsets_tbl = pa.table(
        {
            "tile_id": sc["tile_id"].to_numpy(),
            "salt": sc["salt"].to_numpy().astype(np.int64),
            "__offset": sc["offset"].to_numpy().astype(np.int64),
        }
    )
    offsets_ref = ray.put(offsets_tbl)
    hot_ref = ray.put(sorted(hot))

    def _effective_salt(batch: pa.Table) -> pa.Table:
        hot_list = ray.get(hot_ref)
        tid = batch["tile_id"].to_numpy(zero_copy_only=False)
        salt = batch["salt"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(tid, hot_list) if hot_list else np.zeros(len(tid), dtype=bool)
        eff = np.where(is_hot, salt, 0)
        return batch.set_column(batch.schema.get_field_index("salt"), "salt", pa.array(eff))

    salted = narrow.map_batches(_effective_salt, batch_format="pyarrow", batch_size=batch_size)

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
    ranked = bucketed_group_map(salted, ["tile_id", "salt"], _rank_bucket, num_buckets=num_buckets)
    ranked.write_parquet(assign_dir, partition_cols=["part_id"])
    phase_times["rank_write"] = round(time.time() - t_phase, 3)

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
            "phase_times": phase_times,
        }
    )
    manifest.save()
    return manifest.metrics
