"""Windowed tile reads — the raster↔vector bridge (SURVEY §1.3 last row).

The reference reads raster chunks as ``gdal.Open`` + windowed
``ReadAsArray`` per (time, band, x0, y0, w, h) with a 1024-entry GDAL
dataset-handle pool (xarray_boosted/entrypoint.py:95-133,
earth_data_kit/__init__.py:6). The Parquet analogue: a row-range window
``(path, row_offset, num_rows)`` read via ROW-GROUP pruning — only the
row groups covering the window leave storage — with per-actor handle
caching (the handle-pool analogue, SURVEY §2.3a).
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_window(
    path: str,
    row_offset: int,
    num_rows: int,
    columns: list[str] | None = None,
    _pf: pq.ParquetFile | None = None,
) -> pa.Table:
    """Read rows ``[row_offset, row_offset + num_rows)`` of one tile.

    Row-group pruning: only groups overlapping the window are read
    (the windowed-ReadAsArray analogue; a full-file read for a 2-column
    window would be wrong at 100 TB)."""
    f = _pf or pq.ParquetFile(path)
    md = f.metadata
    lo, hi = row_offset, row_offset + num_rows
    groups, start = [], 0
    first_skipped = 0
    for rg in range(md.num_row_groups):
        n = md.row_group(rg).num_rows
        if start < hi and start + n > lo:
            if not groups:
                first_skipped = start
            groups.append(rg)
        start += n
        if start >= hi:
            break
    if not groups:
        empty_schema = f.schema_arrow if columns is None else pa.schema(
            [f.schema_arrow.field(c) for c in columns]
        )
        return empty_schema.empty_table()
    t = f.read_row_groups(groups, columns=columns)
    return t.slice(lo - first_skipped, hi - lo)


class TileReader:
    """Actor-pool window-read stage: batch rows of (path, row_offset,
    num_rows) → the window rows, tagged with their source tile path.

    Open file handles are cached per actor in a bounded LRU — the GDAL
    ``GDAL_MAX_DATASET_POOL_SIZE`` handle pool re-expressed (reference
    __init__.py:6; repeated ``gdal.Open`` per chunk read was the cost
    the pool amortized, entrypoint.py:95-133)."""

    def __init__(self, columns: list[str] | None = None, pool_size: int = 1024,
                 passthrough: list[str] | None = None):
        self.columns = columns
        self.pool_size = pool_size
        self.passthrough = passthrough or []
        self._handles: OrderedDict[str, pq.ParquetFile] = OrderedDict()
        self.handle_hits = 0
        self.handle_misses = 0

    def _handle(self, path: str) -> pq.ParquetFile:
        f = self._handles.get(path)
        if f is not None:
            self._handles.move_to_end(path)
            self.handle_hits += 1
            return f
        self.handle_misses += 1
        f = pq.ParquetFile(path)
        self._handles[path] = f
        while len(self._handles) > self.pool_size:
            self._handles.popitem(last=False)
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for i, (path, off, n) in enumerate(zip(
            batch["path"].to_pylist(),
            batch["row_offset"].to_pylist(),
            batch["num_rows"].to_pylist(),
        )):
            t = read_window(path, off, n, columns=self.columns, _pf=self._handle(path))
            t = t.append_column("__tile_path", pa.array([path] * len(t), type=pa.string()))
            # window-row metadata (tile_name/date/band…) fans out onto
            # every data row — the stack read's coordinate tags. A tag
            # whose name already exists in the tile's own data gets a
            # "_meta" suffix instead of producing a duplicate column
            # name (ambiguous select/to_pandas — ADVICE r3), mirroring
            # the joins' collision-suffix rule.
            for c in self.passthrough:
                val = batch[c][i].as_py()
                name = c if c not in t.schema.names else c + "_meta"
                t = t.append_column(
                    name, pa.array([val] * len(t), type=batch.schema.field(c).type)
                )
            parts.append(t)
        if not parts:
            return pa.table({"__tile_path": pa.array([], type=pa.string())})
        return pa.concat_tables(parts, promote_options="default")


def windowed_read(
    windows: ray.data.Dataset,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Dataset of (path, row_offset, num_rows) windows → Dataset of the
    windows' rows. Each actor keeps its handle pool warm across batches."""
    return windows.map_batches(
        TileReader,
        fn_constructor_kwargs=dict(columns=columns),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def read_stack(
    catalog: ray.data.Dataset,
    *,
    time_range: tuple | None = None,
    bands: list[str] | None = None,
    window: tuple[int, int] | None = None,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Lazily-indexed multi-tile stack read — the 4-D
    ``(time, band, x, y)`` coordinate view of the reference
    (xarray_boosted/entrypoint.py:280-304) as one compositional call.

    Selection happens at PLAN time against the CATALOG only (no tile
    file is opened to decide): rows are pruned by ``time_range``
    (left-inclusive, like the reference's date slicing) and ``bands``
    (band-description membership, reference M7
    ``df["description"].isin(bands)``, dataset.py:778-780); each
    surviving tile contributes one ``(path, row_offset, num_rows)``
    window (``window`` = the x/y-window analogue over the tile's row
    space; ``None`` = whole tile), and the windows stream through the
    :class:`TileReader` actor pool with its handle cache. Output rows
    carry their coordinate tags (``tile_name``, ``date``,
    ``subdataset``, ``__tile_path``); ``columns`` projects the payload
    read (pruned at the row-group read, never afterwards)."""

    def _prune(batch: pa.Table) -> pa.Table:
        import numpy as np

        keep = np.ones(len(batch), dtype=bool)
        if time_range is not None:
            d = batch["date"].to_numpy(zero_copy_only=False)
            keep &= (d >= np.datetime64(time_range[0])) & (d < np.datetime64(time_range[1]))
        if bands is not None:
            want = set(bands)
            ok = [
                any(b["description"] in want for b in (batch["bands"][i].as_py() or []))
                for i in range(len(batch))
            ]
            keep &= np.asarray(ok, dtype=bool)
        sub = batch.filter(pa.array(keep))
        nr = sub["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        if window is None:
            off = np.zeros(len(sub), dtype=np.int64)
            n = nr
        else:
            off = np.full(len(sub), int(window[0]), dtype=np.int64)
            n = np.maximum(np.minimum(nr - off, int(window[1])), 0)
        out = pa.table(
            {
                "path": sub["path"],
                "tile_name": sub["tile_name"],
                "date": sub["date"],
                "subdataset": sub["subdataset"],
                "row_offset": pa.array(off),
                "num_rows": pa.array(n),
            }
        )
        return out.filter(pa.array(n > 0))

    windows = catalog.map_batches(_prune, batch_format="pyarrow")
    return windows.map_batches(
        TileReader,
        fn_constructor_kwargs=dict(
            columns=columns, passthrough=["tile_name", "date", "subdataset"]
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --- windowed resample (VERDICT r4 missing #2) ------------------------------
#
# The reference warps every tile to a target resolution/CRS before
# mosaicing (classes/dataset.py:524-541: gdal.Warp(xRes, yRes, dstSRS)
# into a VRT — a LAZY index-remapping layer, no pixels materialized).
# The Parquet analogue over the tile's 1-D row axis: output sample j of
# a dst_n-sample grid maps to source position p = (j + 0.5) * n_src /
# dst_n (pixel-CENTER mapping, GDAL's convention), read through the
# same row-group-pruned windowed read. `nearest` gathers floor(p);
# `linear` (the 1-D bilinear kernel) interpolates between floor(p-0.5)
# and its successor with weight frac(p-0.5), edges clamped. Each output
# CHUNK plans its own minimal source window, so a resample never reads
# more rows than it consumes — the warped-VRT laziness, preserved.


class ResampleReader:
    """Actor-pool stage: batches of output-chunk specs ``(path, n_src,
    out_lo, out_hi, dst_n)`` → resampled sample rows ``(tile_name, j,
    <col>_nearest, <col>_linear)``. Handles are LRU-cached per actor
    exactly like :class:`TileReader`."""

    def __init__(self, value_col: str, methods: tuple = ("nearest", "linear"),
                 pool_size: int = 1024):
        self.value_col = value_col
        self.methods = tuple(methods)
        bad = set(self.methods) - {"nearest", "linear"}
        if bad:
            raise ValueError(f"unknown resample methods {sorted(bad)}")
        self.pool_size = pool_size
        self._handles: OrderedDict[str, pq.ParquetFile] = OrderedDict()

    def _handle(self, path: str) -> pq.ParquetFile:
        f = self._handles.get(path)
        if f is not None:
            self._handles.move_to_end(path)
            return f
        f = pq.ParquetFile(path)
        self._handles[path] = f
        while len(self._handles) > self.pool_size:
            self._handles.popitem(last=False)
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        parts = []
        for i in range(len(batch)):
            path = batch["path"][i].as_py()
            n_src = int(batch["n_src"][i].as_py())
            lo, hi = int(batch["out_lo"][i].as_py()), int(batch["out_hi"][i].as_py())
            dst_n = int(batch["dst_n"][i].as_py())
            tile = batch["tile_name"][i].as_py()
            j = np.arange(lo, hi, dtype=np.float64)
            # pixel-center source position, GDAL convention
            p = (j + 0.5) * n_src / float(dst_n)
            cols: dict = {}
            need_lo, need_hi = n_src, 0
            if "nearest" in self.methods:
                idx = np.minimum(np.floor(p), n_src - 1).astype(np.int64)
                need_lo, need_hi = int(idx.min()), int(idx.max()) + 1
                cols["__nearest_idx"] = idx
            if "linear" in self.methods:
                q = p - 0.5
                i0 = np.floor(q)
                w = q - i0  # weight from the UNCLAMPED floor
                i0c = np.clip(i0, 0, n_src - 1).astype(np.int64)
                i1 = np.minimum(i0c + 1, n_src - 1)
                need_lo = min(need_lo, int(i0c.min()))
                need_hi = max(need_hi, int(i1.max()) + 1)
                cols["__lin"] = (i0c, i1, w)
            t = read_window(path, need_lo, need_hi - need_lo,
                            columns=[self.value_col], _pf=self._handle(path))
            v = t[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            out = {
                "tile_name": pa.array([tile] * len(j), type=pa.string()),
                "j": pa.array(np.arange(lo, hi, dtype=np.int64)),
            }
            if "nearest" in self.methods:
                out[f"{self.value_col}_nearest"] = pa.array(
                    v[cols["__nearest_idx"] - need_lo]
                )
            if "linear" in self.methods:
                i0c, i1, w = cols["__lin"]
                v0, v1 = v[i0c - need_lo], v[i1 - need_lo]
                out[f"{self.value_col}_linear"] = pa.array(v0 * (1.0 - w) + v1 * w)
            parts.append(pa.table(out))
        if not parts:
            return pa.table({"tile_name": pa.array([], type=pa.string()),
                             "j": pa.array([], type=pa.int64())})
        return pa.concat_tables(parts, promote_options="default")


def resample_stack(
    catalog: ray.data.Dataset,
    value_col: str,
    dst_n: int,
    methods: tuple = ("nearest", "linear"),
    chunk: int = 8192,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Resample every catalog tile's row axis to ``dst_n`` samples —
    the reference's warp-to-target-resolution step (dataset.py:524-541)
    over Parquet tiles. Plan time emits one spec per ``chunk`` of
    OUTPUT samples (a pure function of j, so chunking never changes
    values); the :class:`ResampleReader` pool reads only each chunk's
    minimal source window."""
    if dst_n <= 0:
        raise ValueError(f"resample_stack: dst_n={dst_n} must be positive")

    def _plan(batch: pa.Table) -> pa.Table:
        import numpy as np

        paths, tiles, n_srcs, los = [], [], [], []
        for i in range(len(batch)):
            n_src = int(batch["n_rows"][i].as_py())
            if n_src <= 0:
                continue
            for lo in range(0, dst_n, chunk):
                paths.append(batch["path"][i].as_py())
                tiles.append(batch["tile_name"][i].as_py())
                n_srcs.append(n_src)
                los.append(lo)
        los_a = np.asarray(los, dtype=np.int64)
        return pa.table(
            {
                "path": pa.array(paths, type=pa.string()),
                "tile_name": pa.array(tiles, type=pa.string()),
                "n_src": pa.array(n_srcs, type=pa.int64()),
                "out_lo": pa.array(los_a),
                "out_hi": pa.array(np.minimum(los_a + chunk, dst_n)),
                "dst_n": pa.array(np.full(len(los_a), dst_n, dtype=np.int64)),
            }
        )

    specs = catalog.map_batches(_plan, batch_format="pyarrow")
    return specs.map_batches(
        ResampleReader,
        fn_constructor_kwargs=dict(value_col=value_col, methods=tuple(methods)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
