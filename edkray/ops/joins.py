"""Joins and lookups, Ray-Data-first.

Reference jоin semantics (SURVEY §2.4) are all broadcast-small-side or
group-collect; this module provides:

- :func:`broadcast_join` — small side via ``ray.put`` once, polars join
  per batch in an actor pool (no shuffle). Reference J1/J2 analogue.
- :func:`pip_join` — point-in-polygon join against broadcast polygons,
  STRtree-analogue PolygonIndex built once per actor (J6).
- :func:`knn_join` — k-nearest-reference-points per row, index pinned
  per actor (J7).
- :func:`asof_join` — as-of (latest right row ≤ left ts per key) against
  a broadcast right side via per-batch ``pd.merge_asof`` (J5 analogue).
- :func:`hash_join` — large↔large hash join via the native
  ``Dataset.join`` (hash-partitioned) with explicit partition count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from edkray.geo.distance import lonlat_to_unit
from edkray.geo.pip import PolygonIndex, wkb_to_ring


class _BroadcastJoiner:
    """Actor: fetch the broadcast small side once, polars-join per batch."""

    def __init__(self, table_ref, on, right_on, how, suffix):
        small = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        self.small = pl.from_arrow(small)
        self.on, self.right_on, self.how, self.suffix = on, right_on, how, suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = pl.from_arrow(batch)
        out = left.join(
            self.small,
            left_on=self.on,
            right_on=self.right_on,
            how=self.how,
            suffix=self.suffix,
            coalesce=True,
        )
        return out.to_arrow()


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Join a Dataset against a small in-memory table without a shuffle.

    The small side is ``ray.put`` ONCE; each actor fetches it once in
    ``__init__`` (plasma-local thereafter) — never re-shipped per batch.
    """
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(
            table_ref=ref, on=on, right_on=right_on or on, how=how, suffix=suffix
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


_STATE_CACHE: dict = {}
_STATE_CACHE_MAX = 8


def process_cached(ref, builder):
    """Per-worker-process cache of broadcast state for TASK-based stages.

    Actor pools break Ray Data's operator fusion (each actor boundary is
    an object-store hop); when the state is cheap to build (a small
    polygon index, a modest kNN matrix), a plain task + per-process
    cache keeps the whole post-shuffle chain fused into one task while
    still fetching the broadcast object only once per worker process.

    Keys must be stable across calls: an ``ObjectRef`` is keyed by its
    hex id; any other object must be hashable (e.g. a string path or a
    tuple of scalars) — keying by ``id()`` is forbidden because CPython
    reuses ids after GC, which could silently return state built from a
    different, freed object. The cache is bounded (FIFO, last
    ``_STATE_CACHE_MAX`` entries) so long-lived Ray workers don't
    accumulate one index per pipeline run.
    """
    if isinstance(ref, ray.ObjectRef):
        key = ref.hex()
    else:
        try:
            key = ("plain", hash(ref), type(ref).__name__)
        except TypeError:
            raise TypeError(
                "process_cached requires a ray.ObjectRef or a hashable key "
                f"object, got unhashable {type(ref).__name__}; ray.put() the "
                "state and pass the ObjectRef"
            ) from None
    if key not in _STATE_CACHE:
        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        while len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        _STATE_CACHE[key] = builder(obj)
    return _STATE_CACHE[key]


class PipJoin:
    """Actor-pool stage: point-in-polygon join against broadcast polygons.

    ``__init__`` decodes WKB and builds the PolygonIndex once per actor
    (the reference re-intersects its grid per call, engines/s3.py:199-207
    — here the index build is amortized). ``__call__`` is vectorized.
    Rows matching no polygon get null ``out_col`` (keep) or are dropped.
    """

    def __init__(self, polygons_ref, id_col="admin_id", wkb_col="wkb_geometry",
                 lon_col="lon", lat_col="lat", out_col="admin_id", keep_unmatched=True,
                 grid_res=None):
        table = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        ids = table[id_col].to_pylist()
        rings = [wkb_to_ring(w) for w in table[wkb_col].to_pylist()]
        # grid_res: coarse-cell bucketing for large polygon sets (10k+);
        # sub-linear scan with identical assignments (see geo.pip)
        self.index = PolygonIndex(ids, rings, grid_res=grid_res)
        self.lon_col, self.lat_col, self.out_col = lon_col, lat_col, out_col
        self.keep_unmatched = keep_unmatched

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        ids = self.index.query(lon, lat)
        out = batch.append_column(self.out_col, pa.array(ids, type=pa.string()))
        if not self.keep_unmatched:
            out = out.filter(pa.array([x is not None for x in ids]))
        return out


def pip_join(
    ds: ray.data.Dataset,
    polygons: pa.Table,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 65536,
    **kwargs,
) -> ray.data.Dataset:
    ref = ray.put(polygons)
    return ds.map_batches(
        PipJoin,
        fn_constructor_kwargs=dict(polygons_ref=ref, **kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class KnnJoin:
    """Actor-pool stage: k nearest reference points per row (haversine).

    The reference-point index (unit vectors) is pinned once per actor —
    the BallTree analogue from SURVEY §2.3 without sklearn. Exact
    brute-force matmul per batch; for very large reference sets pass
    ``shard_cols`` bucketing at build time (scale path documented in
    SURVEY §7).
    """

    def __init__(self, refs_ref, ref_id_col="ref_id", lon_col="lon", lat_col="lat", k=3):
        table = ray.get(refs_ref) if isinstance(refs_ref, ray.ObjectRef) else refs_ref
        self.id_type = table.schema.field(ref_id_col).type
        col = table[ref_id_col]
        self.ref_arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        rlon = table["lon"].to_numpy(zero_copy_only=False)
        rlat = table["lat"].to_numpy(zero_copy_only=False)
        self.units = lonlat_to_unit(rlon, rlat)  # (m, 3)
        self.k = k
        self.lon_col, self.lat_col = lon_col, lat_col

    # rows per inner chunk: bounds the (chunk × refs) cosine matrix to
    # ~40 MB at 5000 refs — a 64k-row batch would otherwise allocate
    # 2.6 GB per task, and on this lazily-backed VM every worker
    # process pays ~9 s/GB first-touch on its buffer, so small buffers
    # matter more than matmul shape (argmax passes are scan-bound)
    CHUNK = 1024

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        q = lonlat_to_unit(lon, lat)
        m = self.units.shape[0]
        k = min(self.k, m)
        out_idx = np.empty((len(lon), k), dtype=np.int64)
        # reused buffer: fresh large allocations per chunk page-fault
        # hard (lazily-backed VM memory) and double peak memory. Must be
        # sized to CHUNK (not the first batch's length): batch sizes vary
        # across an actor's lifetime, and a small first batch followed by
        # a larger one would otherwise make np.matmul(..., out=) raise.
        rows = min(self.CHUNK, len(lon))
        small_k = k <= 8
        if (
            not hasattr(self, "_buf")
            or self._buf.shape[1] != m
            or self._buf.shape[0] < rows
        ):
            self._buf = np.empty((self.CHUNK, m), dtype=np.float64)
            self._neg = None if small_k else np.empty_like(self._buf)
        elif not small_k and self._neg is None:
            self._neg = np.empty_like(self._buf)
        ut = np.ascontiguousarray(self.units.T)
        for s in range(0, len(lon), self.CHUNK):
            e = min(s + self.CHUNK, len(lon))
            cos = self._buf[: e - s]
            np.matmul(q[s:e], ut, out=cos)
            if small_k:
                # k sequential argmax+mask passes: each is one linear
                # scan, ~5x faster than argpartition's per-row
                # introselect at k<=8, and needs no _neg buffer.
                # np.argmax picks the FIRST max → ties break to the
                # lowest ref index, same as the lexsort path below.
                ridx = np.arange(e - s)
                for j in range(k):
                    best = np.argmax(cos, axis=1)
                    out_idx[s:e, j] = best
                    cos[ridx, best] = -np.inf
                continue
            # negate into a reused buffer and select kth=k-1 from the
            # low end — argpartition with kth near m is ~3x slower, and
            # fresh 160MB allocations page-fault hard on this host
            neg = self._neg[: e - s]
            np.negative(cos, out=neg)
            part = np.argpartition(neg, kth=k - 1, axis=1)[:, :k]
            pcos = np.take_along_axis(cos, part, axis=1)
            order = np.lexsort((part, -pcos), axis=1)
            sel = np.take_along_axis(part, order, axis=1)
            # boundary-tie stabilization: argpartition may admit a
            # higher-index ref tied exactly at the k-th value (duplicate
            # reference points) where the small-k path keeps the lowest
            # index. Detect rows whose boundary value has unselected
            # ties and redo just those with a stable full sort — exact
            # float equality only, so near-always zero rows.
            b = np.min(pcos, axis=1)
            bad = np.flatnonzero((cos == b[:, None]).sum(1) > (pcos == b[:, None]).sum(1))
            for i in bad:
                sel[i] = np.argsort(-cos[i], kind="stable")[:k]
            out_idx[s:e] = sel
        # zero-Python list column: take ref ids by flat index, wrap with
        # fixed-stride offsets (Arrow C++, no per-row Python)
        values = self.ref_arr.take(pa.array(out_idx.ravel()))
        offsets = pa.array(np.arange(0, (len(lon) + 1) * k, k, dtype=np.int32))
        neighbors = pa.ListArray.from_arrays(offsets, values)
        return batch.append_column("neighbor_ids", neighbors)


def knn_join(
    ds: ray.data.Dataset,
    refs: pa.Table,
    k: int = 3,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 32768,
    **kwargs,
) -> ray.data.Dataset:
    ref = ray.put(refs)
    return ds.map_batches(
        KnnJoin,
        fn_constructor_kwargs=dict(refs_ref=ref, k=k, **kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class _AsofJoiner:
    """Actor: broadcast right side sorted once; merge_asof per batch.

    With ``interpolate="linear"`` the reference J5 ``combine`` semantics
    (da.interp(..., method="linear"), reference stitching/classes/
    dataset.py:922-965) are re-targeted to the time axis: each left row
    gets the bracketing right rows per key and each ``value_cols``
    column is linearly interpolated between them. Edge rule: values are
    HELD FLAT beyond the series ends — an intentional deviation from
    xarray's interp, which yields NaN outside the source range (and
    interpolates along x/y, not time); the SQL oracle encodes the hold
    semantics explicitly."""

    def __init__(self, right_ref, on, left_ts, right_ts, direction, suffix,
                 interpolate=None, value_cols=None):
        right = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) else right_ref
        rdf = right.to_pandas()
        self.right = rdf.sort_values([right_ts]).reset_index(drop=True)
        self.on, self.left_ts, self.right_ts = on, left_ts, right_ts
        self.direction, self.suffix = direction, suffix
        self.interpolate, self.value_cols = interpolate, list(value_cols or [])
        if interpolate == "linear":
            keep = list(on or []) + [right_ts] + self.value_cols
            base = self.right[keep]
            self.rp = base.rename(
                columns={right_ts: "__t0", **{c: c + "__0" for c in self.value_cols}}
            )
            self.rf = base.rename(
                columns={right_ts: "__t1", **{c: c + "__1" for c in self.value_cols}}
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(batch[self.left_ts].to_numpy(), kind="stable")
        left = batch.iloc[order].reset_index(drop=True)
        if self.interpolate is None:
            return pd.merge_asof(
                left,
                self.right,
                left_on=self.left_ts,
                right_on=self.right_ts,
                left_by=self.on or None,
                right_by=self.on or None,
                direction=self.direction,
                suffixes=("", self.suffix),
            )
        by = self.on or None
        p = pd.merge_asof(left, self.rp, left_on=self.left_ts, right_on="__t0",
                          left_by=by, right_by=by, direction="backward")
        f = pd.merge_asof(left, self.rf, left_on=self.left_ts, right_on="__t1",
                          left_by=by, right_by=by, direction="forward")
        t = left[self.left_ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        t0 = p["__t0"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        t1 = f["__t1"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        m0 = p["__t0"].notna().to_numpy()
        m1 = f["__t1"].notna().to_numpy()
        both = m0 & m1
        denom = np.where(both & (t1 != t0), (t1 - t0).astype(np.float64), 1.0)
        w = np.where(both & (t1 != t0), (t - t0) / denom, 0.0)
        out = left.copy()
        for c in self.value_cols:
            v0 = p[c + "__0"].to_numpy(dtype=np.float64)
            v1 = f[c + "__1"].to_numpy(dtype=np.float64)
            v = np.where(
                both, v0 + (v1 - v0) * w,
                np.where(m0, v0, np.where(m1, v1, np.nan)),
            )
            out[c] = v
        return out


def asof_join(
    ds: ray.data.Dataset,
    right: pa.Table,
    on: list[str] | None,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
    interpolate: str | None = None,
    value_cols: list[str] | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """As-of join (latest right row ≤/≥ left ts per key) — reference J5
    ``combine``/interp analogue. Right side broadcast + sorted once per
    actor; per-batch ``pd.merge_asof`` (left sorted within the batch).

    ``interpolate="linear"`` switches to the reference's
    ``method="linear"`` combine: each ``value_cols`` column is linearly
    interpolated between the bracketing right rows per key (flat beyond
    the series ends); output = left columns + interpolated value
    columns (float64)."""
    if interpolate not in (None, "linear"):
        raise ValueError(f"interpolate must be None or 'linear', got {interpolate!r}")
    if interpolate and not value_cols:
        raise ValueError("interpolate='linear' needs value_cols")
    ref = ray.put(right)
    return ds.map_batches(
        _AsofJoiner,
        fn_constructor_kwargs=dict(
            right_ref=ref, on=on, left_ts=left_ts, right_ts=right_ts,
            direction=direction, suffix=suffix,
            interpolate=interpolate, value_cols=value_cols,
        ),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


_ASOF_SIDE = "__asof_side"
_RANGE_BUCKET = "__rb"


def _keyless_range_asof(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    tagged: ray.data.Dataset,
    align,
    join_lr,
    *,
    lnames: list[str],
    r_out: list[str],
    left_ts: str,
    r_ts: str,
    interpolate: str | None,
    vr: list[str],
    num_buckets: int,
    batch_size: int,
) -> ray.data.Dataset:
    """Keyless large-large as-of via TIME-RANGE partitioning with
    boundary replication (see :func:`asof_join_large`). Partitioning
    assumption: left rows only ever match right rows in their own time
    range or across a range boundary; replicating each bucket's
    prev/next boundary rows makes every bucket locally complete.
    Exchanges: one narrow min/max pass over left (one row per block to
    the driver), one per-bucket first/last reduce over right
    (≤ 2·num_buckets rows to the driver), one range shuffle of both
    sides. Nothing else materializes."""
    import pyarrow.compute as pc

    from edkray.ops.shuffle import bucketed_group_map

    SIDE, RB = _ASOF_SIDE, _RANGE_BUCKET
    out_names = lnames + (vr if interpolate else r_out)

    def _ts_int64(arr):
        """Canonical comparable int64 for a ts column: ANY timestamp/
        date type normalizes through timestamp[us] first, so a
        timestamp[ns] left and a timestamp[us]/date32 right land on the
        same scale (the keyed path gets this for free from _join_lr's
        in-bucket cast; range-bucket assignment must match it)."""
        t = arr.type
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            arr = arr.cast(pa.timestamp("us"))
        return arr.cast(pa.int64())

    # 1. range cutpoints from the left ts span
    def _mm(batch: pa.Table) -> pa.Table:
        mm = pc.min_max(_ts_int64(batch[left_ts]))
        return pa.table({"mn": pa.array([mm["min"].as_py()], type=pa.int64()),
                         "mx": pa.array([mm["max"].as_py()], type=pa.int64())})

    parts = [r for r in left.map_batches(_mm, batch_format="pyarrow").take_all()
             if r["mn"] is not None]
    if not parts:  # empty left → typed empty result
        sch = tagged.schema()
        types = dict(zip(sch.names, sch.types))
        if interpolate:
            for c in vr:
                types[c] = pa.float64()
        return ray.data.from_arrow(
            pa.table({n: pa.array([], type=types[n]) for n in out_names})
        )
    mn = min(r["mn"] for r in parts)
    mx = max(r["mx"] for r in parts)
    if mx == mn:
        cuts = np.empty(0, dtype=np.int64)
    else:
        cuts = np.unique(
            mn + (mx - mn) * np.arange(1, num_buckets, dtype=np.int64) // num_buckets
        )
    nb = len(cuts) + 1

    def _rb_tagged(batch: pa.Table) -> pa.Table:
        side = batch[SIDE].to_numpy(zero_copy_only=False)
        lt = pc.fill_null(_ts_int64(batch[left_ts]), 0).to_numpy(zero_copy_only=False)
        rt = pc.fill_null(_ts_int64(batch[r_ts]), 0).to_numpy(zero_copy_only=False)
        ts = np.where(side == 0, lt, rt)
        rb = np.searchsorted(cuts, ts, side="right").astype(np.int64)
        return batch.append_column(RB, pa.array(rb))

    # deterministic right ordering: ts, ties by the remaining columns
    r_sort = [r_ts] + [c for c in r_out if c != r_ts]

    # 2. per-range-bucket first/last right rows (combiner + exact reduce)
    def _fl(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort(r_sort)
        pos = pl.int_range(pl.len()).over(RB)
        return df.filter((pos == 0) | (pos == pl.len().over(RB) - 1)).to_arrow()

    r_rb = right.map_batches(
        lambda b: align(b, 1), batch_format="pyarrow", batch_size=batch_size
    ).map_batches(_rb_tagged, batch_format="pyarrow", batch_size=batch_size)
    fl = bucketed_group_map(
        r_rb.map_batches(_fl, batch_format="pyarrow", batch_size=batch_size),
        [RB], _fl, num_buckets=min(num_buckets, 16), batch_size=batch_size,
    )
    tabs = [t for t in ray.get(fl.to_arrow_refs()) if t.num_rows]

    # 3. carries: prev = globally latest right row before each bucket,
    #    next = earliest after it (running scan over ≤2·nb driver rows)
    prev_by_rb: dict[int, pl.DataFrame] = {}
    next_by_rb: dict[int, pl.DataFrame] = {}
    if tabs:
        bdf = pl.from_arrow(pa.concat_tables(tabs)).sort(r_sort)
        cur = None
        for rb in range(nb):
            if cur is not None:
                prev_by_rb[rb] = cur
            sub = bdf.filter(pl.col(RB) == rb)
            if len(sub):
                cur = sub.tail(1)
        cur = None
        for rb in range(nb - 1, -1, -1):
            if cur is not None:
                next_by_rb[rb] = cur
            sub = bdf.filter(pl.col(RB) == rb)
            if len(sub):
                cur = sub.head(1)
    carries: dict[int, pl.DataFrame] = {}
    for rb in range(nb):
        pieces = [d.select(r_out) for d in
                  (prev_by_rb.get(rb), next_by_rb.get(rb)) if d is not None]
        if pieces:
            carries[rb] = pl.concat(pieces)

    # 4. range shuffle of both sides; per-bucket local join with carries
    tagged_rb = tagged.map_batches(_rb_tagged, batch_format="pyarrow",
                                   batch_size=batch_size)

    def _bucket(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table)
        outs = []
        for rb in df[RB].unique().sort().to_list():
            sub = df.filter(pl.col(RB) == rb)
            l = sub.filter(pl.col(SIDE) == 0).select(lnames).sort(left_ts)
            r = sub.filter(pl.col(SIDE) == 1).select(r_out)
            if rb in carries:
                r = pl.concat([r, carries[rb]])
            outs.append(join_lr(l, r.sort(r_sort)).to_arrow())
        return pa.concat_tables(outs)

    return bucketed_group_map(tagged_rb, [RB], _bucket, num_buckets=num_buckets,
                              batch_size=batch_size)


def asof_join_large(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
    interpolate: str | None = None,
    value_cols: list[str] | None = None,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Large↔large as-of join — completes reference J5 beyond the
    broadcast-right :func:`asof_join`. Both sides are hash-bucketed on
    the key columns (every key's COMPLETE series from both sides lands
    in one bucket), then joined per bucket with vectorized
    ``polars.join_asof`` — the only exchange is one key-hash shuffle of
    each side; no side is ever materialized whole.

    With EMPTY ``on`` (keyless — two unkeyed time series) the join
    switches to TIME-RANGE partitioning with boundary replication:
    left-ts min/max define ``num_buckets`` uniform ranges, both sides
    route to their range bucket, and each bucket's right series is
    augmented with two replicated boundary rows — the globally latest
    right row before the bucket (prev-carry) and the earliest after it
    (next-carry), computed by a narrow per-bucket first/last reduce
    (≤ 2·num_buckets rows ever reach the driver). backward/forward/
    linear-interp are then locally correct per bucket: a backward match
    from an earlier bucket can only be that bucket's prev-carry. Right
    ts ties are broken by the remaining right columns ascending (last
    wins) — dedup the right side per ts for a fully specified result.
    Right columns clashing with left names get ``suffix``. Output
    columns: left's, then right's minus the keys.

    ``interpolate="linear"`` (reference J5 ``combine`` with
    method="linear", stitching/classes/dataset.py:922-965): each
    ``value_cols`` column is linearly interpolated between the
    bracketing right rows per key (flat beyond the ends); output =
    left columns + interpolated value columns (float64, renamed with
    ``suffix`` on collision).
    """
    on = list(on or [])
    if not on and direction not in ("backward", "forward"):
        raise ValueError("keyless asof_join_large supports direction backward|forward")
    if interpolate not in (None, "linear"):
        raise ValueError(f"interpolate must be None or 'linear', got {interpolate!r}")
    if interpolate and not value_cols:
        raise ValueError("interpolate='linear' needs value_cols")
    SIDE = _ASOF_SIDE
    lnames = list(left.schema().names)
    rnames = list(right.schema().names)
    if interpolate:
        rnames = list(on) + [right_ts] + [c for c in value_cols]
    rename = {
        c: c + suffix for c in rnames if c in lnames and c not in on and c != right_ts
    }
    # always suffix a colliding right_ts — including right_ts == left_ts
    # (the common "both sides call it ts" case), else the final select
    # would name the column twice
    if right_ts in lnames and right_ts not in on:
        rename[right_ts] = right_ts + suffix
    r_ts = rename.get(right_ts, right_ts)
    r_out = [rename.get(c, c) for c in rnames if c not in on]
    ls, rs = left.schema(), right.schema()
    l_types = dict(zip(ls.names, ls.types))
    r_types = dict(zip(rs.names, rs.types))
    all_cols = lnames + [c for c in r_out if c not in lnames]

    def _type_of(col: str) -> pa.DataType:
        if col in lnames:
            return l_types[col]
        orig = next(c for c in rnames if rename.get(c, c) == col)
        return r_types[orig]

    def _align(batch: pa.Table, side: int) -> pa.Table:
        if side == 1:
            if interpolate:
                # drop unused right cols: an excluded col sharing a left
                # name would otherwise collide in the union schema
                batch = batch.select(rnames)
            batch = batch.rename_columns([rename.get(c, c) for c in batch.schema.names])
        cols = {}
        for c in all_cols:
            if c in batch.schema.names:
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(len(batch), type=_type_of(c))
        cols[SIDE] = pa.array(np.full(len(batch), side, dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        lambda b: _align(b, 0), batch_format="pyarrow", batch_size=batch_size
    ).union(
        right.map_batches(
            lambda b: _align(b, 1), batch_format="pyarrow", batch_size=batch_size
        )
    )

    from edkray.ops.shuffle import bucketed_group_map

    vr = [rename.get(c, c) for c in (value_cols or [])]

    def _join_lr(l: pl.DataFrame, r: pl.DataFrame) -> pl.DataFrame:
        """The per-bucket join core: l sorted by left_ts, r sorted by
        r_ts (+ deterministic tiebreak); shared by the keyed and the
        keyless (range-partitioned) paths."""
        by = on or None
        if r.schema[r_ts] != l.schema[left_ts]:
            r = r.with_columns(pl.col(r_ts).cast(l.schema[left_ts]))
        if interpolate is None:
            out = l.join_asof(
                r, left_on=left_ts, right_on=r_ts, by=by, strategy=direction, coalesce=False
            )
            return out.select(lnames + r_out)
        # linear interpolation between the bracketing right rows per key
        rp = r.rename({r_ts: "__t0", **{c: c + "__0" for c in vr}})
        rf = r.rename({r_ts: "__t1", **{c: c + "__1" for c in vr}})
        out = l.join_asof(
            rp, left_on=left_ts, right_on="__t0", by=by, strategy="backward", coalesce=False
        ).join_asof(
            rf, left_on=left_ts, right_on="__t1", by=by, strategy="forward", coalesce=False
        )
        t = pl.col(left_ts).cast(pl.Int64)
        t0, t1 = pl.col("__t0").cast(pl.Int64), pl.col("__t1").cast(pl.Int64)
        w = (
            pl.when((t1 - t0) != 0)
            .then((t - t0).cast(pl.Float64) / (t1 - t0).cast(pl.Float64))
            .otherwise(0.0)
        )
        exprs = []
        for c in vr:
            v0 = pl.col(c + "__0").cast(pl.Float64)
            v1 = pl.col(c + "__1").cast(pl.Float64)
            exprs.append(
                pl.when(pl.col("__t0").is_null() & pl.col("__t1").is_null())
                .then(None)
                .when(pl.col("__t0").is_null())
                .then(v1)
                .when(pl.col("__t1").is_null() | (t1 == t0))
                .then(v0)
                .otherwise(v0 + (v1 - v0) * w)
                .alias(c)
            )
        return out.with_columns(exprs).select(lnames + vr)

    if on:

        def _bucket_asof(table: pa.Table) -> pa.Table:
            df = pl.from_arrow(table)
            l = df.filter(pl.col(SIDE) == 0).select(lnames).sort(left_ts)
            r = df.filter(pl.col(SIDE) == 1).select(on + r_out).sort(r_ts)
            return _join_lr(l, r).to_arrow()

        return bucketed_group_map(tagged, on, _bucket_asof, num_buckets=num_buckets,
                                  batch_size=batch_size)

    return _keyless_range_asof(
        left, right, tagged, _align, _join_lr,
        lnames=lnames, r_out=r_out, left_ts=left_ts, r_ts=r_ts,
        interpolate=interpolate, vr=vr, num_buckets=num_buckets, batch_size=batch_size,
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large↔large join: native hash-partitioned ``Dataset.join``.

    Both sides shuffle on the key — use :func:`broadcast_join` whenever
    one side fits in the object store. ``num_partitions`` bounds the
    all-to-all exchange width; salt hot keys upstream if one key
    dominates (see edkray.pipelines.spatial for count-driven salting).
    """
    return left.join(
        right,
        join_type=how,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
        num_partitions=num_partitions,
    )


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Large↔large equi-join via ONE tagged-union hash-bucketed
    co-shuffle and a per-bucket vectorized polars join.

    The path for schemas the native :func:`hash_join` cannot shuffle —
    Ray's hash-shuffle join rejects list-typed non-key fields (e.g. an
    ``embedding: list<float>`` carry column), polars joins them fine.
    Both sides move exactly once, hash-partitioned on the key; no
    broadcast, no driver materialization; ``num_buckets`` bounds task
    memory exactly like every other winner-filter co-shuffle here.

    Keys join positionally (``on[i] == right_on[i]``; right keys are
    renamed to the left names). Output = left columns + right non-key
    columns; non-key column names must not collide. ``how`` ∈ {inner,
    left}.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"bucketed_join: how={how!r} not in (inner, left)")
    right_on = list(right_on or on)
    if len(right_on) != len(on):
        raise ValueError("bucketed_join: on/right_on length mismatch")

    from edkray.ops.shuffle import bucketed_group_map

    def _pl_dtypes(sch) -> dict:
        empty = pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        ).empty_table()
        return dict(pl.from_arrow(empty).schema)

    lsch, rsch = left.schema(), right.schema()
    lcarry = [c for c in lsch.names if c not in on]
    rcarry = [c for c in rsch.names if c not in right_on]
    clash = set(lcarry) & set(rcarry)
    if clash:
        raise ValueError(f"bucketed_join: non-key column collision {sorted(clash)}")
    ldt, rdt = _pl_dtypes(lsch), _pl_dtypes(rsch)
    rename = dict(zip(right_on, on))

    def _tag_left(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            *[pl.col(c) for c in on],
            *[pl.col(c) for c in lcarry],
            *[pl.lit(None, dtype=rdt[c]).alias(c) for c in rcarry],
            pl.lit(0, dtype=pl.Int8).alias("__side"),
        ).to_arrow()

    def _tag_right(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).rename(rename)
        return df.select(
            *[pl.col(c) for c in on],
            *[pl.lit(None, dtype=ldt[c]).alias(c) for c in lcarry],
            *[pl.col(c) for c in rcarry],
            pl.lit(1, dtype=pl.Int8).alias("__side"),
        ).to_arrow()

    tagged = left.map_batches(
        _tag_left, batch_format="pyarrow", batch_size=batch_size
    ).union(
        right.map_batches(_tag_right, batch_format="pyarrow", batch_size=batch_size)
    )

    def _join(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        l = df.filter(pl.col("__side") == 0).select(list(on) + lcarry)
        r = df.filter(pl.col("__side") == 1).select(list(on) + rcarry)
        return l.join(r, on=list(on), how=how, coalesce=True).to_arrow()

    out = bucketed_group_map(tagged, list(on), _join, num_buckets=num_buckets)
    # 0-row inputs → all buckets empty → Ray forgets the schema
    # (schema() is None, breaking chained joins). The joined output
    # schema is statically known — anchor it with one 0-row block.
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in list(on) + lcarry]
        + [pa.field(c, rtypes[c]) for c in rcarry]
    )
    # round-trip through polars so the anchor's types match the real
    # blocks bit-for-bit (polars emits large_string/large_list)
    anchor = pl.from_arrow(out_schema.empty_table()).to_arrow()
    return out.union(ray.data.from_arrow(anchor))


def range_join_broadcast(
    ds: ray.data.Dataset,
    intervals: pa.Table,
    on_col: str,
    start_col: str,
    end_col: str,
    batch_size: int = 65536,
    chunk: int = 4096,
) -> ray.data.Dataset:
    """Range (interval) join: every left row joins every interval row
    with ``start <= on < end`` (half-open, overlaps allowed — a row
    matching m intervals emits m output rows; rows matching none are
    dropped, i.e. inner semantics). Output = left columns + interval
    columns.

    The brief's "range join" slot, built on the broadcast-small-side
    rule: ``intervals`` is ``ray.put`` once and every batch evaluates
    the containment predicate VECTORIZED — values and interval bounds
    compared as int64 (timestamps compare as their epoch ticks), in
    ``chunk``-column slabs so the (batch × m) bool mask is memory-
    bounded. O(n·m/chunk) slabs is the right shape for the intended
    m (calendar windows, maintenance periods, SLA buckets: 10²–10⁴);
    for m beyond broadcast scale use an equi-bucketed prejoin (split
    intervals into grid cells, J1) — same pattern as the PIP joiner's
    coarse-cell index. Reference analogue: the tile↔bbox date-window
    intersection (J2, stitching/dataset.py time filtering), generalized
    to arbitrary numeric/temporal intervals.
    """
    if intervals.num_rows == 0:
        raise ValueError("range_join_broadcast: empty interval table")
    ivs_ref = ray.put(intervals)

    def _cast_np(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_timestamp(a.type):
            # normalize units FIRST: an ns-typed left against µs-typed
            # bounds must not compare raw ticks
            a = a.cast(pa.timestamp("us")).cast(pa.int64())
        return a.to_numpy(zero_copy_only=False)

    def _match(batch: pa.Table) -> pa.Table:
        ivs: pa.Table = ray.get(ivs_ref)
        starts = _cast_np(ivs[start_col])
        ends = _cast_np(ivs[end_col])
        on = _cast_np(batch[on_col])
        li, ri = [], []
        for s in range(0, len(starts), chunk):
            e = min(s + chunk, len(starts))
            mask = (on[:, None] >= starts[None, s:e]) & (on[:, None] < ends[None, s:e])
            l_idx, r_idx = np.nonzero(mask)
            li.append(l_idx)
            ri.append(r_idx + s)
        l_all = np.concatenate(li)
        r_all = np.concatenate(ri)
        left_out = batch.take(pa.array(l_all))
        right_out = ivs.take(pa.array(r_all))
        for name in right_out.schema.names:
            col = right_out[name]
            if name in left_out.schema.names:
                name = f"{name}_r"
            left_out = left_out.append_column(name, col)
        return left_out

    return ds.map_batches(_match, batch_format="pyarrow", batch_size=batch_size)


def radius_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    lon_col: str,
    lat_col: str,
    radius_km: float,
    cell_res: int = 7,
    num_buckets: int = 64,
    batch_size: int = 65536,
    out_a: str = "key_a",
    out_b: str = "key_b",
    out_dist: str = "dist_km",
) -> ray.data.Dataset:
    """Distance-band spatial self-join: every unordered pair of rows
    within ``radius_km`` great-circle km, ``key_a < key_b``, verified
    with exact haversine. The third spatial join next to PIP (J6,
    reference utilities/geo.py bbox intersect) and kNN (J7) — the
    "all partners within D" form the reference's grid-overlap logic
    (stitching/classes/dataset.py tile adjacency) implies but never
    exposes.

    Scale design (grid-prefilter, candidate-complete at any latitude):

    - each point emits a 33-B ``(cell, key, lon, lat, home)``
      projection — never the payload — into its home quadcell at
      ``cell_res`` plus the ring of cells that could hold a partner
      within ``radius_km``. The lat half-width of the ring is static
      (``D/R`` radians exactly bounds |Δlat| under haversine); the lon
      half-width is computed PER POINT from the worst-case partner
      latitude (``2·asin(sin(D/2R)/cos φ_reach)`` — the exact bound;
      a linear ``D/(111·cos φ)`` approximation UNDERCOUNTS by ~1% near
      the poles and would drop pairs), and wraps across the
      antimeridian, so no worst-case global ring is ever shipped.
    - ONE hash shuffle on the candidate cell co-locates candidates;
      per bucket, pairs are generated segment-vectorized (home rows ×
      all rows of the same cell via offset arithmetic — no Python loop
      over rows) and filtered by exact haversine.
    - each qualifying pair is emitted exactly once with no post-dedup
      shuffle: only in the home cell of an endpoint whose key is the
      smaller of the pair (a point is ``home`` in exactly one cell, and
      ring coverage is symmetric, so the rule fires exactly once).

    Skew: a dense cell costs O(n_home·n_all) in its bucket; raise
    ``cell_res`` to shrink cells (the ring widens automatically).
    Count-driven salting does not apply — pair-gen is not
    self-mergeable under row splits of one cell.
    """
    from edkray.geo.cells import RES_SHIFT, X_SHIFT
    from edkray.geo.distance import EARTH_RADIUS_KM, haversine_km
    from edkray.ops.shuffle import bucketed_group_map

    n = np.int64(1) << cell_res
    lat_span = 180.0 / float(n)
    lon_span = 360.0 / float(n)
    dlat_deg = np.degrees(radius_km / EARTH_RADIUS_KM)
    ky = int(dlat_deg / lat_span) + 1
    dys = np.arange(-ky, ky + 1, dtype=np.int64)
    sin_half = np.sin(radius_km / (2.0 * EARTH_RADIUS_KM))
    cell_c, key_c, lon_c, lat_c, home_c = "__rp_cell", key_col, lon_col, lat_col, "__rp_home"

    def _replicate(b: pa.Table) -> pa.Table:
        lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b[key_col]
        ix = np.floor((lon + 180.0) / 360.0 * float(n)).astype(np.int64)
        iy = np.floor((lat + 90.0) / 180.0 * float(n)).astype(np.int64)
        np.clip(ix, 0, int(n) - 1, out=ix)
        np.clip(iy, 0, int(n) - 1, out=iy)
        home_cell = (np.int64(cell_res) << RES_SHIFT) | (ix << X_SHIFT) | iy
        # exact per-point lon ring half-width (see docstring)
        reach = np.minimum(np.abs(lat) + dlat_deg, 90.0)
        cosr = np.cos(np.radians(reach))
        ratio = np.divide(sin_half, cosr, out=np.full_like(cosr, 2.0), where=cosr > 0)
        full = ratio >= 1.0
        dlon_deg = np.degrees(2.0 * np.arcsin(np.clip(ratio, 0.0, 1.0)))
        kx = (dlon_deg / lon_span).astype(np.int64) + 1
        kx[full] = int(n)  # sentinel: full wrap row
        src_parts, cell_parts = [], []
        for kxv in np.unique(kx):
            sel = np.flatnonzero(kx == kxv)
            if 2 * kxv + 1 >= int(n):
                dxs = np.arange(int(n), dtype=np.int64)  # full row, each cell once
            else:
                dxs = np.arange(-kxv, kxv + 1, dtype=np.int64)
            dx = np.repeat(dxs, len(dys))
            dy = np.tile(dys, len(dxs))
            nx = (ix[sel][:, None] + dx[None, :]) % n  # lon wraps
            ny = iy[sel][:, None] + dy[None, :]        # lat clamps (drop)
            valid = (ny >= 0) & (ny < n)
            valid &= ~((nx == ix[sel][:, None]) & (ny == iy[sel][:, None]))
            nbr = (np.int64(cell_res) << RES_SHIFT) | (nx << X_SHIFT) | ny
            src = np.broadcast_to(sel[:, None], nbr.shape)
            src_parts.append(src[valid])
            cell_parts.append(nbr[valid])
        v_src = np.concatenate(src_parts) if src_parts else np.empty(0, np.int64)
        v_cell = np.concatenate(cell_parts) if cell_parts else np.empty(0, np.int64)
        idx = pa.array(np.concatenate([np.arange(len(lon), dtype=np.int64), v_src]))
        return pa.table({
            cell_c: pa.array(np.concatenate([home_cell, v_cell])),
            key_c: keys.take(idx) if isinstance(keys, pa.ChunkedArray) else pa.array(np.asarray(keys)[np.asarray(idx)]),
            lon_c: pa.array(np.concatenate([lon, lon[v_src]])),
            lat_c: pa.array(np.concatenate([lat, lat[v_src]])),
            home_c: pa.array(np.concatenate([
                np.ones(len(lon), dtype=bool), np.zeros(len(v_src), dtype=bool)
            ])),
        })

    cand = ds.map_batches(_replicate, batch_format="pyarrow", batch_size=batch_size)
    _sch = ds.schema()
    key_type = dict(zip(_sch.names, _sch.types))[key_col]
    empty = pa.table({
        out_a: pa.array([], key_type),
        out_b: pa.array([], key_type),
        out_dist: pa.array([], pa.float64()),
    })

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        order = pc.sort_indices(t[cell_c])
        t = t.take(order)
        cell = t[cell_c].to_numpy(zero_copy_only=False)
        home = t[home_c].to_numpy(zero_copy_only=False)
        lon = t[lon_c].to_numpy(zero_copy_only=False)
        lat = t[lat_c].to_numpy(zero_copy_only=False)
        keys = t[key_c].to_numpy(zero_copy_only=False)
        seg_start = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        counts = np.diff(np.r_[seg_start, len(cell)])
        seg_id = np.repeat(np.arange(len(seg_start)), counts)
        h_rows = np.flatnonzero(home)
        if len(h_rows) == 0:
            return empty
        n_all = counts[seg_id[h_rows]]
        total = int(n_all.sum())
        hi = np.repeat(h_rows, n_all)
        block_start = np.cumsum(n_all) - n_all
        within = np.arange(total, dtype=np.int64) - np.repeat(block_start, n_all)
        ai = np.repeat(seg_start[seg_id[h_rows]], n_all) + within
        m = keys[hi] < keys[ai]
        hi, ai = hi[m], ai[m]
        d = haversine_km(lon[hi], lat[hi], lon[ai], lat[ai])
        m2 = d <= radius_km
        hi, ai, d = hi[m2], ai[m2], d[m2]
        return pa.table({
            out_a: pa.array(keys[hi]).cast(key_type),
            out_b: pa.array(keys[ai]).cast(key_type),
            out_dist: pa.array(d),
        })

    out = bucketed_group_map(cand, [cell_c], _pairs, num_buckets=num_buckets,
                             batch_size=batch_size)
    # Zero qualifying pairs leaves every block empty and Ray Data then
    # reports schema=None (colless to_pandas); union one 0-row TYPED
    # block so the (key_a, key_b, dist_km) schema survives the no-pair
    # case (e.g. tiny inputs where no two points fall within radius).
    return out.union(ray.data.from_arrow(empty))


def idw_grid(
    ds: ray.data.Dataset,
    lon_col: str,
    lat_col: str,
    value_col: str,
    grid_lon: np.ndarray,
    grid_lat: np.ndarray,
    radius_km: float,
    power: float = 2.0,
    eps: float = 1e-9,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Inverse-distance-weighted interpolation of a point field onto a
    fixed grid (the raster↔vector bridge run in reverse: scattered web
    observations → a regular raster). For every grid center g:
    ``idw = Σ v_i/(d_i^power+eps) / Σ 1/(d_i^power+eps)`` over points
    within ``radius_km``.

    Scale shape: the grid is the SMALL side — broadcast once via
    ``ray.put`` and pinned per actor; each batch computes the dense
    batch×grid haversine matrix (vectorized) and emits only the
    per-grid-cell PARTIAL sums (≤ |grid| rows per batch, a combiner),
    so the shuffle carries grid-sized partials, never points. Output:
    one row per grid cell with ≥1 in-radius point — (gid, glon, glat,
    n_pts, idw).
    """
    from edkray.geo.distance import haversine_km
    from edkray.ops.aggregate import grouped_agg

    grid = np.stack([np.asarray(grid_lon, np.float64),
                     np.asarray(grid_lat, np.float64)], axis=1)
    grid_ref = ray.put(grid)

    class _Partial:
        def __init__(self):
            self.grid = ray.get(grid_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
            lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            d = haversine_km(lon[:, None], lat[:, None],
                             self.grid[None, :, 0], self.grid[None, :, 1])
            mask = d <= radius_km
            w = np.where(mask, 1.0 / (d**power + eps), 0.0)
            w_sum = w.sum(axis=0)
            wv_sum = (w * v[:, None]).sum(axis=0)
            n = mask.sum(axis=0).astype(np.int64)
            keep = n > 0
            gid = np.flatnonzero(keep).astype(np.int64)
            return pa.table({"gid": gid, "__w": w_sum[keep],
                             "__wv": wv_sum[keep], "n_pts": n[keep]})

    partials = ds.map_batches(
        _Partial, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8)
    )
    agg = grouped_agg(partials, ["gid"], [
        ("sum", "__w", "__w"), ("sum", "__wv", "__wv"), ("sum", "n_pts", "n_pts"),
    ])

    def _final(b: pa.Table) -> pa.Table:
        gid = b["gid"].to_numpy(zero_copy_only=False)
        return pa.table({
            "gid": gid,
            "glon": grid[gid, 0],
            "glat": grid[gid, 1],
            "n_pts": b["n_pts"],
            "idw": (b["__wv"].to_numpy(zero_copy_only=False)
                    / b["__w"].to_numpy(zero_copy_only=False)),
        })

    return agg.map_batches(_final, batch_format="pyarrow")
