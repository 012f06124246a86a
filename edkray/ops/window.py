"""Windowed aggregation over event streams (batch semantics).

Ray Data has no event-time windows; per the engine's streaming model
(SURVEY §2.9 — the reference is strictly batch too) windows are
expressed as key-partitioned grouped computations:

- :func:`tumbling` — floor(ts, size) + grouped aggregate (vectorized,
  pre-aggregated before the shuffle).
- :func:`sliding` — each row exploded into the windows containing it
  (flat map), then grouped aggregate.
- :func:`sessionize` — per-key sorted gap-split sessions via map_groups.

Ordering assumption: within one key group, map_groups sees all rows of
the key; sessionize sorts by ts inside the group (no cross-key order
needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from edkray.ops.aggregate import AggSpec, grouped_agg


def tumbling(
    ds: ray.data.Dataset,
    ts_col: str,
    size: str,
    keys: list[str],
    aggs: list[AggSpec],
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Tumbling windows of pyarrow unit ``size`` ("hour", "day", ...)."""

    def _bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(window_col, pc.floor_temporal(batch[ts_col], unit=size))

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")
    return grouped_agg(bucketed, keys + [window_col], aggs)


def sliding(
    ds: ray.data.Dataset,
    ts_col: str,
    size_us: int,
    step_us: int,
    keys: list[str],
    aggs: list[AggSpec],
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Sliding windows (size/step in microseconds, epoch-aligned).

    Each row belongs to ``ceil(size/step)`` windows; the explode factor
    is paid before the (pre-aggregated) shuffle.
    """
    nwin = int(np.ceil(size_us / step_us))

    def _explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        n = len(ts)
        last_start = (ts // step_us) * step_us
        starts = last_start[:, None] - np.arange(nwin)[None, :] * step_us  # (n, nwin)
        valid = (ts[:, None] >= starts) & (ts[:, None] < starts + size_us)
        row_idx = np.repeat(np.arange(n), nwin)[valid.reshape(-1)]
        win = starts.reshape(-1)[valid.reshape(-1)]
        out = batch.take(pa.array(row_idx))
        return out.append_column(
            window_col, pa.array(win).cast(pa.timestamp("us"))
        )

    exploded = ds.map_batches(_explode, batch_format="pyarrow")
    return grouped_agg(exploded, keys + [window_col], aggs)


def sessionize(
    ds: ray.data.Dataset,
    ts_col: str,
    key: str,
    gap_us: int,
    agg_col: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Session windows: per key, sort by ts, split where the gap to the
    previous event exceeds ``gap_us``. Output one row per session:
    (key, session_start, session_end, n_events[, sum_value]).

    Hash-bucketed shuffle (all events of a key co-locate) + fully
    vectorized polars session assignment in-bucket — no per-key Python.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    def _sessions(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort([key, ts_col])
        new = (
            (pl.col(ts_col).diff().over(key).dt.total_microseconds() > gap_us)
            .fill_null(True)
            .alias("__new")
        )
        df = df.with_columns(new).with_columns(
            pl.col("__new").cum_sum().over(key).alias("__sid")
        )
        aggs = [
            pl.col(ts_col).min().alias("session_start"),
            pl.col(ts_col).max().alias("session_end"),
            pl.len().cast(pl.Int64).alias("n_events"),
        ]
        if agg_col:
            aggs.append(pl.col(agg_col).sum().alias(f"sum_{agg_col}"))
        out = df.group_by([key, "__sid"], maintain_order=True).agg(aggs).drop("__sid")
        return out.to_arrow()

    return bucketed_group_map(ds, [key], _sessions, num_buckets=num_buckets)
