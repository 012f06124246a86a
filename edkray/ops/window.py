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
) -> ray.data.Dataset:
    """Session windows: per key, sort by ts, split where the gap to the
    previous event exceeds ``gap_us``. Output one row per session:
    (key, session_start, session_end, n_events[, sum_value])."""

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="stable")
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        out = {
            key: [],
            "session_start": [],
            "session_end": [],
            "n_events": [],
        }
        if agg_col:
            out[f"sum_{agg_col}"] = []
        vals = g[agg_col].to_numpy() if agg_col else None
        for s in range(sid[-1] + 1 if len(sid) else 0):
            m = sid == s
            out[key].append(g[key].iloc[0])
            out["session_start"].append(ts[m].min())
            out["session_end"].append(ts[m].max())
            out["n_events"].append(int(m.sum()))
            if agg_col:
                out[f"sum_{agg_col}"].append(float(vals[m].sum()))
        df = pd.DataFrame(out)
        for c in ("session_start", "session_end"):
            df[c] = pd.to_datetime(df[c], unit="us")
        return df

    return ds.groupby(key).map_groups(_sessions, batch_format="pandas")
