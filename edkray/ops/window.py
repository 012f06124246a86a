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


def ewma_by_key(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    tiebreak: list[str] | None = None,
    out: str = "ewma",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key exponentially weighted mean of ``value_col`` in
    event-time order (pandas ``ewm(adjust=True)`` semantics): the
    newest row weighs 1, a row r steps older weighs ``(1-alpha)^r``;
    output is one row per key with the final smoothed value. The
    time-decay summary a crawl/ingest scheduler keeps per entity
    (churn rate, request rate) — reference windows are plain tumbling
    buckets (SURVEY §2.9); this is the decayed counterpart.

    Scale: ONE hash-bucketed co-shuffle on ``keys`` (same bound as
    every winner-filter here), then a fully vectorized polars fold.
    Weights are anchored to the NEWEST row inside each key
    (``w^(m-1-rank)`` with w<1, exponents ≥ 0), so the fold never
    overflows however long a group runs. ``tiebreak`` columns must
    make (ts, tiebreak) a total order within a key or the rank — and
    therefore the weights — would be nondeterministic under ties.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    order = [ts_col] + list(tiebreak or [])
    w = 1.0 - alpha

    def _fold(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(order)
        df = df.with_columns(
            pl.int_range(pl.len()).over(keys, mapping_strategy="group_to_rows").alias("__rn"),
            pl.len().over(keys, mapping_strategy="group_to_rows").alias("__m"),
        ).with_columns(
            (pl.lit(w) ** (pl.col("__m") - 1 - pl.col("__rn")).cast(pl.Float64)).alias("__w")
        )
        res = (
            df.group_by(keys, maintain_order=True)
            .agg(
                (pl.col(value_col) * pl.col("__w")).sum().alias("__num"),
                pl.col("__w").sum().alias("__den"),
            )
            .with_columns((pl.col("__num") / pl.col("__den")).alias(out))
            .drop(["__num", "__den"])
        )
        return res.to_arrow()

    return bucketed_group_map(ds, keys, _fold, num_buckets=num_buckets)


def funnel_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Ordered funnel analysis: how many keys (users) reach each step of
    ``steps``, where step k counts keys with an event of type
    ``steps[k]`` STRICTLY after their earliest completion time of step
    k-1 (the greedy earliest-transition semantics — replayable in SQL
    as a chain of min-ts joins).

    Scale shape: rows co-shuffle ONCE by key hash
    (:func:`~edkray.ops.shuffle.bucketed_group_map` — every key's
    events land in one bucket); inside a bucket the whole step chain is
    vectorized polars (filter → join → group min per step), and only
    the per-bucket COUNTS (≤ len(steps) rows) leave the bucket. A
    zero-filled seed keeps steps that no key reaches present with
    n_keys = 0. Output: (step, step_type, n_keys) per step.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    narrow = ds.map_batches(
        lambda b: b.select([*keys, ts_col, type_col]),
        batch_format="pyarrow",
    )

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        cur = (
            df.filter(pl.col(type_col) == steps[0])
            .group_by(keys)
            .agg(pl.col(ts_col).min().alias("__t"))
        )
        ns = [len(cur)]
        for s in steps[1:]:
            cur = (
                df.filter(pl.col(type_col) == s)
                .join(cur, on=keys, how="inner")
                .filter(pl.col(ts_col) > pl.col("__t"))
                .group_by(keys)
                .agg(pl.col(ts_col).min().alias("__t"))
            )
            ns.append(len(cur))
        return pa.table({
            "step": pa.array(range(1, len(steps) + 1), pa.int64()),
            "n_keys": pa.array(ns, pa.int64()),
        })

    partials = bucketed_group_map(narrow, keys, _bucket, num_buckets=num_buckets)
    seed = ray.data.from_arrow(pa.table({
        "step": pa.array(range(1, len(steps) + 1), pa.int64()),
        "n_keys": pa.array([0] * len(steps), pa.int64()),
    }))
    totals = grouped_agg(partials.union(seed), ["step"],
                         [("sum", "n_keys", "n_keys")])

    def _label(b: pa.Table) -> pa.Table:
        st = b["step"].to_numpy(zero_copy_only=False)
        names = np.asarray(steps, dtype=object)[st - 1]
        return pa.table({"step": b["step"],
                         "step_type": pa.array(list(names), pa.string()),
                         "n_keys": b["n_keys"]})

    return totals.map_batches(_label, batch_format="pyarrow")


def gap_stats(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
    unit_us: float = 1_000_000.0,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key inter-event gap statistics (the LAG window): rows sort by
    ``(ts, *tiebreak)`` inside each key, gaps are consecutive ts
    deltas, output is one row per key with (n_gaps, mean_gap, max_gap)
    in units of ``unit_us`` microseconds (default: seconds).

    Scale shape: ONE key-hash co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map`); the sort + diff +
    aggregate runs as a single vectorized polars plan per bucket.
    Keys with a single event emit n_gaps = 0 and null gap stats
    (matching SQL's LAG semantics where no gap row exists).
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    order = [ts_col, *(tiebreak or [])]

    def _bucket(tbl: pa.Table) -> pa.Table:
        # gaps stay EXACT integer microseconds in-plan; the float unit
        # conversion happens once in the numpy finalize below so the
        # division sequence is bit-identical to the SQL oracle's
        # (polars may constant-fold x/c into x*(1/c), which differs in
        # the last ulp and flips round() at .5 knife-edges)
        df = (
            pl.from_arrow(tbl)
            .sort([*keys, *order])
            .with_columns(
                pl.col(ts_col).cast(pl.Int64).diff().over(keys).alias("__gap")
            )
        )
        # first row of each key has a null diff -> not a gap
        out = (
            df.group_by(keys)
            .agg(
                pl.col("__gap").drop_nulls().len().cast(pl.Int64).alias("n_gaps"),
                pl.col("__gap").sum().alias("__sum_us"),
                pl.col("__gap").max().alias("__max_us"),
            )
        )
        return out.to_arrow()

    per_key = bucketed_group_map(ds, keys, _bucket, num_buckets=num_buckets)

    def _units(b: pa.Table) -> pa.Table:
        n = b["n_gaps"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["__sum_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = b["__max_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = (s / n) / unit_us
        return pa.table({
            **{k: b[k] for k in keys},
            "n_gaps": b["n_gaps"],
            "mean_gap": mean,
            "max_gap": m / unit_us,
        })

    return per_key.map_batches(_units, batch_format="pyarrow")


def cumsum_by_key(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: list[str] | None = None,
    out: str = "running_sum",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key running total in event-time order — SQL
    ``SUM(value) OVER (PARTITION BY keys ORDER BY ts, *tiebreak ROWS
    UNBOUNDED PRECEDING)``. One key co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map`), then a single
    vectorized sort + ``cum_sum().over(keys)`` per bucket; the
    accumulation order matches the SQL window's exactly, so float
    results agree addition-by-addition."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    order = [ts_col, *(tiebreak or [])]

    def _bucket(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .sort([*keys, *order])
            .with_columns(pl.col(value_col).cum_sum().over(keys).alias(out))
            .to_arrow()
        )

    return bucketed_group_map(ds, keys, _bucket, num_buckets=num_buckets)


def trajectory_stats(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    lon_col: str,
    lat_col: str,
    tiebreak: list[str] | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key movement summary over an ordered point stream: number of
    legs, total great-circle path length, and net first→last
    displacement (km). The geospatial LAG window — consecutive-event
    hops per entity.

    Scale shape: ONE key co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map`); inside a bucket
    the leg distances are a single vectorized haversine over the
    shifted coordinate arrays (masked at key boundaries), then a
    polars group aggregate. Single-point keys emit n_legs = 0 and
    zero distances.
    """
    import polars as pl

    from edkray.geo.distance import haversine_km
    from edkray.ops.shuffle import bucketed_group_map

    order = [ts_col, *(tiebreak or [])]

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, *order])
        lon = df[lon_col].to_numpy().astype(np.float64)
        lat = df[lat_col].to_numpy().astype(np.float64)
        same = np.ones(len(df), dtype=bool)
        for k in keys:
            kv = df[k].to_numpy()
            same &= np.r_[False, kv[1:] == kv[:-1]]
        leg = np.zeros(len(df))
        if len(df) > 1:
            d = haversine_km(lon[:-1], lat[:-1], lon[1:], lat[1:])
            leg[1:] = np.where(same[1:], d, 0.0)
        out = (
            df.with_columns(pl.Series("__leg", leg),
                            pl.Series("__isleg", same))
            .group_by(keys)
            .agg(
                pl.col("__isleg").sum().cast(pl.Int64).alias("n_legs"),
                pl.col("__leg").sum().alias("path_km"),
                pl.col(lon_col).first().alias("__lon0"),
                pl.col(lat_col).first().alias("__lat0"),
                pl.col(lon_col).last().alias("__lon1"),
                pl.col(lat_col).last().alias("__lat1"),
            )
        )
        net = haversine_km(out["__lon0"].to_numpy(), out["__lat0"].to_numpy(),
                           out["__lon1"].to_numpy(), out["__lat1"].to_numpy())
        return (
            out.with_columns(pl.Series("net_km", net))
            .drop(["__lon0", "__lat0", "__lon1", "__lat1"])
            .to_arrow()
        )

    narrow = ds.map_batches(
        lambda b: b.select([*keys, *order, lon_col, lat_col]),
        batch_format="pyarrow",
    )
    return bucketed_group_map(narrow, keys, _bucket, num_buckets=num_buckets)


def transition_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    type_col: str,
    tiebreak: list[str] | None = None,
    num_buckets: int = 32,
    max_states: int = 4096,
) -> ray.data.Dataset:
    """First-order Markov transition estimation over per-key event
    sequences: order each key's rows by ``(ts, *tiebreak)``, count
    every consecutive ``(from_type -> to_type)`` pair globally, and
    attach ``p = n / sum(n) OVER from_type`` (the row-conditional
    transition probability, unrounded — callers own presentation
    rounding).

    Scale shape: ONE key-hash co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map` over a 3-column
    projection); inside each bucket the lag + pair-count collapses to
    at most |states|² partial rows, so the final reduce and the
    probability normalization touch report-sized data only (bound
    ENFORCED via ``max_states``² — a transition matrix over an
    unbounded state alphabet is not a report). The reference engine
    has no sequence analytics; this extends the events/window family
    (reference temporal semantics: stitching/classes/dataset.py
    time-ordered band sequences)."""
    import polars as pl

    from edkray.ops.aggregate import grouped_agg
    from edkray.ops.shuffle import bucketed_group_map

    order = [ts_col, *(tiebreak or [])]

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tbl)
            .sort([*keys, *order])
            .with_columns(pl.col(type_col).shift(1).over(keys).alias("__from"))
            .drop_nulls("__from")
        )
        out = (
            df.group_by(["__from", type_col])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"__from": "from_type", type_col: "to_type"})
        )
        return out.to_arrow()

    narrow = ds.map_batches(
        lambda b: b.select([*keys, *order, type_col]), batch_format="pyarrow"
    )
    partials = bucketed_group_map(narrow, keys, _bucket, num_buckets=num_buckets)
    counts = grouped_agg(partials, ["from_type", "to_type"], [("sum", "n", "n")])

    # the transition matrix is a report: |states|² rows at most.  Fold
    # it driver-side under an ENFORCED bound (the A5 contract) to
    # normalize rows into probabilities in one deterministic pass.
    limit = max_states * max_states
    try:
        df = pl.from_pandas(counts.to_pandas(limit=limit))
    except ValueError as e:
        raise ValueError(
            f"transition_counts: more than {limit} distinct transitions — "
            f"the state alphabet is not bounded; raise max_states explicitly"
        ) from e
    if len(df) == 0:
        empty = pa.table({
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "p": pa.array([], pa.float64()),
        })
        return ray.data.from_arrow(empty)
    df = df.sort(["from_type", "to_type"]).with_columns(
        (pl.col("n") / pl.col("n").sum().over("from_type")).alias("p")
    )
    return ray.data.from_arrow(df.to_arrow())


def merge_intervals(
    ds: ray.data.Dataset,
    keys: list[str],
    start_col: str,
    end_col: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Coalesce overlapping-or-touching intervals per key (the SQL
    gaps-and-islands pattern over ranges): sort each key's intervals by
    (start, end), start a new island whenever an interval's start
    exceeds the running max end of everything before it, and emit one
    row per island — ``keys + [start, end, n_intervals]``. Touching
    intervals (next.start == running max end) MERGE (closed-interval
    semantics, matching the SQL ``s > prev_max`` new-group test).

    The crawl-scheduling / availability primitive: collapsing fetch
    windows, outage spans, or coverage ranges into disjoint spans.
    Works on any orderable numeric/timestamp columns (compared as
    int64 internally when temporal).

    Scale shape: ONE key-hash co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map` over a 3-column
    projection); island assignment is a single vectorized polars plan
    per bucket (cum_max + shift + cum_sum), output is island-sized."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tbl)
            .sort([*keys, start_col, end_col])
            .with_columns(pl.col(end_col).cum_max().over(keys).alias("__cmax"))
            .with_columns(pl.col("__cmax").shift(1).over(keys).alias("__prev"))
        )
        df = df.with_columns(
            (pl.col("__prev").is_null() | (pl.col(start_col) > pl.col("__prev")))
            .cast(pl.Int64)
            .alias("__new")
        ).with_columns(pl.col("__new").cum_sum().over(keys).alias("__gid"))
        out = (
            df.group_by([*keys, "__gid"], maintain_order=True)
            .agg(
                pl.col(start_col).min().alias("start"),
                pl.col(end_col).max().alias("end"),
                pl.len().cast(pl.Int64).alias("n_intervals"),
            )
            .drop("__gid")
        )
        return out.to_arrow()

    narrow = ds.map_batches(
        lambda b: b.select([*keys, start_col, end_col]), batch_format="pyarrow"
    )
    return bucketed_group_map(narrow, keys, _bucket, num_buckets=num_buckets)


def max_streak(
    ds: ray.data.Dataset,
    keys: list[str],
    ts_col: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Longest run of CONSECUTIVE active days per key (the classic
    gaps-and-islands engagement metric): distinct calendar days of
    ``ts_col`` per key, islands split where the day-to-day gap exceeds
    1, output ``keys + [n_days, max_streak]`` (total distinct active
    days and the longest consecutive run).

    Scale shape: per-batch day-distinct pre-aggregation shrinks rows
    to (key, day) pairs BEFORE the one key-hash co-shuffle; the island
    scan is one vectorized polars plan per bucket."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    def _days(b: pa.Table) -> pa.Table:
        # pre-distinct inside the batch: the shuffle carries (key, day)
        return (
            pl.from_arrow(b.select([*keys, ts_col]))
            .with_columns(pl.col(ts_col).cast(pl.Date).alias("__day"))
            .select([*keys, "__day"])
            .unique()
            .to_arrow()
        )

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tbl)
            .unique([*keys, "__day"])
            .sort([*keys, "__day"])
            .with_columns(
                (pl.col("__day").cast(pl.Int32).diff().over(keys) > 1)
                .fill_null(True)
                .cast(pl.Int64)
                .alias("__new")
            )
            .with_columns(pl.col("__new").cum_sum().over(keys).alias("__gid"))
        )
        runs = df.group_by([*keys, "__gid"]).agg(
            pl.len().cast(pl.Int64).alias("__run")
        )
        out = runs.group_by(keys).agg(
            pl.col("__run").sum().alias("n_days"),
            pl.col("__run").max().alias("max_streak"),
        )
        return out.to_arrow()

    days = ds.map_batches(_days, batch_format="pyarrow")
    return bucketed_group_map(days, keys, _bucket, num_buckets=num_buckets)


def dense_daily_counts(
    ds,
    ts_col: str,
    max_days: int = 200_000,
    batch_size: int = 65536,
):
    """Daily event counts over a DENSE calendar — every day between the
    global min and max date appears, zero-filled (the gap-visible time
    series a monitoring rollup needs; plain groupby silently drops
    empty days).

    Distributed part: per-batch day counts (combiner) fold through one
    narrow groupby. The zero-fill runs driver-side over the
    REPORT-SIZED day range under an ENFORCED ``max_days`` bound
    (200k days ≈ 550 years — the calendar is a report, not a corpus).
    Output: (day: date32, n: int64)."""
    import pyarrow.compute as pc

    from edkray.ops.aggregate import grouped_agg

    day = ds.map_batches(
        lambda b: pa.table(
            {"day": pc.cast(pc.floor_temporal(b[ts_col], unit="day"), pa.date32())}
        ),
        batch_format="pyarrow", batch_size=batch_size,
    )
    counts = grouped_agg(day, ["day"], [("count", None, "n")])
    df = counts.to_pandas(limit=max_days)
    if df.empty:
        return ray.data.from_arrow(
            pa.table({"day": pa.array([], pa.date32()),
                      "n": pa.array([], pa.int64())})
        )
    days = pd.date_range(df["day"].min(), df["day"].max(), freq="D")
    if len(days) > max_days:
        raise ValueError(
            f"dense_daily_counts: calendar spans {len(days)} days > "
            f"max_days={max_days}; bucket coarser"
        )
    full = pd.DataFrame({"day": days.date})
    out = full.merge(df, on="day", how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return ray.data.from_arrow(pa.table({
        "day": pa.array(out["day"], pa.date32()),
        "n": pa.array(out["n"], pa.int64()),
    }))


def gap_autocorr(
    ds,
    keys: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
    alias: str = "autocorr",
    num_buckets: int = 32,
    batch_size: int = 65536,
):
    """Lag-1 autocorrelation of each key's inter-event gaps — the
    burstiness signal (≈0 for Poisson arrivals, >0 for clustered
    traffic, <0 for alternating long/short gaps).

    One key co-shuffle (hash buckets hold complete key groups); inside
    a bucket the (ts, tiebreak) sort, the microsecond gap diff, and the
    (gapᵢ, gapᵢ₊₁) lag pairs are all vectorized window exprs, and the
    Pearson closed form folds per key in place — no second shuffle, no
    pair rows on the wire. Keys with <3 events or zero gap variance
    emit null (SQL corr semantics). Output: keys + (n_pairs, alias)."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    tiebreak = tiebreak or []
    order = [ts_col] + tiebreak

    def _corr(table: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(table)
            .sort(keys + order)
            .with_columns(
                (pl.col(ts_col).cast(pl.Int64)
                 - pl.col(ts_col).cast(pl.Int64).shift(1).over(keys))
                .cast(pl.Float64).alias("__y")
            )
            .with_columns(pl.col("__y").shift(1).over(keys).alias("__x"))
            .drop_nulls(["__x", "__y"])
        )
        x, y = pl.col("__x"), pl.col("__y")
        s = df.group_by(keys).agg(
            pl.len().cast(pl.Int64).alias("n_pairs"),
            x.sum().alias("__sx"), y.sum().alias("__sy"),
            (x * x).sum().alias("__sxx"), (y * y).sum().alias("__syy"),
            (x * y).sum().alias("__sxy"),
        )
        n = s["n_pairs"].cast(pl.Float64)
        vx = n * s["__sxx"] - s["__sx"] * s["__sx"]
        vy = n * s["__syy"] - s["__sy"] * s["__sy"]
        num = n * s["__sxy"] - s["__sx"] * s["__sy"]
        r = num / (vx * vy).sqrt()
        r = pl.select(
            pl.when((pl.Series(vx) <= 0.0) | (pl.Series(vy) <= 0.0))
            .then(None).otherwise(pl.Series(r)).alias(alias)
        )[alias]
        return (
            s.select(keys + ["n_pairs"]).with_columns(r.alias(alias)).to_arrow()
        )

    return bucketed_group_map(ds, keys, _corr, num_buckets=num_buckets,
                              batch_size=batch_size)


def bearing_sector_counts(
    ds,
    keys: list[str],
    ts_col: str,
    lon_col: str,
    lat_col: str,
    tiebreak: list[str] | None = None,
    num_buckets: int = 32,
):
    """Compass-rose histogram of per-key leg headings: the initial
    great-circle bearing of every consecutive-point leg, binned into
    eight 45° sectors (0=N, 1=NE, … 7=NW) — the movement-direction
    profile over an entity's trajectory.

    Same scale shape as :func:`trajectory_stats`: one key co-shuffle,
    vectorized spherical trig over shifted coordinate arrays (masked at
    key boundaries), then per-bucket partial sector counts folded by a
    narrow groupby. Output: (sector: int64, n: int64), 8 rows max."""
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map
    from ray.data.aggregate import Sum

    order = [ts_col, *(tiebreak or [])]

    def _bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, *order])
        lon = np.radians(df[lon_col].to_numpy().astype(np.float64))
        lat = np.radians(df[lat_col].to_numpy().astype(np.float64))
        same = np.ones(len(df), dtype=bool)
        for k in keys:
            kv = df[k].to_numpy()
            same &= np.r_[False, kv[1:] == kv[:-1]]
        if len(df) < 2:
            return pa.table({"sector": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lon1, lat1, lon2, lat2 = lon[:-1], lat[:-1], lon[1:], lat[1:]
        dlon = lon2 - lon1
        y = np.sin(dlon) * np.cos(lat2)
        x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
        theta = np.degrees(np.arctan2(y, x)) % 360.0
        sector = np.floor(((theta + 22.5) % 360.0) / 45.0).astype(np.int64)
        sector = sector[same[1:]]
        vals, cnts = np.unique(sector, return_counts=True)
        return pa.table({"sector": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    narrow = ds.map_batches(
        lambda b: b.select([*keys, *order, lon_col, lat_col]),
        batch_format="pyarrow",
    )
    partial = bucketed_group_map(narrow, keys, _bucket, num_buckets=num_buckets)
    return partial.groupby(["sector"]).aggregate(Sum("n", alias_name="n"))
