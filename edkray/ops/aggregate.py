"""Scalable grouped aggregation: partial (combiner) pre-aggregation
inside ``map_batches`` followed by a small final ``groupby``.

This is the manual partial+final mean pattern the reference benchmarks
use (benchmarks/read_gdal_parallel.py:44-50 — ``total += mean*size``)
generalized: the shuffle moves one row per (key, batch) instead of every
input row, which at 100 TB is the difference between shuffling the
corpus and shuffling a few million partials.

Supported specs: ("sum", col, alias), ("count", None|col, alias),
("min"/"max", col, alias), ("mean", col, alias) — mean decomposes into
sum+count partials and a finalize division.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

AggSpec = tuple[str, str | None, str]


def _partial_exprs(aggs: list[AggSpec]) -> tuple[list, list, list[tuple[str, str]]]:
    """→ (polars partial exprs, ray final aggs, finalize plan)."""
    partial, final, finalize = [], [], []
    for fn, col, alias in aggs:
        if fn == "sum":
            partial.append(pl.col(col).sum().alias(alias))
            final.append(Sum(alias, alias_name=alias))
            finalize.append(("keep", alias))
        elif fn == "count":
            expr = pl.len() if col is None else pl.col(col).count()
            partial.append(expr.cast(pl.Int64).alias(alias))
            final.append(Sum(alias, alias_name=alias))
            finalize.append(("keep", alias))
        elif fn == "min":
            partial.append(pl.col(col).min().alias(alias))
            final.append(Min(alias, alias_name=alias))
            finalize.append(("keep", alias))
        elif fn == "max":
            partial.append(pl.col(col).max().alias(alias))
            final.append(Max(alias, alias_name=alias))
            finalize.append(("keep", alias))
        elif fn == "mean":
            partial.append(pl.col(col).sum().alias(f"__sum_{alias}"))
            partial.append(pl.col(col).count().cast(pl.Int64).alias(f"__cnt_{alias}"))
            final.append(Sum(f"__sum_{alias}", alias_name=f"__sum_{alias}"))
            final.append(Sum(f"__cnt_{alias}", alias_name=f"__cnt_{alias}"))
            finalize.append(("mean", alias))
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    return partial, final, finalize


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[AggSpec],
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """groupby(keys).agg(aggs) with per-batch combining before the shuffle."""
    partial_exprs, final_aggs, finalize = _partial_exprs(aggs)

    def _partial(batch: pa.Table) -> pa.Table:
        out = pl.from_arrow(batch).group_by(keys).agg(partial_exprs)
        return out.to_arrow()

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    out = partials.groupby(keys).aggregate(*final_aggs)

    needs_mean = any(f == "mean" for f, _ in finalize)
    if not needs_mean:
        return out

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        cols = [pl.col(k) for k in keys]
        for fn, alias in finalize:
            if fn == "keep":
                cols.append(pl.col(alias))
            else:
                cols.append((pl.col(f"__sum_{alias}") / pl.col(f"__cnt_{alias}")).alias(alias))
        return df.select(cols).to_arrow()

    return out.map_batches(_finalize, batch_format="pyarrow")


def grouped_agg_small(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[AggSpec],
    batch_size: int = 65536,
    max_partial_rows: int = 2_000_000,
):
    """Like :func:`grouped_agg` but the FINAL combine runs driver-side
    (polars over the collected partials) instead of a Ray shuffle.

    Correct only when the partial result (one row per (key, block)) fits
    on the driver — i.e. key cardinality × blocks is small. This is the
    reference's driver-side date grouping pattern (dataset.py:789) and
    skips a whole Ray execution's shuffle for small-keyed counts.
    The bound is ENFORCED: if the collected partials exceed
    ``max_partial_rows`` (≈ key cardinality × blocks), this raises with
    a pointer to :func:`grouped_agg` instead of silently OOMing the
    driver at scale. Returns a pandas DataFrame.
    """
    partial_exprs, _, finalize = _partial_exprs(aggs)

    def _partial(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch).group_by(keys).agg(partial_exprs).to_arrow()

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    try:
        collected = partials.to_pandas(limit=max_partial_rows)
    except ValueError as e:
        raise ValueError(
            f"grouped_agg_small: partial rows exceed max_partial_rows="
            f"{max_partial_rows}; key cardinality is too large for a "
            f"driver-side combine — use grouped_agg (distributed shuffle)"
        ) from e
    df = pl.from_pandas(collected)
    combine = []
    for fn, col, alias in aggs:
        if fn in ("sum", "count"):
            combine.append(pl.col(alias).sum().alias(alias))
        elif fn == "min":
            combine.append(pl.col(alias).min().alias(alias))
        elif fn == "max":
            combine.append(pl.col(alias).max().alias(alias))
        elif fn == "mean":
            combine.append(pl.col(f"__sum_{alias}").sum().alias(f"__sum_{alias}"))
            combine.append(pl.col(f"__cnt_{alias}").sum().alias(f"__cnt_{alias}"))
    out = df.group_by(keys).agg(combine)
    for fn, alias in finalize:
        if fn == "mean":
            out = out.with_columns(
                (pl.col(f"__sum_{alias}") / pl.col(f"__cnt_{alias}")).alias(alias)
            ).drop([f"__sum_{alias}", f"__cnt_{alias}"])
    return out.to_pandas()


def grouped_collect(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    alias: str = "values",
    sort: bool = True,
    num_buckets: int = 32,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """groupby(keys) → list of ``value_col`` per key (reference A2/J3
    band→tiles regrouping, dataset.py:331-347: group band rows by config,
    collect tile lists).

    Two-level like :func:`grouped_agg`: per-batch partial collect emits
    ONE list row per (key, batch) (combiner), the bucketed shuffle moves
    those list rows, and the in-bucket final flattens + (optionally)
    sorts each key's list — deterministic output independent of block
    arrival order. A key's full list must fit in one task (same bound as
    any per-key collect; salt upstream if a key's list alone exceeds a
    task's budget)."""

    def _partial(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch.select(keys + [value_col]))
            .group_by(keys)
            .agg(pl.col(value_col).alias(alias))
            .to_arrow()
        )

    pre = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _final(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).group_by(keys).agg(pl.col(alias).flatten().alias(alias))
        if sort:
            df = df.with_columns(pl.col(alias).list.sort())
        return df.to_arrow()

    return bucketed_group_map(pre, keys, _final, num_buckets=num_buckets)


def count_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    alias: str = "n_distinct",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Exact per-group COUNT(DISTINCT value): two-phase — local distinct
    (key, value) pairs per batch (combiner), shuffle the deduped pairs,
    then count per key. The shuffle carries distinct pairs only."""

    def _local(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch.select(keys + [value_col])).unique().to_arrow()

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _count(table: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(table)
            .unique(subset=keys + [value_col])
            .group_by(keys)
            .agg(pl.len().cast(pl.Int64).alias(alias))
            .to_arrow()
        )

    return bucketed_group_map(pre, keys, _count, num_buckets=16)


def top_k_per_group(
    ds: ray.data.Dataset,
    keys: list[str],
    order_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Top-k rows per key group ordered by ``order_cols`` with an
    explicit ``rank`` column (0 = best). Local per-batch top-k combiner
    → hash-bucket shuffle of survivors only → exact in-bucket top-k.
    ``order_cols`` must totally order rows within a key."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)

    def _local(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.sort(order_cols, descending=descending, maintain_order=True)
            .group_by(keys, maintain_order=True)
            .head(k)
            .to_arrow()
        )

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _topk(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort(order_cols, descending=descending, maintain_order=True)
        df = df.with_columns(
            pl.int_range(pl.len()).over(keys, mapping_strategy="group_to_rows").alias("rank")
        )
        return df.filter(pl.col("rank") < k).to_arrow()

    return bucketed_group_map(pre, keys, _topk, num_buckets=16)


def global_top_k(
    ds: ray.data.Dataset,
    order_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Global top-k WITHOUT a global sort: per-block top-k combiner →
    one-block final merge. The exchange carries ≤ k rows per input
    block (k × n_blocks total) instead of every row, so at 100 TB the
    all-to-all a ``sort().limit(k)`` plan would do never happens.
    ``order_cols`` must totally order rows (ties broken explicitly)."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)

    def _local(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch).sort(order_cols, descending=descending).head(k).to_arrow()

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    return pre.repartition(1).map_batches(_local, batch_format="pyarrow", batch_size=None)


def approx_count_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    alias: str = "approx_nd",
    p: int = 12,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Per-group HyperLogLog distinct estimate (~1.04/sqrt(2^p) rel.err).

    The scale path for COUNT(DISTINCT) when the distinct-pair shuffle of
    :func:`count_distinct` is too wide: each batch emits one (key,
    2^p-register sketch) row — the shuffle moves sketches, never values
    — and registers merge by elementwise max in-bucket. Standard HLL
    (Flajolet et al. 2007) with the usual small-range linear counting
    correction; hashes via polars xxhash (stable within a run).
    """
    import pyarrow as _pa

    m = 1 << p

    def _rho_registers(h: "np.ndarray") -> "np.ndarray":
        import numpy as np

        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        # rank = leading zeros of remaining 64-p bits + 1 (capped)
        rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            f = rest[nz].astype(np.float64)
            lz = np.clip(63 - np.floor(np.log2(f)).astype(np.int64), 0, 64 - p)
            rank[nz] = (lz + 1).astype(np.uint8)
        return idx, rank

    def _partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = pl.from_arrow(batch.select(keys + [value_col]))
        h = df.select(pl.col(value_col).hash(seed=7).alias("h"))["h"].to_numpy().astype(np.uint64)
        gkeys = df.select(keys).to_arrow()
        # group rows by key within the batch, build one sketch per key
        key_df = pl.from_arrow(gkeys).with_row_index("__i")
        out_keys, out_sketches = [], []
        for kv, grp in key_df.group_by(keys):
            rows = grp["__i"].to_numpy()
            idx, rank = _rho_registers(h[rows])
            regs = np.zeros(m, dtype=np.uint8)
            np.maximum.at(regs, idx, rank)
            out_keys.append(kv if isinstance(kv, tuple) else (kv,))
            out_sketches.append(regs.tobytes())
        cols = {k: pa.array([ok[i] for ok in out_keys]) for i, k in enumerate(keys)}
        cols["__sketch"] = pa.array(out_sketches, type=_pa.binary())
        return pa.table(cols)

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)

    def _merge(table: pa.Table) -> pa.Table:
        import numpy as np

        df = pl.from_arrow(table)
        out = {k: [] for k in keys}
        out[alias] = []
        for kv, grp in df.group_by(keys):
            regs = np.zeros(m, dtype=np.uint8)
            for sk in grp["__sketch"]:
                regs = np.maximum(regs, np.frombuffer(sk, dtype=np.uint8))
            am = 0.7213 / (1 + 1.079 / m)
            est = am * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
            zeros = int((regs == 0).sum())
            if est <= 2.5 * m and zeros:
                est = m * np.log(m / zeros)  # linear counting
            kv = kv if isinstance(kv, tuple) else (kv,)
            for i, k in enumerate(keys):
                out[k].append(kv[i])
            out[alias].append(int(round(est)))
        arrays = {k: pa.array(v) for k, v in out.items()}
        arrays[alias] = pa.array(out[alias], type=_pa.int64())
        return pa.table(arrays)

    from edkray.ops.shuffle import bucketed_group_map

    return bucketed_group_map(partials, keys, _merge, num_buckets=8)


def distinct(ds: ray.data.Dataset, cols: list[str], batch_size: int = 65536) -> ray.data.Dataset:
    """Distinct rows over ``cols`` with per-batch pre-dedup before the
    shuffle (reference A4 ``unique()`` / ``list(set(...))``)."""

    def _local_unique(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch.select(cols)).unique().to_arrow()

    pre = ds.map_batches(_local_unique, batch_format="pyarrow", batch_size=batch_size)
    from ray.data.aggregate import Count

    return pre.groupby(cols).aggregate(Count(alias_name="__n")).drop_columns(["__n"])


def stratified_sample(
    ds: ray.data.Dataset,
    keys: list[str],
    n_per_key: int,
    id_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Deterministic stratified sample: the ``n_per_key`` rows of each
    key-group with the smallest Knuth multiplicative hash of ``id_col``
    (ties broken by the id itself) — the training-data balancing op
    (cap documents per language / per domain) with a rank that any SQL
    engine reproduces exactly: ``row_number() OVER (PARTITION BY keys
    ORDER BY (id * 2654435761) % 4294967296, id) <= n``.

    Distribution: one hash-bucket shuffle on ``keys``
    (:func:`~edkray.ops.shuffle.bucketed_group_map` — complete groups
    per bucket, many keys per bucket task, no per-key map_groups), then
    a vectorized polars sort + window-rank inside each bucket. Nothing
    materializes on the driver; the sample streams out. Non-negative
    integer ids required (same contract as ``deterministic_sample``,
    stages.py — numpy's uint64 wrap equals SQL mod because 2^32 | 2^64).
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    knuth = np.uint64(2654435761)

    def _sample(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (ids < 0).any():
            raise ValueError(f"stratified_sample: negative ids in {id_col!r}")
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * knuth) % np.uint64(1 << 32)
        df = pl.from_arrow(tbl).with_columns(pl.Series("__h", h.astype(np.int64)))
        out = (
            df.sort([*keys, "__h", id_col])
            .with_columns(pl.int_range(1, pl.len() + 1).over(keys).alias("__rk"))
            .filter(pl.col("__rk") <= n_per_key)
            .drop(["__h", "__rk"])
        )
        return out.to_arrow()

    return bucketed_group_map(ds, keys, _sample, num_buckets=num_buckets)


def grouped_quantile_disc(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    ps: list[float],
    aliases: list[str],
    count_alias: str | None = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Exact discrete quantiles per group over a bounded-domain column
    (the length-filter threshold computation: q50/q90 of doc length per
    language) — WITHOUT shuffling values.

    Phase 1 shuffles one ``(keys, col, count)`` row per distinct value
    per batch (:func:`grouped_agg` partial+final — at 100 TB the wire
    carries the value HISTOGRAM, bounded by the column's domain size,
    not the corpus). Phase 2 is a bucketed per-key finalize over that
    small table: sort by value, cumulative counts, pick the smallest
    value whose cumulative count ≥ ceil(p·n) — exactly DuckDB's
    ``quantile_disc`` (type-1) rule, verified index-by-index, so the
    SQL oracle reproduces it bit-for-bit. Only suitable for columns
    whose distinct-value count is manageable (ints, bucketed floats);
    for unbounded domains use a sketch instead.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    counts = grouped_agg(ds, [*keys, col], [("count", None, "__cnt")])

    def _finalize(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, col])
        df = df.with_columns(
            pl.col("__cnt").cum_sum().over(keys).alias("__cum"),
            pl.col("__cnt").sum().over(keys).alias("__tot"),
        )
        out = df.group_by(keys, maintain_order=True).agg(
            pl.col("__tot").first().alias("__n")
        )
        for p, alias in zip(ps, aliases):
            tgt = (pl.col("__tot") * p).ceil().clip(lower_bound=1)
            qp = (
                df.filter(pl.col("__cum") >= tgt)
                .group_by(keys, maintain_order=True)
                .agg(pl.col(col).first().alias(alias))
            )
            out = out.join(qp, on=keys, how="left")
        if count_alias is not None:
            out = out.rename({"__n": count_alias})
        else:
            out = out.drop("__n")
        return out.to_arrow()

    return bucketed_group_map(counts, keys, _finalize, num_buckets=num_buckets)


def temperature_sample(
    ds: ray.data.Dataset,
    keys: list[str],
    total_n: int,
    temperature: float,
    id_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Temperature-flattened data mixing (the multilingual-LM sampling
    rule, e.g. XLM-R's p_g ∝ c_g^T): group ``g`` receives quota
    ``floor(total_n · c_g^T / Σ_h c_h^T)`` rows — T=1 keeps natural
    proportions, T→0 flattens toward uniform, boosting low-resource
    groups. Within each group the quota is filled by the same
    deterministic Knuth-hash rank as :func:`stratified_sample`, so the
    whole op is SQL-reproducible.

    Two passes: a count pass (A4 partial+final — the per-group counts,
    bounded by the number of groups, land on the driver to compute
    quotas, which broadcast in the bucket-fn closure), then one
    hash-bucket shuffle on ``keys`` with a vectorized window-rank +
    per-group quota filter. ``ds`` is consumed twice — pass a
    re-readable source. Group cardinality must be driver-small (langs /
    domains / sources — the op's intended keys).
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    cdf = grouped_agg(ds, keys, [("count", None, "__n")]).to_pandas()
    powv = cdf["__n"].to_numpy().astype(np.float64) ** float(temperature)
    quota = np.floor(float(total_n) * powv / powv.sum()).astype(np.int64)
    qdf = pl.from_pandas(cdf[keys]).with_columns(
        pl.Series("__quota", quota, dtype=pl.Int64)
    )

    knuth = np.uint64(2654435761)

    def _sample(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (ids < 0).any():
            raise ValueError(f"temperature_sample: negative ids in {id_col!r}")
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * knuth) % np.uint64(1 << 32)
        df = pl.from_arrow(tbl).with_columns(pl.Series("__h", h.astype(np.int64)))
        out = (
            df.sort([*keys, "__h", id_col])
            .with_columns(pl.int_range(1, pl.len() + 1).over(keys).alias("__rk"))
            .join(qdf, on=keys, how="left")
            .filter(pl.col("__rk") <= pl.col("__quota").fill_null(0))
            .drop(["__h", "__rk", "__quota"])
        )
        return out.to_arrow()

    return bucketed_group_map(ds, keys, _sample, num_buckets=num_buckets)


def gumbel_weighted_sample(
    ds: ray.data.Dataset,
    logw_col: str,
    n: int,
    id_col: str,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Weighted sampling WITHOUT replacement via the Gumbel-top-k trick
    (Vieira 2014; the resampling step of DSIR): each row gets key
    ``logw + Gumbel`` and the global top-``n`` keys are the sample —
    distributionally identical to sequential weighted draws, but
    embarrassingly parallel. The Gumbel noise is derived
    DETERMINISTICALLY from the Knuth hash of ``id_col``
    (``u = (hash + 0.5) / 2³²``, ``g = −ln(−ln u)``), so the sample is
    reproducible run-to-run and exactly SQL-mirrorable (verified to
    2⁻⁵² against DuckDB's ln). Output: input columns + ``gumbel_key``,
    the ``n`` rows with the largest keys.

    Scale: one stateless pass appends the key; the selection is
    :func:`global_top_k` — per-block combiner, ≤ n rows per block move.
    Non-negative integer ids required (uint64 wrap = SQL mod).
    """
    knuth = np.uint64(2654435761)

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (ids < 0).any():
            raise ValueError(f"gumbel_weighted_sample: negative ids in {id_col!r}")
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * knuth) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        g = -np.log(-np.log(u))
        key = batch[logw_col].to_numpy(zero_copy_only=False).astype(np.float64) + g
        return batch.append_column("gumbel_key", pa.array(key))

    keyed = ds.map_batches(_key, batch_format="pyarrow", batch_size=batch_size)
    return global_top_k(keyed, ["gumbel_key", id_col], n, descending=[True, False])


def global_shuffle_shard(
    ds: ray.data.Dataset,
    id_col: str,
    shard_size: int,
    range_bits: int = 8,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Deterministic global shuffle + fixed-size shard assignment — the
    LAST step of a training-data pipeline (emit shuffled shards a
    trainer streams in order). Every row gets its position in the
    corpus-wide ordering by ``(knuth_hash(id), id)`` — a reproducible
    permutation — and ``(shard = pos // shard_size,
    pos_in_shard = pos % shard_size)``. Output: input columns + shard,
    pos_in_shard.

    A global rank is the textbook all-to-all trap; this is the
    range-partition + prefix-offset shape instead (the same idiom as
    the flagship's tile-rank pass, generalized to ONE global order):

    1. count pass — narrow (range_bucket, count) partials, where the
       bucket is the hash's TOP ``range_bits`` bits, so bucket order =
       hash order; 2^range_bits counts reach the driver, which
       prefix-sums them into per-bucket starting offsets (broadcast in
       the closure).
    2. rank pass — one hash shuffle on the bucket id; each task sorts
       its WHOLE buckets by (hash, id) and adds the bucket offset:
       offsets make the local ranks globally correct with no global
       sort barrier and no sequential dependency.

    The hash's uniformity bounds bucket skew (Chernoff: ±O(√(n/2^b)));
    size ``range_bits`` so n/2^b rows fit a task. Non-negative integer
    ids required (uint64 wrap = SQL mod).
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    knuth = np.uint64(2654435761)
    nb = 1 << range_bits
    shift = np.uint64(32 - range_bits)

    def _hash_bucket(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if (ids < 0).any():
            raise ValueError(f"global_shuffle_shard: negative ids in {id_col!r}")
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * knuth) % np.uint64(1 << 32)
        return h.astype(np.int64), (h >> shift).astype(np.int64)

    def _counts(batch: pa.Table) -> pa.Table:
        _, b = _hash_bucket(batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"__rb": pa.array(uniq), "__n": pa.array(cnt.astype(np.int64))})

    cdf = (
        grouped_agg(
            ds.map_batches(_counts, batch_format="pyarrow", batch_size=batch_size),
            ["__rb"],
            [("sum", "__n", "__n")],
        )
        .to_pandas()
        .sort_values("__rb")
    )
    counts = np.zeros(nb, dtype=np.int64)
    counts[cdf["__rb"].to_numpy()] = cdf["__n"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def _tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h, b = _hash_bucket(ids)
        return batch.append_column("__h", pa.array(h)).append_column(
            "__rb", pa.array(b)
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow", batch_size=batch_size)

    def _rank(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort(["__rb", "__h", id_col])
        rb = df["__rb"].to_numpy()
        local = (
            df.select(pl.int_range(pl.len()).over("__rb").alias("r"))["r"].to_numpy()
        )
        pos = local + offsets[rb]  # vectorized gather, no per-row Python
        out = df.with_columns(
            pl.Series("shard", pos // shard_size),
            pl.Series("pos_in_shard", pos % shard_size),
        ).drop(["__h", "__rb"])
        return out.to_arrow()

    return bucketed_group_map(
        tagged, ["__rb"], _rank, num_buckets=min(nb, 64), batch_size=batch_size
    )


def heavy_hitters(
    items: ray.data.Dataset,
    item_col: str,
    k: int,
    batch_size: int = 65536,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT φ-heavy hitters (φ = 1/(k+1)) over an item stream, by the
    Misra-Gries pigeonhole + verification two-pass: every item whose
    corpus-wide count exceeds n/(k+1), with its exact count. Output
    ``(item_col, cnt)`` — deterministic despite the sketch (stream
    order never affects the result, so the SQL oracle is exact).

    Pass 1 (candidates): each batch emits the items whose BATCH count
    exceeds batch_n/(k+1) — at most k rows per batch (Σc = n_b bounds
    how many can exceed the threshold), and by pigeonhole any global
    heavy hitter beats the ratio in at least one batch, so the union of
    batch candidates is a guaranteed superset (the same argument that
    makes a distributed Misra-Gries merge sound, without ever merging
    order-dependent counters). Candidates dedup distributed and
    broadcast (≤ k × blocks ids, k-bounded after dedup at ≤ (k+1)·#
    distinct-batch-profiles — in practice ≈ k).

    Pass 2 (verify): exact counts for candidate items only — per-batch
    filtered partial counts, one small grouped sum — filtered to
    cnt > n/(k+1). n comes from the same partial pass (count column),
    so the stream is read twice and shuffles only candidate rows.
    """
    import polars as pl

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([item_col]))
        c = df.group_by(item_col).len()
        cand = c.filter(pl.col("len") > batch.num_rows / (k + 1.0))[item_col]
        return pa.table({item_col: pa.array(cand.to_list(), type=pa.string())})

    parts = items.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    parts = parts.materialize()
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return ray.data.from_arrow(
            pa.table({item_col: pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
        )
    cand_tab = pa.concat_tables(tabs)
    # broadcast the deduped candidate list ONCE (ray.put, ~k items),
    # not per-task in the closure; n (total stream length) is the
    # null-item count row of the verify pass, since batches with zero
    # candidates emit nothing in pass 1
    cand_ref = ray.put(
        pl.Series(sorted(set(cand_tab[item_col].to_pylist())), dtype=pl.String)
    )

    def _verify_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([item_col]))
        c = (
            df.filter(pl.col(item_col).is_in(ray.get(cand_ref)))
            .group_by(item_col)
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("cnt"))
            .drop("len")
        )
        schema = pa.schema([(item_col, pa.string()), ("cnt", pa.int64())])
        out = c.to_arrow().select([item_col, "cnt"]).cast(schema)
        nrow = pa.table(
            {item_col: pa.array([None], type=pa.string()),
             "cnt": pa.array([batch.num_rows], type=pa.int64())}
        )
        return pa.concat_tables([out, nrow])

    counted = grouped_agg(
        items.map_batches(_verify_partial, batch_format="pyarrow",
                          batch_size=batch_size),
        [item_col],
        [("sum", "cnt", "cnt")],
    ).materialize()
    full = pa.concat_tables(
        [t for t in ray.get(counted.to_arrow_refs()) if t.num_rows]
    )
    ivals = full[item_col].to_pylist()
    n = next(c for i, c in zip(ivals, full["cnt"].to_pylist()) if i is None)

    def _thresh(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.filter(
                pl.col(item_col).is_not_null()
                & (pl.col("cnt") > n / (k + 1.0))
            )
        ).to_arrow()

    return counted.map_batches(_thresh, batch_format="pyarrow")


def pack_sequences(
    ds: ray.data.Dataset,
    shard_col: str,
    pos_col: str,
    ntok_col: str,
    seq_len: int,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Greedy in-order sequence packing — the step between the shuffled
    shards (:func:`global_shuffle_shard`) and the trainer: within each
    shard, documents are concatenated in ``pos_col`` order and cut into
    fixed ``seq_len``-token training sequences (documents may straddle
    a cut — the standard packed-stream convention). Appends
    ``tok_offset`` (tokens before this doc in its shard) and ``seq_id``
    (= tok_offset // seq_len, the sequence the doc STARTS in).

    Shards are independent by construction, so packing — inherently a
    sequential prefix sum — parallelizes perfectly across shards: one
    hash-bucket shuffle on ``shard_col``, then a vectorized per-shard
    cumulative sum (polars window). No global barrier, no driver state.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    def _pack(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).sort([shard_col, pos_col])
        out = df.with_columns(
            (pl.col(ntok_col).cum_sum().over(shard_col) - pl.col(ntok_col))
            .cast(pl.Int64)
            .alias("tok_offset")
        ).with_columns((pl.col("tok_offset") // seq_len).alias("seq_id"))
        return out.to_arrow()

    return bucketed_group_map(
        ds, [shard_col], _pack, num_buckets=num_buckets, batch_size=batch_size
    )


# ----------------------------------------------------------------------
# KLL-style quantile sketch — the rank-error sibling of the HLL distinct
# sketch above: bounded memory, mergeable, values never fully shuffle.


def _kll_compact(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Deterministic KLL compaction: any level holding > k items is
    sorted and its EVEN-indexed items promote to the next level (weight
    doubles); the rest drop. (Classic KLL randomizes the even/odd
    choice; pinning 'even' trades a deterministic bias — verified
    within the advertised bound by the oracle — for reproducibility.)"""
    i = 0
    while i < len(levels):
        if len(levels[i]) > k:
            a = np.sort(levels[i], kind="stable")
            if i + 1 == len(levels):
                levels.append(np.empty(0, dtype=np.float64))
            levels[i + 1] = np.concatenate([levels[i + 1], a[::2]])
            levels[i] = np.empty(0, dtype=np.float64)
        i += 1
    return levels


def _kll_rows(levels: list[np.ndarray]) -> pa.Table:
    lv = [i for i, a in enumerate(levels) if len(a)]
    return pa.table({
        "level": pa.array(lv, type=pa.int64()),
        "vals": pa.array([levels[i] for i in lv], type=pa.list_(pa.float64())),
    })


def _kll_merge_rows(tbl: pa.Table, k: int) -> list[np.ndarray]:
    levels: list[np.ndarray] = []
    lv = tbl["level"].to_pylist()
    va = tbl["vals"].to_pylist()
    for i, v in zip(lv, va):
        while len(levels) <= i:
            levels.append(np.empty(0, dtype=np.float64))
        levels[i] = np.concatenate([levels[i], np.asarray(v, dtype=np.float64)])
    return _kll_compact(levels, k)


def _kll_quantile(levels: list[np.ndarray], q: float) -> float:
    vals = np.concatenate([a for a in levels if len(a)] or [np.empty(0)])
    wts = np.concatenate([
        np.full(len(a), 1 << i, dtype=np.int64)
        for i, a in enumerate(levels) if len(a)
    ] or [np.empty(0, dtype=np.int64)])
    order = np.argsort(vals, kind="stable")
    cum = np.cumsum(wts[order])
    target = q * cum[-1]
    return float(vals[order][np.searchsorted(cum, target, side="left")])


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    k: int = 512,
    rank_bound: float = 0.02,
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> "pd.DataFrame":
    """Approximate quantiles via a deterministic mergeable KLL sketch,
    WITH a measured rank-error certificate (the HLL ``hll_ok`` pattern,
    `approx_count_distinct` above): a second streaming pass counts
    ``#{x ≤ estimate}`` exactly and emits per q the true total ``n``
    and ``kll_ok = |rank(est)/n − q| ≤ rank_bound``, so an
    out-of-bound sketch is a hard oracle mismatch, not a silent skew.

    Scale shape: each block reduces to a ≤ k·log-levels float sketch
    (few KB regardless of block size); sketches hash-bucket into
    ``num_buckets`` intermediate merges so the driver folds
    ``num_buckets`` sketches, never #blocks; the certificate pass is a
    broadcast of len(qs) floats + one vectorized count per batch.
    Returns a pandas DataFrame (len(qs) rows) — driver-sized."""
    import pandas as pd
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    def _block_sketch(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        levels = _kll_compact([x], k)
        t = _kll_rows(levels)
        # n rides on the first row only (summed once downstream)
        nn = np.zeros(t.num_rows, dtype=np.int64)
        if t.num_rows:
            nn[0] = len(x)
        return t.append_column("n", pa.array(nn))

    parts = ds.map_batches(_block_sketch, batch_format="pyarrow",
                           batch_size=batch_size)

    # intermediate merge: spread sketch rows over num_buckets by a
    # row-index hash so each merge task folds ~#blocks/num_buckets
    def _spread(b: pa.Table) -> pa.Table:
        h = (np.arange(len(b), dtype=np.int64) * 2654435761) % num_buckets
        return b.append_column("mb", pa.array(h))

    spread = parts.map_batches(_spread, batch_format="pyarrow")

    def _merge(t: pa.Table) -> pa.Table:
        levels = _kll_merge_rows(t.select(["level", "vals"]), k)
        out = _kll_rows(levels)
        n = int(pl.from_arrow(t.select(["n"]))["n"].sum()) if t.num_rows else 0
        # n rides on the first row only (summed once at the driver)
        nn = np.zeros(out.num_rows, dtype=np.int64)
        if out.num_rows:
            nn[0] = n
        return out.append_column("n", pa.array(nn))

    merged = bucketed_group_map(spread, ["mb"], _merge, num_buckets=num_buckets)
    tabs = [t for t in ray.get(merged.to_arrow_refs()) if t.num_columns]
    allrows = pa.concat_tables(tabs) if tabs else _kll_rows([np.empty(0)])
    n_total = int(pc.sum(allrows["n"]).as_py() or 0) if "n" in allrows.schema.names else 0
    if n_total == 0:
        raise ValueError(
            f"approx_quantiles: no non-null values in {col!r} — quantiles undefined"
        )
    final = _kll_merge_rows(allrows.select(["level", "vals"]), k)
    ests = {q: _kll_quantile(final, q) for q in qs}

    # certificate pass: exact rank of each estimate
    est_ref = ray.put(np.array([ests[q] for q in qs], dtype=np.float64))

    def _rank_counts(batch: pa.Table) -> pa.Table:
        e = ray.get(est_ref)
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        c = (x[:, None] <= e[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({"qi": pa.array(np.arange(len(e), dtype=np.int64)),
                         "le": pa.array(c)})

    rc = ds.map_batches(_rank_counts, batch_format="pyarrow",
                        batch_size=batch_size).to_pandas()
    ranks = rc.groupby("qi")["le"].sum()
    rows = []
    for i, q in enumerate(qs):
        err = abs(ranks[i] / n_total - q) if n_total else 0.0
        rows.append({"q": q, "n": n_total, "kll_ok": bool(err <= rank_bound)})
    return pd.DataFrame(rows)


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    n: int,
    score_col: str = "score",
    knuth: int = 2654435761,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    exp-sort): row i draws a deterministic uniform
    ``u = ((key·knuth) mod 2^32 + 0.5) / 2^32`` (the Knuth hash of
    :func:`edkray.ops.stages.deterministic_sample`, centered so u is
    never 0) and scores ``ln(u) / w``; the global top-``n`` scores are
    exactly a weight-proportional sample without replacement — the
    data-mixing primitive (sample n docs ∝ quality weight) done as a
    rank reduction, not a shuffle.

    Scale: scoring is stateless/vectorized; selection is
    :func:`global_top_k` — per-block top-n combiner then one merge
    block, so the exchange carries ≤ n rows per input block at any
    corpus size. Deterministic end-to-end (hash-u, key tiebreak),
    hence SQL-replayable. Requires non-negative integer keys and
    strictly positive weights.
    """

    def _score(b: pa.Table) -> pa.Table:
        signed = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (signed < 0).any():
            raise ValueError("weighted_sample requires non-negative keys")
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_sample requires positive weights")
        k = signed.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * np.uint64(knuth)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        return b.append_column(score_col, pa.array(np.log(u) / w))

    scored = ds.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)
    return global_top_k(
        scored, [score_col, key_col], n, descending=[True, False]
    )


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[AggSpec],
    all_label: str = "ALL",
    batch_size: int = 65536,
    max_group_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP(keys...)``: the finest-level aggregate plus
    every prefix level up to the grand total, with rolled-up key
    columns holding ``all_label`` (a sentinel, not NULL — the driver's
    value-hash compares strings, and the reference data never uses the
    sentinel as a real key).

    Scale shape: ONE wide shuffle (:func:`grouped_agg` at the finest
    level, combiner-pre-aggregated); every coarser level re-aggregates
    the PREVIOUS, already-reduced level, so the whole cascade touches
    report-sized data only and runs driver-side (bounds ENFORCED via
    ``max_group_rows``, the :func:`grouped_agg_small` contract — a
    rollup is only meaningful when the finest level is a report, not
    the corpus). Re-aggregable fns only (sum/count/min/max; count
    re-sums). Rolled-up keys must be string-typed (the sentinel label).
    """
    for fn, _, _ in aggs:
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"rollup_agg supports sum/count/min/max, not {fn}")

    finest_ds = grouped_agg(ds, keys, aggs, batch_size=batch_size)
    try:
        finest = pl.from_pandas(finest_ds.to_pandas(limit=max_group_rows))
    except ValueError as e:
        raise ValueError(
            f"rollup_agg: finest level exceeds max_group_rows={max_group_rows}; "
            f"a rollup over an unbounded key set is not a report — aggregate "
            f"with grouped_agg and roll up a bounded projection instead"
        ) from e

    # count partials are already counts: every coarser level just re-sums
    combine = [
        (pl.col(a).sum() if fn in ("sum", "count")
         else pl.col(a).min() if fn == "min" else pl.col(a).max()).alias(a)
        for fn, _, a in aggs
    ]
    out_cols = [*keys, *(a for _, _, a in aggs)]
    levels = [finest.select(out_cols)]
    prev = finest
    for j in range(len(keys) - 1, -1, -1):
        lvl = (prev.group_by(keys[:j]).agg(combine) if j
               else prev.select(combine))
        prev = lvl
        pad = [pl.lit(all_label).alias(k) for k in keys[j:]]
        levels.append(lvl.with_columns(pad).select(out_cols))
    return ray.data.from_arrow(pl.concat(levels).to_arrow())


def grouped_mode(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    alias: str = "mode",
    count_alias: str | None = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Deterministic per-group mode: the most frequent ``col`` value,
    ties broken by the smaller value (count DESC, value ASC — a total
    order, so the result is replayable in SQL row_number terms).

    Scale shape mirrors :func:`grouped_quantile_disc`: phase 1 ships
    the per-group VALUE HISTOGRAM (one ``(keys, col, count)`` row per
    distinct value — :func:`grouped_agg`, combiner-pre-aggregated, so
    the wire is bounded by the domain size, not the corpus), phase 2
    is a bucketed per-key argmax over that small table. Only suitable
    for bounded-domain columns; for unbounded domains use
    :func:`heavy_hitters` sketches instead.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    counts = grouped_agg(ds, [*keys, col], [("count", None, "__cnt")])

    def _argmax(tbl: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tbl)
            .sort([*keys, "__cnt", col], descending=[False] * len(keys) + [True, False])
            .group_by(keys, maintain_order=True)
            .agg(pl.col(col).first().alias(alias),
                 pl.col("__cnt").first().alias(count_alias or "__n"))
        )
        if count_alias is None:
            df = df.drop("__n")
        return df.to_arrow()

    return bucketed_group_map(counts, keys, _argmax, num_buckets=num_buckets)


def grouped_quantile_cont(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    ps: list[float],
    aliases: list[str],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Exact CONTINUOUS quantiles per group (DuckDB ``quantile_cont`` /
    ``median``: value at 0-based position ``p·(n-1)``, linearly
    interpolated between the bracketing order statistics).

    Same wire shape as :func:`grouped_quantile_disc`: phase 1 ships the
    per-group value HISTOGRAM (combiner-pre-aggregated ``(keys, col,
    count)`` rows — bounded by the column's domain, not the corpus),
    phase 2 walks each group's cumulative counts to pick the two
    bracketing values and interpolate. Bounded-domain columns only.
    """
    import polars as pl

    from edkray.ops.shuffle import bucketed_group_map

    counts = grouped_agg(ds, [*keys, col], [("count", None, "__cnt")])

    def _finalize(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, col]).to_pandas()
        rows = []
        for gk, grp in df.groupby(keys, sort=False):
            vals = grp[col].to_numpy(dtype=np.float64)
            cnt = grp["__cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            rec = dict(zip(keys, gk if isinstance(gk, tuple) else (gk,)))
            for p, alias in zip(ps, aliases):
                h = p * (n - 1)
                i0, i1 = int(np.floor(h)), int(np.ceil(h))
                # order statistic k (0-based) = first value with cum > k
                v0 = vals[np.searchsorted(cum, i0, side="right")]
                v1 = vals[np.searchsorted(cum, i1, side="right")]
                rec[alias] = v0 + (h - i0) * (v1 - v0)
            rows.append(rec)
        return pa.Table.from_pylist(rows)

    return bucketed_group_map(counts, keys, _finalize, num_buckets=num_buckets)


def pivot_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    pivot_col: str,
    categories: list[str],
    prefix: str = "n_",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Long→wide pivot of category counts: one output row per key with
    a ``{prefix}{category}`` count column per category. Categories are
    EXPLICIT (the distributed-pivot contract — a deterministic output
    schema can't depend on discovering values at runtime; discover
    them first with :func:`distinct` if needed). Values outside
    ``categories`` are ignored.

    Scale shape: the per-batch combiner already emits the WIDE partial
    (one row per key per batch, vectorized boolean-sum per category),
    so the shuffle carries key-cardinality-sized wide rows and the
    final combine is a plain :func:`grouped_agg` sum per column —
    pivoting costs nothing beyond the groupby it replaces.
    """
    specs = [("sum", f"{prefix}{c}", f"{prefix}{c}") for c in categories]

    def _partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([*keys, pivot_col]))
        return (
            df.group_by(keys)
            .agg([
                (pl.col(pivot_col) == c).sum().cast(pl.Int64).alias(f"{prefix}{c}")
                for c in categories
            ])
            .to_arrow()
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    return grouped_agg(partials, keys, specs, batch_size=batch_size)


def histogram(
    ds: ray.data.Dataset,
    col: str,
    bins: int,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Global equi-width histogram: pass 1 computes min/max (a narrow
    native aggregate — combiners all the way down), pass 2 assigns
    ``bin = min(floor((x-mn)/(mx-mn)·bins), bins-1)`` per batch and
    counts via :func:`grouped_agg` (the wire carries ≤ ``bins`` rows
    per block). Output: (bin, lo, hi, n) per non-empty bin, edge
    formulas written to match the SQL oracle's operation order so the
    float boundaries agree bit-for-bit."""
    stats = ds.aggregate(Min(col), Max(col))
    mn = float(stats[f"min({col})"])
    mx = float(stats[f"max({col})"])
    if mx <= mn:
        raise ValueError(f"histogram: degenerate range [{mn}, {mx}] for {col}")

    def _bin(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(np.floor((v - mn) / (mx - mn) * bins).astype(np.int64),
                         bins - 1)
        return pa.table({"bin": idx})

    counts = grouped_agg(
        ds.map_batches(_bin, batch_format="pyarrow", batch_size=batch_size),
        ["bin"], [("count", None, "n")],
    )

    def _edges(b: pa.Table) -> pa.Table:
        k = b["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "bin": b["bin"],
            "lo": mn + k * (mx - mn) / bins,
            "hi": mn + (k + 1.0) * (mx - mn) / bins,
            "n": b["n"],
        })

    return counts.map_batches(_edges, batch_format="pyarrow")


def grouped_string_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    alias: str = "agg",
    sep: str = ",",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """SQL ``string_agg(value, sep ORDER BY value)`` per group:
    deterministic (value-sorted) concatenation built on
    :func:`grouped_collect` (per-batch partial lists as the combiner,
    one bucketed shuffle of list rows, in-bucket flatten + sort), plus
    a vectorized join-to-string finalize. A group's concatenated
    string must fit one row — same bound as any per-key collect."""

    def _join(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(
            pl.col(alias).list.join(sep).alias(alias)
        )
        return df.to_arrow()

    collected = grouped_collect(ds, keys, value_col, alias=alias, sort=True,
                                num_buckets=num_buckets)
    return collected.map_batches(_join, batch_format="pyarrow")


def grouped_corr(
    ds: ray.data.Dataset,
    keys: list[str],
    x_col: str,
    y_col: str,
    alias: str = "corr",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Per-group Pearson correlation of two numeric columns via
    sufficient-statistic folds: each batch contributes the six partials
    (n, Σx, Σy, Σx², Σy², Σxy) per key — the combiner pattern of
    :func:`grouped_agg` — so the shuffle moves six doubles per
    (key, batch) and the corpus never re-groups.  Finalize applies the
    closed form

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ᵗᵒᵗ)·(n·Σy² − Σy²ᵗᵒᵗ))

    Groups with zero variance in either column emit null (SQL ``corr``
    semantics).  Output: ``keys + [n, alias]`` with ``n`` the pair
    count.  Rows where either column is null are dropped from all six
    statistics (SQL pairwise-deletion semantics)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).drop_nulls([x_col, y_col])
        x = pl.col(x_col).cast(pl.Float64)
        y = pl.col(y_col).cast(pl.Float64)
        return (
            df.group_by(keys)
            .agg(
                pl.len().cast(pl.Int64).alias("__n"),
                x.sum().alias("__sx"),
                y.sum().alias("__sy"),
                (x * x).sum().alias("__sxx"),
                (y * y).sum().alias("__syy"),
                (x * y).sum().alias("__sxy"),
            )
            .to_arrow()
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    folded = partials.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")]
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        n = df["__n"].to_numpy().astype(np.float64)
        sx = df["__sx"].to_numpy()
        sy = df["__sy"].to_numpy()
        sxx = df["__sxx"].to_numpy()
        syy = df["__syy"].to_numpy()
        sxy = df["__sxy"].to_numpy()
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        num = n * sxy - sx * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            r = num / np.sqrt(vx * vy)
        r = np.where((vx <= 0.0) | (vy <= 0.0), np.nan, r)
        out = df.select(keys).with_columns(
            pl.Series("n", n.astype(np.int64)),
            pl.Series(alias, r),
        )
        return out.to_arrow()

    return folded.map_batches(_finalize, batch_format="pyarrow")


def cube_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[AggSpec],
    all_label: str = "ALL",
    batch_size: int = 65536,
    max_group_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """SQL ``GROUP BY CUBE(keys...)``: the finest-level aggregate plus
    every other subset of the key set (2^|keys| grouping sets), rolled
    key columns holding ``all_label`` (same sentinel contract as
    :func:`rollup_agg`).

    Scale shape: ONE wide shuffle (:func:`grouped_agg` at the finest
    level, combiner-pre-aggregated); every other grouping set
    re-aggregates the finest, already-reduced level driver-side under
    the ENFORCED ``max_group_rows`` bound (a cube is only meaningful
    over a report-sized finest level).  Re-aggregable fns only
    (sum/count/min/max)."""
    from itertools import combinations

    for fn, _, _ in aggs:
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"cube_agg supports sum/count/min/max, not {fn}")

    finest_ds = grouped_agg(ds, keys, aggs, batch_size=batch_size)
    try:
        finest = pl.from_pandas(finest_ds.to_pandas(limit=max_group_rows))
    except ValueError as e:
        raise ValueError(
            f"cube_agg: finest level exceeds max_group_rows={max_group_rows}; "
            f"a cube over an unbounded key set is not a report — aggregate "
            f"with grouped_agg and cube a bounded projection instead"
        ) from e

    combine = [
        (pl.col(a).sum() if fn in ("sum", "count")
         else pl.col(a).min() if fn == "min" else pl.col(a).max()).alias(a)
        for fn, _, a in aggs
    ]
    out_cols = [*keys, *(a for _, _, a in aggs)]
    levels = [finest.select(out_cols)]
    for r in range(len(keys) - 1, -1, -1):
        for subset in combinations(keys, r):
            kept = list(subset)
            lvl = finest.group_by(kept).agg(combine) if kept else finest.select(combine)
            pad = [pl.lit(all_label).alias(k) for k in keys if k not in subset]
            levels.append(lvl.with_columns(pad).select(out_cols))
    return ray.data.from_arrow(pl.concat(levels).to_arrow())


def grouped_entropy(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    alias: str = "entropy",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Shannon entropy (bits) of the ``val_col`` category distribution
    per key group, via two NARROW shuffles: exact (key, val) counts
    from :func:`grouped_agg` (combiner keeps the wire at distinct
    pairs per batch), then per-key sufficient sums (Σn, Σ n·log₂n) —
    entropy folds closed-form as ``log₂N − (Σ n·log₂n)/N`` so the
    corpus never re-groups and no per-key value list is materialized.
    Output: ``keys + [n, alias]`` with ``n`` the group row count."""
    counts = grouped_agg(ds, keys + [val_col], [("count", None, "__n")],
                         batch_size=batch_size)

    def _partial(batch: pa.Table) -> pa.Table:
        n = pl.col("__n").cast(pl.Float64)
        return (
            pl.from_arrow(batch)
            .group_by(keys)
            .agg(
                pl.col("__n").sum().alias("__N"),
                (n * n.log(2.0)).sum().alias("__s"),
            )
            .to_arrow()
        )

    folded = counts.map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size
    ).groupby(keys).aggregate(
        Sum("__N", alias_name="__N"), Sum("__s", alias_name="__s")
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        big_n = pl.col("__N").cast(pl.Float64)
        return (
            df.with_columns(
                (big_n.log(2.0) - pl.col("__s") / big_n).alias(alias),
                pl.col("__N").alias("n"),
            )
            .select(keys + ["n", alias])
            .to_arrow()
        )

    return folded.map_batches(_finalize, batch_format="pyarrow")


def chi_squared(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    max_cells: int = 1_000_000,
) -> pa.Table:
    """Pearson chi-squared test of independence between two categorical
    columns. Distributed part: exact contingency counts via
    :func:`grouped_agg` (narrow — distinct (a, b) cells per batch on
    the wire). The fold to the statistic runs driver-side over the
    REPORT-SIZED contingency table (|A|×|B| cells) under an ENFORCED
    ``max_cells`` bound, using the observed-cells-only closed form

        χ² = N · Σ o²/(rₐ·c_b) − N

    (algebraically equal to Σ(o−e)²/e over ALL cells, including
    unobserved zero cells, since Σe = N). Output: one row
    ``(chi2, dof, n)``."""
    counts = grouped_agg(ds, [col_a, col_b], [("count", None, "__n")])
    try:
        df = counts.to_pandas(limit=max_cells)
    except ValueError as e:
        raise ValueError(
            f"chi_squared: contingency cells exceed max_cells={max_cells}; "
            f"a test over an unbounded category pair is not a report — "
            f"bucket the columns first"
        ) from e
    c = pl.from_pandas(df).with_columns(
        pl.col("__n").cast(pl.Float64),
        pl.col("__n").sum().over(col_a).cast(pl.Float64).alias("__ra"),
        pl.col("__n").sum().over(col_b).cast(pl.Float64).alias("__cb"),
    )
    big_n = float(c["__n"].sum())
    chi2 = big_n * float(
        (c["__n"] * c["__n"] / (c["__ra"] * c["__cb"])).sum()
    ) - big_n
    dof = (c[col_a].n_unique() - 1) * (c[col_b].n_unique() - 1)
    return pa.table({
        "chi2": pa.array([chi2], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "n": pa.array([int(big_n)], pa.int64()),
    })


def rank_with_ties(
    ds: ray.data.Dataset,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    alias: str = "rnk",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """SQL ``RANK() OVER (PARTITION BY keys ORDER BY order_col) <= k``
    with TIES KEPT (unlike :func:`top_k_per_group`'s row_number
    semantics — a value tied at the boundary keeps every row).

    Two-level: the local combiner keeps each batch's rank()≤k rows
    (safe: a row dropped locally has ≥k strictly-better rows in its
    own batch, hence globally), the hash-bucket shuffle moves the
    survivors only, and the in-bucket pass computes the exact min-rank.
    Output: input columns + ``alias`` (int64 rank, 1-based)."""
    rk = (
        pl.col(order_col)
        .rank(method="min", descending=descending)
        .over(keys)
        .cast(pl.Int64)
    )

    def _local(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .filter(rk <= k)
            .to_arrow()
        )

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _final(table: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(table)
            .with_columns(rk.alias(alias))
            .filter(pl.col(alias) <= k)
            .to_arrow()
        )

    return bucketed_group_map(pre, keys, _final, num_buckets=16)


def pairwise_set_jaccard(
    ds: ray.data.Dataset,
    elem_col: str,
    set_col: str,
    max_sets: int = 100_000,
    batch_size: int = 65536,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Jaccard similarity between every pair of ``set_col`` categories
    by their DISTINCT ``elem_col`` membership sets (e.g. how similar
    two event types are by the users who perform them).

    One bucketed shuffle of locally-deduped (elem, set) pairs: each
    element's rows land in one bucket, a vectorized self-join per
    bucket emits (set_a < set_b) co-membership partial counts, and a
    narrow groupby folds them into exact intersection sizes. Per-set
    sizes (≤ ``max_sets`` rows, ENFORCED — the set-category
    vocabulary, not the corpus) fold driver-side and ride into the
    finalize closure. Pairs with empty intersection are omitted (SQL
    inner-join semantics). Output: (set_a, set_b, n_common, jaccard)."""
    sizes_ds = count_distinct(ds, [set_col], elem_col, alias="__c")
    try:
        sizes_df = sizes_ds.to_pandas(limit=max_sets)
    except ValueError as e:
        raise ValueError(
            f"pairwise_set_jaccard: set-category count exceeds "
            f"max_sets={max_sets}; all-pairs output is quadratic in it — "
            f"bucket or LSH instead"
        ) from e
    sizes = dict(zip(sizes_df[set_col], sizes_df["__c"].astype(float)))

    def _local(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch.select([elem_col, set_col])).unique().to_arrow()
        )

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _pairs(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table).unique(subset=[elem_col, set_col])
        j = df.join(df, on=elem_col, suffix="__b").filter(
            pl.col(set_col) < pl.col(f"{set_col}__b")
        )
        return (
            j.group_by([set_col, f"{set_col}__b"])
            .agg(pl.len().cast(pl.Int64).alias("__i"))
            .rename({set_col: "set_a", f"{set_col}__b": "set_b"})
            .to_arrow()
        )

    partial = bucketed_group_map(pre, [elem_col], _pairs,
                                 num_buckets=num_buckets)
    inter = partial.groupby(["set_a", "set_b"]).aggregate(
        Sum("__i", alias_name="n_common")
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        ca = df["set_a"].replace_strict(sizes, return_dtype=pl.Float64)
        cb = df["set_b"].replace_strict(sizes, return_dtype=pl.Float64)
        n = df["n_common"].cast(pl.Float64)
        return (
            df.with_columns((n / (ca + cb - n)).alias("jaccard"))
            .select(["set_a", "set_b", "n_common", "jaccard"])
            .to_arrow()
        )

    return inter.map_batches(_finalize, batch_format="pyarrow")


def grouped_kl(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    alias: str = "kl",
    max_vals: int = 1_000_000,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """KL divergence (bits) of each key group's ``val_col`` category
    distribution from the GLOBAL distribution — the distribution-shift
    score CCNet-style curation uses per domain/source.

    Exact (key, val) counts via :func:`grouped_agg` (narrow), the
    global per-val marginal (≤ ``max_vals`` rows, ENFORCED — the value
    vocabulary) folds driver-side into the finalize closure, and KL
    collapses to per-key sufficient sums:

        KL(P‖Q) = (Σ n·(log₂n − log₂q)) / N − log₂N

    so the second shuffle moves two doubles per (key, batch). Every
    group's support is a subset of the global support by construction
    (q > 0 wherever n > 0). Output: ``keys + [n, alias]``."""
    counts = grouped_agg(ds, keys + [val_col], [("count", None, "__n")],
                         batch_size=batch_size)
    counts = counts.materialize()  # reused by the marginal + the fold

    gl = grouped_agg(counts, [val_col], [("sum", "__n", "__g")])
    try:
        gl_df = gl.to_pandas(limit=max_vals)
    except ValueError as e:
        raise ValueError(
            f"grouped_kl: value vocabulary exceeds max_vals={max_vals}; "
            f"bucket val_col first"
        ) from e
    total = float(gl_df["__g"].sum())
    log2q = {
        v: float(np.log2(g / total)) for v, g in zip(gl_df[val_col], gl_df["__g"])
    }

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        n = pl.col("__n").cast(pl.Float64)
        lq = df[val_col].replace_strict(log2q, return_dtype=pl.Float64)
        return (
            df.with_columns(lq.alias("__lq"))
            .group_by(keys)
            .agg(
                pl.col("__n").sum().alias("__N"),
                (n * (n.log(2.0) - pl.col("__lq"))).sum().alias("__s"),
            )
            .to_arrow()
        )

    folded = counts.map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size
    ).groupby(keys).aggregate(
        Sum("__N", alias_name="__N"), Sum("__s", alias_name="__s")
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        big_n = pl.col("__N").cast(pl.Float64)
        return (
            df.with_columns(
                (pl.col("__s") / big_n - big_n.log(2.0)).alias(alias),
                pl.col("__N").alias("n"),
            )
            .select(keys + ["n", alias])
            .to_arrow()
        )

    return folded.map_batches(_finalize, batch_format="pyarrow")


def grouped_weighted_quantile(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    weight_col: str,
    q: float = 0.5,
    alias: str = "wq",
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Weighted lower quantile per key group: the smallest value whose
    cumulative weight (values ascending) reaches ``q`` of the group's
    total weight — weighted median at q=0.5 (e.g. the price below
    which half the shipped QUANTITY sits, not half the line rows).

    Scale shape mirrors :func:`grouped_quantile_disc`: the combiner
    collapses each batch to distinct (key, value, Σweight) rows — the
    value histogram, not the corpus — one hash-bucket shuffle
    co-locates each key's histogram, and the in-bucket pass is a
    vectorized sort + cumulative-weight scan. Output:
    ``keys + [alias]``."""

    def _partial(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .drop_nulls([val_col, weight_col])
            .group_by(keys + [val_col])
            .agg(pl.col(weight_col).cast(pl.Float64).sum().alias("__w"))
            .to_arrow()
        )

    pre = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _pick(table: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(table)
            .group_by(keys + [val_col])
            .agg(pl.col("__w").sum())
            .sort(keys + [val_col])
            .with_columns(
                pl.col("__w").cum_sum().over(keys).alias("__cw"),
                pl.col("__w").sum().over(keys).alias("__tw"),
            )
        )
        return (
            df.filter(pl.col("__cw") >= q * pl.col("__tw"))
            .group_by(keys, maintain_order=True)
            .agg(pl.col(val_col).first().alias(alias))
            .to_arrow()
        )

    return bucketed_group_map(pre, keys, _pick, num_buckets=num_buckets)


def grouped_gini(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    alias: str = "gini",
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Gini coefficient of ``val_col`` per key group (inequality of the
    value distribution — 0 = uniform, →1 = one row holds everything).

    Scale shape: the combiner collapses each batch to distinct
    (key, value, count) histogram rows — the shuffle carries the value
    histogram, never the corpus. In-bucket, the classic sorted-rank
    form  G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n  expands over a run of
    ``c`` equal values starting after cumulative count ``a`` to
    x·(c·a + c(c+1)/2) — a vectorized cumsum scan, no row explosion.
    Requires non-negative values (asserted). Output: keys + [n, alias]."""

    def _partial(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .drop_nulls([val_col])
            .group_by(keys + [val_col])
            .agg(pl.len().cast(pl.Int64).alias("__c"))
            .to_arrow()
        )

    pre = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _gini(table: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(table)
            .group_by(keys + [val_col])
            .agg(pl.col("__c").sum())
            .sort(keys + [val_col])
        )
        if (df[val_col] < 0).any():
            raise ValueError("grouped_gini: negative values are not supported")
        c = pl.col("__c").cast(pl.Float64)
        x = pl.col(val_col).cast(pl.Float64)
        df = df.with_columns(
            (c.cum_sum().over(keys) - c).alias("__a"),
        ).with_columns(
            (x * (c * pl.col("__a") + c * (c + 1) / 2.0)).alias("__s"),
        )
        out = df.group_by(keys).agg(
            pl.col("__c").sum().cast(pl.Int64).alias("n"),
            pl.col("__s").sum().alias("__S"),
            (x * c).sum().alias("__T"),
        )
        n = pl.col("n").cast(pl.Float64)
        return (
            out.with_columns(
                (2.0 * pl.col("__S") / (n * pl.col("__T")) - (n + 1.0) / n)
                .alias(alias)
            )
            .select(keys + ["n", alias])
            .to_arrow()
        )

    return bucketed_group_map(pre, keys, _gini, num_buckets=num_buckets)


def grouped_genmeans(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Geometric and harmonic mean of ``val_col`` per key group via
    sufficient sums (n, Σln v, Σ1/v) — the :func:`grouped_agg` combiner
    shape, two doubles per (key, batch) on the wire. Requires strictly
    positive values (nulls dropped; non-positive raises). Output:
    ``keys + [n, geomean, harmmean]``."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).drop_nulls([val_col])
        v = pl.col(val_col).cast(pl.Float64)
        if (df[val_col] <= 0).any():
            raise ValueError("grouped_genmeans: values must be > 0")
        return (
            df.group_by(keys)
            .agg(
                pl.len().cast(pl.Int64).alias("__n"),
                v.log().sum().alias("__sl"),
                (1.0 / v).sum().alias("__si"),
            )
            .to_arrow()
        )

    folded = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size
    ).groupby(keys).aggregate(
        Sum("__n", alias_name="__n"),
        Sum("__sl", alias_name="__sl"),
        Sum("__si", alias_name="__si"),
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        n = pl.col("__n").cast(pl.Float64)
        return (
            df.with_columns(
                pl.col("__n").alias("n"),
                (pl.col("__sl") / n).exp().alias("geomean"),
                (n / pl.col("__si")).alias("harmmean"),
            )
            .select(keys + ["n", "geomean", "harmmean"])
            .to_arrow()
        )

    return folded.map_batches(_finalize, batch_format="pyarrow")


def grouped_mad(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    med_alias: str = "med",
    mad_alias: str = "mad",
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Median absolute deviation (and the median) per key group — the
    robust spread statistic quality gates use where stddev is skewed
    by outliers.

    ONE histogram shuffle does both statistics: the combiner collapses
    batches to (key, value, count) rows (:func:`grouped_quantile_disc`
    shape — the wire carries the value histogram, not the corpus), and
    in-bucket the lower median reads off the cumulative counts, the
    deviation histogram |v − med| regroups in place, and the MAD reads
    off ITS cumulative counts — no second corpus pass, no join back.
    Both picks follow DuckDB's ``quantile_disc`` (type-1) rule. Only
    for manageable distinct-value domains (ints, bucketed floats)."""
    counts = grouped_agg(ds, [*keys, val_col], [("count", None, "__cnt")],
                         batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _finalize(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, val_col])
        df = df.with_columns(
            pl.col("__cnt").cum_sum().over(keys).alias("__cum"),
            pl.col("__cnt").sum().over(keys).alias("__tot"),
        )
        tgt = (pl.col("__tot") * 0.5).ceil().clip(lower_bound=1)
        med = (
            df.filter(pl.col("__cum") >= tgt)
            .group_by(keys, maintain_order=True)
            .agg(pl.col(val_col).first().alias(med_alias))
        )
        dev = (
            df.join(med, on=keys)
            .with_columns(
                (pl.col(val_col) - pl.col(med_alias)).abs().alias("__d")
            )
            .group_by([*keys, "__d"])
            .agg(pl.col("__cnt").sum())
            .sort([*keys, "__d"])
            .with_columns(
                pl.col("__cnt").cum_sum().over(keys).alias("__cum"),
                pl.col("__cnt").sum().over(keys).alias("__tot"),
            )
        )
        mad = (
            dev.filter(pl.col("__cum") >= tgt)
            .group_by(keys, maintain_order=True)
            .agg(pl.col("__d").first().alias(mad_alias))
        )
        return med.join(mad, on=keys).to_arrow()

    return bucketed_group_map(counts, keys, _finalize, num_buckets=num_buckets)


def grouped_percent_rank(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    alias: str = "pr",
    descending: bool = False,
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY keys ORDER BY val_col)``
    for every row: (rank−1)/(n−1) with min-rank tie semantics,
    single-row groups emit 0.0. One key co-shuffle
    (:func:`~edkray.ops.shuffle.bucketed_group_map`), vectorized rank
    window in-bucket; output is input columns + ``alias`` (the corpus
    annotated, not reduced — downstream should consume it streaming)."""
    from edkray.ops.shuffle import bucketed_group_map

    def _pr(table: pa.Table) -> pa.Table:
        rk = (
            pl.col(val_col)
            .rank(method="min", descending=descending)
            .over(keys)
            .cast(pl.Float64)
        )
        n = pl.len().over(keys).cast(pl.Float64)
        expr = (
            pl.when(n > 1).then((rk - 1.0) / (n - 1.0)).otherwise(0.0)
        ).alias(alias)
        return pl.from_arrow(table).with_columns(expr).to_arrow()

    return bucketed_group_map(ds, keys, _pr, num_buckets=num_buckets,
                              batch_size=batch_size)


def grouped_winsorized_mean(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    alias: str = "wmean",
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Winsorized mean per key group: values clamped to the group's
    [p_lo, p_hi] discrete quantiles before averaging — the robust mean
    quality gates use where a plain mean chases outliers.

    ONE value-histogram shuffle (the :func:`grouped_quantile_disc`
    combiner shape): in-bucket, both thresholds read off the
    cumulative counts (DuckDB type-1 ``quantile_disc`` rule) and the
    clamped mean folds from the same histogram — Σ c·clamp(v)/n, no
    second corpus pass. Output: ``keys + [n, lo, hi, alias]``."""
    counts = grouped_agg(ds, [*keys, val_col], [("count", None, "__cnt")],
                         batch_size=batch_size)
    from edkray.ops.shuffle import bucketed_group_map

    def _finalize(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl).sort([*keys, val_col])
        df = df.with_columns(
            pl.col("__cnt").cum_sum().over(keys).alias("__cum"),
            pl.col("__cnt").sum().over(keys).alias("__tot"),
        )
        picks = {}
        for p, name in ((p_lo, "lo"), (p_hi, "hi")):
            tgt = (pl.col("__tot") * p).ceil().clip(lower_bound=1)
            picks[name] = (
                df.filter(pl.col("__cum") >= tgt)
                .group_by(keys, maintain_order=True)
                .agg(pl.col(val_col).first().alias(name))
            )
        j = df.join(picks["lo"], on=keys).join(picks["hi"], on=keys)
        v = pl.col(val_col).cast(pl.Float64)
        clamped = (
            pl.when(v < pl.col("lo")).then(pl.col("lo").cast(pl.Float64))
            .when(v > pl.col("hi")).then(pl.col("hi").cast(pl.Float64))
            .otherwise(v)
        )
        out = (
            j.with_columns((clamped * pl.col("__cnt")).alias("__s"))
            .group_by(keys, maintain_order=True)
            .agg(
                pl.col("__tot").first().alias("n"),
                pl.col("lo").first(),
                pl.col("hi").first(),
                (pl.col("__s").sum() / pl.col("__tot").first()).alias(alias),
            )
        )
        return out.to_arrow()

    return bucketed_group_map(counts, keys, _finalize, num_buckets=num_buckets)
