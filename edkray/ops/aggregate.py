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

import polars as pl
import pyarrow as pa
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
):
    """Like :func:`grouped_agg` but the FINAL combine runs driver-side
    (polars over the collected partials) instead of a Ray shuffle.

    Correct only when the partial result (one row per (key, block)) fits
    on the driver — i.e. key cardinality × blocks is small. This is the
    reference's driver-side date grouping pattern (dataset.py:789) and
    skips a whole Ray execution's shuffle for small-keyed counts.
    Returns a pandas DataFrame.
    """
    partial_exprs, _, finalize = _partial_exprs(aggs)

    def _partial(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch).group_by(keys).agg(partial_exprs).to_arrow()

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    df = pl.from_pandas(partials.to_pandas())
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


def distinct(ds: ray.data.Dataset, cols: list[str], batch_size: int = 65536) -> ray.data.Dataset:
    """Distinct rows over ``cols`` with per-batch pre-dedup before the
    shuffle (reference A4 ``unique()`` / ``list(set(...))``)."""

    def _local_unique(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch.select(cols)).unique().to_arrow()

    pre = ds.map_batches(_local_unique, batch_format="pyarrow", batch_size=batch_size)
    from ray.data.aggregate import Count

    return pre.groupby(cols).aggregate(Count(alias_name="__n")).drop_columns(["__n"])
