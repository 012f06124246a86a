"""Distributed exact global ranking (row_number / NTILE over a total
order) — the window-function bridge the reference expresses as its
explicit mosaic rank assignment (reference: earth_data_kit stitching
rank semantics, tests/test_stitching) generalized to any total order.

Scale shape: a global sort is the textbook way to rank, but Ray Data's
``ds.sort`` gives ordered blocks with no block-offset metadata, so the
rank itself still needs a second pass.  Instead we range-partition:

1. **Sample** a bounded number of order-column values per batch (the
   wire carries ≤ ``sample_per_batch`` scalars per block — at 100 TB
   this is KBs, not data).
2. **Split points** are distinct sampled values; every row maps to a
   range part via ``np.searchsorted`` (equal values always land in the
   same part, so no tie ever straddles a part boundary).
3. **Count per part** via a combiner-pre-aggregated groupby — the
   per-part row counts (≤ ``num_parts`` rows) come back to the driver,
   a bounded metadata-sized collect, and become exclusive offsets.
4. **Rank inside each part**: one hash-free co-shuffle
   (``groupby(part).map_groups``), a vectorized lexsort on
   ``(value, tiebreak)``, rank = part offset + local position.

One all-to-all exchange total (step 4); steps 1-3 move only samples and
counts.  Skew note: parts are split by VALUE, so a single value that
dominates the corpus concentrates in one part — acceptable for
near-unique order columns (prices, timestamps, hashes); for low-card
columns use a (value, tiebreak) composite sample instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["global_rank", "ntile", "ordered_cumsum"]

_PART = "__rng_part"


def _split_points(ds: ray.data.Dataset, value_col: str, num_parts: int,
                  sample_per_batch: int) -> np.ndarray:
    def _sample(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(v) > sample_per_batch:
            idx = np.linspace(0, len(v) - 1, sample_per_batch).astype(np.int64)
            v = v[idx]
        return pa.table({value_col: v})

    # bounded driver combine: ≤ sample_per_batch rows per input block
    sample = ds.map_batches(_sample, batch_format="pyarrow").to_pandas()
    vals = np.unique(sample[value_col].to_numpy())
    if len(vals) <= 1 or num_parts <= 1:
        return vals[:0]
    q = np.linspace(0, len(vals) - 1, num_parts + 1)[1:-1].astype(np.int64)
    return np.unique(vals[q])


def _assign(batch: pa.Table, value_col: str, splits: np.ndarray) -> pa.Table:
    v = batch[value_col].to_numpy(zero_copy_only=False)
    # side='right': rows equal to a split value all take the LEFT part,
    # so ties never straddle a boundary
    part = np.searchsorted(splits, v, side="right").astype(np.int64)
    return batch.append_column(_PART, pa.array(part))


def global_rank(
    ds: ray.data.Dataset,
    value_col: str,
    tiebreak: list[str],
    rank_col: str = "rank",
    num_parts: int = 64,
    sample_per_batch: int = 128,
    descending: bool = False,
) -> tuple[ray.data.Dataset, int]:
    """Append a 1-based dense global ``rank_col`` ordered by
    ``(value_col, *tiebreak)`` (a total order — tiebreak must make rows
    unique).  Returns ``(ranked_ds, total_rows)``; the total comes from
    the same bounded count pass that builds the offsets, so callers
    (NTILE, percent_rank) don't pay an extra ``count()``.
    """
    splits = _split_points(ds, value_col, num_parts, sample_per_batch)
    parted = ds.map_batches(
        lambda b: _assign(b, value_col, splits), batch_format="pyarrow"
    )

    # per-part counts: pre-combined per batch, ≤ num_parts rows collected
    def _cnt(batch: pa.Table) -> pa.Table:
        p, c = np.unique(batch[_PART].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({_PART: p, "__c": c})

    cnt = (
        parted.map_batches(_cnt, batch_format="pyarrow")
        .groupby(_PART)
        .sum("__c")
        .to_pandas()
    )
    n_parts = len(splits) + 1
    sizes = np.zeros(n_parts, dtype=np.int64)
    sizes[cnt[_PART].to_numpy()] = cnt["sum(__c)"].to_numpy()
    total = int(sizes.sum())
    if descending:
        # rank 1 = largest value: offsets accumulate from the top part down
        offsets = np.concatenate([[0], np.cumsum(sizes[::-1])[:-1]])[::-1].copy()
    else:
        offsets = np.concatenate([[0], np.cumsum(sizes[:-1])])

    def _rank_part(group: pa.Table) -> pa.Table:
        part = int(group[_PART][0].as_py())
        keys = [group[c].to_numpy(zero_copy_only=False) for c in tiebreak]
        keys.append(group[value_col].to_numpy(zero_copy_only=False))
        order = np.lexsort(keys)  # last key primary
        if descending:
            order = order[::-1]
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = offsets[part] + np.arange(1, len(order) + 1)
        out = group.drop_columns([_PART])
        return out.append_column(rank_col, pa.array(rank))

    ranked = parted.groupby(_PART).map_groups(_rank_part, batch_format="pyarrow")
    return ranked, total


def ntile(
    ds: ray.data.Dataset,
    value_col: str,
    tiebreak: list[str],
    tiles: int,
    tile_col: str = "tile",
    **rank_kwargs,
) -> ray.data.Dataset:
    """SQL ``NTILE(tiles) OVER (ORDER BY value_col, *tiebreak)``: the
    first ``n % tiles`` tiles get ``n // tiles + 1`` rows, the rest get
    ``n // tiles`` — computed from the exact global rank."""
    ranked, total = global_rank(ds, value_col, tiebreak, rank_col="__rnk",
                                **rank_kwargs)
    size, rem = divmod(total, tiles)

    def _tile(batch: pa.Table) -> pa.Table:
        r = batch["__rnk"].to_numpy(zero_copy_only=False) - 1  # 0-based
        big = (size + 1) * rem
        t = np.where(
            r < big,
            r // max(size + 1, 1) + 1,
            rem + (r - big) // max(size, 1) + 1,
        ).astype(np.int64)
        return batch.drop_columns(["__rnk"]).append_column(tile_col, pa.array(t))

    return ranked.map_batches(_tile, batch_format="pyarrow")


def _skyline_2d(tbl: pa.Table, max_col: str, min_col: str) -> pa.Table:
    """Rows not dominated under (max_col ↑ better, min_col ↓ better).
    p dominates q iff p.max ≥ q.max ∧ p.min ≤ q.min with one strict.
    Vectorized: per distinct max value take the group min of min_col;
    the running (strictly-greater-max) prefix-min then gives each row
    its best dominator candidate."""
    import polars as pl

    df = pl.from_arrow(tbl)
    g = (
        df.group_by(max_col)
        .agg(pl.col(min_col).min().alias("__gmin"))
        .sort(max_col, descending=True)
        .with_columns(pl.col("__gmin").cum_min().shift(1).alias("__pmin"))
    )
    out = (
        df.join(g, on=max_col, how="left")
        .filter(
            (pl.col("__pmin").is_null() | (pl.col("__pmin") > pl.col(min_col)))
            & (pl.col("__gmin") >= pl.col(min_col))
        )
        .drop(["__gmin", "__pmin"])
    )
    return out.to_arrow()


def skyline_2d(
    ds: ray.data.Dataset,
    max_col: str,
    min_col: str,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Distributed 2-D skyline (Pareto frontier): rows for which no
    other row is ≥ on ``max_col`` and ≤ on ``min_col`` with at least
    one strict inequality.

    Scale shape: the local skyline of every batch (vectorized polars
    kernel) is a superset filter — a globally non-dominated row
    survives every local pass, and dominated rows never resurrect —
    so the exchange carries only the per-block frontiers (O(frontier)
    ≈ O(log rows) per block for independent dims). The final pass
    re-runs the same kernel over the gathered candidates in one task
    (``repartition(1)``), which is bounded by the candidate count,
    not the corpus."""
    local = ds.map_batches(
        lambda b: _skyline_2d(b, max_col, min_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return local.repartition(1).map_batches(
        lambda b: _skyline_2d(b, max_col, min_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def ordered_cumsum(
    ds: ray.data.Dataset,
    value_col: str,
    sum_col: str,
    tiebreak: list[str],
    cum_col: str = "cum",
    rank_col: str = "rank",
    num_parts: int = 64,
    sample_per_batch: int = 128,
    descending: bool = False,
) -> tuple[ray.data.Dataset, int]:
    """Exact global running total of ``sum_col`` over the total order
    ``(value_col, *tiebreak)`` — the distributed prefix-sum behind
    Pareto/ABC cumulative-share classification, without a global sort.

    Same range-partition idiom as :func:`global_rank`, with the
    metadata pass carrying per-part (count, Σsum_col) so each part
    gets BOTH an exclusive rank offset and an exclusive sum offset;
    in-part, one vectorized lexsort + local cumsum finishes the job.
    For bit-exact parity with a SQL window sum use an INTEGER
    ``sum_col`` (e.g. cents) — float partial sums re-associate.
    Returns ``(ds + [rank_col, cum_col], total_sum)``."""
    splits = _split_points(ds, value_col, num_parts, sample_per_batch)
    parted = ds.map_batches(
        lambda b: _assign(b, value_col, splits), batch_format="pyarrow"
    )

    def _cnt(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (
            pl.from_arrow(batch.select([_PART, sum_col]))
            .group_by(_PART)
            .agg(
                pl.len().cast(pl.Int64).alias("__c"),
                pl.col(sum_col).sum().alias("__s"),
            )
            .to_arrow()
        )

    cnt = (
        parted.map_batches(_cnt, batch_format="pyarrow")
        .groupby(_PART)
        .sum(["__c", "__s"])
        .to_pandas()
    )
    n_parts = len(splits) + 1
    sizes = np.zeros(n_parts, dtype=np.int64)
    sums = np.zeros(n_parts, dtype=np.float64)
    sums_i = np.zeros(n_parts, dtype=np.int64)
    idx = cnt[_PART].to_numpy()
    sizes[idx] = cnt["sum(__c)"].to_numpy()
    s_vals = cnt["sum(__s)"].to_numpy()
    integer_sums = np.issubdtype(s_vals.dtype, np.integer)
    if integer_sums:
        sums_i[idx] = s_vals
    else:
        sums[idx] = s_vals
    total_rows = int(sizes.sum())
    part_sums = sums_i if integer_sums else sums
    if descending:
        roff = np.concatenate([[0], np.cumsum(sizes[::-1])[:-1]])[::-1].copy()
        soff = np.concatenate(
            [[part_sums[0] * 0], np.cumsum(part_sums[::-1])[:-1]])[::-1].copy()
    else:
        roff = np.concatenate([[0], np.cumsum(sizes[:-1])])
        soff = np.concatenate([[part_sums[0] * 0], np.cumsum(part_sums[:-1])])
    total_sum = part_sums.sum()

    def _cum_part(group: pa.Table) -> pa.Table:
        part = int(group[_PART][0].as_py())
        keys = [group[c].to_numpy(zero_copy_only=False) for c in tiebreak]
        keys.append(group[value_col].to_numpy(zero_copy_only=False))
        order = np.lexsort(keys)
        if descending:
            order = order[::-1]
        v = group[sum_col].to_numpy(zero_copy_only=False)[order]
        cum = soff[part] + np.cumsum(v)
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = roff[part] + np.arange(1, len(order) + 1)
        cums = np.empty(len(order), dtype=cum.dtype)
        cums[order] = cum
        out = group.drop_columns([_PART])
        return out.append_column(rank_col, pa.array(rank)).append_column(
            cum_col, pa.array(cums))

    ranked = parted.groupby(_PART).map_groups(_cum_part, batch_format="pyarrow")
    return ranked, total_sum
