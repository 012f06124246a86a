"""Explicit hash-bucket shuffle grouping.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per group —
with millions of small keys that is milliseconds of Ray/pandas overhead
PER KEY (measured ~2.5 ms/group → hours at corpus scale). The scalable
pattern: shuffle on ``hash(key) % num_buckets`` so each task receives
ONE bucket containing many whole key-groups, then run the per-key logic
vectorized (polars/numpy) inside the task.

All rows of a key land in the same bucket, so any per-key computation
is exactly as correct as the per-group version; ``num_buckets`` bounds
task memory (pick ≈ total_rows / target_rows_per_task; hot keys must be
salted upstream if one key alone exceeds a task's budget).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data

BUCKET_COL = "__bucket"


def add_bucket(batch: pa.Table, keys: list[str], num_buckets: int, seed: int = 11) -> pa.Table:
    """Append a hash-bucket column over ``keys`` (vectorized xxhash)."""
    df = pl.from_arrow(batch.select(keys))
    h = df.select(pl.struct(keys).hash(seed=seed).alias("h"))["h"].to_numpy()
    bucket = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(BUCKET_COL, pa.array(bucket))


def _key_hash(batch: pa.Table, keys: list[str], seed: int) -> np.ndarray:
    df = pl.from_arrow(batch.select(keys))
    return df.select(pl.struct(keys).hash(seed=seed).alias("h"))["h"].to_numpy()


def _detect_hot_keys(
    ds: ray.data.Dataset, keys: list[str], budget: int, seed: int = 11
) -> tuple[np.ndarray, np.ndarray]:
    """Count-driven hot-key detection: returns (sorted key hashes whose
    row count exceeds ``budget``, per-key split factor ceil(count /
    budget)). The count pre-pass shuffles only (key-hash, partial-count)
    rows; only the hot subset — by construction a handful of keys —
    reaches the driver."""

    def _partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(_key_hash(batch, keys, seed), return_counts=True)
        return pa.table({"kh": pa.array(u), "c": pa.array(c.astype(np.int64))})

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _total(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table)
        tot = df.group_by("kh").agg(pl.col("c").sum())
        hot = tot.filter(pl.col("c") > budget)
        return hot.to_arrow()

    hot_ds = bucketed_group_map(partial, ["kh"], _total, num_buckets=16)
    tabs = [t for t in ray.get(hot_ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    hot = pa.concat_tables(tabs)
    kh = hot["kh"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = hot["c"].to_numpy(zero_copy_only=False)
    order = np.argsort(kh)
    splits = -(-cnt[order] // budget)  # ceil
    return kh[order], splits.astype(np.int64)


def _salted_bucket(
    batch: pa.Table,
    keys: list[str],
    num_buckets: int,
    seed: int,
    hot_kh: np.ndarray,
    hot_splits: np.ndarray,
) -> pa.Table:
    """Bucket column with hot keys spread over ``split`` buckets each.

    Salt = a SECONDARY all-column row hash mod split — a deterministic
    per-row value, so a hot key's rows spread evenly regardless of how
    they arrive in batches (the earlier batch-local round-robin
    restarted at 0 per batch and concentrated small batches in low-salt
    buckets — ADVICE r3). Rows identical in every column share a salt
    by construction; only byte-identical duplicates can't be spread
    deterministically."""
    h = _key_hash(batch, keys, seed)
    bucket = (h % np.uint64(num_buckets)).astype(np.int64)
    if len(hot_kh):
        pos = np.searchsorted(hot_kh, h)
        posc = np.minimum(pos, len(hot_kh) - 1)
        is_hot = hot_kh[posc] == h
        if is_hot.any():
            idx = np.flatnonzero(is_hot)
            cols = [c for c in batch.schema.names if c != BUCKET_COL]
            # hash ONLY the hot rows: the secondary all-column hash is
            # O(row bytes) and hot rows are usually a small slice
            rh = _key_hash(batch.take(pa.array(idx)), cols, seed ^ 0x5D)
            salt = rh % hot_splits[posc[idx]].astype(np.uint64)
            bucket[idx] = ((h[idx] + salt * np.uint64(0x9E3779B97F4A7C15))
                           % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(BUCKET_COL, pa.array(bucket))


def bucketed_group_map(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = 64,
    batch_size: int = 65536,
    seed: int = 11,
    hot_key_merge: Callable[[pa.Table], pa.Table] | None = None,
    hot_key_budget: int = 500_000,
) -> ray.data.Dataset:
    """Apply ``fn`` to each hash bucket (a pa.Table holding complete
    key-groups for every key hashing into the bucket). ``fn`` must
    handle multiple keys per call — vectorized, e.g. polars
    ``group_by(keys)`` or window exprs ``.over(keys)``.

    **Hot-key salting** (optional): pass ``hot_key_merge`` to protect
    against one key dominating a bucket (the skew straggler). A
    count-driven pre-pass (narrow (key-hash, count) rows only) finds
    keys above ``hot_key_budget`` rows; their rows are round-robin
    salted across ceil(count/budget) buckets, ``fn`` runs on each
    partial group, and ONLY the hot keys' outputs re-group once more
    through ``hot_key_merge``. Requirements: ``fn``'s output must
    retain the key columns, and ``merge(fn(a) ∪ fn(b))`` must equal
    ``fn(a ∪ b)`` for row-splits of one key — true for self-mergeable
    fns (dedup/first-wins/min-max: pass ``hot_key_merge=fn``).
    Enabling it materializes ``ds`` (the count pass re-reads it).
    """
    if hot_key_merge is None:
        with_bucket = ds.map_batches(
            lambda b: add_bucket(b, keys, num_buckets, seed),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        ds = ds.materialize()
        hot_kh, hot_splits = _detect_hot_keys(ds, keys, hot_key_budget, seed)
        with_bucket = ds.map_batches(
            lambda b: _salted_bucket(b, keys, num_buckets, seed, hot_kh, hot_splits),
            batch_format="pyarrow",
            batch_size=batch_size,
        )

    def _wrap(group: pa.Table) -> pa.Table:
        out = fn(group)
        if BUCKET_COL in out.schema.names:
            out = out.drop_columns([BUCKET_COL])
        # pa.Table.from_pandas inside bucket fns re-attaches the pandas
        # schema-metadata dict, which makes hash(schema) raise inside
        # Ray's schema dedup ("Failed to hash the schemas" warnings)
        return out.replace_schema_metadata(None)

    first = with_bucket.groupby(BUCKET_COL).map_groups(_wrap, batch_format="pyarrow")
    if hot_key_merge is None or len(hot_kh) == 0:
        return first

    # hot keys' outputs are partial (their groups were split): route just
    # those rows through one more complete-group pass under the merge fn
    first = first.materialize()
    out_names = first.schema().names if first.count() else []
    missing = [k for k in keys if out_names and k not in out_names]
    if missing:
        # enforce the documented contract instead of silently emitting
        # unmerged partial groups (ADVICE r3): _pick re-hashes fn's
        # OUTPUT rows, so the key columns must survive fn
        raise ValueError(
            f"hot-key salting requires fn's output to retain key columns "
            f"{keys}; missing {missing} — drop hot_key_merge or keep the keys"
        )

    def _pick(batch: pa.Table, want_hot: bool) -> pa.Table:
        h = _key_hash(batch, keys, seed)
        pos = np.searchsorted(hot_kh, h)
        posc = np.minimum(pos, len(hot_kh) - 1)
        is_hot = hot_kh[posc] == h
        return batch.filter(pa.array(is_hot if want_hot else ~is_hot))

    cold = first.map_batches(lambda b: _pick(b, False), batch_format="pyarrow",
                             batch_size=batch_size)
    hot = first.map_batches(lambda b: _pick(b, True), batch_format="pyarrow",
                            batch_size=batch_size)
    merged = bucketed_group_map(hot, keys, hot_key_merge, num_buckets=num_buckets,
                                batch_size=batch_size, seed=seed)
    return cold.union(merged)


def dedup_in_bucket(keys: list[str], order_cols: list[str]) -> Callable[[pa.Table], pa.Table]:
    """Bucket fn: keep the first row per key ordered by ``order_cols``.

    Sorts by ``order_cols`` ONLY (stable), then hash-based
    ``unique(keep="first")`` picks the min-order row per key — same
    result as sorting by keys+order but never compares the (often long
    string) key column in the sort. ``order_cols`` must totally order
    rows within a key for a deterministic winner.
    """

    def _fn(table: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(table)
            .sort(order_cols, maintain_order=True)
            .unique(subset=keys, keep="first", maintain_order=True)
            .to_arrow()
        )

    return _fn
