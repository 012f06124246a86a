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


def bucketed_group_map(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = 64,
    batch_size: int = 65536,
    seed: int = 11,
) -> ray.data.Dataset:
    """Apply ``fn`` to each hash bucket (a pa.Table holding complete
    key-groups for every key hashing into the bucket). ``fn`` must
    handle multiple keys per call — vectorized, e.g. polars
    ``group_by(keys)`` or window exprs ``.over(keys)``."""
    with_bucket = ds.map_batches(
        lambda b: add_bucket(b, keys, num_buckets, seed),
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

    return with_bucket.groupby(BUCKET_COL).map_groups(_wrap, batch_format="pyarrow")


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
