"""Relational set operations (INTERSECT / EXCEPT, DISTINCT semantics)
over arbitrary key columns — the vocabulary/membership comparisons a
corpus-diff pipeline runs between two snapshots or two sources.

Scale shape: each side is deduped PER BATCH first (combiner), tagged
with a presence flag, and the union makes ONE hash shuffle on the key
columns; the per-group decision (present-in-a / present-in-b) is a
two-column max aggregate, so the wire carries batch-distinct keys and
two int8-sized flags, never the corpora.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data

from edkray.ops.aggregate import grouped_agg

__all__ = ["set_op"]


def set_op(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cols: list[str],
    how: str,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """``a INTERSECT b`` / ``a EXCEPT b`` (SQL DISTINCT set semantics)
    on ``cols``. ``how`` ∈ {"intersect", "except"}."""
    if how not in ("intersect", "except"):
        raise ValueError(f"how must be 'intersect' or 'except', not {how!r}")

    def _tag(side_a: bool):
        def _fn(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(cols)).unique()
            return df.with_columns(
                pl.lit(1 if side_a else 0).cast(pl.Int64).alias("__a"),
                pl.lit(0 if side_a else 1).cast(pl.Int64).alias("__b"),
            ).to_arrow()
        return _fn

    tagged = a.map_batches(_tag(True), batch_format="pyarrow",
                           batch_size=batch_size).union(
        b.map_batches(_tag(False), batch_format="pyarrow", batch_size=batch_size)
    )
    flags = grouped_agg(tagged, cols, [("max", "__a", "__a"), ("max", "__b", "__b")])

    import pyarrow.compute as pc

    def _decide(batch: pa.Table) -> pa.Table:
        in_a = pc.equal(batch["__a"], 1)
        in_b = pc.equal(batch["__b"], 1)
        keep = pc.and_(in_a, in_b) if how == "intersect" else pc.and_(
            in_a, pc.invert(in_b))
        return batch.filter(keep).select(cols)

    return flags.map_batches(_decide, batch_format="pyarrow")
