"""Corpus snapshot diff — added / removed / changed between two
crawl versions.

The incremental-corpus bookkeeping step: given two url-keyed snapshots,
emit every url whose membership or content changed (unchanged rows are
dropped — they are the overwhelming majority at web scale and nobody
re-processes them). The web-text generalization of the reference's
resume-by-probe incremental sync (engines/s3.py:291-299 — "skip what
is already current"), upgraded from file-presence to content equality.

Scale shape: each side reduces to narrow (key, cmp-value, side) rows
inside ``map_batches`` — pass a precomputed hash column (e.g.
``utils.cheap_hash`` of the text) as ``cmp_col`` so the wide text never
shuffles. The two sides co-shuffle ONCE via a tagged union hash-bucketed
on the key (the winner-filter / PMI-join machinery), and each bucket
runs one vectorized polars full-outer join + classification. No
broadcast, no driver materialization, output ∝ churn, not corpus.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data

from edkray.ops.shuffle import bucketed_group_map


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key: str = "url",
    cmp_col: str = "text",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Diff two snapshots on ``key``; compare content via ``cmp_col``.

    Output: one row per url in the symmetric-difference-or-changed set,
    columns (``key``, ``status``) with status ∈ {added, removed,
    changed}. Duplicate keys within one side (non-deduped snapshots)
    collapse to the side's MINIMUM comparison value — a pinned,
    order-free rule the SQL oracle replays with ``min()``.

    Presence is tracked with explicit per-side markers, NOT by null
    ``cmp_col`` values — a key present on one side with a null
    comparison value is still "present" (so a null-content url that
    exists only in ``old`` classifies as removed, not added), and a
    key present on both sides is "changed" iff the values differ
    null-safely (``IS DISTINCT FROM``: null vs non-null is a change,
    null vs null is not)."""

    def _narrow(side: str):
        def _fn(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            return (
                df.group_by(pl.col(key).alias("__key"))
                .agg(pl.col(cmp_col).min().alias("__v"))
                .with_columns(pl.lit(side).alias("__side"))
                .to_arrow()
            )
        return _fn

    tagged = old.map_batches(
        _narrow("o"), batch_format="pyarrow", batch_size=batch_size
    ).union(
        new.map_batches(_narrow("n"), batch_format="pyarrow", batch_size=batch_size)
    )

    def _classify(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        sides = df.group_by("__key", "__side").agg(pl.col("__v").min())
        o = sides.filter(pl.col("__side") == "o").select(
            "__key", pl.col("__v").alias("__vo"), pl.lit(True).alias("__po")
        )
        n = sides.filter(pl.col("__side") == "n").select(
            "__key", pl.col("__v").alias("__vn"), pl.lit(True).alias("__pn")
        )
        j = o.join(n, on="__key", how="full", coalesce=True)
        j = j.with_columns(
            pl.when(pl.col("__po").is_null()).then(pl.lit("added"))
            .when(pl.col("__pn").is_null()).then(pl.lit("removed"))
            .when(pl.col("__vo").ne_missing(pl.col("__vn"))).then(pl.lit("changed"))
            .otherwise(None)
            .alias("status")
        ).drop_nulls("status")
        return j.select(pl.col("__key").alias(key), "status").to_arrow()

    return bucketed_group_map(tagged, ["__key"], _classify, num_buckets=num_buckets)
