"""Predicate-pushdown Parquet Source — the third registry engine.

Mirrors the reference Earth-Engine engine's SERVER-SIDE filtering
(engines/earth_engine.py:22-56: OGR ``SetSpatialFilterRect`` plus an
attribute time filter, both applied INSIDE the listing — rows outside
the rect/range never leave the source) as true Parquet predicate
pushdown: ``scan()`` compiles the query bbox and time range into one
``pyarrow.dataset`` expression handed to
``ray.data.read_parquet(filter=...)``, so row groups whose statistics
exclude the predicate are skipped at the scan and non-matching rows
never enter the pipeline. This is the engine a user ports a GEE-like
catalog onto: filters live in the source, not a downstream
``map_batches`` stage (upgrades SURVEY §2 S2 from "pushdown analogue"
to a registered engine).

The spatial rect maps onto two NUMERIC point columns (``x_col``/
``y_col`` — lon/lat in a geo table); the attribute time filter onto a
timestamp column (``ts_col``), left-inclusive like every other time
range in this engine (engines/commons.py:37-54).
"""

from __future__ import annotations

import datetime as dt
import glob as _glob

import pyarrow.dataset as pads
import ray.data

from edkray.sources.registry import register_source
from edkray.sources.templates import GridCell, validate_wildcards


class PushdownParquetSource:
    """Parquet collection scan with source-side rect + time filtering.

    ``ts_col`` names the timestamp column the time range applies to;
    ``x_col``/``y_col`` name the numeric point columns the query bbox
    applies to (both must be set to use ``query_bbox``).
    """

    def __init__(self, ts_col: str = "ts", x_col: str | None = None,
                 y_col: str | None = None):
        self.ts_col, self.x_col, self.y_col = ts_col, x_col, y_col

    def scan(
        self,
        source: str,
        time_range: tuple[dt.datetime, dt.datetime] | None = None,
        grid: list[GridCell] | None = None,
        query_bbox: tuple[float, float, float, float] | None = None,
        columns: list[str] | None = None,
    ) -> ray.data.Dataset:
        validate_wildcards(source)
        paths = sorted(_glob.glob(source)) if any(c in source for c in "*?") else [source]
        if not paths:
            raise ValueError(f"no files matched {source!r}")  # dataset.py:276-277

        expr = None
        if time_range is not None:
            t0, t1 = time_range
            expr = (pads.field(self.ts_col) >= t0) & (pads.field(self.ts_col) < t1)
        if query_bbox is not None:
            if not (self.x_col and self.y_col):
                raise ValueError("query_bbox needs x_col and y_col configured")
            xmin, ymin, xmax, ymax = query_bbox
            rect = (
                (pads.field(self.x_col) >= xmin)
                & (pads.field(self.x_col) <= xmax)
                & (pads.field(self.y_col) >= ymin)
                & (pads.field(self.y_col) <= ymax)
            )  # closed intersects, matching geo.py:160-163
            expr = rect if expr is None else expr & rect
        from edkray.utils import scrubbed_schema

        # The pushdown expression's fields (ts/x/y) must resolve in the
        # read schema whether or not the caller projects them: read the
        # union of the projection and the filter columns (the filter
        # columns' row groups are decoded for the predicate anyway),
        # then drop the extras after the scan. Schema is metadata-free
        # so read blocks hash cleanly in Ray's schema dedup.
        filter_cols = [c for c in (self.ts_col, self.x_col, self.y_col) if c]
        read_cols = columns
        extra: list[str] = []
        if columns is not None and expr is not None:
            extra = [c for c in filter_cols if c not in columns]
            read_cols = columns + extra
        ds = ray.data.read_parquet(
            paths, columns=read_cols, filter=expr,
            schema=scrubbed_schema(paths[0], read_cols),
        )
        if extra:
            keep = list(columns)
            ds = ds.map_batches(lambda b: b.select(keep), batch_format="pyarrow")
        return ds


register_source("pushdown_parquet", PushdownParquetSource)
