"""Source protocol + registry — the reference's duck-typed engine
plugin interface (``scan(source, time_opts, space_opts, ...) -> df`` /
``sync(...)``, registered via an if-chain, dataset.py:79-100)
re-expressed: a ``Source`` returns a ``ray.data.Dataset``; registration
is a dict instead of an if-chain.

The built-in ``ParquetSource`` runs the full discover lifecycle
(SURVEY §3.1) offline: template time/space expansion → concrete path
listing → per-path date re-parse → ``read_parquet`` with column
projection, the parsed ``date`` attached per file.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import os
from typing import Callable, Protocol

import pyarrow as pa
import ray.data

from edkray.sources.templates import (
    GridCell,
    date_pattern,
    expand_space,
    expand_time,
    parse_date,
    validate_wildcards,
)

_REGISTRY: dict[str, Callable[..., "Source"]] = {}


class Source(Protocol):
    def scan(
        self,
        source: str,
        time_range: tuple[dt.datetime, dt.datetime] | None = None,
        grid: list[GridCell] | None = None,
        query_bbox: tuple[float, float, float, float] | None = None,
        columns: list[str] | None = None,
    ) -> ray.data.Dataset: ...


def register_source(name: str, factory: Callable[..., Source]) -> None:
    _REGISTRY[name] = factory


def get_source(name: str, **kwargs) -> Source:
    if name not in _REGISTRY:
        raise KeyError(f"unknown source engine {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


class ParquetSource:
    """Local/remote parquet trees addressed by strftime + {var} templates.

    ``scan`` = the reference's discover: expand the template over the
    time range (left-inclusive, granularity inferred from tokens) and
    the grid cells (pruned by query bbox), glob each concrete pattern,
    re-parse the date from each matched path, and read the matched
    files with the parsed ``date`` attached as a column (the catalog's
    ``date``/tile association, engines/s3.py:262-283)."""

    def scan(
        self,
        source: str,
        time_range: tuple[dt.datetime, dt.datetime] | None = None,
        grid: list[GridCell] | None = None,
        query_bbox: tuple[float, float, float, float] | None = None,
        columns: list[str] | None = None,
    ) -> ray.data.Dataset:
        validate_wildcards(source)
        if time_range is not None:
            dated = expand_time(source, *time_range)
        else:
            dated = [(dt.datetime(1970, 1, 1), source)]  # epoch sentinel
        expanded = expand_space(dated, grid or [], query_bbox)
        pattern = date_pattern(source)

        files: list[tuple[str, dt.datetime]] = []
        for r in expanded:
            for path in sorted(_glob.glob(r.path)):
                parsed = parse_date(path, pattern) or r.date
                files.append((path, parsed))
        if not files:
            raise ValueError(f"no files matched template {source!r}")  # dataset.py:276-277

        # group files by date so each read task can attach its date
        paths = [p for p, _ in files]
        by_path = {p: d for p, d in files}
        ds = ray.data.read_parquet(paths, columns=columns, include_paths=True)

        def _attach(batch: pa.Table) -> pa.Table:
            dates = [by_path.get(p) for p in batch["path"].to_pylist()]
            batch = batch.drop_columns(["path"])
            return batch.append_column("date", pa.array(dates, type=pa.timestamp("us")))

        return ds.map_batches(_attach, batch_format="pyarrow")


register_source("parquet", ParquetSource)
