"""WARC-like record-container source — the webtext-payload engine.

Real crawl archives arrive as record containers (WARC: per-record
header + raw payload bytes), not parquet. This engine reads a minimal
deterministic container of that SHAPE offline — the same role the
reference's S3/GEE engines play for raster tiles (duck-typed ``scan``
through the registry, reference dataset.py:79-100) — so a pipeline can
start from raw crawl records and land in the same Dataset schema the
parquet engines produce (url, warc_ts, html [+ date from the path]).

Container format (pinned):

    file  := magic b"WREC1\\n" then records until EOF
    record:= u32 url_len | u32 payload_len | i64 ts_us   (16 B, LE)
             url bytes (UTF-8) | payload bytes

Scale shape: FILES are the parallelism unit (real WARCs ship as many
~1 GB parts) — ``scan`` expands the path template exactly like
ParquetSource, then ``read_binary_files`` hands each file's bytes to
one parse task; header fields decode via ``np.frombuffer`` per record
and payload slices reference the file buffer (one copy into the Arrow
column, no per-field Python parsing beyond the record walk, which is
inherent to a variable-length container).
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import struct

import numpy as np
import pyarrow as pa
import ray.data

from edkray.sources.registry import register_source
from edkray.sources.templates import (
    GridCell,
    date_pattern,
    expand_space,
    expand_time,
    parse_date,
    validate_wildcards,
)

MAGIC = b"WREC1\n"
_HDR = struct.Struct("<IIq")  # url_len, payload_len, ts_us


def write_warclike(path: str, records: list[tuple[str, dt.datetime, bytes]]) -> None:
    """Write (url, warc_ts, payload) records — the test/fixture writer."""
    with open(path, "wb") as f:
        f.write(MAGIC)
        for url, ts, payload in records:
            ub = url.encode("utf-8")
            ts_us = int(ts.timestamp() * 1e6)
            f.write(_HDR.pack(len(ub), len(payload), ts_us))
            f.write(ub)
            f.write(payload)


def parse_warclike(data: bytes, path: str = "<buf>") -> pa.Table:
    """Parse one container's bytes into (url, warc_ts, html)."""
    if not data.startswith(MAGIC):
        raise ValueError(f"{path}: bad magic (not a WREC1 container)")
    mv = memoryview(data)
    off = len(MAGIC)
    urls: list[str] = []
    ts: list[int] = []
    payloads: list[memoryview] = []
    n = len(mv)
    while off < n:
        if off + _HDR.size > n:
            raise ValueError(f"{path}: truncated record header at byte {off}")
        ul, pl_, t = _HDR.unpack_from(mv, off)
        off += _HDR.size
        if off + ul + pl_ > n:
            raise ValueError(f"{path}: truncated record body at byte {off}")
        urls.append(bytes(mv[off : off + ul]).decode("utf-8"))
        off += ul
        payloads.append(mv[off : off + pl_])
        off += pl_
        ts.append(t)
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(np.array(ts, dtype=np.int64)).cast(pa.timestamp("us")),
        "html": pa.array([bytes(p) for p in payloads], type=pa.binary()),
    })


class WarcLikeSource:
    """Template-addressed WARC-like containers through the registry.

    ``scan`` = the parquet engine's discover lifecycle over container
    files: expand time × grid templates, glob, re-parse each path's
    date, then one parse task per file."""

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
            dated = [(dt.datetime(1970, 1, 1), source)]
        expanded = expand_space(dated, grid or [], query_bbox)
        pattern = date_pattern(source)

        files: list[tuple[str, dt.datetime]] = []
        for r in expanded:
            for path in sorted(_glob.glob(r.path)):
                files.append((path, parse_date(path, pattern) or r.date))
        if not files:
            raise ValueError(f"no files matched template {source!r}")

        by_path = {p: d for p, d in files}
        ds = ray.data.read_binary_files([p for p, _ in files], include_paths=True)

        def _parse(batch: dict) -> pa.Table:
            parts = []
            for path, data in zip(batch["path"], batch["bytes"]):
                t = parse_warclike(data, path)
                t = t.append_column(
                    "date",
                    pa.array([by_path.get(path)] * len(t), type=pa.timestamp("us")),
                )
                parts.append(t)
            if not parts:
                empty = parse_warclike(MAGIC).append_column(
                    "date", pa.array([], type=pa.timestamp("us"))
                )
                return empty if columns is None else empty.select(columns)
            out = pa.concat_tables(parts)
            if columns is not None:
                out = out.select(columns)
            return out

        return ds.map_batches(_parse, batch_format="numpy")


register_source("warclike", WarcLikeSource)
