"""JSON-lines corpus engine — the sixth registered Source.

Web-text corpora overwhelmingly ship as date-sharded ``.jsonl`` /
``.jsonl.gz`` trees; this engine gives them the same discover
lifecycle the reference gives raster trees (template time/space
expansion → concrete listing → per-path date re-parse → typed read;
reference ``scan`` shape: earth_data_kit/stitching/engines/s3.py
262-283 via the registry if-chain, dataset.py:79-100).

Unlike parquet, JSON has no columnar layout, so ``columns=`` is a
post-parse projection (applied immediately after decode so only the
requested columns enter the object store) — the honest contract, not
a silent pushdown claim. ``.gz`` shards inflate in the read tasks via
Arrow's stream codec (never on the driver).
"""

from __future__ import annotations

import datetime as dt
import glob as _glob

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


class JsonlSource:
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
                parsed = parse_date(path, pattern) or r.date
                files.append((path, parsed))
        if not files:
            raise ValueError(f"no files matched template {source!r}")

        paths = [p for p, _ in files]
        by_path = {p: d for p, d in files}
        open_args = (
            {"compression": "gzip"} if all(p.endswith(".gz") for p in paths) else {}
        )
        ds = ray.data.read_json(
            paths, include_paths=True, arrow_open_stream_args=open_args
        )

        def _attach(batch: pa.Table) -> pa.Table:
            dates = [by_path.get(p) for p in batch["path"].to_pylist()]
            batch = batch.drop_columns(["path"])
            if columns is not None:
                batch = batch.select(columns)
            return batch.append_column(
                "date", pa.array(dates, type=pa.timestamp("us"))
            )

        return ds.map_batches(_attach, batch_format="pyarrow")


def write_jsonl(path: str, rows: list[dict]) -> None:
    """Deterministic JSONL writer (fixtures/tests): one compact JSON
    object per line, keys in insertion order."""
    import json

    opener = open
    if path.endswith(".gz"):
        import gzip

        opener = gzip.open
    with opener(path, "wt", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False, separators=(",", ":")) + "\n")


register_source("jsonl", JsonlSource)
