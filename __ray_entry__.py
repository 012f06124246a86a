"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in the ``edkray`` library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      — flagship spatial-join + tiling pipeline on sf0.001:
  pages are derived deterministically from the ``documents`` table
  (BASELINE.json input_hint shape), then geocoded, cell-indexed,
  deduped, tile-assigned, PIP-joined against admin polygons, ranked and
  written with a per-partition resume manifest. Returns the assignments
  Dataset.
- ``queries()``    — one entry per operator family (see edkray.queries).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (column names match exactly).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from edkray import queries as _Q


def _documents_to_pages(batch: pa.Table) -> pa.Table:
    """Deterministic documents → pages(url, warc_ts, html, text, lang)
    derivation (BASELINE.json input_hint shape; ~200 registered domains,
    warc_ts spread over [2017-01-01, 2017-01-08))."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    urls = [f"https://site{int(i) % 200:03d}.example/d/{int(i):08d}" for i in ids]
    t0 = dt.datetime(2017, 1, 1)
    offs_us = (ids * 9973) % (7 * 86400)
    ts = [t0 + dt.timedelta(seconds=int(o)) for o in offs_us]
    htmls = [f"<html><body>{t}</body></html>".encode() for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": batch["lang"],
        }
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    import ray.data

    from edkray.fixtures import make_admin, make_knn_refs
    from edkray.pipelines.spatial import run_spatial_pipeline

    work = "/tmp/edkray_entry"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    pages_path = os.path.join(work, "pages")
    ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet").map_batches(
        _documents_to_pages, batch_format="pyarrow"
    ).write_parquet(pages_path)

    out_dir = os.path.join(work, "out")
    run_spatial_pipeline(
        pages_path,
        admin=make_admin(),
        out_dir=out_dir,
        knn_refs=make_knn_refs(500),
        num_partitions=4,
        resume=False,
    )
    return ray.data.read_parquet(os.path.join(out_dir, "assignments"))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per SQL-expressible query."""
    return _Q.oracle_sql()
