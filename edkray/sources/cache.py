"""Probe-resume asset cache — the reference's sync/download stage
(S10-S12) as a Ray stage.

The reference downloads remote assets to a local tmp dir and SKIPS any
file that already opens cleanly (``gdal.Open`` probe, engines/s3.py:
291-299, engines/earth_engine.py:59-60, engines/stac.py:129-142). Here
the probe is a Parquet-footer open; fetches fan out as zero-copy Ray
tasks (one per asset, the unit the reference's thread pools used) and a
re-run touches only missing/corrupt files — the cache IS the checkpoint.

Cache layout: ``{cache_dir}/{md5(href)[:16]}_{basename}`` so distinct
hrefs never collide and a human can still read the dir.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import ray


def cache_path(href: str, cache_dir: str) -> str:
    digest = hashlib.md5(href.encode()).hexdigest()[:16]
    return os.path.join(cache_dir, f"{digest}_{os.path.basename(href)}")


def probe_ok(path: str) -> bool:
    """The gdal.Open probe analogue: does the local copy open cleanly?"""
    import pyarrow.parquet as pq

    try:
        pq.ParquetFile(path)
        return True
    except Exception:
        return False


def fetch_one(href: str, cache_dir: str) -> str:
    """Copy ``href`` into the cache unless a clean copy already exists
    (probe-resume). Returns the local path."""
    dest = cache_path(href, cache_dir)
    if os.path.exists(dest) and probe_ok(dest):
        return dest  # resume: skip completed download
    os.makedirs(cache_dir, exist_ok=True)
    tmp = dest + ".part"
    shutil.copyfile(href, tmp)  # offline "download"; swap for a real
    os.replace(tmp, dest)  # fetcher (s5cmd/wget analogue) in production
    return dest


@ray.remote
def _fetch_task(href: str, cache_dir: str) -> str:
    return fetch_one(href, cache_dir)


def fetch_all(hrefs: list[str], cache_dir: str, max_in_flight: int = 64) -> list[str]:
    """Fan the fetches out as Ray tasks with bounded in-flight count
    (the reference's ThreadPool of downloads, engines/earth_engine.py:
    58-119, re-expressed; backpressure instead of an unbounded pool)."""
    out: list[str] = [""] * len(hrefs)
    pending: dict = {}
    i = 0
    while i < len(hrefs) or pending:
        while i < len(hrefs) and len(pending) < max_in_flight:
            pending[_fetch_task.remote(hrefs[i], cache_dir)] = i
            i += 1
        done, _ = ray.wait(list(pending), num_returns=1)
        for ref in done:
            out[pending.pop(ref)] = ray.get(ref)
    return out
