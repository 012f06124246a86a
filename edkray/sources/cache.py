"""Probe-resume asset cache — the reference's sync/download stage
(S10-S12) as a Ray stage.

The reference downloads remote assets to a local tmp dir and SKIPS any
file that already opens cleanly (``gdal.Open`` probe, engines/s3.py:
291-299, engines/earth_engine.py:59-60, engines/stac.py:129-142). Here
the probe is a Parquet-footer open; fetches fan out as zero-copy Ray
tasks (one per asset, the unit the reference's thread pools used) and a
re-run touches only missing/corrupt files — the cache IS the checkpoint.

The reference's sync loop also surfaces per-download *progress* (GDAL
progress callbacks inside a ThreadPool, engines/earth_engine.py:58-119)
and is implicitly throttled by the pool size. Both surfaces exist here:
``fetch_all(progress=...)`` fires a driver-side callback as each asset
lands (the file-level granularity the reference reports at), and
``max_bytes_per_sec`` rate-limits the aggregate copy bandwidth by
splitting the budget across the in-flight slots (each task throttles
its chunked copy to its share — no cross-task coordination needed, so
it works unchanged on a multi-node cluster where a global token bucket
would serialize on an actor).

Cache layout: ``{cache_dir}/{md5(href)[:16]}_{basename}`` so distinct
hrefs never collide and a human can still read the dir.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
from typing import Callable

import ray

_CHUNK = 1 << 20  # 1 MiB copy granularity (throttle quantum)


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


def _throttled_copy(src: str, dst: str, max_bytes_per_sec: float | None) -> int:
    """Chunked copy, sleeping as needed to hold ``max_bytes_per_sec``.
    Returns bytes copied."""
    if max_bytes_per_sec is None:
        shutil.copyfile(src, dst)
        return os.path.getsize(dst)
    n = 0
    t0 = time.monotonic()
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        while True:
            chunk = fi.read(_CHUNK)
            if not chunk:
                break
            fo.write(chunk)
            n += len(chunk)
            ahead = n / max_bytes_per_sec - (time.monotonic() - t0)
            if ahead > 0:
                time.sleep(ahead)
    return n


def fetch_one(
    href: str, cache_dir: str, max_bytes_per_sec: float | None = None
) -> tuple[str, int, bool]:
    """Copy ``href`` into the cache unless a clean copy already exists
    (probe-resume). Returns ``(local_path, bytes_copied, skipped)`` —
    0 bytes / skipped=True when the probe hit."""
    dest = cache_path(href, cache_dir)
    if os.path.exists(dest) and probe_ok(dest):
        return dest, 0, True  # resume: skip completed download
    os.makedirs(cache_dir, exist_ok=True)
    tmp = dest + ".part"
    # offline "download"; swap for a real fetcher (s5cmd/wget analogue)
    # in production — the chunked throttle applies identically
    n = _throttled_copy(href, tmp, max_bytes_per_sec)
    os.replace(tmp, dest)
    return dest, n, False


@ray.remote
def _fetch_task(
    href: str, cache_dir: str, max_bytes_per_sec: float | None
) -> tuple[str, int, bool]:
    return fetch_one(href, cache_dir, max_bytes_per_sec)


def fetch_all(
    hrefs: list[str],
    cache_dir: str,
    max_in_flight: int = 64,
    max_bytes_per_sec: float | None = None,
    progress: Callable[[int, int, str, int], None] | None = None,
) -> list[str]:
    """Fan the fetches out as Ray tasks with bounded in-flight count
    (the reference's ThreadPool of downloads, engines/earth_engine.py:
    58-119, re-expressed; backpressure instead of an unbounded pool).

    ``max_bytes_per_sec`` caps AGGREGATE copy bandwidth: each task gets
    ``max_bytes_per_sec / slots`` where ``slots`` is the concurrency
    actually used, so the cap holds when the pool is full and is
    conservative as the tail drains. ``progress(done, total,
    local_path, nbytes)`` fires on the driver after each asset lands
    (probe-skipped assets report ``nbytes=0``), mirroring the
    reference's per-download GDAL progress callbacks at file
    granularity.
    """
    slots = max(1, min(max_in_flight, len(hrefs)))
    per_task = None if max_bytes_per_sec is None else max_bytes_per_sec / slots
    out: list[str] = [""] * len(hrefs)
    pending: dict = {}
    i = 0
    done_n = 0
    while i < len(hrefs) or pending:
        while i < len(hrefs) and len(pending) < max_in_flight:
            pending[_fetch_task.remote(hrefs[i], cache_dir, per_task)] = i
            i += 1
        done, _ = ray.wait(list(pending), num_returns=1)
        for ref in done:
            path, nbytes, _skipped = ray.get(ref)
            out[pending.pop(ref)] = path
            done_n += 1
            if progress is not None:
                progress(done_n, len(hrefs), path, nbytes)
    return out
