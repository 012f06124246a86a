"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": flagship throughput, ...}

``--scaling`` runs the flagship spatial pipeline twice in FRESH
processes (num_cpus=8 then 32) on the same input and reports both
throughputs plus scaling efficiency t_8 / (4 * t_32) — the sandbox
evidence for the north_rule's N→4N cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# one compute thread per Ray task/actor: Ray provides the parallelism;
# per-worker polars/BLAS pools sized to the machine oversubscribe 32×
# and anti-scale (measured 31s → 84s at num_cpus=32 without this)
os.environ.setdefault("POLARS_MAX_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# --scaling uses a larger replicated table so compute dominates fixed
# per-execution overheads (strong-scaling needs enough work per CPU)
MULT = int(os.environ.get("GRAFT_BENCH_MULT", "1"))
# tmpfs scratch: the sandbox disk tops out ~100 MB/s and saturates the
# pipeline at ~135k docs/s regardless of CPUs; bench measures compute
BENCH_ROOT = os.environ.get("GRAFT_BENCH_ROOT", "/dev/shm/edkray_bench" if os.path.isdir("/dev/shm") else "/tmp/edkray_bench")
T0 = dt.datetime(2017, 1, 1)


def _pages_path(sf_dir: str, mult: int = 1) -> str:
    """Derive a Common-Crawl-style pages table (BASELINE.json input_hint
    shape) deterministically from the sf dir's lineitem table (row count
    × ``mult`` via replica-indexed urls); cached."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{BENCH_ROOT}/pages_{tag}_x{mult}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out

    import numpy as np
    import pyarrow as pa
    import ray.data

    shutil.rmtree(out, ignore_errors=True)

    def _to_pages(b: pa.Table) -> pa.Table:
        ok0 = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln0 = b["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        reps = np.arange(mult, dtype=np.int64)
        ok = np.repeat(ok0, mult)
        ln = np.repeat(ln0, mult)
        uid = (ok * 8 + ln) * 16 + np.tile(reps, len(ok0))
        # ~2% of rows share one hot domain (dense-cell skew); rest spread
        # over 500 domains
        dom = np.where(uid % 50 == 0, -1, uid % 500)
        urls = [
            f"https://{'hotcity' if d < 0 else f'site{d:03d}'}.example/p/{u:012d}"
            for d, u in zip(dom, uid)
        ]
        offs = (uid * 9973) % (7 * 86400)
        ts = [T0 + dt.timedelta(seconds=int(o)) for o in offs]
        texts = [f"{u:016x} synthetic page body content for benchmark " * 4 for u in uid]
        htmls = [t.encode() for t in texts]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
                "text": pa.array(texts, type=pa.large_string()),
                "lang": pa.array([("en", "de", "fr", "es", "zh")[int(u) % 5] for u in uid]),
            }
        )

    (
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                              columns=["l_orderkey", "l_linenumber"])
        .map_batches(_to_pages, batch_format="pyarrow")
        .repartition(16 * mult)
        .write_parquet(out)
    )
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def run_flagship(sf_dir: str, out_root: str, mult: int = 1) -> tuple[float, int]:
    """Returns (seconds, n_docs processed)."""
    import pyarrow.parquet as pq

    from edkray.fixtures import make_admin, make_knn_refs
    from edkray.pipelines.spatial import run_spatial_pipeline

    pages = _pages_path(sf_dir, mult)
    n_docs = sum(
        pq.ParquetFile(os.path.join(pages, f)).metadata.num_rows
        for f in os.listdir(pages) if f.endswith(".parquet")
    )
    out_dir = os.path.join(out_root, "flagship")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    # full north-star pipeline: dedup → geocode/cells → tile → PIP →
    # kNN (5000 reference points, k=3, exact) → write + rank.
    # GRAFT_DEDUP_MODE=narrow uses the scale-path dedup (decision
    # shuffle only; wide rows never shuffle) — the --scaling default.
    run_spatial_pipeline(pages, admin=make_admin(), out_dir=out_dir,
                         knn_refs=make_knn_refs(5000),
                         num_partitions=16, resume=False,
                         dedup_mode=os.environ.get("GRAFT_DEDUP_MODE", "wide"))
    return time.time() - t0, n_docs


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


BENCH_QUERIES = [
    "pricing_summary", "dedup_lineitem_first", "daily_events",
    "sessionize_events", "asof_orders", "knn_parts", "spatial_flagship",
    "tile_rank", "minhash_pairs", "embedding_topk", "top_revenue_orders",
]


def main() -> None:
    import ray

    scaling = "--scaling" in sys.argv
    flagship_only = "--flagship-only" in sys.argv

    if scaling:
        # interleave 8/32 phases so host-CPU drift (this sandbox shows
        # episodic steal) biases neither side; keep the min per count
        results: dict[int, dict] = {}
        for cpus in (8, 32, 8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR,
                       GRAFT_BENCH_MULT=os.environ.get("GRAFT_BENCH_MULT", "4"),
                       GRAFT_DEDUP_MODE=os.environ.get("GRAFT_DEDUP_MODE", "narrow"))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only", "--once"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if cpus not in results or r["value"] < results[cpus]["value"]:
                results[cpus] = r
        t8, t32 = results[8]["value"], results[32]["value"]
        docs = results[32]["n_docs"]
        eff = t8 / (4.0 * t32)
        print(json.dumps({
            "metric": "spatial_flagship_scaling",
            "unit": "sec",
            "sf": SF_DIR,
            "t_8cpus_sec": round(t8, 2),
            "t_32cpus_sec": round(t32, 2),
            "docs_per_sec_8": round(docs / t8, 1),
            "docs_per_sec_32": round(docs / t32, 1),
            "scaling_efficiency_8_to_32": round(eff, 3),
            "n_docs": docs,
        }))
        return

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="error")
    import logging

    import ray.data

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.data.DataContext.get_current().enable_progress_bars = False

    out_root = f"{BENCH_ROOT}/out_{NUM_CPUS}"
    os.makedirs(out_root, exist_ok=True)
    _pages_path(SF_DIR, MULT)  # build the cache outside the timed section

    # pre-fault guest memory (untimed): this sandbox VM's memory is
    # lazily host-backed (~9 s/GB on first touch); touching a pool up
    # front keeps the timed run out of the first-fault regime
    import numpy as _np

    for _ in range(6):
        _a = _np.ones(1 << 27, dtype=_np.float64)
        del _a

    # warm up the executor + actor-pool code paths on a tiny input so
    # the timed run measures steady-state throughput, not cold start
    run_flagship("/root/testdata/sf0.001", out_root)

    timings: dict[str, float] = {}
    # best-of-2 unless --once: the sandbox host shows episodic CPU steal;
    # min of two runs approximates steady state
    fl_sec, n_docs = run_flagship(SF_DIR, out_root, MULT)
    if flagship_only and "--once" not in sys.argv:
        fl2, _ = run_flagship(SF_DIR, out_root, MULT)
        fl_sec = min(fl_sec, fl2)
    timings["spatial_pipeline"] = round(fl_sec, 3)

    if not flagship_only:
        from edkray import queries as Q

        qs = Q.queries()
        for name in BENCH_QUERIES:
            t0 = time.time()
            _consume(qs[name](SF_DIR))
            timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "spatial-join+tiling e2e (flagship + operator suite)",
        "value": fl_sec if flagship_only else total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / fl_sec, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
