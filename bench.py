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

``--weak-scaling`` holds the PER-CPU load fixed instead (mult=4 at
8 CPUs vs mult=16 at 32 CPUs) and reports throughput-ratio efficiency
(docs/s at 32) / (4 × docs/s at 8) — the fixed-size-cluster story: a
4× cluster is given 4× the data and should finish in the same wall
time. This is the deployment-relevant number for a 100 TB corpus
sharded across nodes.

``--compute-scaling`` measures the N→4N pair over the enrich core
(geocode + cells + PIP + kNN through real engine stages) with no
write/shuffle — the component a single sandbox VM can meaningfully
scale; end-to-end pairs at ≥10M docs measure the host's
memory-provisioning bandwidth instead (BASELINE.md round-3). All
scaling modes report the host's own pure-CPU ceiling and provisioning
canary alongside the raw efficiency.
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

    # shard count via READ splits, not repartition: a repartition here is
    # a full shuffle of the GENERATED table (~50 GB at mult=64 — measured
    # spilling to disk for 40+ min in an 8-CPU session). N read blocks →
    # N map tasks → N output files, zero exchange. batch_size bounds the
    # per-task generated block (mult× amplification) to ~100 MB.
    (
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                              columns=["l_orderkey", "l_linenumber"],
                              override_num_blocks=min(16 * mult, 512))
        .map_batches(_to_pages, batch_format="pyarrow",
                     batch_size=max(1024, 65536 // mult))
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
                         dedup_mode=os.environ.get("GRAFT_DEDUP_MODE", "wide"),
                         wk_mode=os.environ.get("GRAFT_WK_MODE", "broadcast"),
                         read_cache=os.environ.get("GRAFT_READ_CACHE", "materialize"))
    return time.time() - t0, n_docs


def run_compute(sf_dir: str, mult: int = 4) -> tuple[float, int]:
    """CPU-bound engine-stage pair: the north-star enrich core
    (geocode → H3/S2/quad cells → STRtree PIP → exact kNN, all real
    engine stages) over a MATERIALIZED in-memory pages table with a
    per-batch count as the only output. No parquet write, no shuffle,
    ~zero fresh pages in steady state (batch buffers recycle through
    the allocator) — isolates per-CPU compute from the sandbox host's
    memory-provisioning wall (BASELINE.md round-3 analysis). Returns
    (best-of-2 seconds, n_docs)."""
    import pyarrow as pa
    import ray
    import ray.data

    from edkray.fixtures import make_admin, make_knn_refs
    from edkray.ops.joins import KnnJoin, PipJoin, process_cached
    from edkray.pipelines.spatial import add_cell_columns, geocode_batch

    pages = _pages_path(sf_dir, mult)
    ds = ray.data.read_parquet(
        pages, columns=["url", "warc_ts", "lang"]
    ).materialize()  # untimed: provisioning + decompress paid here
    n_docs = ds.count()
    admin_ref = ray.put(make_admin())
    refs_ref = ray.put(make_knn_refs(5000))

    def _enrich_count(b: pa.Table) -> pa.Table:
        b = add_cell_columns(geocode_batch(b))
        pip = process_cached(admin_ref, lambda t: PipJoin(t))
        b = pip(b)
        knn = process_cached(refs_ref, lambda t: KnnJoin(t, k=3))
        b = knn(b)
        return pa.table({"n": pa.array([len(b)], type=pa.int64())})

    def _one() -> float:
        t0 = time.time()
        total = ds.map_batches(
            _enrich_count, batch_format="pyarrow", batch_size=32768
        ).to_pandas()["n"].sum()
        assert total == n_docs
        return time.time() - t0

    _one()  # warm: actor/worker code paths + first-touch of batch pools
    best = min(_one(), _one())
    return best, n_docs


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

# round-4 training-data additions, timed separately so `suite_r3_sec`
# stays like-for-like comparable with BENCH_r02/r03
BENCH_QUERIES_R4 = ["paragraph_dedup", "semdedup", "bm25_topk", "dsir_resample",
                    "web_ingest", "pagerank_scores", "domain_rollup"]


_CALIB_WORK = """
import os
os.environ["OMP_NUM_THREADS"] = "1"; os.environ["OPENBLAS_NUM_THREADS"] = "1"
import numpy as np
a = np.random.rand(600, 600)
for _ in range(400):
    a = a @ a
    a /= np.abs(a).max() + 1.0
"""


def provisioning_canary() -> float:
    """Host memory-provisioning bandwidth (MB/s): first-touch of a
    fresh 512 MB numpy buffer. ~110 MB/s in a healthy window; observed
    down to 5 MB/s in degraded ones (BASELINE.md round-3) — at that
    point end-to-end pipeline walls measure this number, not CPUs."""
    import numpy as _np

    t0 = time.time()
    _a = _np.ones(1 << 26, dtype=_np.float64)
    dt = time.time() - t0
    del _a
    return round(512 / dt, 1)


def machine_ceiling(lo: int = 8, hi: int = 32) -> dict:
    """The HOST's own 8→32 strong-scaling ceiling, measured with
    independent pure-CPU processes (no Ray, no I/O, no shared state).

    Each process runs identical fixed work, so with 4× the processes
    doing 4× the total work, efficiency = t_8 / t_32 (1.0 iff 32 vCPUs
    really deliver 4× the compute of 8). On this sandbox VM they do
    not (~0.63–0.70 measured — host SMT/oversubscription); no pipeline
    can scale past the hardware it runs on, so ``--scaling`` reports
    raw efficiency alongside this ceiling and their ratio."""
    def run(n: int) -> float:
        t0 = time.time()
        ps = [subprocess.Popen([sys.executable, "-c", _CALIB_WORK],
                               stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
              for _ in range(n)]
        for p in ps:
            p.wait()
        return time.time() - t0

    t8a, t32a, t8b, t32b = run(lo), run(hi), run(lo), run(hi)  # interleaved vs drift
    t8, t32 = min(t8a, t8b), min(t32a, t32b)
    return {f"t_{lo}procs_sec": round(t8, 2), f"t_{hi}procs_sec": round(t32, 2),
            "machine_ceiling_eff": round(t8 / t32, 3)}


def main() -> None:
    import ray

    scaling = "--scaling" in sys.argv
    flagship_only = "--flagship-only" in sys.argv

    if "--calibrate" in sys.argv:
        print(json.dumps({"metric": "machine_ceiling", **machine_ceiling()}))
        return

    if "--compute-only" in sys.argv:
        # child mode for --compute-scaling: the enrich core over a
        # materialized table, one JSON line
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                     logging_level="error")
        import logging

        import ray.data
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        ray.data.DataContext.get_current().enable_progress_bars = False
        sec, n_docs = run_compute(SF_DIR, MULT)
        print(json.dumps({"metric": "compute_core", "value": round(sec, 3),
                          "unit": "sec", "n_docs": n_docs, "num_cpus": NUM_CPUS,
                          "docs_per_sec": round(n_docs / sec, 1)}))
        ray.shutdown()
        return

    if "--compute-scaling" in sys.argv:
        # N→4N pair over the CPU-bound enrich core (geocode+cells+PIP+
        # kNN, real engine stages, no write/shuffle) — the component a
        # single VM can meaningfully scale (see BASELINE.md round-3:
        # end-to-end pairs at ≥10M docs measure the host's memory-
        # provisioning bandwidth instead). Interleaved best-of-2.
        lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(","))
        ratio = hi / lo
        results: dict[int, dict] = {}
        for cpus in (lo, hi, lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR,
                       GRAFT_BENCH_MULT=os.environ.get("GRAFT_BENCH_MULT", "4"))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--compute-only"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            jl = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not jl:
                sys.stderr.write(f"[compute-scaling] child cpus={cpus} produced no JSON; "
                                 "stderr tail:\n" + "\n".join(p.stderr.splitlines()[-25:]) + "\n")
                continue
            r = json.loads(jl[-1])
            if cpus not in results or r["value"] < results[cpus]["value"]:
                results[cpus] = r
        missing = [c for c in (lo, hi) if c not in results]
        if missing:
            raise SystemExit(f"[compute-scaling] no successful run for cpus={missing}")
        t_lo, t_hi = results[lo]["value"], results[hi]["value"]
        eff = t_lo / (ratio * t_hi)
        ceiling = machine_ceiling(lo, hi)
        print(json.dumps({
            "metric": "enrich_core_compute_scaling",
            "unit": "sec",
            "sf": SF_DIR,
            f"t_{lo}cpus_sec": round(t_lo, 2),
            f"t_{hi}cpus_sec": round(t_hi, 2),
            f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
            **ceiling,
            "normalized_efficiency": round(eff / ceiling["machine_ceiling_eff"], 3),
            "host_provisioning_mb_s": provisioning_canary(),
            "n_docs": results[hi]["n_docs"],
        }))
        return

    if "--weak-scaling" in sys.argv:
        # fixed per-CPU load: (8 cpus, mult m) vs (32 cpus, mult 4m);
        # interleaved phases, best (max docs/s) per config
        base_mult = int(os.environ.get("GRAFT_BENCH_MULT", "4"))
        lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
        ratio = hi / lo
        results: dict[int, dict] = {}
        for cpus, m in ((lo, base_mult), (hi, int(ratio * base_mult)),
                        (lo, base_mult), (hi, int(ratio * base_mult))):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR,
                       GRAFT_BENCH_MULT=str(m),
                       GRAFT_DEDUP_MODE=os.environ.get("GRAFT_DEDUP_MODE", "narrow"))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only", "--once"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            jl = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not jl:
                sys.stderr.write(f"[scaling] child cpus={cpus} produced no JSON; stderr tail:\n"
                                 + "\n".join(p.stderr.splitlines()[-25:]) + "\n")
                continue
            line = jl[-1]
            r = json.loads(line)
            if cpus not in results or r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
                results[cpus] = r
        missing = [c for c in (lo, hi) if c not in results]
        if missing:
            raise SystemExit(f"[weak-scaling] no successful run for cpus={missing}; "
                             "see stderr above for child failures")
        d_lo, d_hi = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
        print(json.dumps({
            "metric": "spatial_flagship_weak_scaling",
            "unit": "docs/sec",
            "sf": SF_DIR,
            f"t_{lo}cpus_sec": results[lo]["value"],
            f"t_{hi}cpus_sec": results[hi]["value"],
            f"n_docs_{lo}": results[lo]["n_docs"],
            f"n_docs_{hi}": results[hi]["n_docs"],
            f"docs_per_sec_{lo}": d_lo,
            f"docs_per_sec_{hi}": d_hi,
            f"weak_scaling_efficiency_{lo}_to_{hi}": round(d_hi / (ratio * d_lo), 3),
        }))
        return

    if scaling:
        # interleave lo/hi phases so host-CPU drift (this sandbox shows
        # episodic steal) biases neither side; keep the min per count.
        # GRAFT_SCALING_CPUS="lo,hi" picks the N and 4N pair (default
        # 8,32). "2,8" measures the engine's N→4N scaling BELOW the
        # host's oversubscription point — at 32 vCPUs this shared VM
        # delivers only ~2.6-2.9x the compute of 8 (machine_ceiling_eff
        # below), which no pipeline can scale past.
        lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
        ratio = hi / lo
        results: dict[int, dict] = {}
        # GRAFT_SCALING_ROUNDS=1 halves the attempt so it fits inside
        # this host's short healthy windows (they close in <10 min)
        rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
        for cpus in (lo, hi) * rounds:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR,
                       GRAFT_BENCH_MULT=os.environ.get("GRAFT_BENCH_MULT", "4"),
                       GRAFT_DEDUP_MODE=os.environ.get("GRAFT_DEDUP_MODE", "narrow"))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only", "--once"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            jl = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not jl:
                sys.stderr.write(f"[scaling] child cpus={cpus} produced no JSON; stderr tail:\n"
                                 + "\n".join(p.stderr.splitlines()[-25:]) + "\n")
                continue
            line = jl[-1]
            r = json.loads(line)
            if cpus not in results or r["value"] < results[cpus]["value"]:
                results[cpus] = r
        missing = [c for c in (lo, hi) if c not in results]
        if missing:
            raise SystemExit(f"[scaling] no successful run for cpus={missing}; "
                             "see stderr above for child failures")
        t8, t32 = results[lo]["value"], results[hi]["value"]
        docs = results[hi]["n_docs"]
        eff = t8 / (ratio * t32)
        ceiling = machine_ceiling(lo, hi)
        print(json.dumps({
            "metric": "spatial_flagship_scaling",
            "unit": "sec",
            "sf": SF_DIR,
            f"t_{lo}cpus_sec": round(t8, 2),
            f"t_{hi}cpus_sec": round(t32, 2),
            f"docs_per_sec_{lo}": round(docs / t8, 1),
            f"docs_per_sec_{hi}": round(docs / t32, 1),
            f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
            # this host's own 8→32 ceiling (independent processes, no
            # Ray) and the pipeline's efficiency relative to it — the
            # hardware-normalized number a real 4×-node cluster (where
            # nodes don't share a socket/bus) is expected to track
            **ceiling,
            "normalized_efficiency": round(eff / ceiling["machine_ceiling_eff"], 3),
            "host_provisioning_mb_s": provisioning_canary(),
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
    # lazily host-backed (~9 s/GB on first touch in a healthy window);
    # touching a pool up front keeps the timed run out of the
    # first-fault regime. ADAPTIVE: in degraded windows the host drops
    # to <10 MB/s provisioning (measured 162 s/GB on 2026-08-17) — there
    # the prefault costs far more than it saves, so probe 1 GB and skip
    # the rest if the host is slow.
    import numpy as _np

    _t0 = time.time()
    _a = _np.ones(1 << 27, dtype=_np.float64)
    del _a
    if time.time() - _t0 < 15:
        for _ in range(5):
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
        for name in BENCH_QUERIES + BENCH_QUERIES_R4:
            t0 = time.time()
            _consume(qs[name](SF_DIR))
            timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    suite_r3 = round(
        sum(v for k, v in timings.items() if k not in BENCH_QUERIES_R4), 3
    )
    print(json.dumps({
        "metric": "spatial-join+tiling e2e (flagship + operator suite)",
        "value": fl_sec if flagship_only else total,
        "unit": "sec",
        "suite_r3_sec": fl_sec if flagship_only else suite_r3,
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / fl_sec, 1),
        # host-health stamp: walls on this sandbox track the VM's
        # memory-provisioning bandwidth (healthy ≥ ~100 MB/s; degraded
        # windows measured < 10). Read suite regressions against this.
        "host_provisioning_mb_s": provisioning_canary(),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
