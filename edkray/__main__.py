"""Job entrypoint: ``python -m edkray`` — the ``ray job submit`` surface.

The north-rule operational story (reference analogue: the ``edk`` CLI
wrapping ``dataset.py``'s sync/stitch driver) is a single submittable
job that runs the flagship spatial-join + tiling pipeline over a pages
Parquet directory, resumable from its per-partition manifest:

    ray job submit --working-dir . -- python -m edkray \
        --pages /data/pages --out /data/out \
        --admin /data/admin.parquet --knn-refs /data/refs.parquet

The driver owns no Ray session of its own beyond attaching to the
cluster the job runs on (``ray.init(address=...)`` only when not
already initialised, so it also runs standalone). Metrics (phase
times, per-partition rows) are printed as one JSON line and persisted
in the run's ``_manifest.json``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m edkray",
        description="Run the edkray spatial-join + tiling pipeline (resumable).",
    )
    p.add_argument("--pages", required=True, help="input pages Parquet file/dir")
    p.add_argument("--out", required=True, help="output root (pages/, assignments/, _manifest.json)")
    p.add_argument("--admin", help="admin-boundary polygons Parquet (default: built-in fixture)")
    p.add_argument("--knn-refs", help="kNN reference points Parquet (omit to skip the kNN stage)")
    p.add_argument("--k", type=int, default=3, help="neighbors per page (default 3)")
    p.add_argument("--num-partitions", type=int, default=16, help="output partitions (default 16)")
    p.add_argument("--dedup-mode", choices=["wide", "narrow"], default="wide",
                   help="'narrow' = decision-shuffle dedup (scale path)")
    p.add_argument("--wk-mode", choices=["auto", "broadcast", "partitioned"],
                   default="auto",
                   help="narrow dedup winner-key filter: broadcast the sorted "
                        "key array, co-shuffle on url-hash (10^12-url path), "
                        "or pick by winner count (auto)")
    p.add_argument("--no-resume", action="store_true", help="start fresh (purge out dir)")
    p.add_argument("--bbox", type=float, nargs=4, metavar=("W", "S", "E", "N"),
                   help="optional query bbox filter (lon/lat)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="error")

    import pyarrow.parquet as pq

    from edkray import fixtures
    from edkray.pipelines.spatial import run_spatial_pipeline

    admin = pq.read_table(args.admin) if args.admin else fixtures.make_admin()
    knn_refs = pq.read_table(args.knn_refs) if args.knn_refs else None

    metrics = run_spatial_pipeline(
        args.pages,
        admin,
        args.out,
        knn_refs=knn_refs,
        k=args.k,
        num_partitions=args.num_partitions,
        dedup_mode=args.dedup_mode,
        wk_mode=args.wk_mode,
        resume=not args.no_resume,
        query_bbox=tuple(args.bbox) if args.bbox else None,
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
