"""Overview-pyramid builder — the COG-exporter analogue (reference S15).

A cloud-optimized raster export is tiled chunks + an overview pyramid
(each zoom level a 2×2 aggregation of the level below). The Ray-Data
analogue over the engine's quadcell keys: start from per-cell stats at
base resolution R and cascade ``grouped_agg`` upward — level r is
computed FROM LEVEL r+1 (4 child rows per parent), never from the base
table, so total work is geometric (~4/3 × base cells), exactly like
raster overviews (reference export path: earth_data_kit
``dataset.py``'s ``to_cog``/VRT chain; see SURVEY §2 S15).

Each level optionally checkpoints to ``out_dir/res=<r>/`` partitioned
Parquet before the next level reads it back — the cascade is then
resumable per level (a failed run skips finished levels) and no level's
lineage ever re-executes an earlier level's shuffle.

Aggregates must be re-aggregable (sum/min/max; count becomes a sum
after the base level), the same constraint raster overviews impose.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import ray.data

from edkray.geo.cells import quadcell_decode, quadcell_parent
from edkray.ops.aggregate import grouped_agg


def coarsen_level(
    ds: ray.data.Dataset,
    cell_col: str,
    parent_res: int,
    aggs: list[tuple[str, str | None, str]],
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """One pyramid step: re-key every row to its ``parent_res`` quadcell
    and re-aggregate. ``aggs`` as in :func:`grouped_agg`
    ((op, col, alias); ops must be re-aggregable)."""

    def _to_parent(batch: pa.Table) -> pa.Table:
        import numpy as np

        cells = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        parent = quadcell_parent(cells, parent_res)
        idx = batch.schema.get_field_index(cell_col)
        return batch.set_column(idx, cell_col, pa.array(parent))

    keyed = ds.map_batches(_to_parent, batch_format="pyarrow", batch_size=batch_size)
    return grouped_agg(keyed, [cell_col], aggs)


def build_overviews(
    ds: ray.data.Dataset,
    cell_col: str,
    base_res: int,
    min_res: int,
    aggs: list[tuple[str, str | None, str]],
    out_dir: str | None = None,
    resume: bool = False,
) -> dict[int, ray.data.Dataset]:
    """Cascade ``ds`` (per-cell stats at ``base_res``) down to
    ``min_res``; returns {res: level dataset}. With ``out_dir`` each
    level writes ``out_dir/res=<r>/`` and the next level reads the
    checkpoint back (resumable with ``resume=True``: finished levels —
    marked by ``_DONE`` — are skipped and re-read)."""
    levels: dict[int, ray.data.Dataset] = {}
    # checkpoint re-reads select the level's real columns — the hive
    # path segment (res=<r>) would otherwise be inferred as a column
    cols = [cell_col] + [alias for _, _, alias in aggs]
    cur = ds
    for r in range(base_res - 1, min_res - 1, -1):
        part = os.path.join(out_dir, f"res={r}") if out_dir else None
        done = os.path.join(part, "_DONE") if part else None
        if part and resume and os.path.exists(done):
            cur = ray.data.read_parquet(part).select_columns(cols)
        else:
            cur = coarsen_level(cur, cell_col, r, aggs)
            if part:
                # write_parquet appends on Ray 2.49 — purge any stale
                # partial level (crashed run, or re-run into the same
                # out_dir) so the checkpoint re-read never double-counts
                if os.path.isdir(part):
                    shutil.rmtree(part)
                cur.write_parquet(part)
                open(done, "w").close()
                cur = ray.data.read_parquet(part).select_columns(cols)
        levels[r] = cur
    return levels


def pyramid_union(levels: dict[int, ray.data.Dataset]) -> ray.data.Dataset:
    """All levels as one dataset (cell ids encode their res, so rows
    from different levels never collide)."""
    dss = list(levels.values())
    out = dss[0]
    for d in dss[1:]:
        out = out.union(d)
    return out


def level_res(ds: ray.data.Dataset, cell_col: str) -> int:
    """Resolution encoded in a level's cell ids (reads one batch)."""
    import numpy as np

    batch = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    res, _, _ = quadcell_decode(batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64))
    return int(res[0])
