"""Distributed k-means over an embedding column (``list<float>``).

Training-data curation clusters corpora by embedding (topic balancing,
domain mixing, per-cluster sampling). :class:`IvfIndex`
(ops/search.py) fits centroids on a DRIVER-SIDE SAMPLE — right for a
coarse ANN quantizer, wrong when the clustering itself is the product.
This module runs Lloyd's algorithm over the FULL dataset:

- init: the embeddings of the ``k`` smallest ids (deterministic and
  SQL-reproducible — no RNG to mirror in the oracle);
- each iteration: one ``map_batches`` pass assigns every row to its
  nearest centroid (vectorized ||x-c||² argmin via the expansion
  x·x - 2x·C + c·c) and emits ≤ k PARTIAL rows per batch (cluster,
  count, component-sum vector); a bucketed tree-reduce
  (:func:`bucketed_group_map` on cluster) folds partials so exactly
  ``k`` rows reach the driver per iteration — the data never leaves
  its blocks, and the k×d centroid matrix is re-broadcast via
  ``ray.put``;
- empty clusters keep their previous centroid (mirrored in the oracle
  with a LEFT JOIN + coalesce);
- :func:`kmeans_assign` appends the final ``cluster`` column in one
  more broadcast pass.

At 100 TB: per-iteration shuffle volume is k rows × num batches of
(8 + 8 + 8d) bytes — independent of corpus size; driver state is k×d
floats. Ties (a row equidistant to two centroids) break to the lowest
cluster index on both the engine and SQL sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from edkray.ops.shuffle import bucketed_group_map
from edkray.utils import list_to_matrix, matrix_to_list_array


def _nearest(emb: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Index of the nearest centroid per row (squared euclidean,
    ties → lowest index, which is exactly what argmin returns)."""
    # ||x||² is constant per row w.r.t. the argmin — skip it
    d2 = -2.0 * (emb @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def _init_centroids(
    ds: ray.data.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Embeddings of the k smallest ids via the distributed top-k
    combiner (global_top_k: per-block head, one-task merge — only the
    final k rows reach the driver)."""
    from edkray.ops.aggregate import global_top_k

    def _proj(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, vec_col])

    head_ds = global_top_k(ds.map_batches(_proj, batch_format="pyarrow"),
                           [id_col], k, descending=False)
    head = pa.concat_tables(
        [t for t in ray.get(head_ds.to_arrow_refs()) if t.num_rows])
    order = np.argsort(head[id_col].to_numpy(zero_copy_only=False),
                       kind="stable")
    return list_to_matrix(head[vec_col].take(pa.array(order)), dtype=np.float64)


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 16384,
    max_partial_rows: int = 500_000,
) -> np.ndarray:
    """Fit k-means centroids over the full dataset. Returns (k, d)
    float64 centroids after ``iters`` Lloyd updates.

    The per-iteration combine is the A5 pattern (grouped_agg_small):
    partials are ≤ k rows per block, so when k × blocks ≤
    ``max_partial_rows`` they fold on the driver (skipping a whole Ray
    shuffle per iteration); above the bound the fold runs as a bucketed
    tree-reduce instead — same kernel, no driver materialization."""
    cent = _init_centroids(ds, k, id_col, vec_col)
    d = cent.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def _partial(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            emb = list_to_matrix(batch[vec_col], dtype=np.float64)
            assign = _nearest(emb, c)
            uniq, inv, cnt = np.unique(assign, return_inverse=True,
                                       return_counts=True)
            sums = np.zeros((len(uniq), emb.shape[1]))
            np.add.at(sums, inv, emb)
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
                "s": matrix_to_list_array(sums),
            })

        partials = ds.map_batches(_partial, batch_format="pyarrow",
                                  batch_size=batch_size)

        def _fold(table: pa.Table) -> pa.Table:
            cl = table["cluster"].to_numpy(zero_copy_only=False)
            n = table["n"].to_numpy(zero_copy_only=False)
            s = list_to_matrix(table["s"], dtype=np.float64)
            uniq, inv = np.unique(cl, return_inverse=True)
            nn = np.zeros(len(uniq), dtype=np.int64)
            ss = np.zeros((len(uniq), s.shape[1]))
            np.add.at(nn, inv, n)
            np.add.at(ss, inv, s)
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int64)),
                "n": pa.array(nn),
                "s": matrix_to_list_array(ss),
            })

        partials = partials.materialize()
        if partials.count() <= max_partial_rows:
            tabs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
            rows = _fold(pa.concat_tables(tabs))
        else:
            folded = bucketed_group_map(partials, ["cluster"], _fold,
                                        num_buckets=min(k, 16))
            rows = pa.concat_tables(
                [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows])
        new = cent.copy()  # empty clusters keep their previous centroid
        cl = rows["cluster"].to_numpy(zero_copy_only=False)
        n = rows["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = list_to_matrix(rows["s"], dtype=np.float64)
        new[cl] = s / n[:, None]
        cent = new
        assert cent.shape == (k, d)
    return cent


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    batch_size: int = 16384,
) -> ray.data.Dataset:
    """Append the nearest-centroid index as ``out_col`` (broadcast
    centroids, one vectorized pass; upserts if the column exists)."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        emb = list_to_matrix(batch[vec_col], dtype=np.float64)
        a = pa.array(_nearest(emb, c).astype(np.int64))
        if out_col in batch.schema.names:
            return batch.set_column(
                batch.schema.get_field_index(out_col), out_col, a)
        return batch.append_column(out_col, a)

    return ds.map_batches(_assign, batch_format="pyarrow", batch_size=batch_size)


def semdedup(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
    batch_size: int = 16384,
    block: int = 2048,
    max_cluster_size: int = 65536,
) -> ray.data.Dataset:
    """SemDeDup (semantic dedup, Abbas et al. 2023, arXiv:2303.09540):
    cluster by embedding, then WITHIN each cluster drop every row whose
    cosine to ANY lower-id row of the same cluster is ≥ ``tau``; the
    lowest-id member of each semantic duplicate neighborhood survives.
    Returns ``(id_col, cluster, keep)``.

    The whole point of clustering first is scale: pairwise cosine runs
    per CLUSTER, never corpus-wide — O(Σ nᵢ²) instead of O(n²). Shape:
    one broadcast assignment pass (centroids via ``ray.put``), then one
    :func:`bucketed_group_map` shuffle on ``cluster`` carrying (id,
    cluster, unit vector); inside a bucket each cluster's keep mask is
    a blocked matmul (``block`` rows at a time, so task memory is
    O(block × cluster_size), not cluster_size²). The drop rule compares
    against all earlier rows — kept or dropped — so blocks are
    independent (no sequential scan), matching the reference SemDeDup
    formulation and staying SQL-mirrorable.

    Skew note (VERDICT r4 #6): cluster sizes are data-dependent; a
    degenerate corpus (one boilerplate mode) makes one cluster ≈ the
    corpus and the within-cluster prune goes O(corpus²). Clusters
    larger than ``max_cluster_size`` are therefore RECURSIVELY SPLIT
    in-task by a deterministic 2-means on the unit vectors (the
    standard SemDeDup remedy — more, smaller clusters — applied only
    where needed) and deduped within each leaf, bounding work at
    O(n · max_cluster_size) per bucket. Identical-vector degenerate
    clusters that 2-means cannot separate fall back to id-order chunks
    of ``max_cluster_size``. At or below the cap the result is exact
    SemDeDup (the SQL oracle's rule); above it, cross-leaf duplicates
    within one oversized cluster are intentionally not compared — the
    same approximation raising k would introduce globally.
    """
    from edkray.ops.shuffle import bucketed_group_map
    from edkray.utils import list_to_matrix, matrix_to_list_array

    assigned = kmeans_assign(ds, centroids, vec_col=vec_col)

    def _unit(batch: pa.Table) -> pa.Table:
        emb = list_to_matrix(batch[vec_col], dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "cluster": batch["cluster"],
                "__u": matrix_to_list_array(emb / norm[:, None]),
            }
        )

    rows = assigned.map_batches(_unit, batch_format="pyarrow", batch_size=batch_size)

    def _keep_mask(units: np.ndarray) -> np.ndarray:
        n = len(units)
        keep = np.ones(n, dtype=bool)
        for s in range(1, n, block):
            e = min(s + block, n)
            gram = units[s:e] @ units[:e].T  # rows i∈[s,e) vs cols j<e
            earlier = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            keep[s:e] = ~((gram >= tau) & earlier).any(axis=1)
        return keep

    def _split2(units: np.ndarray) -> np.ndarray:
        """Deterministic in-task 2-means over unit vectors: seed with
        row 0 and the row least-cosine to it, ≤5 Lloyd rounds."""
        c0 = units[0]
        c1 = units[int(np.argmin(units @ c0))]
        lab = None
        for _ in range(5):
            new = (units @ c1) > (units @ c0)
            if lab is not None and np.array_equal(new, lab):
                break
            lab = new
            for side, m in ((0, ~lab), (1, lab)):
                if m.any():
                    v = units[m].mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        if side == 0:
                            c0 = v / nv
                        else:
                            c1 = v / nv
        return lab

    def _keep_capped(units: np.ndarray, depth: int = 0) -> np.ndarray:
        n = len(units)
        if n <= max_cluster_size:
            return _keep_mask(units)
        lab = _split2(units) if depth < 48 else None
        small = 0 if lab is None else int(min(lab.sum(), n - lab.sum()))
        if small < max(1, n // 20):
            # 2-means made no real progress (identical/collinear
            # vectors): id-order chunks — deterministic, terminates
            keep = np.ones(n, dtype=bool)
            for s in range(0, n, max_cluster_size):
                keep[s : s + max_cluster_size] = _keep_mask(
                    units[s : s + max_cluster_size]
                )
            return keep
        keep = np.ones(n, dtype=bool)
        # boolean masks preserve id order within each side, so the
        # lower-id-survives rule holds inside every leaf
        keep[~lab] = _keep_capped(units[~lab], depth + 1)
        keep[lab] = _keep_capped(units[lab], depth + 1)
        return keep

    def _per_bucket(table: pa.Table) -> pa.Table:
        cl = table["cluster"].to_numpy(zero_copy_only=False)
        ids = table[id_col].to_numpy(zero_copy_only=False)
        units = list_to_matrix(table["__u"], dtype=np.float64)
        order = np.lexsort((ids, cl))  # by cluster, then id asc
        cl, ids, units = cl[order], ids[order], units[order]
        keep = np.ones(len(ids), dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        bounds = np.r_[starts, len(cl)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            keep[a:b] = _keep_capped(units[a:b])
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "cluster": pa.array(cl.astype(np.int64)),
                "keep": pa.array(keep),
            }
        )

    return bucketed_group_map(
        rows, ["cluster"], _per_bucket, num_buckets=num_buckets, batch_size=batch_size
    )
