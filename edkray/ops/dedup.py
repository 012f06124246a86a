"""Deduplication family for web-corpus pipelines.

- :func:`exact_dedup` — hash-partition + first-per-group (reference's
  ``list(set(...))`` dedup, engines/s3.py:305, made deterministic).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash over
  char-k-gram rolling hashes, banded LSH bucketing via groupby, in-bucket
  pairwise verification. The shuffle moves (band, band_hash, doc_id,
  signature) rows — never the documents themselves.
- :func:`simhash_column` / :func:`simhash_pairs` — 64-bit SimHash with
  chunk-banding for Hamming-distance candidates.
- :func:`jaccard` — exact char-k-gram Jaccard (verification oracle).
- :func:`embedding_dup_pairs` — random-hyperplane LSH buckets + exact
  cosine verification over an embedding column.

Pair outputs are canonical (id_a < id_b), deduplicated, deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

from edkray.ops.shuffle import bucketed_group_map, dedup_in_bucket
from edkray.ops.text import kgram_hashes


def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Keep exactly one row per ``key_cols``: the first by ``order_cols``
    (ascending, deterministic).

    Two-level: per-batch local dedup (cheap combiner) → hash-bucket
    shuffle (NOT per-key map_groups — see edkray.ops.shuffle) →
    vectorized in-bucket dedup. Only local survivors shuffle.
    """

    def _local(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.sort(order_cols, maintain_order=True)
            .unique(subset=key_cols, keep="first", maintain_order=True)
            .to_arrow()
        )

    pre = ds.map_batches(_local, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_group_map(
        pre, key_cols, dedup_in_bucket(key_cols, order_cols), num_buckets, batch_size
    )


# --- MinHash + LSH --------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature of one document."""
    grams = np.unique(kgram_hashes(text.encode("utf-8", "ignore"), k))
    if len(grams) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hm = (a[:, None] * grams[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return hm.min(axis=1)


class MinHasher:
    """Actor-pool stage: permutation params generated once per actor;
    emits one row per (doc, band): (doc_id, band, band_hash, sig)."""

    def __init__(self, id_col="doc_id", text_col="text", num_perm=64, bands=16, k=8, seed=7):
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = minhash_signature(text or "", self.num_perm, self.k, self.a, self.b)
        # band hash: mix the rows of each band into one uint64
        r = self.rows_per_band
        banded = sigs.reshape(n, self.bands, r)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            for j in range(r):
                bh = bh * np.uint64(0x100000001B3) + banded[:, :, j]
        out_ids = np.repeat(np.asarray(ids, dtype=np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        out_bh = bh.reshape(-1)
        out_sig = np.repeat(sigs, self.bands, axis=0)
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "band": pa.array(out_band),
                "band_hash": pa.array(out_bh),
                "sig": pa.array(list(out_sig), type=pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    threshold: float = 0.7,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash (actor pool) → explode to band rows → groupby
    (band, band_hash) shuffle → in-bucket pairwise signature agreement →
    canonical pair rows (id_a < id_b, est_jaccard). Pairs surfacing in
    multiple bands are deduplicated by a final groupby-first.
    """
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands, k=k
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    _empty = pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []}).astype(
        {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}
    )

    def _bucket_pairs(table: pa.Table) -> pa.Table:
        # one hash bucket = many whole (band, band_hash) groups; per-group
        # pair generation loops in-task (no Ray per-group overhead)
        df = table.to_pandas()
        outs = []
        for _, group in df.groupby(["band", "band_hash"], sort=False):
            g = group.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
            n = len(g)
            if n < 2:
                continue
            ids = g[id_col].to_numpy()
            sigs = np.stack(g["sig"].to_numpy())  # (n, num_perm)
            ia, ib = np.triu_indices(n, k=1)
            est = (sigs[ia] == sigs[ib]).mean(axis=1)
            keep = est >= threshold
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {"id_a": ids[ia][keep], "id_b": ids[ib][keep], "est_jaccard": est[keep]}
                    )
                )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True) if outs else _empty, preserve_index=False
        )

    pairs = bucketed_group_map(band_rows, ["band", "band_hash"], _bucket_pairs, num_buckets=32)
    # same pair can surface from several bands → distinct on (id_a, id_b)
    return bucketed_group_map(
        pairs, ["id_a", "id_b"], dedup_in_bucket(["id_a", "id_b"], ["est_jaccard"]), num_buckets=16
    )


# --- SimHash --------------------------------------------------------------


def simhash64(text: str, k: int = 4) -> np.uint64:
    """64-bit SimHash over char-k-gram hashes (vectorized bit voting)."""
    grams = kgram_hashes(text.encode("utf-8", "ignore"), k)
    if len(grams) == 0:
        return np.uint64(0)
    bits = (grams[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.sum(axis=0) * 2 > len(grams)
    return np.uint64(np.packbits(votes[::-1]).view(">u8")[0])


def simhash_column(batch: pa.Table, text_col: str = "text", k: int = 4) -> pa.Table:
    texts = batch[text_col].to_pylist()
    out = np.fromiter(
        (simhash64(t or "", k) for t in texts), dtype=np.uint64, count=len(texts)
    )
    return batch.append_column("simhash", pa.array(out))


def simhash_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    max_hamming: int = 3,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Candidate near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Banding: split the 64-bit hash into 4 × 16-bit chunks; any pair
    within Hamming ≤ 3 agrees on ≥1 chunk (pigeonhole) → groupby
    (chunk_idx, chunk_value) → verify exact Hamming in-bucket.
    """

    def _hash_and_band(batch: pa.Table) -> pa.Table:
        batch = simhash_column(batch.select([id_col, text_col]), text_col, k)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        n = len(ids)
        chunk_idx = np.tile(np.arange(4, dtype=np.int32), n)
        chunk_val = np.empty(4 * n, dtype=np.uint64)
        for c in range(4):
            chunk_val[c::4] = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "chunk": pa.array(chunk_idx),
                "chunk_val": pa.array(chunk_val),
                "simhash": pa.array(np.repeat(sh, 4)),
            }
        )

    band_rows = ds.map_batches(_hash_and_band, batch_format="pyarrow", batch_size=batch_size)

    _empty = pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
    )

    def _bucket_pairs(table: pa.Table) -> pa.Table:
        df = table.to_pandas()
        outs = []
        for _, group in df.groupby(["chunk", "chunk_val"], sort=False):
            g = group.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            sh = g["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(len(g), k=1)
            x = sh[ia] ^ sh[ib]
            ham = np.zeros(len(x), dtype=np.int64)
            for b in range(64):
                ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            keep = ham <= max_hamming
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {"id_a": ids[ia][keep], "id_b": ids[ib][keep], "hamming": ham[keep]}
                    )
                )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True) if outs else _empty, preserve_index=False
        )

    pairs = bucketed_group_map(band_rows, ["chunk", "chunk_val"], _bucket_pairs, num_buckets=32)
    return bucketed_group_map(
        pairs, ["id_a", "id_b"], dedup_in_bucket(["id_a", "id_b"], ["hamming"]), num_buckets=16
    )


# --- exact n-gram Jaccard (verification) ---------------------------------


def jaccard(text_a: str, text_b: str, k: int = 8) -> float:
    """Exact char-k-gram Jaccard similarity of two strings."""
    ga = np.unique(kgram_hashes(text_a.encode("utf-8", "ignore"), k))
    gb = np.unique(kgram_hashes(text_b.encode("utf-8", "ignore"), k))
    if len(ga) == 0 and len(gb) == 0:
        return 1.0
    inter = np.intersect1d(ga, gb, assume_unique=True).size
    return inter / (len(ga) + len(gb) - inter)


# --- embedding near-dup ---------------------------------------------------


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    nbits: int = 12,
    threshold: float = 0.95,
    seed: int = 11,
    batch_size: int = 16384,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: random-hyperplane LSH buckets →
    exact in-bucket cosine ≥ threshold. Output (id_a, id_b, cosine)."""

    class _HyperplaneBucketer:
        def __init__(self):
            self.planes = None  # lazily sized from first batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            emb = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            if self.planes is None:
                d = dim or emb.shape[1]
                self.planes = np.random.default_rng(seed).standard_normal((d, nbits))
            bits = (emb @ self.planes) > 0
            bucket = np.zeros(len(ids), dtype=np.int64)
            for j in range(nbits):
                bucket = bucket * 2 + bits[:, j]
            norm = np.linalg.norm(emb, axis=1)
            norm[norm == 0] = 1.0
            unit = emb / norm[:, None]
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "bucket": pa.array(bucket),
                    "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
                }
            )

    rows = ds.map_batches(
        _HyperplaneBucketer, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 2)
    )

    _empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
        {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
    )

    def _bucket_pairs(table: pa.Table) -> pa.Table:
        df = table.to_pandas()
        outs = []
        for _, group in df.groupby("bucket", sort=False):
            g = group.sort_values(id_col, kind="stable").drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            unit = np.stack(g["unit"].to_numpy())
            cos = unit @ unit.T
            ia, ib = np.triu_indices(len(g), k=1)
            c = cos[ia, ib]
            keep = c >= threshold
            if keep.any():
                outs.append(
                    pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep], "cosine": c[keep]})
                )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True) if outs else _empty, preserve_index=False
        )

    # each (id_a, id_b) pair appears in exactly one LSH bucket → no final dedup
    return bucketed_group_map(rows, ["bucket"], _bucket_pairs, num_buckets=16)
