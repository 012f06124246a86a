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
from edkray.utils import list_to_matrix, matrix_to_list_array


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


def _batch_signatures(
    texts: list, num_perm: int, k: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n, num_perm) uint64 signatures for a list of documents."""
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, text in enumerate(texts):
        sigs[i] = minhash_signature(text or "", num_perm, k, a, b)
    return sigs


class MinHasher:
    """Actor-pool stage: permutation params generated once per actor;
    emits one NARROW row per (doc, band): (doc_id, band, band_hash) —
    ~20 B/row. Round 1 shipped the full 64-perm signature on every band
    row (~8 KB/doc through the shuffle, 10-100× the necessary bytes);
    signatures are now recomputed only for LSH candidates in the
    verification pass."""

    def __init__(self, id_col="doc_id", text_col="text", num_perm=64, bands=16, k=8, seed=7):
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        sigs = _batch_signatures(texts, self.num_perm, self.k, self.a, self.b)
        # band hash: mix the rows of each band into one uint64
        r = self.rows_per_band
        banded = sigs.reshape(n, self.bands, r)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            for j in range(r):
                bh = bh * np.uint64(0x100000001B3) + banded[:, :, j]
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(np.asarray(ids, dtype=np.int64), self.bands)),
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1)),
            }
        )


def _minhash_candidates(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    num_perm: int,
    bands: int,
    k: int,
    concurrency,
    batch_size: int,
) -> pd.DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band.

    The shuffle carries only (doc_id, band, band_hash); the final
    distinct pair set is collected (candidates ≪ corpus by LSH design
    — they bound the op's own output size)."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands, k=k
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    _empty = pd.DataFrame({"id_a": [], "id_b": []}).astype({"id_a": "int64", "id_b": "int64"})

    def _bucket_pairs(table: pa.Table) -> pa.Table:
        # one hash bucket = many whole (band, band_hash) groups; per-group
        # pair generation loops in-task (no Ray per-group overhead)
        df = table.to_pandas()
        outs = []
        for _, group in df.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(group[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True) if outs else _empty, preserve_index=False
        )

    pairs = bucketed_group_map(band_rows, ["band", "band_hash"], _bucket_pairs, num_buckets=32)
    # same pair can surface from several bands → distinct on (id_a, id_b)
    pairs = bucketed_group_map(
        pairs, ["id_a", "id_b"], dedup_in_bucket(["id_a", "id_b"], ["id_a"]), num_buckets=16
    )
    return pairs.to_pandas()


def _gather_candidate_texts(
    ds: ray.data.Dataset, id_col: str, text_col: str, need: np.ndarray, batch_size: int
) -> dict:
    """Second streaming pass over ``ds``: broadcast the sorted candidate
    id set, keep only matching rows. Returns {id: text} for candidates."""
    need_ref = ray.put(np.sort(need))

    def _filter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(wanted, ids)
        keep = (pos < len(wanted)) & (wanted[np.minimum(pos, len(wanted) - 1)] == ids)
        return batch.select([id_col, text_col]).filter(pa.array(keep))

    got = ds.map_batches(_filter, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    return dict(zip(got[id_col].to_numpy(), got[text_col]))


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
    """Near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash → NARROW band rows (doc_id, band, band_hash) →
    groupby (band, band_hash) shuffle → distinct candidate pairs →
    verification pass: signatures recomputed for candidate docs only
    (second pass over ``ds`` with a broadcast id filter), est_jaccard =
    full-signature agreement, filter ≥ threshold. Output identical to
    the round-1 sig-on-every-band-row version at a fraction of the
    shuffle bytes. ``ds`` is consumed twice — pass a re-readable source.
    """
    cand = _minhash_candidates(ds, id_col, text_col, num_perm, bands, k, concurrency, batch_size)
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    if len(cand) == 0:
        return ray.data.from_arrow(empty)
    need = np.unique(np.concatenate([cand["id_a"].to_numpy(), cand["id_b"].to_numpy()]))
    texts = _gather_candidate_texts(ds, id_col, text_col, need, batch_size)
    a, b = _perm_params(num_perm)
    sigs = _batch_signatures([texts.get(i) for i in need], num_perm, k, a, b)
    row = {int(i): j for j, i in enumerate(need)}
    sa = sigs[[row[int(i)] for i in cand["id_a"]]]
    sb = sigs[[row[int(i)] for i in cand["id_b"]]]
    est = (sa == sb).mean(axis=1)
    keep = est >= threshold
    if not keep.any():
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(cand["id_a"].to_numpy()[keep].astype(np.int64)),
                "id_b": pa.array(cand["id_b"].to_numpy()[keep].astype(np.int64)),
                "est_jaccard": pa.array(est[keep]),
            }
        )
    )


def minhash_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    threshold: float = 0.5,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """MinHash-LSH candidates verified by EXACT char-k-gram Jaccard ≥
    threshold — SQL-checkable near-dup dedup (the DuckDB n-gram Jaccard
    query is its oracle when LSH recall is 1, which holds whenever true
    pairs sit well above the banding threshold: at J ≥ 0.9 the per-pair
    miss probability with 16 bands × 4 rows is (1-0.9⁴)^16 ≈ 2e-9).
    Output (id_a, id_b, jaccard)."""
    cand = _minhash_candidates(ds, id_col, text_col, num_perm, bands, k, concurrency, batch_size)
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    if len(cand) == 0:
        return ray.data.from_arrow(empty)
    need = np.unique(np.concatenate([cand["id_a"].to_numpy(), cand["id_b"].to_numpy()]))
    texts = _gather_candidate_texts(ds, id_col, text_col, need, batch_size)
    grams = {
        int(i): np.unique(kgram_hashes((texts.get(i) or "").encode("utf-8", "ignore"), k))
        for i in need
    }
    ja = np.empty(len(cand), dtype=np.float64)
    for j, (ia, ib) in enumerate(zip(cand["id_a"], cand["id_b"])):
        ga, gb = grams[int(ia)], grams[int(ib)]
        if len(ga) == 0 and len(gb) == 0:
            ja[j] = 1.0
            continue
        inter = np.intersect1d(ga, gb, assume_unique=True).size
        ja[j] = inter / (len(ga) + len(gb) - inter)
    keep = ja >= threshold
    if not keep.any():
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(cand["id_a"].to_numpy()[keep].astype(np.int64)),
                "id_b": pa.array(cand["id_b"].to_numpy()[keep].astype(np.int64)),
                "jaccard": pa.array(ja[keep]),
            }
        )
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
    bands: int = 64,
    rbits: int = 4,
    threshold: float = 0.95,
    seed: int = 11,
    batch_size: int = 16384,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup via BANDED random-hyperplane LSH +
    exact cosine verification. Output (id_a, id_b, cosine), id_a < id_b.

    Round-1 postmortem: a single 12-bit band has all-bits-agree
    probability ~(1-θ/π)^12 ≈ 0.4% at cos 0.4 → recall ≈ 0. Banding
    fixes recall multiplicatively: P(miss) = (1 - p^rbits)^bands with
    p = 1 - θ/π; at cos 0.4 (p≈0.631) the default 64 bands × 4 bits
    gives P(miss) ≈ 1.6e-5 per pair. Tighter thresholds allow fewer,
    wider bands.

    Scale shape (three passes, all streaming):
    1. band rows — each doc emits ``bands`` NARROW rows (id, band,
       bucket ≤ 20 B); the embedding itself never shuffles.
    2. groupby (band, bucket) → candidate id pairs; cross-band dedup.
    3. verification gather: candidate ids are broadcast, a second pass
       over ``ds`` streams out only candidate unit vectors, and exact
       cosine filters ≥ threshold. Candidate pairs are assumed ≪ corpus
       (LSH selectivity) — they are the op's output, so they bound
       driver memory by definition.

    ``ds`` is consumed twice (banding + gather) — pass a re-readable
    source (e.g. ``read_parquet``), not an expensive upstream pipeline.
    """

    def _planes(d: int) -> np.ndarray:
        return np.random.default_rng(seed).standard_normal((d, bands * rbits))

    weights = (1 << np.arange(rbits, dtype=np.int64))[None, None, :]

    def _band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = list_to_matrix(batch[vec_col])
        planes = _planes(dim or emb.shape[1])
        bits = (emb @ planes) > 0  # (n, bands*rbits)
        buckets = (bits.reshape(len(ids), bands, rbits) * weights).sum(axis=2)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids.astype(np.int64), bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(ids))),
                "bucket": pa.array(buckets.reshape(-1)),
            }
        )

    rows = ds.map_batches(_band_rows, batch_format="pyarrow", batch_size=batch_size)

    _empty_pairs = pd.DataFrame({"id_a": [], "id_b": []}).astype(
        {"id_a": "int64", "id_b": "int64"}
    )

    def _bucket_pairs(table: pa.Table) -> pa.Table:
        df = table.to_pandas()
        outs = []
        for _, group in df.groupby(["band", "bucket"], sort=False):
            ids = np.unique(group[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True) if outs else _empty_pairs, preserve_index=False
        )

    cand = bucketed_group_map(rows, ["band", "bucket"], _bucket_pairs, num_buckets=32)
    # a pair can surface from many bands → distinct on (id_a, id_b)
    cand = bucketed_group_map(
        cand, ["id_a", "id_b"], dedup_in_bucket(["id_a", "id_b"], ["id_a"]), num_buckets=16
    )

    cand_df = cand.to_pandas()
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )
    if len(cand_df) == 0:
        return ray.data.from_arrow(empty)

    need = np.unique(np.concatenate([cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()]))
    need_ref = ray.put(np.sort(need))

    def _gather(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(wanted, ids)
        keep = (pos < len(wanted)) & (wanted[np.minimum(pos, len(wanted) - 1)] == ids)
        if not keep.any():
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "unit": pa.array([], type=pa.list_(pa.float64()))})
        emb = list_to_matrix(batch[vec_col])[keep]
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = emb / norm[:, None]
        return pa.table({id_col: pa.array(ids[keep]), "unit": matrix_to_list_array(unit)})

    got = ds.map_batches(_gather, batch_format="pyarrow", batch_size=batch_size)
    gtabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_columns]
    gt = pa.concat_tables(gtabs).combine_chunks()
    gids = gt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(gids)
    gids = gids[order]
    units = list_to_matrix(gt["unit"])[order]
    ua = units[np.searchsorted(gids, cand_df["id_a"].to_numpy())]
    ub = units[np.searchsorted(gids, cand_df["id_b"].to_numpy())]
    cos = np.einsum("ij,ij->i", ua, ub)
    keep = cos >= threshold
    out = pa.table(
        {
            "id_a": pa.array(cand_df["id_a"].to_numpy()[keep].astype(np.int64)),
            "id_b": pa.array(cand_df["id_b"].to_numpy()[keep].astype(np.int64)),
            "cosine": pa.array(cos[keep]),
        }
    )
    return ray.data.from_arrow(out if len(out) else empty)
