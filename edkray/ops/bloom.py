"""Bloom-prefiltered incremental dedup: new-batch vs existing-corpus.

Generalizes the reference's probe-before-download resume semantics
(reference earth_data_kit/stitching/engines/earth_engine.py:58-119 skips
tiles the local cache already holds) to record level: an incremental
ingest keeps only the rows of a NEW batch whose key is absent from the
already-ingested CORPUS, without shuffling the corpus payload.

Scale shape (10^12-row corpus, new batch ≪ corpus):

- The corpus is only ever SCANNED projected to its key columns — its
  payload never leaves storage and its keys never shuffle.
- A Bloom filter over corpus keys (built once per corpus version, ~10
  bits/key for ~1% FPR at num_hashes=7; reusable across batches) is
  broadcast via ``ray.put``. Bloom-NEGATIVE new rows are definitely
  absent from the corpus and bypass all further work.
- Bloom-POSITIVE rows ("suspects" — true hits + FPR·|new| false
  positives) are verified EXACTLY, so the result is precise regardless
  of the filter's error rate:
  ``verify_mode="broadcast"`` (default under ``broadcast_limit``):
  suspect keys are collected once (bounded by the suspect count, NOT
  the corpus), the corpus key-scan is prefiltered by suspect-hash
  ``searchsorted`` then exact-matched with a polars join; the matched
  key set (≤ suspects) broadcasts back for the final anti-filter.
  ``verify_mode="shuffle"``: no driver key set — corpus keys (narrow)
  and suspect rows co-shuffle through ``bucketed_group_map`` and each
  bucket drops suspects whose key meets a corpus row. Suspects carry
  payload through one exchange; the corpus still ships keys only.
  ``"auto"`` picks broadcast while the suspect count fits
  ``broadcast_limit``, else shuffle — mirroring the dedup winner-key
  ``wk_mode="auto"`` contract (pipelines/spatial.py).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
import ray.data

from edkray.ops.shuffle import _key_hash, bucketed_group_map

_SIDE = "__sside"
_FLAG = "__suspect"


def _positions(h: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(num_hashes, n) bit positions via Kirsch–Mitzenmacher double
    hashing: pos_i = h1 + i*h2 mod num_bits, h2 forced odd."""
    h1 = h.astype(np.uint64, copy=False)
    h2 = ((h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(num_bits)


def bloom_build(
    ds: ray.data.Dataset,
    key_cols: list[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    seed: int = 101,
) -> np.ndarray:
    """Build a Bloom bitmap (packed uint64 words) over ``key_cols``.

    One partial bitmap per input block (map_batches(batch_size=None)),
    OR-folded on the driver STREAMING via iter_batches — at most two
    bitmaps resident at once, never the corpus. num_bits/8 bytes per
    block of driver traffic; size num_bits ≈ 10× the corpus key count
    (the bitmap must fit one worker's heap — it broadcasts to the
    prefilter stage)."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    words = num_bits // 64

    def _partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        if len(batch):
            pos = _positions(_key_hash(batch, key_cols, seed), num_bits, num_hashes)
            flat = pos.ravel()
            # bitwise_or.at handles duplicate word indices correctly
            np.bitwise_or.at(bm, flat >> np.uint64(6), np.uint64(1) << (flat & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.view(np.uint8).tobytes()], type=pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    out = np.zeros(words, dtype=np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["bm"]:
            out |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return out


def bloom_test(
    bloom: np.ndarray, h: np.ndarray, num_bits: int, num_hashes: int
) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (no false
    negatives by construction), False = definitely absent."""
    if not len(h):
        return np.zeros(0, dtype=bool)
    pos = _positions(h, num_bits, num_hashes)
    bits = (bloom[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=0)


def _pad_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Align ``table`` to ``schema`` (missing columns null-filled) for a
    union — the same padding rule as dedup._bucketed_verify's _tag."""
    cols = []
    for f in schema:
        if f.name in table.schema.names:
            cols.append(table[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(len(table), type=f.type))
    return pa.table(cols, schema=schema)


def incremental_dedup(
    new_ds: ray.data.Dataset,
    corpus_ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    seed: int = 101,
    verify_mode: str = "auto",
    broadcast_limit: int = 2_000_000,
    num_buckets: int = 32,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Rows of ``new_ds`` to ingest: first occurrence per ``key_cols``
    (by ``order_cols`` ascending) among new rows whose key is absent
    from ``corpus_ds``. EXACT output — the Bloom filter only routes
    work; every positive is verified against real corpus key values.
    """
    if verify_mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"verify_mode must be auto|broadcast|shuffle, got {verify_mode!r}")
    from edkray.ops.dedup import exact_dedup

    corpus_keys = corpus_ds.select_columns(key_cols)
    bloom = bloom_build(corpus_keys, key_cols, num_bits, num_hashes, seed)
    bloom_ref = ray.put(bloom)

    fresh = exact_dedup(new_ds, key_cols, order_cols, num_buckets, batch_size)

    def _flag(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        sus = bloom_test(bm, _key_hash(batch, key_cols, seed), num_bits, num_hashes)
        if _FLAG in batch.schema.names:
            batch = batch.drop_columns([_FLAG])
        return batch.append_column(_FLAG, pa.array(sus))

    # materialized once: the tagged new batch is read by the suspect-key
    # pass and the final filter (new-batch-sized — the working set an
    # incremental ingest holds by definition, never the corpus)
    tagged = fresh.map_batches(_flag, batch_format="pyarrow", batch_size=batch_size).materialize()

    def _count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"c": pa.array([pc.sum(batch[_FLAG]).as_py() or 0], type=pa.int64())})

    n_suspect = int(
        tagged.map_batches(_count, batch_format="pyarrow", batch_size=None).sum("c") or 0
    )

    def _slice(flag_value: bool):
        def _f(batch: pa.Table) -> pa.Table:
            mask = batch[_FLAG].to_numpy(zero_copy_only=False).astype(bool)
            sel = batch.take(pa.array(np.flatnonzero(mask if flag_value else ~mask)))
            return sel.drop_columns([_FLAG])

        return _f

    mode = verify_mode
    if mode == "auto":
        mode = "broadcast" if n_suspect <= broadcast_limit else "shuffle"

    if n_suspect == 0:
        return tagged.drop_columns([_FLAG])

    if mode == "broadcast":
        # suspect keys: bounded by the suspect count (true dups + FPR·new)
        sus_parts = [
            pl.from_arrow(b.select(key_cols + [_FLAG])).filter(pl.col(_FLAG)).drop(_FLAG)
            for b in tagged.select_columns(key_cols + [_FLAG]).iter_batches(
                batch_format="pyarrow", batch_size=batch_size
            )
        ]
        sus_pl = pl.concat(sus_parts).unique(subset=key_cols)
        sus_hash = np.sort(
            sus_pl.select(pl.struct(key_cols).hash(seed=seed).alias("h"))["h"].to_numpy()
        )
        sus_ref = ray.put((sus_hash, sus_pl))

        def _matched(batch: pa.Table) -> pa.Table:
            hashes, keys_df = ray.get(sus_ref)
            h = _key_hash(batch, key_cols, seed)
            p = np.searchsorted(hashes, h)
            p = np.minimum(p, len(hashes) - 1)
            maybe = hashes[p] == h
            if not maybe.any():
                return keys_df.head(0).to_arrow()
            # exact key-value match (hash prefilter only prunes)
            cand = pl.from_arrow(batch.take(pa.array(np.flatnonzero(maybe))))
            return (
                cand.join(keys_df, on=key_cols, how="semi")
                .unique(subset=key_cols)
                .select(key_cols)
                .to_arrow()
            )

        hit = corpus_keys.map_batches(_matched, batch_format="pyarrow", batch_size=batch_size)
        hit_pl = pl.concat(
            [pl.from_arrow(b) for b in hit.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [sus_pl.head(0)]
        ).unique(subset=key_cols)
        hit_ref = ray.put(hit_pl)

        def _final(batch: pa.Table) -> pa.Table:
            matched = ray.get(hit_ref)
            df = pl.from_arrow(batch)
            keep = df.filter(~pl.col(_FLAG)).drop(_FLAG)
            sus = df.filter(pl.col(_FLAG)).drop(_FLAG)
            if len(sus) and len(matched):
                sus = sus.join(matched.cast({c: sus.schema[c] for c in key_cols}), on=key_cols, how="anti")
            return pl.concat([keep, sus]).to_arrow()

        return tagged.map_batches(_final, batch_format="pyarrow", batch_size=batch_size)

    # shuffle verify: corpus ships NARROW key rows; suspects ship payload
    # once. Per bucket: drop suspects whose key meets any corpus row.
    suspects = tagged.map_batches(_slice(True), batch_format="pyarrow", batch_size=batch_size)
    negatives = tagged.map_batches(_slice(False), batch_format="pyarrow", batch_size=batch_size)
    out_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(tagged.schema().names, tagged.schema().types) if n != _FLAG]
    )
    union_schema = out_schema.append(pa.field(_SIDE, pa.int8()))

    def _tag_corpus(batch: pa.Table) -> pa.Table:
        t = _pad_to(batch, out_schema)
        return t.append_column(_SIDE, pa.array(np.zeros(len(t), dtype=np.int8)))

    def _tag_suspect(batch: pa.Table) -> pa.Table:
        t = _pad_to(batch, out_schema)
        return t.append_column(_SIDE, pa.array(np.ones(len(t), dtype=np.int8)))

    routed = corpus_keys.map_batches(_tag_corpus, batch_format="pyarrow", batch_size=batch_size).union(
        suspects.map_batches(_tag_suspect, batch_format="pyarrow", batch_size=batch_size)
    )

    def _verify(table: pa.Table) -> pa.Table:
        if table.schema.names != union_schema.names:
            table = table.select(union_schema.names)
        df = pl.from_arrow(table)
        present = df.filter(pl.col(_SIDE) == 0).select(key_cols).unique()
        out = df.filter(pl.col(_SIDE) == 1).join(present, on=key_cols, how="anti")
        return out.drop(_SIDE).to_arrow().cast(out_schema)

    survivors = bucketed_group_map(routed, key_cols, _verify, num_buckets, batch_size)
    return negatives.union(survivors)
