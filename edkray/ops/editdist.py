"""Edit-distance-1 similarity join via deletion neighborhoods — the
typo-pair miner of a web-text curation pipeline (finds near-identical
vocabulary entries without an all-pairs scan).

Candidate generation is the classic SymSpell/deletion-neighborhood
trick: every token emits itself plus each single-character deletion as
a bucket key. Two tokens are within edit distance 1 iff they share a
key — substitution pairs share the same-position deletion, indel pairs
share the shorter token itself — so the all-pairs O(V²) scan becomes
ONE hash shuffle on bucket keys whose group sizes are bounded by the
neighborhood fan-in, then an exact vectorized verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["ed1_pairs", "ed1_mask"]


def _pad_matrix(strs: np.ndarray, width: int) -> np.ndarray:
    """(n,) unicode array → (n, width) uint32 codepoint matrix, 0-padded."""
    out = np.zeros((len(strs), width), dtype=np.uint32)
    if len(strs):
        buf = strs.astype(f"U{width}")
        out[:] = buf.view(np.uint32).reshape(len(strs), width)
    return out


def ed1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact check: edit_distance(a_i, b_i) == 1 for each
    pair. Handles substitution (equal length, exactly one mismatch) and
    single indel (length delta 1, suffix realigns after the first
    mismatch); any other length delta is False."""
    a = np.asarray(a, dtype="U64")
    b = np.asarray(b, dtype="U64")
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    # orient so a is the shorter (indel case checks deletion from b)
    swap = la > lb
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    la2 = np.where(swap, lb, la)
    lb2 = np.where(swap, la, lb)
    width = int(max(lb2.max(initial=1), 1)) + 1
    A = _pad_matrix(a2, width)
    B = _pad_matrix(b2, width)
    pos = np.arange(width)[None, :]
    valid_a = pos < la2[:, None]

    out = np.zeros(len(a), dtype=bool)
    # substitution: same length, exactly one differing position
    eq_len = la2 == lb2
    mism = ((A != B) & valid_a).sum(axis=1)
    out |= eq_len & (mism == 1)
    # single indel: |len delta| == 1; find first mismatch i of A vs B,
    # then require A[i:] == B[i+1:]
    indel = lb2 == la2 + 1
    if indel.any():
        neq = (A != B) & valid_a
        # first mismatch index (la if prefixes agree fully)
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), la2)
        shifted_eq = A[:, :-1] == B[:, 1:]  # A[j] == B[j+1]
        after = pos[:, : width - 1] >= first[:, None]
        in_a = pos[:, : width - 1] < la2[:, None]
        suffix_ok = ~(after & in_a & ~shifted_eq)
        out |= indel & suffix_ok.all(axis=1)
    return out


def ed1_pairs(
    tokens: ray.data.Dataset,
    col: str = "tok",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """All unordered pairs of DISTINCT tokens at edit distance exactly 1.
    ``tokens`` must already be distinct on ``col`` (dedupe upstream).
    Output: (tok_a, tok_b) with tok_a < tok_b, each pair once.

    Scale: each token fans out to len+1 bucket keys; groups are
    neighborhood-sized (alphabet × length), so pair generation inside a
    bucket is tiny. A pair can share up to 2 keys (same-position
    deletion + the shorter token itself appearing as a full key), so
    pairs are deduped by one narrow distinct shuffle on the pair
    itself.
    """
    from edkray.ops.aggregate import distinct

    def _keys(b: pa.Table) -> pa.Table:
        toks = b[col].to_pylist()
        ks, ts = [], []
        for t in toks:
            ks.append(t)
            ts.append(t)
            for i in range(len(t)):
                ks.append(t[:i] + t[i + 1:])
                ts.append(t)
        return pa.table({"__k": pa.array(ks, pa.string()),
                         col: pa.array(ts, pa.string())})

    keyed = tokens.map_batches(_keys, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        toks = np.unique(np.asarray(group[col].to_pylist(), dtype="U64"))
        if len(toks) < 2:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string())})
        ia, ib = np.triu_indices(len(toks), k=1)
        a, b = toks[ia], toks[ib]
        m = ed1_mask(a, b)
        return pa.table({"tok_a": pa.array(a[m]), "tok_b": pa.array(b[m])})

    cand = keyed.groupby("__k").map_groups(_pairs, batch_format="pyarrow")
    return distinct(cand, ["tok_a", "tok_b"])
