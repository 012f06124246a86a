"""Distributed connected components over duplicate-pair edge lists.

The training-pipeline step AFTER near-dup pair mining: the pairs
emitted by ``minhash_lsh_pairs`` / ``simhash_pairs`` /
``embedding_dup_pairs`` are edges of a duplicate graph, and the actual
keep/drop decision needs that graph's connected components (cluster id
= min doc id in the component; keep exactly the representative). The
reference engine has no graph step — its BuildVRT last-wins ordering
(stitching/classes.py) resolves overlaps pairwise — but at corpus scale
near-dup sets are transitive chains (A~B, B~C with A!~C), so pairwise
drop rules either over- or under-delete; components are the standard
fix (the SlimPajama / BigCode dedup pipelines do exactly this).

Algorithm: hash-to-min (Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds", ICDE 2013) over an EXPLODED
state relation of (node, member) pairs meaning ``member ∈ C(node)``:

    init:  C(v) = {v} ∪ N(v)
    round: every node v with m = min C(v) sends C(v) to m and {m}
           to every u ∈ C(v); new C(v) = union of received sets
    fixed point: C(min) = its whole component, C(v≠min) = {min}

Each round is ONE bucketed shuffle (``hash(node) % num_buckets`` via
:func:`edkray.ops.shuffle.bucketed_group_map`) whose per-bucket kernel
is fully vectorized: ``np.lexsort`` + boundary flags dedupe the pair
relation, per-node mins fall out of the sort order, and both message
families are emitted with ``np.repeat`` — no per-node Python loop.

Convergence is detected EXACTLY (whp): the state is a *set* of pairs,
so each bucket kernel folds an order-independent signature — XOR of
``splitmix64(node) ^ splitmix64(member)`` plus a row count — emitted as
two sentinel rows (node = -1 / -2). The driver XORs/sums the bucket
sentinels per round; two identical consecutive (signature, count)
pairs mean the round operator hit a fixed point, and hash-to-min's
fixed points are exactly the converged form above. Rounds are
O(log diameter) — 2-3 for the near-clique components LSH produces.

Scale: only doc ids ever shuffle (16 B/pair); documents never move.
The state relation is O(Σ component size) at the fixed point (the min
node of each component holds the full member set) — i.e. proportional
to the number of DUPLICATED docs, a small fraction of a 10^12-doc
corpus, and each round's message volume is ≤ 2× state. One driver-side
scalar (signature, count) per round is the only materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .shuffle import bucketed_group_map

NODE = "node"
MEMBER = "member"
_SIG_NODE = -1  # sentinel row carrying the bucket's state signature
_CNT_NODE = -2  # sentinel row carrying the bucket's deduped row count


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 array (specified mix,
    same constants as utils.fnv1a64_int)."""
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _dedup_sorted(n: np.ndarray, m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort (node, member) pairs by node then member and drop exact
    duplicates. Returns the deduped sorted columns."""
    order = np.lexsort((m, n))
    n, m = n[order], m[order]
    if len(n):
        keep = np.empty(len(n), dtype=bool)
        keep[0] = True
        np.not_equal(n[1:], n[:-1], out=keep[1:])
        keep[1:] |= m[1:] != m[:-1]
        n, m = n[keep], m[keep]
    return n, m


def _round_kernel(table: pa.Table) -> pa.Table:
    """One hash-to-min round for one bucket: merge incoming messages
    into the bucket's state C(v), then emit next-round messages plus
    the bucket's state-signature sentinels."""
    n = table[NODE].to_numpy(zero_copy_only=False).astype(np.int64)
    m = table[MEMBER].to_numpy(zero_copy_only=False).astype(np.int64)
    real = n >= 0  # drop sentinel rows from the previous round
    n, m = _dedup_sorted(n[real], m[real])
    if not len(n):
        return pa.table({NODE: pa.array([], type=pa.int64()),
                         MEMBER: pa.array([], type=pa.int64())})

    # state signature (order-independent): xor-fold + count
    sig = np.bitwise_xor.reduce(_mix64(n) ^ _mix64(~m))
    starts = np.empty(len(n), dtype=bool)
    starts[0] = True
    np.not_equal(n[1:], n[:-1], out=starts[1:])
    # sorted by member within node → per-node min is the group head
    minv = np.repeat(m[starts], np.diff(np.flatnonzero(np.append(starts, True))))

    # messages: C(v) → min  and  {min} → every u ∈ C(v)
    out_n = np.concatenate([minv, m, [np.int64(_SIG_NODE)], [np.int64(_CNT_NODE)]])
    out_m = np.concatenate([m, minv, [sig.astype(np.int64)], [np.int64(len(n))]])
    return pa.table({NODE: pa.array(out_n), MEMBER: pa.array(out_m)})


def _label_kernel(table: pa.Table) -> pa.Table:
    """Final pass: per-node min member = the component id."""
    n = table[NODE].to_numpy(zero_copy_only=False).astype(np.int64)
    m = table[MEMBER].to_numpy(zero_copy_only=False).astype(np.int64)
    real = n >= 0
    n, m = _dedup_sorted(n[real], m[real])
    if not len(n):
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64())})
    starts = np.empty(len(n), dtype=bool)
    starts[0] = True
    np.not_equal(n[1:], n[:-1], out=starts[1:])
    return pa.table({"doc_id": pa.array(n[starts]), "cluster_id": pa.array(m[starts])})


def _round_signature(msgs: ray.data.Dataset) -> tuple[int, int]:
    """Fold the per-bucket sentinel rows into one (xor-signature, count)
    scalar pair — the only driver-side materialization per round."""

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch[NODE].to_numpy(zero_copy_only=False)
        m = batch[MEMBER].to_numpy(zero_copy_only=False)
        sigs = m[n == _SIG_NODE].astype(np.int64)
        cnts = m[n == _CNT_NODE].astype(np.int64)
        sig = np.bitwise_xor.reduce(sigs) if len(sigs) else np.int64(0)
        return pa.table({"sig": pa.array([sig]), "cnt": pa.array([int(cnts.sum())])})

    parts = msgs.map_batches(_partial, batch_format="pyarrow").take_all()
    sig, cnt = 0, 0
    for row in parts:
        sig ^= int(row["sig"])
        cnt += int(row["cnt"])
    return sig, cnt


def connected_components(
    pairs: ray.data.Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    num_buckets: int = 32,
    max_iter: int = 32,
) -> ray.data.Dataset:
    """Connected components of the undirected graph given by an edge
    list. Returns a Dataset of (doc_id, cluster_id) covering every node
    that appears in an edge, with cluster_id = min doc id reachable.

    ``num_buckets`` bounds per-task memory exactly as in
    :func:`bucketed_group_map`; at corpus scale size it to
    Σ component sizes / target rows per task.
    """

    def _init(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # C(v) = {v} ∪ N(v), exploded
        return pa.table({
            NODE: pa.array(np.concatenate([a, a, b, b])),
            MEMBER: pa.array(np.concatenate([a, b, b, a])),
        })

    msgs = pairs.map_batches(_init, batch_format="pyarrow")
    prev: tuple[int, int] | None = None
    for _ in range(max_iter):
        msgs = bucketed_group_map(msgs, [NODE], _round_kernel,
                                  num_buckets=num_buckets).materialize()
        cur = _round_signature(msgs)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(diameter > 2^{max_iter} is impossible — raise max_iter only "
            f"if the input graph is adversarial)"
        )
    out = bucketed_group_map(msgs, [NODE], _label_kernel, num_buckets=num_buckets)
    # Zero input edges → every block empty → Ray loses the schema
    # (ds.schema() is None and downstream joins crash). Anchor the
    # fixed (doc_id, cluster_id) int64 schema with one 0-row block.
    return out.union(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64()),
    })))


def dedup_decisions(
    pairs: ray.data.Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Cluster near-dup pairs and emit the keep/drop decision: one row
    per clustered doc with its cluster id and ``keep`` = true iff the
    doc is the cluster representative (min id). Docs in no pair are
    implicitly kept and not emitted (filter-join the decision table
    against the corpus as a broadcast or bucketed semi-join)."""
    labels = connected_components(pairs, a_col=a_col, b_col=b_col,
                                  num_buckets=num_buckets)

    def _keep(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        c = batch["cluster_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("keep", pa.array(d == c))

    return labels.map_batches(_keep, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    num_iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    batch_size: int = 65536,
    mode: str = "auto",
    dense_limit: int = 30_000_000,
) -> ray.data.Dataset:
    """Distributed PageRank power iteration over an edge list — link
    analysis for web corpora (quality priors for crawl selection; the
    Common-Crawl harmonic/PageRank ranking step). The reference engine
    has no graph analytics; this extends the dedup components family.

    Semantics (pinned, SQL-replayable): rank_0(v) = 1/N over the node
    set {src} ∪ {dst}; each iteration

        rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} rank_t(u)/outdeg(u)

    Dangling nodes (no out-edges) contribute nothing — their mass is
    dropped, the "ignore dangling" PageRank variant, so ranks sum to
    < 1 when they exist; the oracle replays the same rule. Duplicate
    edges count once per occurrence (a multigraph).

    Two execution modes (the A5 driver-bound-with-fallback contract):

    - ``mode="dense"`` (auto default while the node count fits
      ``dense_limit``): node ids index into a broadcast sorted array;
      each iteration is ONE streaming pass over the pre-indexed edge
      blocks — per block a vectorized ``np.bincount`` partial rank
      vector — folded on the driver (two vectors resident at once).
      No shuffle at all per iteration; edges never move after the
      one-time out-degree attach. Driver traffic = blocks × 8·N bytes
      per iteration, hence the ENFORCED ``dense_limit`` bound.
    - ``mode="shuffle"`` (auto fallback past the bound): per iteration
      one co-shuffle of (edges ∪ rank rows) on the source node via
      :func:`bucketed_group_map` (the per-bucket kernel joins rank to
      edges vectorized in polars, partial-sums contributions by
      destination inside the bucket, and emits the base term from the
      rank side so every node survives), then one bucketed polars sum
      on the destination — NOT the native per-key groupby (the
      top_revenue_orders lesson). Only (node id, float) pairs move;
      rank state checkpoints per iteration via ``materialize()`` — the
      iterative-frontier persistence every fixed-point algorithm needs
      (a production run would swap it for a partitioned parquet
      checkpoint and reuse the edge bucketing across iterations; Ray
      Data has no co-partition cache primitive, so edges re-shuffle
      per iteration here).
    """
    import polars as pl


    if mode not in ("auto", "dense", "shuffle"):
        raise ValueError(f"mode must be auto|dense|shuffle, got {mode!r}")

    # --- dense path: no shuffle anywhere ------------------------------
    # Node set, out-degree, indexing and every iteration are driver-
    # folded vectors bounded by dense_limit; the decision needs the
    # node count, which the dense node-set fold itself produces — so
    # in auto mode we TRY the dense fold with a hard cap and fall back
    # when it trips (the same try-then-fallback shape as the flagship's
    # count-bound salting).
    if mode in ("auto", "dense"):
        cap = dense_limit if mode == "auto" else max(dense_limit, 1)

        def _uniq(batch: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate([
                    batch[src].to_numpy(zero_copy_only=False).astype(np.int64),
                    batch[dst].to_numpy(zero_copy_only=False).astype(np.int64),
                ])
            )
            return pa.table({"node": pa.array(u)})

        parts = []
        total = 0
        overflow = False
        per_block = edges.map_batches(_uniq, batch_format="pyarrow", batch_size=None)
        for bb in per_block.iter_batches(batch_format="pyarrow", batch_size=None):
            arr = bb["node"].to_numpy(zero_copy_only=False)
            parts.append(arr)
            total += len(arr)
            if total > 4 * cap:  # block-level uniques can overlap ≤ blocks×
                overflow = True
                break
        node_ids = None
        if not overflow:
            node_ids = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
            if len(node_ids) > cap:
                overflow = True
        del parts
        if overflow:
            if mode == "dense":
                raise ValueError(
                    f"dense pagerank needs the node set on the driver; it exceeds "
                    f"dense_limit={dense_limit} — raise it explicitly or use mode='shuffle'"
                )
            mode = "shuffle"
        else:
            n_nodes = len(node_ids)
            base = (1.0 - damping) / n_nodes
            ids_ref = ray.put(node_ids)

            def _index(batch: pa.Table) -> pa.Table:
                ids = ray.get(ids_ref)
                return pa.table({
                    "si": pa.array(np.searchsorted(
                        ids, batch[src].to_numpy(zero_copy_only=False)).astype(np.int64)),
                    "di": pa.array(np.searchsorted(
                        ids, batch[dst].to_numpy(zero_copy_only=False)).astype(np.int64)),
                })

            eidx = edges.map_batches(
                _index, batch_format="pyarrow", batch_size=batch_size
            ).materialize()

            # out-degree: one driver-folded bincount pass (same bound)
            outdeg = np.zeros(n_nodes, dtype=np.int64)
            for bb in eidx.map_batches(
                lambda b: pa.table({"v": pa.array(
                    [np.bincount(b["si"].to_numpy(zero_copy_only=False),
                                 minlength=n_nodes).astype(np.int64).tobytes()],
                    type=pa.binary())}),
                batch_format="pyarrow", batch_size=None,
            ).iter_batches(batch_format="pyarrow", batch_size=None):
                for buf in bb["v"]:
                    outdeg += np.frombuffer(buf.as_py(), dtype=np.int64)
            od_ref = ray.put(np.maximum(outdeg, 1))  # guard: si rows imply outdeg ≥ 1

            rank_vec = np.full(n_nodes, 1.0 / n_nodes)
            for _ in range(num_iters):
                rref = ray.put(rank_vec)

                def _partial(batch: pa.Table) -> pa.Table:
                    r = ray.get(rref)
                    od = ray.get(od_ref)
                    si = batch["si"].to_numpy(zero_copy_only=False)
                    w = r[si] * damping / od[si]
                    v = np.bincount(
                        batch["di"].to_numpy(zero_copy_only=False),
                        weights=w, minlength=n_nodes,
                    )
                    return pa.table({"v": pa.array([v.tobytes()], type=pa.binary())})

                acc = np.full(n_nodes, base)
                for bb in eidx.map_batches(
                    _partial, batch_format="pyarrow", batch_size=None
                ).iter_batches(batch_format="pyarrow", batch_size=None):
                    for buf in bb["v"]:
                        acc += np.frombuffer(buf.as_py(), dtype=np.float64)
                rank_vec = acc

            out = pa.table({"node": pa.array(node_ids), "rank": pa.array(rank_vec)})
            return ray.data.from_arrow(out)

    # --- shuffle path: everything bucketed, nothing driver-sized ------
    def _deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch[src].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({src: pa.array(u.astype(np.int64)),
                         "__outdeg": pa.array(c.astype(np.int64))})

    def _deg_sum(table: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(table)
            .group_by(src)
            .agg(pl.col("__outdeg").sum())
            .to_arrow()
        )

    deg = bucketed_group_map(
        edges.map_batches(_deg_partial, batch_format="pyarrow", batch_size=batch_size),
        [src], _deg_sum, num_buckets, batch_size,
    )

    # attach outdeg to edges once (small co-shuffle, reused every iter)
    def _attach(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table)
        e = df.filter(pl.col("__side") == 0).select([src, dst])
        d = df.filter(pl.col("__side") == 1).select([src, "__outdeg"])
        return e.join(d, on=src, how="inner").to_arrow()

    def _tag(side: int, with_deg: bool):
        def _f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {
                src: batch[src],
                dst: batch[dst] if dst in batch.schema.names else pa.nulls(n, pa.int64()),
                "__outdeg": batch["__outdeg"].cast(pa.int64())
                if with_deg
                else pa.nulls(n, pa.int64()),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            return pa.table(cols)

        return _f

    routed = edges.map_batches(_tag(0, False), batch_format="pyarrow", batch_size=batch_size).union(
        deg.map_batches(_tag(1, True), batch_format="pyarrow", batch_size=batch_size)
    )
    edges_deg = bucketed_group_map(routed, [src], _attach, num_buckets, batch_size).materialize()

    # node set = {src} ∪ {dst}, bucketed distinct (NOT the native
    # per-key groupby — 10^8-node graphs would hit the sort wall)
    def _both(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch[src].to_numpy(zero_copy_only=False).astype(np.int64),
            batch[dst].to_numpy(zero_copy_only=False).astype(np.int64),
        ]))
        return pa.table({"node": pa.array(u)})

    def _uniq_bucket(table: pa.Table) -> pa.Table:
        return pl.from_arrow(table).unique(subset=["node"]).to_arrow()

    nodes = bucketed_group_map(
        edges.map_batches(_both, batch_format="pyarrow", batch_size=batch_size),
        ["node"], _uniq_bucket, num_buckets, batch_size,
    ).materialize()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    rank = nodes.map_batches(
        lambda b: b.append_column("rank", pa.array(np.full(len(b), 1.0 / n_nodes))),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()

    def _tag_e(batch: pa.Table) -> pa.Table:
        return pa.table({
            src: batch[src].cast(pa.int64()),
            dst: batch[dst].cast(pa.int64()),
            "__outdeg": batch["__outdeg"].cast(pa.int64()),
            "rank": pa.nulls(len(batch), pa.float64()),
            "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    def _tag_r(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            src: batch["node"].cast(pa.int64()),
            dst: pa.nulls(n, pa.int64()),
            "__outdeg": pa.nulls(n, pa.int64()),
            "rank": batch["rank"].cast(pa.float64()),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def _contrib(table: pa.Table) -> pa.Table:
        df = pl.from_arrow(table)
        e = df.filter(pl.col("__side") == 0).select([src, dst, "__outdeg"])
        r = df.filter(pl.col("__side") == 1).select([src, "rank"])
        c = (
            e.join(r, on=src, how="inner")
            .select(
                pl.col(dst).alias("node"),
                (pl.col("rank") * damping / pl.col("__outdeg")).alias("w"),
            )
            # partial-sum by destination INSIDE the bucket: shrinks the
            # second exchange to ≤ one row per (bucket, node)
            .group_by("node")
            .agg(pl.col("w").sum())
        )
        b = r.select(pl.col(src).alias("node"), pl.lit(base, dtype=pl.Float64).alias("w"))
        return pl.concat([c, b]).to_arrow()

    def _sum_rank(table: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(table)
            .group_by("node")
            .agg(pl.col("w").sum().alias("rank"))
            .to_arrow()
        )

    for _ in range(num_iters):
        routed = edges_deg.map_batches(
            _tag_e, batch_format="pyarrow", batch_size=batch_size
        ).union(rank.map_batches(_tag_r, batch_format="pyarrow", batch_size=batch_size))
        msgs = bucketed_group_map(routed, [src], _contrib, num_buckets, batch_size)
        rank = bucketed_group_map(
            msgs, ["node"], _sum_rank, num_buckets, batch_size
        ).materialize()

    return rank


# ----------------------------------------------------------------------
# Triangle counting — degree-ordered wedge generation (the MapReduce
# classic: Cohen '09 / Suri & Vassilvitskii WWW'11). Third graph op,
# next to connected components and PageRank above.


def triangle_count(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "pa.Table":
    """Exact global triangle count of the undirected simple graph
    spanned by an edge stream (duplicates / self-loops / direction
    ignored). Returns a one-row pa.Table ``(n_triangles:int64)``.

    Why degree ordering: generating wedges (2-paths) around EVERY
    vertex is Σ deg(v)² — a power-law hub makes one task quadratic.
    Orienting each edge from its lower-(deg,id) endpoint to the higher
    bounds every out-degree by O(√m), so the wedge stream is O(m^1.5)
    TOTAL and no single vertex group explodes (Suri & Vassilvitskii's
    MR-NodeIterator++ bound) — the same hub-skew discipline as the
    salted shuffles elsewhere in this repo.

    Stages (all bucketed, nothing materializes driver-side but one
    scalar per bucket):
      1. canonicalize (lo,hi) + distinct — one co-shuffle;
      2. degrees — per-batch pre-agg counts, bucketed sum;
      3. annotate both endpoints with degrees — two bucketed joins;
      4. orient by (deg,id); wedges per origin — one bucketed
         group-map whose kernel is a vectorized polars self-join,
         pre-aggregated to (x,y,cnt);
      5. close wedges against the canonical edge set — tagged-union
         co-shuffle + per-bucket inner join; driver sums O(buckets)
         partial scalars.
    """
    import polars as pl

    from .joins import bucketed_join

    def _canon(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            pl.col(src).cast(pl.Int64).alias("__s"),
            pl.col(dst).cast(pl.Int64).alias("__t"),
        ).drop_nulls()
        df = df.filter(pl.col("__s") != pl.col("__t"))
        return df.select(
            pl.min_horizontal("__s", "__t").alias("a"),
            pl.max_horizontal("__s", "__t").alias("b"),
        ).unique().to_arrow()

    canon = edges.map_batches(_canon, batch_format="pyarrow", batch_size=batch_size)
    e = bucketed_group_map(
        canon, ["a", "b"],
        lambda t: pl.from_arrow(t).select(["a", "b"]).unique().to_arrow(),
        num_buckets=num_buckets,
    ).materialize()  # reused three times below (degrees, orient, closure)

    def _deg_pre(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        both = pl.concat([df.select(pl.col("a").alias("node")),
                          df.select(pl.col("b").alias("node"))])
        return both.group_by("node").agg(pl.len().cast(pl.Int64).alias("deg")).to_arrow()

    deg = bucketed_group_map(
        e.map_batches(_deg_pre, batch_format="pyarrow"),
        ["node"],
        lambda t: pl.from_arrow(t).group_by("node").agg(pl.col("deg").sum()).to_arrow(),
        num_buckets=num_buckets,
    )

    da = deg.map_batches(
        lambda b: pl.from_arrow(b).rename({"deg": "deg_a"}).to_arrow(),
        batch_format="pyarrow")
    db = deg.map_batches(
        lambda b: pl.from_arrow(b).rename({"deg": "deg_b"}).to_arrow(),
        batch_format="pyarrow")
    withdeg = bucketed_join(
        bucketed_join(e, da, on=["a"], right_on=["node"], num_buckets=num_buckets),
        db, on=["b"], right_on=["node"], num_buckets=num_buckets,
    )

    def _orient(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        a_first = (pl.col("deg_a") < pl.col("deg_b")) | (
            (pl.col("deg_a") == pl.col("deg_b")) & (pl.col("a") < pl.col("b")))
        return df.select(
            pl.when(a_first).then(pl.col("a")).otherwise(pl.col("b")).alias("u"),
            pl.when(a_first).then(pl.col("b")).otherwise(pl.col("a")).alias("v"),
            pl.when(a_first).then(pl.col("deg_b")).otherwise(pl.col("deg_a")).alias("dv"),
        ).to_arrow()

    oriented = withdeg.map_batches(_orient, batch_format="pyarrow")

    def _wedges(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).select(["u", "v", "dv"])
        w = df.join(df, on="u", suffix="_r").filter(
            (pl.col("dv") < pl.col("dv_r"))
            | ((pl.col("dv") == pl.col("dv_r")) & (pl.col("v") < pl.col("v_r")))
        )
        # normalize the wedge pair to id order (the canonical edge key)
        return (w.select(
            pl.min_horizontal("v", "v_r").alias("a"),
            pl.max_horizontal("v", "v_r").alias("b"),
        ).group_by(["a", "b"]).agg(pl.len().cast(pl.Int64).alias("cnt")).to_arrow())

    wedges = bucketed_group_map(oriented, ["u"], _wedges, num_buckets=num_buckets)

    tagged = wedges.union(e.map_batches(
        lambda b: pl.from_arrow(b).select(
            "a", "b", pl.lit(None, dtype=pl.Int64).alias("cnt")).to_arrow(),
        batch_format="pyarrow"))

    def _close(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        w = df.filter(pl.col("cnt").is_not_null())
        ed = df.filter(pl.col("cnt").is_null()).select(["a", "b"]).unique()
        n = int(w.join(ed, on=["a", "b"], how="inner")["cnt"].sum() or 0)
        return pa.table({"n": pa.array([n], type=pa.int64())})

    parts = bucketed_group_map(tagged, ["a", "b"], _close, num_buckets=num_buckets)
    total = sum(r["n"] for r in parts.take_all())  # O(num_buckets) scalars
    return pa.table({"n_triangles": pa.array([total], type=pa.int64())})


def hits(
    edges: ray.data.Dataset,
    num_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over an edge list — the
    second classic web link-analysis ranking next to :func:`pagerank`
    (crawl frontier scoring distinguishes good *pointers* from good
    *content*; PageRank alone conflates the two). The reference engine
    has no graph analytics; this extends the link-analysis family.

    Semantics (pinned, SQL-replayable with unrolled CTEs):

    - node set = {src} ∪ {dst}; hub_0(u) = 1.0 for every node
    - per iteration t: auth_t(v) = Σ_{(u,v)∈E} hub_{t-1}(u), then
      auth_t /= Σ_v auth_t(v) (L1 normalization — division by one
      global scalar, exactly replayable in SQL, unlike the L2 variant
      only up to a sqrt); hub_t(u) = Σ_{(u,v)∈E} auth_t(v), then
      hub_t /= Σ_u hub_t(u)
    - duplicate edges count once per occurrence (multigraph, as in
      :func:`pagerank`); nodes with no in-edges have auth 0.0, no
      out-edges hub 0.0 — all nodes appear in the output

    Scale shape: per iteration TWO narrow co-shuffles (edges join the
    (node, float) score table — :func:`edkray.ops.joins.bucketed_join`,
    both sides hash-partitioned once, no broadcast) and two combined
    grouped sums; only (int64, float64) pairs ever move, never
    documents. The normalizer is ONE driver scalar per half-iteration
    (``Dataset.sum`` — a distributed fold of per-block partials).
    Score state checkpoints per iteration via ``materialize()`` (same
    contract as pagerank's shuffle mode).
    """
    from .aggregate import grouped_agg
    from .joins import bucketed_join

    def _nodes(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch[src].to_numpy(zero_copy_only=False).astype(np.int64),
            batch[dst].to_numpy(zero_copy_only=False).astype(np.int64),
        ]))
        return pa.table({"node": pa.array(u)})

    # every trailing map/agg below re-anchors its schema with a 0-row
    # typed block — Ray drops the schema of all-empty datasets and the
    # bucketed joins need .schema() (the no-edge corner)
    e = edges.map_batches(
        lambda b: pa.table({
            src: pc.cast(b[src], pa.int64()),
            dst: pc.cast(b[dst], pa.int64()),
        }),
        batch_format="pyarrow", batch_size=batch_size,
    ).union(ray.data.from_arrow(pa.table({
        src: pa.array([], pa.int64()), dst: pa.array([], pa.int64()),
    }))).materialize()

    nodes = grouped_agg(
        e.map_batches(_nodes, batch_format="pyarrow", batch_size=batch_size),
        ["node"], [("count", None, "__n")],
    ).drop_columns(["__n"]).union(ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
    }))).materialize()

    # hub_0 = 1.0 everywhere
    score = nodes.map_batches(
        lambda b: b.append_column("score", pa.array(np.ones(b.num_rows))),
        batch_format="pyarrow",
    ).union(ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()), "score": pa.array([], pa.float64()),
    }))).materialize()

    def _half(score_ds: ray.data.Dataset, join_key: str, out_key: str):
        """One half-iteration: attach score to edges on join_key, sum
        the contributions by the opposite endpoint, L1-normalize."""
        j = bucketed_join(
            e, score_ds, on=[join_key], right_on=["node"],
            num_buckets=num_buckets, batch_size=batch_size,
        )
        raw = grouped_agg(
            j.map_batches(
                lambda b: pa.table({"node": b[out_key], "score": b["score"]}),
                batch_format="pyarrow",
            ),
            ["node"], [("sum", "score", "score")],
        ).materialize()
        total = raw.sum("score") or 1.0

        def _norm(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "score": pc.divide(b["score"], pa.scalar(float(total))),
            })

        out = raw.map_batches(_norm, batch_format="pyarrow")
        return out.union(ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }))).materialize()

    auth = score  # placeholder; overwritten in the loop
    hub = score
    for _ in range(num_iters):
        auth = _half(hub, src, dst)   # auth(v) = Σ hub(u) over in-edges
        hub = _half(auth, dst, src)   # hub(u) = Σ auth(v) over out-edges

    def _renamed(ds: ray.data.Dataset, alias: str) -> ray.data.Dataset:
        return ds.map_batches(
            lambda b: pa.table({"node": b["node"], alias: b["score"]}),
            batch_format="pyarrow",
        ).union(ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()), alias: pa.array([], pa.float64()),
        })))

    out = bucketed_join(
        nodes, _renamed(auth, "auth"),
        on=["node"], how="left", num_buckets=num_buckets,
    )
    out = bucketed_join(
        out, _renamed(hub, "hub"),
        on=["node"], how="left", num_buckets=num_buckets,
    )

    def _fill(b: pa.Table) -> pa.Table:
        # Column names chosen so the unique int key sorts first
        # alphabetically — row-order-insensitive comparators that sort
        # rows by column order then key on the int, not a float.
        return pa.table({
            "node": b["node"],
            "score_auth": pc.coalesce(b["auth"], pa.scalar(0.0)),
            "score_hub": pc.coalesce(b["hub"], pa.scalar(0.0)),
        })

    filled = out.map_batches(_fill, batch_format="pyarrow")
    return filled.union(ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "score_auth": pa.array([], pa.float64()),
        "score_hub": pa.array([], pa.float64()),
    })))


def bfs_hops(
    edges: ray.data.Dataset,
    seeds,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Multi-source BFS over an edge list: shortest hop distance from
    the seed set to every node reachable within ``max_hops`` (crawl
    frontier scheduling / seed-proximity scoring for web corpora —
    which pages sit k clicks from a trusted seed list).

    Semantics (pinned, SQL-replayable as a bounded recursive CTE with
    a final ``min(hop)``): hop(seed) = 0; each round expands the
    newly-discovered frontier one edge, keeping the FIRST (minimum)
    hop per node. Directed edges; duplicate edges are harmless (the
    frontier dedupes per bucket).

    Scale shape: per round ONE co-shuffle of (edges ∪ frontier rows)
    on the source node via :func:`~edkray.ops.shuffle.bucketed_group_map`
    — the per-bucket kernel semi-joins edges against the frontier and
    emits unique destinations, so only (node id, hop) pairs move and
    message volume is bounded by the round's discovered set, not the
    corpus. The distance table checkpoints per round via
    ``materialize()`` (the iterative-frontier persistence pattern
    shared with :func:`pagerank`); rounds stop early when a frontier
    comes back empty.

    ``seeds``: a Dataset with a ``node`` column, or a small list /
    ndarray of node ids (driver-built, seed lists are curated and
    tiny by nature)."""
    import polars as pl

    from .aggregate import grouped_agg

    if isinstance(seeds, ray.data.Dataset):
        dist = seeds.map_batches(
            lambda b: pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "hop": pa.array(np.zeros(len(b), np.int64)),
            }),
            batch_format="pyarrow",
        )
        dist = grouped_agg(dist, ["node"], [("min", "hop", "hop")])
    else:
        ids = np.unique(np.asarray(list(seeds), dtype=np.int64))
        dist = ray.data.from_arrow(pa.table({
            "node": pa.array(ids),
            "hop": pa.array(np.zeros(len(ids), np.int64)),
        }))
    dist = dist.materialize()

    def _tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(b[src], pa.int64()),
            "d": pc.cast(b[dst], pa.int64()),
            "__f": pa.array(np.zeros(len(b), bool)),
        })

    tagged_edges = edges.map_batches(_tag_edges, batch_format="pyarrow")

    for r in range(max_hops):
        frontier = dist.filter(expr=f"hop == {r}")
        if frontier.count() == 0:
            break
        nxt = r + 1

        def _tag_frontier(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": pc.cast(b["node"], pa.int64()),
                "d": pa.array(np.zeros(len(b), np.int64)),
                "__f": pa.array(np.ones(len(b), bool)),
            })

        def _bucket(tbl: pa.Table, hop_next: int = nxt) -> pa.Table:
            df = pl.from_arrow(tbl)
            fr = df.filter(pl.col("__f")).select("k").unique()
            out = (
                df.filter(~pl.col("__f"))
                .join(fr, on="k", how="semi")
                .select(pl.col("d").alias("node"))
                .unique()
                .with_columns(pl.lit(hop_next).cast(pl.Int64).alias("hop"))
            )
            return out.to_arrow()

        msgs = tagged_edges.union(
            frontier.map_batches(_tag_frontier, batch_format="pyarrow")
        )
        cand = bucketed_group_map(msgs, ["k"], _bucket, num_buckets=num_buckets)
        dist = grouped_agg(
            dist.union(cand), ["node"], [("min", "hop", "hop")]
        ).materialize()

    return dist
