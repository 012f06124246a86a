"""Ray Data operator tests against slow pandas/numpy oracles."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _df_eq(a: pd.DataFrame, b: pd.DataFrame, float_cols=()):
    a = a[sorted(a.columns)].sort_values(sorted(a.columns), kind="stable").reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(sorted(b.columns), kind="stable").reset_index(drop=True)
    assert len(a) == len(b), f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        both_na = pd.isna(av) & pd.isna(bv)
        if c in float_cols:
            assert (np.isclose(a[c].astype(float), b[c].astype(float), atol=1e-9) | both_na).all(), c
        else:
            assert ((av == bv) | both_na).all(), c


@pytest.fixture(scope="module")
def rand_table(ray_session):
    rng = np.random.default_rng(3)
    n = 20_000
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n)),
            "g": pa.array(rng.choice(["a", "b", "c"], n)),
            "x": pa.array(rng.normal(size=n)),
            "o": pa.array(rng.integers(0, 1 << 40, n)),
        }
    )


class TestAggregate:
    def test_grouped_agg_matches_pandas(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.aggregate import grouped_agg

        ds = ray.data.from_arrow(rand_table).repartition(8)
        got = grouped_agg(
            ds,
            ["k", "g"],
            [("sum", "x", "sum_x"), ("count", None, "n"), ("min", "x", "min_x"),
             ("max", "x", "max_x"), ("mean", "x", "mean_x")],
        ).to_pandas()
        exp = (
            rand_table.to_pandas()
            .groupby(["k", "g"], as_index=False)
            .agg(sum_x=("x", "sum"), n=("x", "size"), min_x=("x", "min"),
                 max_x=("x", "max"), mean_x=("x", "mean"))
        )
        _df_eq(got, exp, float_cols={"sum_x", "min_x", "max_x", "mean_x"})

    def test_grouped_agg_small_matches_and_enforces_bound(self, ray_session, rand_table):
        import pytest
        import ray.data

        from edkray.ops.aggregate import grouped_agg_small

        ds = ray.data.from_arrow(rand_table).repartition(8)
        got = grouped_agg_small(ds, ["g"], [("sum", "x", "sum_x"), ("count", None, "n")])
        exp = (
            rand_table.to_pandas().groupby(["g"], as_index=False)
            .agg(sum_x=("x", "sum"), n=("x", "size"))
        )
        _df_eq(got, exp, float_cols={"sum_x"})
        # driver-side combine refuses unbounded partials
        with pytest.raises(ValueError, match="use grouped_agg"):
            grouped_agg_small(ds, ["g"], [("count", None, "n")], max_partial_rows=1)

    def test_distinct(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.aggregate import distinct

        got = distinct(ray.data.from_arrow(rand_table), ["g"]).to_pandas()
        assert sorted(got["g"]) == ["a", "b", "c"]

    def test_global_top_k_matches_pandas(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.aggregate import global_top_k

        ds = ray.data.from_arrow(rand_table).repartition(8)
        got = global_top_k(ds, ["x", "o"], 7, descending=[True, False]).to_pandas()
        exp = (
            rand_table.to_pandas()
            .sort_values(["x", "o"], ascending=[False, True], kind="stable")
            .head(7)
            .reset_index(drop=True)
        )
        _df_eq(got, exp, float_cols={"x"})


class TestDedup:
    def test_exact_dedup_matches_pandas(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.dedup import exact_dedup

        ds = ray.data.from_arrow(rand_table).repartition(8)
        got = exact_dedup(ds, ["k"], ["o", "x", "g"]).to_pandas()
        exp = (
            rand_table.to_pandas()
            .sort_values(["k", "o", "x", "g"], kind="stable")
            .drop_duplicates(subset=["k"], keep="first")
        )
        _df_eq(got, exp, float_cols={"x"})

    def test_dup_rate_by_group_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data

        from edkray.ops.dedup import dup_rate_by_group

        rng = np.random.default_rng(3)
        n = 400
        doc_id = np.arange(n, dtype=np.int64)
        # 30 distinct texts over 400 docs -> every group has duplicates;
        # domains cut across text groups
        text = [f"text-{v}" for v in rng.integers(0, 30, size=n)]
        dom = [f"site{v}.example" for v in doc_id % 7]
        tbl = pa.table({"doc_id": doc_id, "text": text, "domain": dom})
        got = (
            dup_rate_by_group(ray.data.from_arrow(tbl).repartition(6), num_buckets=4)
            .to_pandas()
            .sort_values("domain")
            .reset_index(drop=True)
        )
        df = tbl.to_pandas()
        df["is_dup"] = df.doc_id > df.groupby("text").doc_id.transform("min")
        exp = (
            df.groupby("domain")
            .agg(n_pages=("doc_id", "size"), n_dups=("is_dup", "sum"))
            .reset_index()
        )
        exp["n_dups"] = exp["n_dups"].astype("int64")
        exp["dup_rate"] = exp.n_dups / exp.n_pages
        exp = exp.sort_values("domain").reset_index(drop=True)
        _df_eq(got, exp, float_cols={"dup_rate"})

    def test_dup_rate_no_dups_is_zero(self, ray_session):
        import ray.data

        from edkray.ops.dedup import dup_rate_by_group

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a", "b", "c"]),
            "domain": pa.array(["h1", "h1", "h2"]),
        })
        got = dup_rate_by_group(ray.data.from_arrow(tbl), num_buckets=2).to_pandas()
        assert got.n_dups.sum() == 0 and (got.dup_rate == 0.0).all()
        assert got.set_index("domain").n_pages.to_dict() == {"h1": 2, "h2": 1}

    def test_minhash_finds_planted_near_dups(self, ray_session):
        import ray.data

        from edkray.ops.dedup import minhash_lsh_pairs

        base = "the quick brown fox jumps over the lazy dog " * 20
        docs = [base, base.replace("lazy", "sleepy", 1), "completely different words " * 30]
        tbl = pa.table({"doc_id": pa.array([1, 2, 3]), "text": pa.array(docs)})
        pairs = minhash_lsh_pairs(ray.data.from_arrow(tbl), threshold=0.5).to_pandas()
        assert {(1, 2)} <= set(zip(pairs.id_a, pairs.id_b))
        assert (3 not in set(pairs.id_a)) and (3 not in set(pairs.id_b))

    def test_simhash_identical_docs(self, ray_session):
        import ray.data

        from edkray.ops.dedup import simhash_pairs

        t = "repeated content for hashing " * 10
        tbl = pa.table({"doc_id": pa.array([1, 2, 3]),
                        "text": pa.array([t, t, "unrelated other text entirely " * 9])})
        pairs = simhash_pairs(ray.data.from_arrow(tbl)).to_pandas()
        match = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]
        assert len(match) == 1 and match.hamming.iloc[0] == 0

    def test_jaccard_exact(self):
        from edkray.ops.dedup import jaccard

        assert jaccard("abcdefghij", "abcdefghij", k=4) == 1.0
        assert jaccard("abcdefghij", "zzzzzzzzzz", k=4) == 0.0
        # empty k-gram set: never a duplicate (VERDICT r4 #5)
        assert jaccard("", "", k=4) == 0.0
        assert jaccard("", "abcdefghij", k=4) == 0.0

    def test_minhash_empty_docs_never_pair(self, ray_session):
        """Null/empty-text docs (empty k-gram sets) must not surface as
        each other's est_jaccard=1.0 duplicates (VERDICT r4 #5)."""
        import ray.data

        from edkray.ops.dedup import minhash_jaccard_pairs, minhash_lsh_pairs

        base = "the quick brown fox jumps over the lazy dog " * 20
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5]),
            "text": pa.array([base, base, "", "", None]),
        })
        for op in (minhash_lsh_pairs, minhash_jaccard_pairs):
            pairs = op(ray.data.from_arrow(tbl), threshold=0.5).to_pandas()
            assert set(zip(pairs.id_a, pairs.id_b)) == {(1, 2)}, op.__name__

    def test_embedding_dup_pairs(self, ray_session):
        import ray.data

        from edkray.ops.dedup import embedding_dup_pairs

        rng = np.random.default_rng(5)
        v = rng.normal(size=(10, 16))
        v[7] = v[2] + 1e-6  # planted near-dup
        tbl = pa.table({"vec_id": pa.array(np.arange(10)),
                        "embedding": pa.array(list(v), type=pa.list_(pa.float64()))})
        pairs = embedding_dup_pairs(ray.data.from_arrow(tbl), threshold=0.999).to_pandas()
        assert {(2, 7)} == set(zip(pairs.id_a, pairs.id_b))


class TestWindows:
    @pytest.fixture(scope="class")
    def events(self):
        rng = np.random.default_rng(11)
        n = 5000
        t0 = dt.datetime(2024, 1, 1)
        ts = [t0 + dt.timedelta(seconds=int(s)) for s in np.sort(rng.integers(0, 86400 * 3, n))]
        return pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user": pa.array(rng.integers(0, 20, n)),
                "val": pa.array(rng.uniform(0, 10, n)),
            }
        )

    def test_tumbling(self, ray_session, events):
        import ray.data

        from edkray.ops.window import tumbling

        got = tumbling(ray.data.from_arrow(events), "ts", "hour", ["user"],
                       [("count", None, "n"), ("sum", "val", "sv")]).to_pandas()
        df = events.to_pandas()
        df["window_start"] = df.ts.dt.floor("h")
        exp = df.groupby(["user", "window_start"], as_index=False).agg(n=("val", "size"), sv=("val", "sum"))
        _df_eq(got, exp, float_cols={"sv"})

    def test_sliding(self, ray_session, events):
        import ray.data

        from edkray.ops.window import sliding

        got = sliding(ray.data.from_arrow(events), "ts", 7_200_000_000, 3_600_000_000,
                      ["user"], [("count", None, "n")]).to_pandas()
        df = events.to_pandas()
        rows = []
        for w in (0, 1):
            d = df.copy()
            d["window_start"] = d.ts.dt.floor("h") - pd.Timedelta(hours=w)
            rows.append(d)
        exp = (
            pd.concat(rows)
            .groupby(["user", "window_start"], as_index=False)
            .agg(n=("val", "size"))
        )
        _df_eq(got, exp)

    def test_sessionize(self, ray_session, events):
        import ray.data

        from edkray.ops.window import sessionize

        gap = 900_000_000  # 15 min
        got = sessionize(ray.data.from_arrow(events), "ts", "user", gap, agg_col="val").to_pandas()
        df = events.to_pandas().sort_values(["user", "ts"], kind="stable")
        df["new"] = (df.groupby("user")["ts"].diff().dt.total_seconds() * 1e6 > gap).fillna(True)
        df["sid"] = df.groupby("user")["new"].cumsum()
        exp = df.groupby(["user", "sid"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"), sum_val=("val", "sum"),
        ).drop(columns="sid")
        _df_eq(got, exp, float_cols={"sum_val"})


class TestJoins:
    def test_broadcast_join(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.joins import broadcast_join

        small = pa.table({"g": pa.array(["a", "b", "c"]), "w": pa.array([1.0, 2.0, 3.0])})
        got = broadcast_join(ray.data.from_arrow(rand_table), small, on=["g"]).to_pandas()
        exp = rand_table.to_pandas().merge(small.to_pandas(), on="g")
        _df_eq(got, exp, float_cols={"x", "w"})

    def test_asof_join(self, ray_session):
        import ray.data

        from edkray.ops.joins import asof_join

        t0 = dt.datetime(2024, 1, 1)
        left = pa.table(
            {
                "id": pa.array(np.arange(100)),
                "key": pa.array(np.arange(100) % 3),
                "ts": pa.array([t0 + dt.timedelta(minutes=int(7 * i)) for i in range(100)],
                               type=pa.timestamp("us")),
            }
        )
        right = pa.table(
            {
                "key": pa.array([0, 0, 1, 2]),
                "rts": pa.array([t0, t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=9)],
                                type=pa.timestamp("us")),
                "payload": pa.array([10, 20, 30, 40]),
            }
        )
        got = asof_join(ray.data.from_arrow(left), right, on=["key"], left_ts="ts", right_ts="rts").to_pandas()
        exp = pd.merge_asof(
            left.to_pandas().sort_values("ts"), right.to_pandas().sort_values("rts"),
            left_on="ts", right_on="rts", left_by="key", right_by="key", direction="backward",
        )
        _df_eq(got, exp)

    def test_asof_join_large_matches_merge_asof(self, ray_session):
        import ray.data

        from edkray.ops.joins import asof_join_large

        rng = np.random.default_rng(3)
        t0 = dt.datetime(2024, 1, 1)
        n, m = 500, 120
        left = pa.table(
            {
                "id": pa.array(np.arange(n)),
                "key": pa.array(rng.integers(0, 17, n)),
                "ts": pa.array([t0 + dt.timedelta(minutes=int(x)) for x in rng.integers(0, 10000, n)],
                               type=pa.timestamp("us")),
                # a column whose name clashes with the right side
                "payload": pa.array(rng.normal(size=n)),
            }
        )
        rts = np.sort(rng.choice(np.arange(10000), size=m, replace=False))
        right = pa.table(
            {
                "key": pa.array(rng.integers(0, 17, m)),
                "rts": pa.array([t0 + dt.timedelta(minutes=int(x)) for x in rts],
                                type=pa.timestamp("us")),
                "payload": pa.array(rng.integers(0, 1000, m)),
            }
        )
        got = asof_join_large(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(4),
            on=["key"], left_ts="ts", right_ts="rts", num_buckets=8,
        ).to_pandas()
        exp = pd.merge_asof(
            left.to_pandas().sort_values("ts"), right.to_pandas().sort_values("rts"),
            left_on="ts", right_on="rts", left_by="key", right_by="key",
            direction="backward", suffixes=("", "_r"),
        )
        _df_eq(got.sort_values("id"), exp.sort_values("id"), float_cols={"payload"})

    def test_hash_join(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.joins import hash_join

        left = ray.data.from_arrow(rand_table.select(["k", "x"]))
        rt = pa.table({"k": pa.array(np.arange(500)), "lbl": pa.array([f"n{i}" for i in range(500)])})
        right = ray.data.from_arrow(rt)
        got = hash_join(left, right, on=["k"], num_partitions=4).to_pandas()
        exp = rand_table.to_pandas()[["k", "x"]].merge(rt.to_pandas(), on="k")
        _df_eq(got, exp, float_cols={"x"})

    def test_bucketed_join(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.joins import bucketed_join

        left = ray.data.from_arrow(rand_table.select(["k", "x"]))
        # right carries a list<float> column — the case hash_join rejects
        rng = np.random.default_rng(3)
        ks = np.arange(400)
        rt = pa.table({
            "rk": pa.array(ks),
            "lbl": pa.array([f"n{i}" for i in ks]),
            "vec": pa.array(rng.normal(size=(400, 3)).tolist(),
                            type=pa.list_(pa.float64())),
        })
        right = ray.data.from_arrow(rt)
        got = bucketed_join(
            left, right, on=["k"], right_on=["rk"], num_buckets=4
        ).to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        exp = (
            rand_table.to_pandas()[["k", "x"]]
            .merge(rt.to_pandas().rename(columns={"rk": "k"}), on="k")
            .sort_values(["k", "x"]).reset_index(drop=True)
        )
        _df_eq(got[["k", "x", "lbl"]], exp[["k", "x", "lbl"]], float_cols={"x"})
        assert all(
            np.allclose(a, b) for a, b in zip(got["vec"], exp["vec"])
        )
        # left join keeps unmatched left rows with null right columns
        lj = bucketed_join(
            left, right, on=["k"], right_on=["rk"], how="left", num_buckets=4
        ).to_pandas()
        assert len(lj) == len(exp) + (rand_table.to_pandas()["k"] >= 400).sum()
        with pytest.raises(ValueError):
            bucketed_join(left, right, on=["k"], how="outer")

    def test_pip_join_matches_index(self, ray_session):
        import ray
        import ray.data

        from edkray.fixtures import make_admin
        from edkray.geo.pip import PolygonIndex, wkb_to_ring
        from edkray.ops.joins import pip_join

        rng = np.random.default_rng(9)
        lon, lat = rng.uniform(-180, 180, 3000), rng.uniform(-85, 85, 3000)
        tbl = pa.table({"i": pa.array(np.arange(3000)), "lon": pa.array(lon), "lat": pa.array(lat)})
        admin = make_admin()
        got = pip_join(ray.data.from_arrow(tbl), admin).to_pandas().sort_values("i")
        idx = PolygonIndex(admin["admin_id"].to_pylist(),
                           [wkb_to_ring(w) for w in admin["wkb_geometry"].to_pylist()])
        exp = idx.query(lon, lat)
        assert (got["admin_id"].to_numpy() == exp).sum() == 3000 - sum(x is None for x in exp) or \
            all((a == b) or (pd.isna(a) and b is None) for a, b in zip(got["admin_id"], exp))

    def test_knn_join(self, ray_session):
        import ray.data

        from edkray.geo.distance import knn_haversine
        from edkray.ops.joins import knn_join

        rng = np.random.default_rng(13)
        refs = pa.table(
            {"ref_id": pa.array([f"r{i:03d}" for i in range(200)]),
             "lon": pa.array(rng.uniform(-180, 180, 200)), "lat": pa.array(rng.uniform(-85, 85, 200))}
        )
        qlon, qlat = rng.uniform(-180, 180, 500), rng.uniform(-85, 85, 500)
        tbl = pa.table({"i": pa.array(np.arange(500)), "lon": pa.array(qlon), "lat": pa.array(qlat)})
        got = knn_join(ray.data.from_arrow(tbl), refs, k=3).to_pandas().sort_values("i")
        idx, _ = knn_haversine(qlon, qlat, refs["lon"].to_numpy(), refs["lat"].to_numpy(), 3)
        exp = [[f"r{j:03d}" for j in row] for row in idx]
        assert [list(x) for x in got["neighbor_ids"]] == exp


class TestSearch:
    def test_cosine_topk_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.ops.search import cosine_topk

        rng = np.random.default_rng(17)
        emb = rng.normal(size=(1000, 32))
        queries = emb[:4] + rng.normal(scale=0.01, size=(4, 32))
        tbl = pa.table({"vec_id": pa.array(np.arange(1000)),
                        "embedding": pa.array(list(emb), type=pa.list_(pa.float64()))})
        got = cosine_topk(ray.data.from_arrow(tbl), queries, k=5).to_pandas()
        unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cos = qu @ unit.T
        for qi in range(4):
            order = np.lexsort((np.arange(1000), -cos[qi]))[:5]
            sub = got[got.query_id == qi].sort_values("rank")
            assert sub.vec_id.tolist() == order.tolist()

    def test_topk_merge_many_queries_bucketed(self, ray_session):
        """VERDICT r3 item 8: the final top-k merge must be bucketed,
        not per-query map_groups (~2.5 ms of Ray overhead PER QUERY →
        25 s+ at 10k queries). Feed 10k queries' partial rows straight
        into the merge: it must finish in seconds and match the local
        sort exactly."""
        import time

        import ray.data

        from edkray.ops.search import _merge_topk

        rng = np.random.default_rng(29)
        nq, parts, k = 10_000, 8, 3
        # 8 partial top-3 rows per query, as the per-batch stage emits
        qid = np.repeat(np.arange(nq, dtype=np.int64), parts * k)
        vid = rng.integers(0, 1 << 30, nq * parts * k)
        cos = rng.uniform(-1, 1, nq * parts * k)
        partials = pa.table({"query_id": pa.array(qid), "vec_id": pa.array(vid),
                             "cosine": pa.array(cos)})
        ds = ray.data.from_arrow(partials).repartition(8)
        t0 = time.perf_counter()
        got = _merge_topk(ds, k, "vec_id").to_pandas()
        wall = time.perf_counter() - t0
        assert len(got) == nq * k
        assert wall < 30, f"10k-query merge took {wall:.1f}s — per-group overhead?"
        exp = (
            pd.DataFrame({"query_id": qid, "vec_id": vid, "cosine": cos})
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True], kind="stable")
            .groupby("query_id", sort=True)
            .head(k)
        )
        exp["rank"] = exp.groupby("query_id").cumcount()
        _df_eq(got, exp, float_cols={"cosine"})


class TestText:
    def test_token_count(self, ray_session):
        from edkray.ops.text import token_count

        tbl = pa.table({"text": pa.array(["a b  c", "", "  ", "single", "x y z w"])})
        out = token_count(tbl).column("n_tokens").to_pylist()
        assert out == [3, 0, 0, 1, 4]

    def test_quality_stats(self):
        from edkray.ops.text import quality_stats

        tbl = pa.table({"text": pa.array(["abc123!?", ""])})
        out = quality_stats(tbl).to_pydict()
        assert out["n_chars"] == [8, 0]
        assert out["n_digit"] == [3, 0]
        assert out["n_punct"] == [2, 0]

    def test_langid(self, ray_session):
        from edkray.ops.text import LangId

        texts = [
            "the cat and the dog in a house that was for you",
            "der hund und die katze ist nicht ein problem",
            "le chat est un animal et je ne pas que vous",
            "el perro y la casa es una cosa que no por yo",
            "",
        ]
        out = LangId()(pa.table({"text": pa.array(texts)}))["lang_pred"].to_pylist()
        assert out == ["en", "de", "fr", "es", "und"]

    def test_fingerprint_deterministic(self):
        from edkray.ops.text import fingerprint

        tbl = pa.table({"text": pa.array(["some document text here " * 5] * 2 + ["other doc"])})
        out = fingerprint(tbl)
        fps = out["fingerprint"].to_pylist()
        assert fps[0] == fps[1] != fps[2]

    def test_kgram_hashes_match_direct(self):
        from edkray.ops.text import kgram_hashes, polyhash

        data = b"abcdefghijklmnop"
        k = 4
        got = kgram_hashes(data, k)
        exp = np.array([polyhash(data[i : i + k]) for i in range(len(data) - k + 1)], dtype=np.uint64)
        assert (got == exp).all()


class TestShuffle:
    def test_bucketed_group_map_sees_whole_groups(self, ray_session, rand_table):
        import polars as pl
        import ray.data

        from edkray.ops.shuffle import bucketed_group_map

        def per_key_count(t: pa.Table) -> pa.Table:
            return pl.from_arrow(t).group_by("k").agg(pl.len().cast(pl.Int64).alias("n")).to_arrow()

        got = bucketed_group_map(ray.data.from_arrow(rand_table).repartition(8), ["k"],
                                 per_key_count).to_pandas()
        exp = rand_table.to_pandas().groupby("k", as_index=False).agg(n=("k", "size"))
        _df_eq(got, exp)

    def test_hot_key_salting_output_unchanged(self, ray_session):
        """VERDICT r2 item 6: with one key holding 50% of rows, the
        count-driven salting splits that key across buckets (no single
        task holds the whole key) and a self-mergeable fn's output is
        identical to the unsalted run."""
        import ray.data

        from edkray.ops.shuffle import (
            _detect_hot_keys, _salted_bucket, bucketed_group_map, dedup_in_bucket,
        )

        rng = np.random.default_rng(41)
        n = 40_000
        # key 0 = 50% of rows; 200 cold keys share the rest
        k = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 201, n))
        tbl = pa.table({
            "k": pa.array(k.astype(np.int64)),
            "ord": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.normal(size=n)),
        })
        ds = ray.data.from_arrow(tbl).repartition(8)
        fn = dedup_in_bucket(["k"], ["ord"])
        plain = bucketed_group_map(ds, ["k"], fn, num_buckets=8).to_pandas()
        salted = bucketed_group_map(
            ray.data.from_arrow(tbl).repartition(8), ["k"], fn, num_buckets=8,
            hot_key_merge=fn, hot_key_budget=2000,
        ).to_pandas()
        a = plain.sort_values("k").reset_index(drop=True)
        b = salted.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

        # detection found the hot key with the right split factor
        hot_kh, splits = _detect_hot_keys(ray.data.from_arrow(tbl), ["k"], 2000)
        assert len(hot_kh) == 1
        assert splits[0] == -(-int((k == 0).sum()) // 2000)
        # and the bucket assigner actually spreads it over many buckets
        hot_rows = pa.table({"k": pa.array(np.zeros(5000, dtype=np.int64)),
                             "ord": pa.array(np.arange(5000)),
                             "v": pa.array(np.zeros(5000))})
        bucketed = _salted_bucket(hot_rows, ["k"], 8, 11, hot_kh, splits)
        n_buckets_used = len(np.unique(bucketed["__bucket"].to_numpy()))
        assert n_buckets_used > 1


class TestRound2Fixes:
    def test_knn_join_small_then_large_batch(self, ray_session):
        """Regression: a cached KnnJoin whose FIRST batch is smaller than
        CHUNK must still handle a later larger batch (the reused matmul
        buffer was sized to the first batch; VERDICT r1 'What's wrong' #1)."""
        import ray

        from edkray.geo.distance import knn_haversine
        from edkray.ops.joins import KnnJoin

        rng = np.random.default_rng(21)
        refs = pa.table(
            {"ref_id": pa.array(np.arange(50, dtype=np.int64)),
             "lon": pa.array(rng.uniform(-180, 180, 50)),
             "lat": pa.array(rng.uniform(-85, 85, 50))}
        )
        joiner = KnnJoin(ray.put(refs), ref_id_col="ref_id", k=3)
        for n in (10, 5000, 7):  # small → larger-than-CHUNK → small again
            lon, lat = rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)
            batch = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
            out = joiner(batch)  # must not raise
            idx, _ = knn_haversine(lon, lat, refs["lon"].to_numpy(), refs["lat"].to_numpy(), 3)
            assert [list(x) for x in out["neighbor_ids"].to_pylist()] == [list(r) for r in idx]

    def test_process_cached_rejects_unhashable(self, ray_session):
        import ray

        from edkray.ops.joins import _STATE_CACHE, _STATE_CACHE_MAX, process_cached

        with pytest.raises(TypeError):
            process_cached([1, 2, 3], lambda x: x)
        # ObjectRef path works and is cached
        ref = ray.put((1, 2))
        a = process_cached(ref, lambda x: object())
        b = process_cached(ref, lambda x: object())
        assert a is b
        # bounded: old entries evicted
        for i in range(_STATE_CACHE_MAX + 3):
            process_cached(("key", i), lambda x: x)
        assert len(_STATE_CACHE) <= _STATE_CACHE_MAX


class TestRound3Fixes:
    def test_asof_join_large_same_ts_name(self, ray_session):
        """Regression (ADVICE r2 medium): both sides using the SAME
        timestamp column name ('ts') raised polars DuplicateError."""
        import ray.data

        from edkray.ops.joins import asof_join_large

        rng = np.random.default_rng(7)
        t0 = dt.datetime(2024, 1, 1)
        n, m = 300, 80
        left = pa.table({
            "id": pa.array(np.arange(n)),
            "key": pa.array(rng.integers(0, 11, n)),
            "ts": pa.array([t0 + dt.timedelta(minutes=int(x)) for x in rng.integers(0, 5000, n)],
                           type=pa.timestamp("us")),
        })
        rts = np.sort(rng.choice(np.arange(5000), size=m, replace=False))
        right = pa.table({
            "key": pa.array(rng.integers(0, 11, m)),
            "ts": pa.array([t0 + dt.timedelta(minutes=int(x)) for x in rts],
                           type=pa.timestamp("us")),
            "payload": pa.array(rng.integers(0, 1000, m)),
        })
        got = asof_join_large(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            on=["key"], left_ts="ts", right_ts="ts", num_buckets=4,
        ).to_pandas()
        exp = pd.merge_asof(
            left.to_pandas().sort_values("ts"), right.to_pandas().sort_values("ts"),
            on="ts", by="key", direction="backward", suffixes=("", "_r"),
        )
        assert "ts_r" in got.columns  # right ts kept under the suffix
        g = got.sort_values("id").reset_index(drop=True)
        e = exp.sort_values("id").reset_index(drop=True)
        pd.testing.assert_series_equal(g["payload"].astype("float64"),
                                       e["payload"].astype("float64"), check_names=False)

    def test_interp_join_linear(self, ray_session):
        """Linear-interpolation combine (reference J5 method='linear'):
        broadcast and large-large paths agree with a numpy oracle,
        including edge holds and exact-timestamp hits."""
        import ray.data

        from edkray.ops.joins import asof_join, asof_join_large

        t0 = dt.datetime(2024, 1, 1)
        right = pa.table({
            "key": pa.array([0, 0, 0, 1]),
            "rts": pa.array([t0, t0 + dt.timedelta(hours=10), t0 + dt.timedelta(hours=20),
                             t0 + dt.timedelta(hours=5)], type=pa.timestamp("us")),
            "val": pa.array([100.0, 200.0, 150.0, 50.0]),
        })
        left = pa.table({
            "id": pa.array(np.arange(6)),
            "key": pa.array([0, 0, 0, 0, 1, 1]),
            "ts": pa.array([
                t0 - dt.timedelta(hours=2),      # before series → hold first (100)
                t0 + dt.timedelta(hours=5),      # midpoint 100..200 → 150
                t0 + dt.timedelta(hours=10),     # exact hit → 200
                t0 + dt.timedelta(hours=30),     # after series → hold last (150)
                t0 + dt.timedelta(hours=5),      # exact single point → 50
                t0 + dt.timedelta(hours=9),      # after single point → 50
            ], type=pa.timestamp("us")),
        })
        exp = [100.0, 150.0, 200.0, 150.0, 50.0, 50.0]
        got_b = asof_join(
            ray.data.from_arrow(left), right, on=["key"], left_ts="ts", right_ts="rts",
            interpolate="linear", value_cols=["val"],
        ).to_pandas().sort_values("id")
        assert got_b["val"].tolist() == exp
        got_l = asof_join_large(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            on=["key"], left_ts="ts", right_ts="rts",
            interpolate="linear", value_cols=["val"], num_buckets=4,
        ).to_pandas().sort_values("id")
        assert got_l["val"].tolist() == exp

    def test_knn_tie_stable_across_k_paths(self, ray_session):
        """Regression (ADVICE r2 low): with duplicate reference points
        tied exactly at the k-th boundary, the argpartition (k>8) path
        must break ties to the lowest ref index like the argmax (k<=8)
        path does."""
        import ray

        from edkray.ops.joins import KnnJoin

        rng = np.random.default_rng(31)
        base_lon = rng.uniform(-180, 180, 6)
        base_lat = rng.uniform(-85, 85, 6)
        # 30 refs = each base point duplicated 5x → ties guaranteed to
        # straddle any k boundary that isn't a multiple of 5
        lon = np.repeat(base_lon, 5)
        lat = np.repeat(base_lat, 5)
        refs = pa.table({"ref_id": pa.array(np.arange(30, dtype=np.int64)),
                         "lon": pa.array(lon), "lat": pa.array(lat)})
        qlon, qlat = rng.uniform(-180, 180, 64), rng.uniform(-85, 85, 64)
        batch = pa.table({"lon": pa.array(qlon), "lat": pa.array(qlat)})
        for k in (7, 12):  # straddles duplicate groups on both paths
            out = KnnJoin(ray.put(refs), ref_id_col="ref_id", k=k)(batch)
            got = [list(x) for x in out["neighbor_ids"].to_pylist()]
            # expected: stable sort by (-cos, index)
            from edkray.geo.distance import lonlat_to_unit
            cos = lonlat_to_unit(qlon, qlat) @ lonlat_to_unit(lon, lat).T
            exp = [np.argsort(-row, kind="stable")[:k].tolist() for row in cos]
            assert got == exp, f"k={k}"

    def test_lsh_verification_stays_distributed(self, ray_session, monkeypatch):
        """VERDICT r2 item 2: the LSH verification pass must never pull
        candidate texts/vectors (or the pair set) onto the driver.
        Forbid Dataset.to_pandas for the duration of both ops — the
        round-2 implementation called it on the candidate/text path."""
        import ray
        import ray.data

        from edkray.ops.dedup import embedding_dup_pairs, minhash_lsh_pairs

        def _boom(self, *a, **k):
            raise AssertionError("driver-side Dataset materialization on candidate path")

        monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)

        base = "the quick brown fox jumps over the lazy dog " * 8
        texts = [base, base + "tail", "totally different words here " * 6] + [
            f"unique filler document number {i} with its own content" for i in range(30)
        ]
        tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                        "text": pa.array(texts)})
        out = minhash_lsh_pairs(ray.data.from_arrow(tbl), threshold=0.5)
        tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        got = pa.concat_tables(tabs).to_pydict() if tabs else {"id_a": [], "id_b": []}
        assert (0, 1) in set(zip(got["id_a"], got["id_b"]))

        rng = np.random.default_rng(23)
        emb = rng.normal(size=(40, 16))
        emb[1] = emb[0] + rng.normal(scale=1e-4, size=16)  # near-dup pair
        etbl = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                         "embedding": pa.array(list(emb), type=pa.list_(pa.float64()))})
        eout = embedding_dup_pairs(ray.data.from_arrow(etbl), threshold=0.999)
        etabs = [t for t in ray.get(eout.to_arrow_refs()) if t.num_rows]
        egot = pa.concat_tables(etabs).to_pydict() if etabs else {"id_a": [], "id_b": []}
        assert (0, 1) in set(zip(egot["id_a"], egot["id_b"]))

    def test_list_to_matrix_rejects_nulls(self):
        """Regression (ADVICE r2 low): null rows must raise, not
        silently misalign when the survivor count divides n."""
        from edkray.utils import list_to_matrix

        # 2 null rows out of 4; remaining 2 rows x 2 vals = 4 values,
        # 4 % 4 == 0 → the old ragged check passed and rows misaligned
        col = pa.array([[1.0, 2.0], None, [5.0, 6.0], None], type=pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="null"):
            list_to_matrix(col)

    def test_s2_token_empty_and_shape(self):
        from edkray.geo.s2 import s2_token

        empty = s2_token(np.empty(0, dtype=np.uint64))
        assert empty.dtype.kind == "U"
        assert pa.array(empty).type == pa.string()  # no null-type schema drift
        two_d = s2_token(np.full((2, 3), (5 << 60) | (1 << 30), dtype=np.uint64))
        assert two_d.shape == (2, 3)

    def test_deterministic_sample_uint64_and_negative(self):
        from edkray.ops.stages import deterministic_sample

        big = np.array([0, 1, 2**32 + 7, 2**40 + 123], dtype=np.int64)
        batch = pa.table({"k": pa.array(big)})
        out = deterministic_sample(batch, "k", 0.5)
        # exact mathematical rule: (k * 2654435761) mod 2^32 < 0.5 * 2^32
        exp = [int(k) * 2654435761 % (1 << 32) < (1 << 31) for k in big]
        assert out["k"].to_pylist() == [int(k) for k, e in zip(big, exp) if e]
        with pytest.raises(ValueError):
            deterministic_sample(pa.table({"k": pa.array([-1])}), "k", 0.5)

    def test_lsh_embedding_recall_equals_exact(self, ray_session, sf_dir):
        """Banded LSH (64 bands x 4 bits) must recover the FULL exact
        cosine>=0.4 pair set (round-1 single-band version had recall~0)."""
        from edkray.queries import q_cosine_dup_pairs, q_lsh_embedding_pairs

        lsh = q_lsh_embedding_pairs(sf_dir).to_pandas()
        ex = q_cosine_dup_pairs(sf_dir).to_pandas()
        got = set(zip(lsh.id_a, lsh.id_b))
        exp = set(zip(ex.id_a, ex.id_b))
        assert len(exp) > 0
        assert got == exp

    def test_minhash_jaccard_pairs_equals_exact(self, ray_session, sf_dir):
        """LSH candidates + exact-Jaccard verify must equal the brute
        exact pair set at threshold 0.5 (true pairs sit at J>=0.92,
        banding miss ~2e-9)."""
        import ray.data

        from edkray.ops.dedup import minhash_jaccard_pairs
        from edkray.ops.text import kgram_hashes
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        got = minhash_jaccard_pairs(
            ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
            threshold=0.5,
        ).to_pandas()
        ids = docs["doc_id"].to_numpy()
        grams = [np.unique(kgram_hashes((t or "").encode(), 8)) for t in docs["text"].to_pylist()]
        exp = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(grams[i], grams[j], assume_unique=True).size
                if inter and inter / (len(grams[i]) + len(grams[j]) - inter) >= 0.5:
                    exp.add((int(ids[i]), int(ids[j])))
        assert len(exp) > 0
        assert set(zip(got.id_a, got.id_b)) == exp

    def test_ivf_approximate_recall(self, ray_session, sf_dir):
        """IVF with nprobe < nlist is approximate: assert recall vs the
        exact brute-force top-k (and exactness when probing all lists)."""
        import pyarrow.parquet as pq
        import ray.data

        from edkray.ops.search import IvfIndex, ivf_topk

        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        mat = np.stack(emb.to_pandas().sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
        ids = np.sort(emb["vec_id"].to_numpy())
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        queries = mat[:5]
        qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cos = qu @ unit.T
        exact = {
            (qi, int(ids[j]))
            for qi in range(5)
            for j in np.lexsort((ids, -cos[qi]))[:5]
        }
        index = IvfIndex(nlist=8).fit(mat)
        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        approx = ivf_topk(ds, index, queries, k=5, nprobe=3).to_pandas()
        got = set(zip(approx.query_id, approx.vec_id))
        recall = len(got & exact) / len(exact)
        assert recall >= 0.5  # approximate path finds most true neighbors
        full = ivf_topk(ds, index, queries, k=5, nprobe=8).to_pandas()
        assert set(zip(full.query_id, full.vec_id)) == exact  # exhaustive probe = exact

    def test_simhash_pairs_match_bruteforce(self, ray_session, sf_dir):
        """Pigeonhole banding (4 x 16-bit chunks) guarantees EVERY pair
        with Hamming <= 3 is found — compare against brute force O(n^2)."""
        import pyarrow.parquet as pq
        import ray.data

        from edkray.ops.dedup import simhash64, simhash_pairs

        docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = docs["doc_id"].to_numpy()
        sh = np.array([simhash64(t or "") for t in docs["text"].to_pylist()], dtype=np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for b in range(64):
            ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        exp = {
            (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i, j, h in zip(ia, ib, ham) if h <= 3
        }
        got = simhash_pairs(
            ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
            max_hamming=3,
        ).to_pandas()
        assert set(zip(got.id_a, got.id_b)) == exp
        assert len(exp) > 0

    def test_grouped_collect_matches_pandas(self, ray_session, rand_table):
        import ray.data

        from edkray.ops.aggregate import grouped_collect

        got = grouped_collect(
            ray.data.from_arrow(rand_table).repartition(8), ["k"], "x", alias="xs"
        ).to_pandas()
        exp = (
            rand_table.to_pandas().groupby("k")["x"].apply(lambda s: sorted(s)).to_dict()
        )
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            assert np.allclose(list(row["xs"]), exp[row["k"]])

    def test_polygon_index_grid_res_bucketing(self):
        """grid_res bucketed index must return identical assignments to
        the linear scan at 10k polygons — and touch far fewer polygons."""
        from edkray.geo.pip import PolygonIndex

        rng = np.random.default_rng(31)
        npoly = 10_000
        cx = rng.uniform(-175, 175, npoly)
        cy = rng.uniform(-80, 80, npoly)
        w = rng.uniform(0.5, 3.0, npoly)
        rings = [
            np.array([[x - d, y - d], [x + d, y - d], [x + d, y + d], [x - d, y + d]])
            for x, y, d in zip(cx, cy, w)
        ]
        ids = [f"p{i:05d}" for i in range(npoly)]
        lon = rng.uniform(-180, 180, 5000)
        lat = rng.uniform(-85, 85, 5000)
        import time

        linear = PolygonIndex(ids, rings)
        t0 = time.perf_counter(); exp = linear.query(lon, lat); t_lin = time.perf_counter() - t0
        bucketed = PolygonIndex(ids, rings, grid_res=6)
        t0 = time.perf_counter(); got = bucketed.query(lon, lat); t_buc = time.perf_counter() - t0
        assert (got == exp).all()
        assert sum(x is not None for x in got) > 100  # non-trivial hit rate
        assert t_buc < t_lin  # sub-linear scan actually pays off


class TestRound4Fixes:
    def test_batched_signature_kernels_match_per_doc(self):
        """VERDICT r3 item 4: the cross-document MinHash/SimHash batch
        kernels (one rolling-hash pass over a concatenated buffer +
        segmented reduce) must reproduce the per-doc originals bit for
        bit, including the short-doc (len<=k) and empty-doc edges and
        the oversized-doc chunked path."""
        import random
        import string

        import edkray.ops.dedup as dd
        from edkray.ops.dedup import (
            _batch_signatures,
            _perm_params,
            minhash_signature,
            simhash64,
            simhash_column,
        )
        from edkray.ops.text import batch_kgram_hashes, kgram_hashes

        rng = random.Random(3)
        docs = []
        for _ in range(200):
            n = rng.choice([0, 1, 3, 7, 8, 9, 20, 150, 1200])
            docs.append("".join(rng.choice(string.ascii_letters + " àé中") for _ in range(n)))
        docs += ["", None, "abc"]

        datas = [(t or "").encode("utf-8", "ignore") for t in docs]
        grams, counts = batch_kgram_hashes(datas, 8)
        off = np.concatenate([[0], np.cumsum(counts)])
        for i, d in enumerate(datas):
            assert np.array_equal(kgram_hashes(d, 8), grams[off[i]:off[i + 1]]), i

        a, b = _perm_params(64)
        sigs = _batch_signatures(docs, 64, 8, a, b)
        for i, t in enumerate(docs):
            assert np.array_equal(sigs[i], minhash_signature(t or "", 64, 8, a, b)), i

        # oversized-doc accumulate path: force a tiny chunk budget
        old = dd._SIG_CHUNK_GRAMS
        try:
            dd._SIG_CHUNK_GRAMS = 300
            assert np.array_equal(sigs, dd._batch_signatures(docs, 64, 8, a, b))
        finally:
            dd._SIG_CHUNK_GRAMS = old

        out = simhash_column(
            pa.table({"text": pa.array(docs, type=pa.large_string())})
        )["simhash"].to_numpy(zero_copy_only=False)
        for i, t in enumerate(docs):
            assert out[i] == simhash64(t or "", 4), i

    def test_id_partitioned_mode_matches_broadcast_no_driver_ids(
        self, ray_session, monkeypatch
    ):
        """VERDICT r3 item 3: id_mode="partitioned" must produce the
        broadcast path's exact output while never materializing the
        candidate-id array on the driver (_collect_ids is forbidden)."""
        import ray
        import ray.data

        import edkray.ops.dedup as dd
        from edkray.ops.dedup import embedding_dup_pairs, minhash_lsh_pairs

        def _gather(out):
            tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
            if not tabs:
                return set()
            d = pa.concat_tables(tabs).to_pydict()
            return set(zip(d["id_a"], d["id_b"]))

        base = "the quick brown fox jumps over the lazy dog " * 8
        texts = [base, base + "tail", "totally different words here " * 6] + [
            f"unique filler document number {i} with its own content" for i in range(30)
        ]
        tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                        "text": pa.array(texts)})
        rng = np.random.default_rng(23)
        emb = rng.normal(size=(40, 16))
        emb[1] = emb[0] + rng.normal(scale=1e-4, size=16)
        etbl = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                         "embedding": pa.array(list(emb), type=pa.list_(pa.float64()))})

        exp_mh = _gather(minhash_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=0.5, id_mode="broadcast"))
        exp_emb = _gather(embedding_dup_pairs(
            ray.data.from_arrow(etbl), threshold=0.999, id_mode="broadcast"))
        assert (0, 1) in exp_mh and (0, 1) in exp_emb

        def _boom(uniq):
            raise AssertionError("driver-side candidate-id materialization in partitioned mode")

        monkeypatch.setattr(dd, "_collect_ids", _boom)
        got_mh = _gather(minhash_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=0.5, id_mode="partitioned"))
        got_emb = _gather(embedding_dup_pairs(
            ray.data.from_arrow(etbl), threshold=0.999, id_mode="partitioned"))
        assert got_mh == exp_mh
        assert got_emb == exp_emb

    def test_absent_candidate_doc_pairs_dropped(self, ray_session, monkeypatch):
        """ADVICE r3: a candidate pair whose ids vanished from the corpus
        must be dropped, not emitted as a perfect duplicate (two absent
        docs used to verify as jaccard/est=1.0 via the ''-sentinel)."""
        import ray.data

        import edkray.ops.dedup as dd
        from edkray.ops.dedup import minhash_jaccard_pairs, minhash_lsh_pairs

        base = "the quick brown fox jumps over the lazy dog " * 8
        tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                        "text": pa.array([base, base + "tail"])})

        real = dd._minhash_candidates

        def _with_ghosts(*args, **kwargs):
            cand = real(*args, **kwargs)
            ghost = ray.data.from_arrow(pa.table(
                {"id_a": pa.array([7777], type=pa.int64()),
                 "id_b": pa.array([7778], type=pa.int64())}))
            return cand.union(ghost)

        monkeypatch.setattr(dd, "_minhash_candidates", _with_ghosts)
        for fn, kw in ((minhash_jaccard_pairs, dict(threshold=0.5)),
                       (minhash_lsh_pairs, dict(threshold=0.5))):
            out = fn(ray.data.from_arrow(tbl), **kw).to_pandas()
            got = set(zip(out.id_a, out.id_b))
            assert (0, 1) in got, fn.__name__
            assert (7777, 7778) not in got, fn.__name__

    def test_keyless_asof_join_large(self, ray_session):
        """VERDICT r3 item 7: asof_join_large with on=[] — time-range
        partitioning with boundary replication — must match pandas
        merge_asof (backward + forward) and np.interp (linear) exactly,
        including matches that cross range-bucket boundaries."""
        import ray.data

        from edkray.ops.joins import asof_join_large

        rng = np.random.default_rng(7)
        nl, nr = 4000, 600
        lts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 10**6, nl), unit="s")
        rts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            np.unique(rng.integers(-10**4, int(1.2 * 10**6), nr).astype(np.int64)), unit="s")
        left = pd.DataFrame({"event_id": np.arange(nl), "ts": lts})
        right = pd.DataFrame({"ts": rts, "val": rng.normal(size=len(rts)),
                              "tag": rng.integers(0, 100, len(rts))})

        for direction in ("backward", "forward"):
            got = asof_join_large(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right).repartition(4),
                on=[], left_ts="ts", right_ts="ts", direction=direction,
                num_buckets=8,
            ).to_pandas().sort_values("event_id").reset_index(drop=True)
            exp = pd.merge_asof(
                left.sort_values("ts"), right.sort_values("ts"), on="ts",
                direction=direction, suffixes=("", "_r"),
            ).sort_values("event_id").reset_index(drop=True)
            for c in ("val", "tag"):
                a, b = got[c].to_numpy(), exp[c].to_numpy()
                na = pd.isna(a) & pd.isna(b)
                assert ((a == b) | na).all(), (direction, c)

        goti = asof_join_large(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(4),
            on=[], left_ts="ts", right_ts="ts",
            interpolate="linear", value_cols=["val"], num_buckets=8,
        ).to_pandas().sort_values("event_id")["val"].to_numpy()
        t = left["ts"].astype("int64").to_numpy()
        rt = right["ts"].astype("int64").to_numpy()
        order = np.argsort(rt)
        # np.interp holds flat beyond the ends — the engine's edge rule
        expi = np.interp(t, rt[order], right["val"].to_numpy()[order])
        assert np.allclose(goti, expi, atol=1e-9)

    def test_salted_bucket_per_row_deterministic(self):
        """ADVICE r3: hot-key salt must be a per-row value, not a
        batch-local position — the same rows must land in the same
        buckets no matter how the input is split into batches, and a
        hot key's rows must actually spread across > 1 bucket even when
        fed one row at a time (the old round-robin restarted at 0 per
        batch, concentrating small batches in low-salt buckets)."""
        from edkray.ops.shuffle import BUCKET_COL, _key_hash, _salted_bucket

        n = 512
        tbl = pa.table({"k": pa.array(np.zeros(n, dtype=np.int64)),
                        "v": pa.array(np.arange(n, dtype=np.int64))})
        kh = np.sort(np.unique(_key_hash(tbl, ["k"], 11)))
        splits = np.array([8], dtype=np.int64)
        whole = _salted_bucket(tbl, ["k"], 64, 11, kh, splits)[BUCKET_COL].to_numpy(
            zero_copy_only=False)
        # one row per batch — the worst case for position-based salts
        single = np.concatenate([
            _salted_bucket(tbl.slice(i, 1), ["k"], 64, 11, kh, splits)[
                BUCKET_COL].to_numpy(zero_copy_only=False)
            for i in range(n)
        ])
        assert (whole == single).all()
        assert len(np.unique(single)) > 1  # actually spread, not all salt 0

    def test_hot_key_merge_requires_keys_in_output(self, ray_session):
        """ADVICE r3: fn dropping the key columns under hot_key_merge
        must raise instead of silently emitting unmerged partials."""
        import polars as pl
        import ray.data

        from edkray.ops.shuffle import bucketed_group_map

        rng = np.random.default_rng(3)
        tbl = pa.table({"k": pa.array(np.zeros(5000, dtype=np.int64)),
                        "v": pa.array(rng.integers(0, 10, 5000))})

        def drops_key(t: pa.Table) -> pa.Table:
            return pl.from_arrow(t).group_by("k").agg(
                pl.col("v").sum().alias("sv")).drop("k").to_arrow()

        with pytest.raises(ValueError, match="retain key columns"):
            bucketed_group_map(
                ray.data.from_arrow(tbl), ["k"], drops_key,
                hot_key_merge=drops_key, hot_key_budget=100,
            ).materialize()

    def test_tilereader_passthrough_collision_suffixed(self, ray_session, tmp_path):
        """ADVICE r3: a passthrough tag whose name already exists in the
        tile's data must be suffixed, not emitted as a duplicate column."""
        import pyarrow.parquet as pq_

        from edkray.sources.window import TileReader

        p = str(tmp_path / "tile.parquet")
        pq_.write_table(pa.table({"doc_id": pa.array([1, 2, 3]),
                                  "date": pa.array(["inner"] * 3)}), p)
        rd = TileReader(passthrough=["tile_name", "date"])
        out = rd(pa.table({"path": pa.array([p]),
                           "row_offset": pa.array([0]),
                           "num_rows": pa.array([3]),
                           "tile_name": pa.array(["t0"]),
                           "date": pa.array(["2024-01-01"])}))
        names = out.schema.names
        assert len(names) == len(set(names))  # no duplicate column names
        assert "date_meta" in names and out["date_meta"].to_pylist() == ["2024-01-01"] * 3
        assert out["date"].to_pylist() == ["inner"] * 3
        assert out["tile_name"].to_pylist() == ["t0"] * 3


class TestRepetitionAndContamination:
    def test_repetition_stats_known_values(self):
        from edkray.ops.text import repetition_stats

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(["a b a b a", "", "x", "p q r s"]),
        })
        out = repetition_stats(tbl).to_pydict()
        assert out["n_tokens"] == [5, 0, 1, 4]
        # doc0: tokens {a×3, b×2} → 1 - 2/5; bigrams: "a b"×2,"b a"×2 → 2/4
        assert out["dup_token_frac"][0] == pytest.approx(1 - 2 / 5)
        assert out["top_bigram_frac"][0] == pytest.approx(0.5)
        # empty and single-token docs: both fracs 0
        assert out["dup_token_frac"][1:3] == [0.0, 0.0]
        assert out["top_bigram_frac"][1:3] == [0.0, 0.0]
        # all-unique doc: dup 0, every bigram unique → 1/3
        assert out["dup_token_frac"][3] == 0.0
        assert out["top_bigram_frac"][3] == pytest.approx(1 / 3)

    def test_repetition_upserts_existing_column(self):
        from edkray.ops.text import repetition_stats

        tbl = pa.table({"text": pa.array(["a a"]), "n_tokens": pa.array([99], type=pa.int64())})
        out = repetition_stats(tbl)
        assert out.column("n_tokens").to_pylist() == [2]
        assert out.schema.names.count("n_tokens") == 1

    def test_contaminator_actor_pool(self, ray_session):
        import ray
        import ray.data

        from edkray.ops.text import Contaminator

        docs = [
            {"doc_id": 0, "text": "clean document nothing here"},
            {"doc_id": 1, "text": "prefix SECRET BENCHMARK STRING suffix"},
            {"doc_id": 2, "text": "has OTHER NEEDLE and SECRET BENCHMARK STRING"},
        ]
        ref = ray.put(["SECRET BENCHMARK STRING", "OTHER NEEDLE"])
        out = (
            ray.data.from_items(docs)
            .map_batches(
                Contaminator,
                fn_constructor_kwargs={"needles_ref": ref},
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out.n_hits.tolist() == [0, 1, 2]
        assert out.contaminated.tolist() == [False, True, True]


class TestStratifiedSample:
    def test_exact_rank_semantics_and_determinism(self, ray_session):
        import numpy as np
        import ray.data

        from edkray.ops.aggregate import stratified_sample

        rng = np.random.default_rng(5)
        langs = rng.choice(["en", "de", "fr"], 300)
        items = [{"doc_id": int(i), "lang": str(l)} for i, l in enumerate(langs)]
        ds = ray.data.from_items(items)
        got = stratified_sample(ds, ["lang"], 7, "doc_id").to_pandas()
        got = got.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        # reference: per-lang 7 smallest knuth hashes
        import pandas as pd

        df = pd.DataFrame(items)
        h = (df.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        df["h"] = h.astype(np.int64)
        exp = (
            df.sort_values(["lang", "h", "doc_id"])
            .groupby("lang")
            .head(7)[["doc_id", "lang"]]
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "lang"]], exp)
        # second run identical (no randomness)
        got2 = stratified_sample(ds, ["lang"], 7, "doc_id").to_pandas()
        got2 = got2.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["doc_id", "lang"]], got2[["doc_id", "lang"]])

    def test_small_groups_kept_whole(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import stratified_sample

        ds = ray.data.from_items(
            [{"doc_id": i, "lang": "solo" if i == 0 else "big"} for i in range(50)]
        )
        out = stratified_sample(ds, ["lang"], 10, "doc_id").to_pandas()
        sizes = out.groupby("lang").size()
        assert sizes["solo"] == 1 and sizes["big"] == 10

    def test_negative_ids_rejected(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import stratified_sample

        ds = ray.data.from_items([{"doc_id": -1, "lang": "en"}])
        import pytest as _pytest

        with _pytest.raises(Exception, match="negative"):
            stratified_sample(ds, ["lang"], 1, "doc_id").materialize()


class TestGroupedQuantile:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data

        from edkray.ops.aggregate import grouped_quantile_disc

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 500),
            "v": rng.integers(0, 40, 500),
        })
        got = (
            grouped_quantile_disc(
                ray.data.from_pandas(df), ["k"], "v",
                [0.0, 0.25, 0.5, 0.9, 1.0], ["q0", "q25", "q50", "q90", "q100"],
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        exp = duckdb.sql(
            """SELECT k, quantile_disc(v, 0.0) q0, quantile_disc(v, 0.25) q25,
                      quantile_disc(v, 0.5) q50, quantile_disc(v, 0.9) q90,
                      quantile_disc(v, 1.0) q100
               FROM df GROUP BY k ORDER BY k"""
        ).df()
        for c in ["q0", "q25", "q50", "q90", "q100"]:
            assert got[c].tolist() == exp[c].tolist(), c

    def test_single_value_groups(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_quantile_disc

        ds = ray.data.from_items([{"k": "x", "v": 7}])
        out = grouped_quantile_disc(ds, ["k"], "v", [0.5], ["q50"], count_alias="n").to_pandas()
        assert out.q50.tolist() == [7] and out.n.tolist() == [1]


class TestPiiScrub:
    def test_counts_and_redaction(self):
        from edkray.ops.text import pii_scrub

        tbl = pa.table({
            "text": pa.array([
                "mail a.b+x@foo-bar.co.uk or c@d.org now",
                "call 415-555-1234 or 4155551234",
                "srv at 10.0.0.255:8080",
                "clean text",
            ])
        })
        out = pii_scrub(tbl).to_pydict()
        assert out["n_email"] == [2, 0, 0, 0]
        assert out["n_phone"] == [0, 2, 0, 0]
        assert out["n_ip"] == [0, 0, 1, 0]
        assert out["text"] == [
            "mail <EMAIL> or <EMAIL> now",
            "call <PHONE> or <PHONE>",
            "srv at <IP>:8080",
            "clean text",
        ]

    def test_out_col_preserves_original(self):
        from edkray.ops.text import pii_scrub

        tbl = pa.table({"text": pa.array(["x@y.io"])})
        out = pii_scrub(tbl, out_col="clean_text").to_pydict()
        assert out["text"] == ["x@y.io"] and out["clean_text"] == ["<EMAIL>"]


class TestReviewRegressions:
    """Round-4 code-review fixes: mixed ts dtypes in the keyless as-of,
    null text in Contaminator, RIFF non-WAVE payloads, pushdown scan
    with the filter column not projected."""

    def test_keyless_asof_mixed_ts_units(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from edkray.ops.joins import asof_join_large

        rng = np.random.default_rng(23)
        lt = pd.DataFrame({
            "ts": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(np.sort(rng.integers(0, 10**6, 400)), unit="s"),
            "lv": np.arange(400),
        })  # from_pandas → timestamp[ns]
        rt = pd.DataFrame({
            "ts": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(np.sort(rng.integers(0, 10**6, 150)), unit="s"),
            "rv": np.arange(150) * 10,
        })
        rt_us = rt.copy()
        rt_us["ts"] = rt_us["ts"].astype("datetime64[us]")  # right in us, left in ns
        got = (
            asof_join_large(
                ray.data.from_pandas(lt), ray.data.from_pandas(rt_us),
                on=[], left_ts="ts", right_ts="ts", num_buckets=8,
            )
            .to_pandas().sort_values(["ts", "lv"]).reset_index(drop=True)
        )
        exp = pd.merge_asof(
            lt.sort_values("ts"), rt.sort_values("ts"), on="ts", suffixes=("", "_r")
        ).sort_values(["ts", "lv"]).reset_index(drop=True)
        assert got.rv.fillna(-1).tolist() == exp.rv.fillna(-1).tolist()

    def test_keyless_asof_date32_right(self, ray_session):
        import datetime as dt

        import pandas as pd
        import pyarrow as pa
        import ray.data

        from edkray.ops.joins import asof_join_large

        lt = pd.DataFrame({
            "ts": pd.to_datetime(["2020-01-02 12:00", "2020-01-05 01:00", "2020-01-09 00:00"]),
            "lv": [1, 2, 3],
        })
        right = pa.table({
            "ts": pa.array([dt.date(2020, 1, 1), dt.date(2020, 1, 4), dt.date(2020, 1, 8)],
                           type=pa.date32()),
            "rv": pa.array([10, 20, 30], type=pa.int64()),
        })
        got = (
            asof_join_large(
                ray.data.from_pandas(lt), ray.data.from_arrow(right),
                on=[], left_ts="ts", right_ts="ts", num_buckets=4,
            )
            .to_pandas().sort_values("lv")
        )
        assert got.rv.tolist() == [10, 20, 30]

    def test_contaminator_null_text(self, ray_session):
        import ray

        from edkray.ops.text import Contaminator

        c = Contaminator(["NEEDLE"])
        out = c(pa.table({"text": pa.array(["has NEEDLE", None, "clean"])})).to_pydict()
        assert out["n_hits"] == [1, 0, 0]
        assert out["contaminated"] == [True, False, False]

    def test_decode_audio_riff_non_wave(self):
        from edkray.ops.multimodal import decode_audio

        webp_ish = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"\x00" * 16
        with pytest.raises(NotImplementedError):
            decode_audio(webp_ish)

    def test_pushdown_scan_filter_col_not_projected(self, ray_session, tmp_path):
        import datetime as dt

        import numpy as np
        import pyarrow.parquet as pq

        from edkray.sources.registry import get_source

        ts = pa.array(
            [dt.datetime(2020, 1, 1) + dt.timedelta(hours=i) for i in range(48)],
            type=pa.timestamp("us"),
        )
        tbl = pa.table({"ts": ts, "pid": pa.array(np.arange(48), type=pa.int64()),
                        "val": pa.array(np.arange(48.0))})
        p = str(tmp_path / "x.parquet")
        pq.write_table(tbl, p)
        eng = get_source("pushdown_parquet", ts_col="ts")
        out = eng.scan(
            p,
            time_range=(dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2)),
            columns=["pid", "val"],  # ts filtered but NOT projected
        ).to_pandas()
        assert sorted(out.pid.tolist()) == list(range(24))
        assert list(out.columns) == ["pid", "val"]


class TestFingerprintVectorized:
    def test_matches_per_doc_definition(self):
        import numpy as np

        from edkray.ops.text import fingerprint, kgram_hashes, polyhash

        rng = np.random.default_rng(7)
        words = ["alpha", "beta", "gamma", "x", "the", "data"]
        texts = [" ".join(rng.choice(words, int(rng.integers(0, 60)))) for _ in range(200)]
        texts += ["", "ab", "abcdefgh", "abcdefghi", None, "a" * 7, "b" * 8, "c" * 24]
        out = fingerprint(pa.table({"text": pa.array(texts, type=pa.string())}))
        f_new = np.array(out["fingerprint"].to_pylist(), dtype=np.uint64)
        d_new = np.array(out["doc_hash"].to_pylist(), dtype=np.uint64)
        for i, text in enumerate(texts):  # the per-doc reference definition
            data = (text or "").encode("utf-8", "ignore")
            h = kgram_hashes(data, 8)
            if len(h) == 0:
                assert f_new[i] == 0 and d_new[i] == 0
                continue
            assert d_new[i] == polyhash(data)
            nwin = max(len(h) - 16 + 1, 1)
            mins = np.lib.stride_tricks.sliding_window_view(
                h, min(16, len(h))).min(axis=1)[:nwin]
            acc = np.uint64(0)
            for m in np.unique(mins):
                acc ^= m
            assert f_new[i] == acc, i


class TestConnectedComponents:
    """ops/graph.py — hash-to-min components over dup-pair edge lists."""

    @staticmethod
    def _expected(edges):
        # tiny driver-side union-find as the reference implementation
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    @staticmethod
    def _pairs_ds(edges):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                    "id_b": pa.array([b for _, b in edges], type=pa.int64()),
                }
            )
        ).repartition(4)

    def test_chain_needs_multiple_rounds(self, ray_session):
        from edkray.ops.graph import connected_components

        edges = [(i, i + 1) for i in range(20)]  # diameter 20
        out = connected_components(self._pairs_ds(edges), num_buckets=4).to_pandas()
        got = dict(zip(out.doc_id, out.cluster_id))
        assert got == {i: 0 for i in range(21)}

    def test_random_graph_matches_union_find(self, ray_session):
        from edkray.ops.graph import connected_components

        rng = np.random.default_rng(7)
        # sparse random graph over a sparse id space (forces many
        # non-trivial components and exercises bucket boundaries)
        ids = rng.choice(100_000, size=400, replace=False)
        edges = [
            (int(ids[i]), int(ids[j]))
            for i, j in rng.integers(0, len(ids), size=(300, 2))
            if i != j
        ]
        out = connected_components(self._pairs_ds(edges), num_buckets=8).to_pandas()
        got = dict(zip(out.doc_id, out.cluster_id))
        assert got == self._expected(edges)

    def test_self_loops_and_duplicate_edges(self, ray_session):
        from edkray.ops.graph import connected_components

        edges = [(5, 5), (1, 2), (2, 1), (1, 2), (8, 9)]
        out = connected_components(self._pairs_ds(edges), num_buckets=4).to_pandas()
        got = dict(zip(out.doc_id, out.cluster_id))
        assert got == {5: 5, 1: 1, 2: 1, 8: 8, 9: 8}

    def test_dedup_decisions_keep_flags(self, ray_session):
        from edkray.ops.graph import dedup_decisions

        edges = [(3, 1), (1, 7), (10, 11)]
        out = dedup_decisions(self._pairs_ds(edges), num_buckets=4).to_pandas()
        out = out.sort_values("doc_id")
        assert list(out.doc_id) == [1, 3, 7, 10, 11]
        assert list(out.cluster_id) == [1, 1, 1, 10, 10]
        assert list(out.keep) == [True, False, False, True, False]


class TestKmeans:
    """ops/cluster.py — full-dataset distributed Lloyd k-means."""

    @staticmethod
    def _ref_fit(x, k, iters):
        # driver-side reference: same init (k smallest ids = first k
        # rows here), same tie-break (argmin → lowest cluster)
        cent = x[:k].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            new = cent.copy()
            for j in range(k):
                if (a == j).any():
                    new[j] = x[a == j].mean(axis=0)
            cent = new
        return cent

    @staticmethod
    def _ds(x):
        import ray.data

        from edkray.utils import matrix_to_list_array

        t = pa.table({
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": matrix_to_list_array(x),
        })
        return ray.data.from_arrow(t).repartition(6)

    def test_matches_numpy_reference(self, ray_session):
        from edkray.ops.cluster import kmeans_assign, kmeans_fit

        rng = np.random.default_rng(3)
        x = rng.normal(size=(300, 8))
        ds = self._ds(x)
        cent = kmeans_fit(ds, k=5, iters=3)
        ref = self._ref_fit(x, 5, 3)
        np.testing.assert_allclose(cent, ref, rtol=1e-12)
        out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
        d2 = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
        np.testing.assert_array_equal(out["cluster"].to_numpy(),
                                      np.argmin(d2, axis=1))

    def test_distributed_fold_matches_driver_fold(self, ray_session):
        from edkray.ops.cluster import kmeans_fit

        rng = np.random.default_rng(4)
        x = rng.normal(size=(200, 6))
        ds = self._ds(x)
        driver = kmeans_fit(ds, k=4, iters=2, max_partial_rows=10**6)
        forced = kmeans_fit(ds, k=4, iters=2, max_partial_rows=0)
        np.testing.assert_allclose(forced, driver, rtol=1e-12)

    def test_empty_cluster_keeps_centroid(self, ray_session):
        from edkray.ops.cluster import kmeans_fit

        # row 1 duplicates row 0 → ties break to cluster 0, cluster 1
        # receives nothing and must hold its initial centroid
        x = np.array([[0.0, 0.0], [0.0, 0.0], [0.1, 0.0], [0.2, 0.1]])
        cent = kmeans_fit(self._ds(x), k=2, iters=2)
        np.testing.assert_allclose(cent[1], [0.0, 0.0])
        ref = self._ref_fit(x, 2, 2)
        np.testing.assert_allclose(cent, ref, rtol=1e-12)


class TestBigramLm:
    """ops/lm.py — distributed stupid-backoff bigram LM scoring."""

    @staticmethod
    def _ds(texts, ids=None):
        import ray.data

        ids = ids or list(range(len(texts)))
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })).repartition(3)

    def test_hand_computed_scores(self, ray_session):
        from edkray.ops.lm import fit_bigram_lm, score_bigram_lm

        # corpus: "a b a b" and "a c"; unigrams a:3 b:2 c:1, N=6
        # bigrams: (a,b):2 (b,a):1 (a,c):1
        ds = self._ds(["a b a b", "a c"])
        model = fit_bigram_lm(ds, min_count=1)
        out = score_bigram_lm(ds, model).to_pandas().sort_values("doc_id")
        # doc0: ln(2/3), ln(1/2), ln(2/3) → mean
        exp0 = (2 * np.log(2 / 3) + np.log(1 / 2)) / 3
        # doc1: ln(1/3)
        np.testing.assert_allclose(out.lm_score.to_numpy(),
                                   [exp0, np.log(1 / 3)], rtol=1e-12)
        assert list(out.n_tokens) == [4, 2]

    def test_min_count_pruning_backoff(self, ray_session):
        from edkray.ops.lm import fit_bigram_lm, score_bigram_lm

        # (a,b) seen twice survives min_count=2; (b,a),(a,c) pruned →
        # backoff 0.4 * C(w2)/N
        ds = self._ds(["a b a b", "a c"])
        model = fit_bigram_lm(ds, min_count=2)
        assert len(model.big) == 1
        out = score_bigram_lm(ds, model).to_pandas().sort_values("doc_id")
        exp0 = (2 * np.log(2 / 3) + np.log(0.4 * 3 / 6)) / 3
        exp1 = np.log(0.4 * 1 / 6)
        np.testing.assert_allclose(out.lm_score.to_numpy(), [exp0, exp1],
                                   rtol=1e-12)

    def test_null_and_short_docs_excluded(self, ray_session):
        from edkray.ops.lm import fit_bigram_lm, score_bigram_lm

        ds = self._ds(["a b", None, "x", ""], ids=[1, 2, 3, 4])
        model = fit_bigram_lm(ds, min_count=1)
        # null contributes no tokens; "" is one empty token; "x" one token
        assert model.total == 4
        out = score_bigram_lm(ds, model).to_pandas()
        assert list(out.doc_id) == [1]  # only the doc with a bigram

    def test_model_bound_enforced(self, ray_session):
        from edkray.ops.lm import fit_bigram_lm

        with pytest.raises(ValueError, match="max_model_rows"):
            fit_bigram_lm(self._ds(["a b c d e f g h"]), max_model_rows=3)


class TestParagraphDedup:
    """paragraph_dedup vs a pandas first-occurrence recompute."""

    @staticmethod
    def _oracle(docs: pd.DataFrame, sep: str, words_per_para, joiner) -> pd.DataFrame:
        rows = []
        for _, r in docs.iterrows():
            if words_per_para is None:
                paras = r["text"].split(sep)
            else:
                ws = r["text"].split(" ")
                paras = [
                    " ".join(ws[i : i + words_per_para])
                    for i in range(0, len(ws), words_per_para)
                ]
            for pos, para in enumerate(paras):
                rows.append((r["doc_id"], pos, para))
        ex = pd.DataFrame(rows, columns=["doc_id", "pos", "para"])
        ex = ex.sort_values(["doc_id", "pos"], kind="stable")
        first = ~ex.duplicated("para", keep="first")
        out = []
        for doc_id, grp in ex.groupby("doc_id"):
            kept = grp[first.loc[grp.index]]
            out.append(
                (
                    doc_id,
                    joiner.join(kept["para"]),
                    len(grp),
                    len(kept),
                )
            )
        return pd.DataFrame(out, columns=["doc_id", "text_dedup", "n_paras", "n_kept"])

    def test_line_mode_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        rng = np.random.default_rng(11)
        vocab = ["alpha beta", "gamma delta", "eps zeta", "eta theta", "iota kappa"]
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(200),
                "text": [
                    "\n".join(rng.choice(vocab, size=rng.integers(1, 6)))
                    for _ in range(200)
                ],
            }
        )
        got = (
            paragraph_dedup(ray.data.from_pandas(docs).repartition(8),
                            num_buckets=8, doc_buckets=8)
            .to_pandas()
        )
        _df_eq(got, self._oracle(docs, "\n", None, "\n"))

    def test_doc_fully_dropped_and_empty(self, ray_session):
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        docs = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a\nb", "a\nb", ""]}
        )
        got = (
            paragraph_dedup(ray.data.from_pandas(docs), num_buckets=4, doc_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.loc[1, "text_dedup"] == "" and got.loc[1, "n_kept"] == 0
        # doc 3's single empty paragraph: first occurrence of "" wins somewhere;
        # the oracle agrees on whatever the global rule gives
        _df_eq(got, self._oracle(docs, "\n", None, "\n"))

    def test_word_chunk_mode_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        rng = np.random.default_rng(5)
        vocab = ["row", "scan", "key", "agg", "part", "fast"]
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(150),
                "text": [
                    " ".join(rng.choice(vocab, size=rng.integers(4, 20)))
                    for _ in range(150)
                ],
            }
        )
        got = (
            paragraph_dedup(
                ray.data.from_pandas(docs).repartition(6),
                words_per_para=4, num_buckets=8, doc_buckets=8,
            )
            .to_pandas()
        )
        _df_eq(got, self._oracle(docs, "\n", 4, " "))

    def test_hot_paragraph_salting_matches_unsalted(self, ray_session):
        """Force the hot-key salted decision path (a boilerplate paragraph
        in 60% of docs, budget far below its count) and require output
        identical to the unsalted run."""
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        rng = np.random.default_rng(7)
        boiler = "accept all cookies"
        texts = [
            (boiler + "\n" if rng.random() < 0.6 else "")
            + f"unique line {i}\nshared {i % 40}"
            for i in range(3000)
        ]
        docs = pd.DataFrame({"doc_id": np.arange(3000), "text": texts})
        base = (
            paragraph_dedup(ray.data.from_pandas(docs).repartition(8),
                            num_buckets=8, doc_buckets=8)
            .to_pandas()
        )
        salted = (
            paragraph_dedup(
                ray.data.from_pandas(docs).repartition(8),
                num_buckets=8, doc_buckets=8, hot_paragraph_budget=100,
            )
            .to_pandas()
        )
        _df_eq(salted, base)


class TestSemDedup:
    @staticmethod
    def _oracle(ids, emb, assign, tau):
        units = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        keep = {}
        for c in np.unique(assign):
            idx = np.where(assign == c)[0]
            idx = idx[np.argsort(ids[idx])]
            u = units[idx]
            g = u @ u.T
            for r in range(len(idx)):
                keep[ids[idx[r]]] = not (g[r, :r] >= tau).any()
        return keep

    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.ops.cluster import kmeans_assign, kmeans_fit, semdedup
        from edkray.utils import matrix_to_list_array

        rng = np.random.default_rng(9)
        # 3 tight modes + noise → real clusters with near-dups inside
        modes = rng.normal(size=(3, 16))
        emb = np.concatenate(
            [m + 0.05 * rng.normal(size=(120, 16)) for m in modes]
        )
        ids = rng.permutation(len(emb)).astype(np.int64)
        tab = pa.table({"vec_id": pa.array(ids), "embedding": matrix_to_list_array(emb)})
        ds = ray.data.from_arrow(tab).repartition(6)
        cent = kmeans_fit(ds, k=3, iters=2)
        got = semdedup(ds, cent, tau=0.9, num_buckets=4, block=7).to_pandas()

        assign_df = kmeans_assign(ds, cent).to_pandas()
        order = np.argsort(assign_df["vec_id"].to_numpy())
        srt = np.argsort(ids)
        exp_keep = self._oracle(
            ids[srt],
            emb[srt],
            assign_df.sort_values("vec_id")["cluster"].to_numpy(),
            0.9,
        )
        assert len(got) == len(emb)
        dropped = int((~got["keep"]).sum())
        assert dropped > 0, "degenerate test: nothing dropped"
        for _, r in got.iterrows():
            assert exp_keep[r["vec_id"]] == r["keep"], r["vec_id"]

    def test_block_boundary_invariance(self, ray_session):
        """keep mask identical for block sizes 1 < cluster and block ≫ cluster."""
        import ray.data

        from edkray.ops.cluster import kmeans_fit, semdedup
        from edkray.utils import matrix_to_list_array

        rng = np.random.default_rng(21)
        emb = rng.normal(size=(200, 8))
        emb[50:60] = emb[40:50] + 1e-6  # exact-ish dups
        tab = pa.table(
            {"vec_id": pa.array(np.arange(200, dtype=np.int64)),
             "embedding": matrix_to_list_array(emb)}
        )
        ds = ray.data.from_arrow(tab)
        cent = kmeans_fit(ds, k=2, iters=1)
        a = semdedup(ds, cent, tau=0.99, block=3).to_pandas().sort_values("vec_id")
        b = semdedup(ds, cent, tau=0.99, block=4096).to_pandas().sort_values("vec_id")
        assert (a["keep"].to_numpy() == b["keep"].to_numpy()).all()
        assert (~a["keep"]).sum() >= 10

    def test_cluster_size_cap(self, ray_session):
        """Oversized clusters are recursively split (VERDICT r4 #6):
        the capped path must not invent duplicates among distinct
        vectors, must still drop identical co-leaf duplicates, and a
        degenerate identical-vector cluster must fall back to id-order
        chunks instead of recursing forever / going O(n²)."""
        import ray.data

        from edkray.ops.cluster import semdedup
        from edkray.utils import matrix_to_list_array

        rng = np.random.default_rng(4)
        # one mega-cluster: a single centroid captures everything
        cent = np.zeros((1, 12))
        emb = rng.normal(size=(600, 12))
        emb /= np.linalg.norm(emb, axis=1)[:, None]
        emb[250] = emb[249]  # planted exact dup (same leaf every split)
        tab = pa.table(
            {"vec_id": pa.array(np.arange(600, dtype=np.int64)),
             "embedding": matrix_to_list_array(emb)}
        )
        ds = ray.data.from_arrow(tab)
        got = semdedup(ds, cent, tau=0.999, max_cluster_size=64).to_pandas()
        got = got.sort_values("vec_id").reset_index(drop=True)
        assert len(got) == 600 and (got["cluster"] == 0).all()
        assert not got.loc[250, "keep"] and got.loc[249, "keep"]
        # random 12-d unit vectors are nowhere near cos 0.999
        assert int((~got["keep"]).sum()) == 1
        # uncapped run agrees where the cap is not hit
        ref = semdedup(ds, cent, tau=0.999).to_pandas().sort_values("vec_id")
        assert (got["keep"].to_numpy() == ref["keep"].to_numpy()).all()

        # degenerate: 500 identical vectors, cap 64 → id-order chunks,
        # first of each chunk survives
        same = np.tile(emb[0], (500, 1))
        tab2 = pa.table(
            {"vec_id": pa.array(np.arange(500, dtype=np.int64)),
             "embedding": matrix_to_list_array(same)}
        )
        got2 = semdedup(
            ray.data.from_arrow(tab2), cent, tau=0.95, max_cluster_size=64
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)
        keepers = got2.loc[got2["keep"], "vec_id"].to_numpy()
        assert list(keepers) == [i * 64 for i in range(8)]


class TestBm25:
    def test_matches_bruteforce(self, ray_session):
        import math

        import ray.data

        from edkray.ops.search import bm25_topk

        rng = np.random.default_rng(13)
        vocab = ["cat", "dog", "fish", "bird", "tree", "rock"]
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
                    for _ in range(300)
                ],
            }
        )
        terms = ["cat", "tree"]
        k1, b, k = 1.2, 0.75, 12

        # brute force
        split = [t.split(" ") for t in docs["text"]]
        n = len(docs)
        avgdl = sum(len(w) for w in split) / n
        df = {t: sum(t in w for w in split) for t in terms}
        scores = {}
        for did, ws in zip(docs["doc_id"], split):
            s = 0.0
            for t in terms:
                tf = ws.count(t)
                if tf:
                    idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
            if s > 0:
                scores[did] = s
        exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

        got = (
            bm25_topk(ray.data.from_pandas(docs).repartition(7), terms, k=k,
                      k1=k1, b=b)
            .to_pandas()
        )
        assert list(got["doc_id"]) == [d for d, _ in exp]
        assert np.allclose(got["score"], [s for _, s in exp], atol=1e-9)

    def test_absent_term_and_no_hits(self, ray_session):
        import ray.data

        from edkray.ops.search import bm25_topk

        docs = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["aa bb", "bb cc"]}
        )
        out = bm25_topk(ray.data.from_pandas(docs), ["zz"], k=5).to_pandas()
        assert len(out) == 0
        out2 = bm25_topk(ray.data.from_pandas(docs), ["aa", "zz"], k=5).to_pandas()
        assert list(out2["doc_id"]) == [0]


class TestDsir:
    def test_matches_bruteforce(self, ray_session):
        import math

        import ray.data

        from edkray.ops.text import dsir_logweights, polyhash

        rng = np.random.default_rng(17)
        vocab = ["sun", "moon", "star", "rain", "wind", "snow", "fog"]
        n = 400
        langs = rng.choice(["en", "de"], n, p=[0.4, 0.6])
        # target docs biased toward first half of vocab
        texts = []
        for lg in langs:
            p = np.array([3, 3, 3, 1, 1, 1, 1], float) if lg == "en" else np.ones(7)
            texts.append(" ".join(rng.choice(vocab, size=rng.integers(3, 15),
                                             p=p / p.sum())))
        docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                             "text": texts, "lang": langs})

        NB, A = 16, 1.0
        bmap = {w: int(polyhash(w.encode()) % np.uint64(NB)) for w in vocab}
        raw = np.zeros(NB)
        tgt = np.zeros(NB)
        for t, lg in zip(texts, langs):
            for w in t.split(" "):
                raw[bmap[w]] += 1
                if lg == "en":
                    tgt[bmap[w]] += 1
        lr = np.log((tgt + A) / (tgt.sum() + A * NB)) - np.log(
            (raw + A) / (raw.sum() + A * NB))
        exp = {
            did: sum(lr[bmap[w]] for w in t.split(" "))
            for did, t in zip(docs["doc_id"], texts)
        }

        got = (
            dsir_logweights(
                ray.data.from_pandas(docs).repartition(5), "lang", ["en"],
                hash_buckets=NB,
            )
            .to_pandas()
        )
        assert len(got) == n
        for _, r in got.iterrows():
            assert math.isclose(exp[r["doc_id"]], r["dsir_logw"], abs_tol=1e-9)
        # target docs should score higher on average (the op does something)
        m_en = got[docs.set_index("doc_id").loc[got["doc_id"], "lang"].to_numpy() == "en"]["dsir_logw"].mean()
        m_de = got[docs.set_index("doc_id").loc[got["doc_id"], "lang"].to_numpy() == "de"]["dsir_logw"].mean()
        assert m_en > m_de


class TestTemperatureSample:
    def test_quotas_and_determinism(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import temperature_sample

        rng = np.random.default_rng(23)
        sizes = {"a": 800, "b": 200, "c": 50}
        rows = []
        i = 0
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        df = pd.DataFrame(rows, columns=["id", "g"]).sample(frac=1, random_state=1)
        ds = ray.data.from_pandas(df).repartition(6)

        T, N = 0.5, 300
        got = temperature_sample(ds, ["g"], N, T, "id", num_buckets=8).to_pandas()

        powv = np.array([sizes["a"], sizes["b"], sizes["c"]], float) ** T
        exp_quota = np.floor(N * powv / powv.sum()).astype(int)
        counts = got.groupby("g")["id"].count()
        assert counts["a"] == exp_quota[0]
        assert counts["b"] == exp_quota[1]
        assert counts["c"] == exp_quota[2]
        # flattening: group c overrepresented vs natural share
        assert counts["c"] / counts.sum() > sizes["c"] / sum(sizes.values())

        # deterministic: rerun equals
        got2 = temperature_sample(
            ray.data.from_pandas(df).repartition(3), ["g"], N, T, "id", num_buckets=4
        ).to_pandas()
        assert sorted(got["id"]) == sorted(got2["id"])

        # membership rule: per group, the quota smallest Knuth hashes
        knuth = np.uint64(2654435761)
        for g, q in zip(sizes, exp_quota):
            ids = df[df["g"] == g]["id"].to_numpy().astype(np.uint64)
            h = (ids * knuth) % np.uint64(1 << 32)
            expect = set(ids[np.lexsort((ids, h))][:q].astype(int))
            assert set(got[got["g"] == g]["id"]) == expect

    def test_t1_keeps_natural_proportions(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import temperature_sample

        df = pd.DataFrame(
            {"id": np.arange(1000), "g": ["x"] * 900 + ["y"] * 100}
        )
        got = temperature_sample(
            ray.data.from_pandas(df), ["g"], 100, 1.0, "id", num_buckets=4
        ).to_pandas()
        c = got.groupby("g")["id"].count()
        assert c["x"] == 90 and c["y"] == 10


class TestTfidfTerms:
    def test_matches_pandas_reference(self, ray_session):
        import math

        import numpy as np
        import ray.data

        from edkray.ops.text import tfidf_terms

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(40)]
        docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
                for _ in range(120)]
        tbl = pa.table({"doc_id": pa.array(range(120), type=pa.int64()),
                        "text": pa.array(docs)})
        got = (
            tfidf_terms(ray.data.from_arrow(tbl).repartition(5), k=3)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        # reference
        tf: dict = {}
        for i, d in enumerate(docs):
            for w in d.split():
                tf[(i, w)] = tf.get((i, w), 0) + 1
        df: dict = {}
        for (_, w) in tf:
            df[w] = df.get(w, 0) + 1
        n = float(len(docs))
        rows = [(i, w, c, df[w], c * math.log(n / df[w]))
                for (i, w), c in tf.items()]
        exp = []
        for i in range(120):
            mine = sorted((r for r in rows if r[0] == i),
                          key=lambda r: (-r[4], r[1]))[:3]
            exp.extend((*r, rk) for rk, r in enumerate(mine))
        import pandas as pd

        edf = pd.DataFrame(exp, columns=["doc_id", "term", "tf", "df",
                                         "tfidf", "rank"])
        edf = edf.sort_values(["doc_id", "rank"]).reset_index(drop=True)
        assert len(got) == len(edf)
        assert (got.doc_id.values == edf.doc_id.values).all()
        assert (got.term.values == edf.term.values).all()
        assert (got.tf.values == edf.tf.values).all()
        assert (got["df"].values == edf["df"].values).all()
        assert np.allclose(got.tfidf.values, edf.tfidf.values, atol=1e-12)

    def test_empty_text_docs_absent(self, ray_session):
        import ray.data

        from edkray.ops.text import tfidf_terms

        tbl = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                        "text": pa.array(["hello world", ""])})
        got = tfidf_terms(ray.data.from_arrow(tbl), k=5).to_pandas()
        assert set(got.doc_id) == {1}
        # idf uses N = ALL docs (2), so ln(2/1) for both unique terms
        assert np.isclose(got.tfidf.max(), np.log(2.0))


class TestLinearFit:
    def _data(self, n=4000, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        x1 = rng.uniform(1, 50, n)
        x2 = rng.uniform(0, 10, n)
        y = 3.0 * x1 - 2.0 * x2 + 5.0 + rng.normal(0, 0.5, n)
        return pa.table({"x1": x1, "x2": x2, "y": y}), x1, x2, y

    def test_matches_lstsq_and_partition_invariant(self, ray_session):
        import numpy as np
        import ray.data

        from edkray.ops.search import linear_fit

        tbl, x1, x2, y = self._data()
        X = np.column_stack([x1, x2, np.ones(len(y))])
        ref, *_ = np.linalg.lstsq(X, y, rcond=None)
        vals = {}
        for parts in (1, 9):
            out = linear_fit(ray.data.from_arrow(tbl).repartition(parts),
                             ["x1", "x2"], "y")
            got = dict(zip(out["term"].to_pylist(), out["value"].to_pylist()))
            assert abs(got["x1"] - ref[0]) < 1e-8
            assert abs(got["x2"] - ref[1]) < 1e-8
            assert abs(got["intercept"] - ref[2]) < 1e-8
            assert 0.99 < got["r2"] <= 1.0
            vals[parts] = got
        # partitioning changes only float summation order
        for k in vals[1]:
            assert abs(vals[1][k] - vals[9][k]) < 1e-9

    def test_ridge_matches_closed_form(self, ray_session):
        import numpy as np
        import ray.data

        from edkray.ops.search import linear_fit

        tbl, x1, x2, y = self._data(n=1000, seed=9)
        out = linear_fit(ray.data.from_arrow(tbl).repartition(4),
                         ["x1", "x2"], "y", l2=50.0)
        got = dict(zip(out["term"].to_pylist(), out["value"].to_pylist()))
        X = np.column_stack([x1, x2])
        xc = X - X.mean(axis=0)
        yc = y - y.mean()
        beta = np.linalg.solve(xc.T @ xc + 50.0 * np.eye(2), xc.T @ yc)
        assert abs(got["x1"] - beta[0]) < 1e-8
        assert abs(got["x2"] - beta[1]) < 1e-8
        assert abs(got["intercept"]
                   - (y.mean() - beta @ X.mean(axis=0))) < 1e-8

    def test_empty_raises(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.search import linear_fit

        tbl = pa.table({"x1": pa.array([], type=pa.float64()),
                        "y": pa.array([], type=pa.float64())})
        with pytest.raises(ValueError, match="empty"):
            linear_fit(ray.data.from_arrow(tbl), ["x1"], "y")


def _bpe_reference(word_counts: dict, num_merges: int) -> list:
    """From-scratch BPE reference: recount every pair from scratch each
    step (no incremental updates) — the slow-but-obvious Sennrich loop
    that pins ops/text.py:_bpe_merge_loop's index maintenance."""
    words = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for step in range(num_merges):
        pairs: dict = {}
        for w, c in words.items():
            for p in zip(w, w[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((step, best[0], best[1], pairs[best]))
        new_words = {}
        for w, c in words.items():
            nw, j = [], 0
            while j < len(w):
                if j < len(w) - 1 and (w[j], w[j + 1]) == best:
                    nw.append(best[0] + best[1])
                    j += 2
                else:
                    nw.append(w[j])
                    j += 1
            new_words[tuple(nw)] = new_words.get(tuple(nw), 0) + c
        words = new_words
    return merges


class TestBpeTrain:
    def test_classic_sennrich_example(self, ray_session):
        import ray.data

        from edkray.ops.text import bpe_train

        # Sennrich et al. 2016 §3 worked example: corpus frequencies
        # low×5 lower×2 newest×6 widest×3 — first merges must be
        # (e,s) 9, (es,t) 9, (est,</w>) 9, (l,o) 7, (lo,w) 7
        docs = ["low "] * 5 + ["lower "] * 2 + ["newest "] * 6 + ["widest "] * 3
        tbl = pa.table({"text": pa.array(docs)})
        got = bpe_train(ray.data.from_arrow(tbl), num_merges=5)
        rows = list(zip(got["step"].to_pylist(), got["left"].to_pylist(),
                        got["right"].to_pylist(), got["pair_count"].to_pylist()))
        assert rows == [(0, "e", "s", 9), (1, "es", "t", 9),
                        (2, "est", "</w>", 9), (3, "l", "o", 7),
                        (4, "lo", "w", 7)]

    def test_matches_recount_reference_and_deterministic(self, ray_session):
        import numpy as np
        import ray.data

        from edkray.ops.text import bpe_train

        rng = np.random.default_rng(11)
        vocab = ["alpha", "alphabet", "beta", "betting", "gamma", "game",
                 "games", "delta", "felt", "fell", "yellow", "mellow"]
        texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(300)]
        tbl = pa.table({"text": pa.array(texts)})
        wc: dict = {}
        for t in texts:
            for w in t.split():
                wc[w] = wc.get(w, 0) + 1
        exp = _bpe_reference(wc, 25)
        for parts in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            got = bpe_train(ds, num_merges=25)
            rows = list(zip(got["step"].to_pylist(), got["left"].to_pylist(),
                            got["right"].to_pylist(),
                            got["pair_count"].to_pylist()))
            assert rows == exp

    def test_min_count_prunes_tail(self, ray_session):
        import ray.data

        from edkray.ops.text import bpe_train

        tbl = pa.table({"text": pa.array(["zzq"] + ["common words"] * 10)})
        got = bpe_train(ray.data.from_arrow(tbl), num_merges=50, min_count=2)
        merged = set(got["left"].to_pylist()) | set(got["right"].to_pylist())
        assert not any("z" in s or "q" in s for s in merged)

    def test_vocab_limit_enforced(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.text import bpe_train

        import itertools

        letters = "abcdefghijklmnopqrstuvwxyz"
        words = ["".join(t) for t in itertools.product(letters, repeat=2)][:600]
        texts = [" ".join(words[i::40]) for i in range(40)]
        tbl = pa.table({"text": pa.array(texts)})
        with pytest.raises(ValueError, match="vocab_limit"):
            bpe_train(ray.data.from_arrow(tbl).repartition(4),
                      num_merges=5, vocab_limit=100)


class TestBpeTokenCount:
    def test_matches_python_re(self, ray_session):
        import re

        from edkray.ops.text import BPE_ISH_PATTERN, bpe_token_count

        texts = [
            "key agg row 42 scan's fast!",
            "  padded  text 7x",
            "",
            "a1b2",
            "UPPER lower 123 ... ---",
        ]
        tab = pa.table({"text": pa.array(texts)})
        got = bpe_token_count(tab)["n_bpe_tokens"].to_pylist()
        exp = [len(re.findall(BPE_ISH_PATTERN, t)) for t in texts]
        assert got == exp

    def test_upserts_existing_column(self, ray_session):
        from edkray.ops.text import bpe_token_count

        tab = pa.table({"text": pa.array(["a b"]), "n_bpe_tokens": pa.array([99])})
        out = bpe_token_count(tab)
        assert out["n_bpe_tokens"].to_pylist() == [2]
        assert out.num_columns == 2


class TestGumbelWeightedSample:
    def test_matches_bruteforce_and_is_weighted(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import gumbel_weighted_sample

        rng = np.random.default_rng(31)
        n_rows = 5000
        # two strata: high weight vs low weight
        logw = np.where(np.arange(n_rows) % 10 == 0, 2.0, -2.0)
        df = pd.DataFrame({"doc_id": np.arange(n_rows, dtype=np.int64),
                           "dsir_logw": logw})
        got = (
            gumbel_weighted_sample(
                ray.data.from_pandas(df).repartition(8), "dsir_logw", 200, "doc_id"
            )
            .to_pandas()
        )
        # brute-force replica
        knuth = np.uint64(2654435761)
        h = (df["doc_id"].to_numpy().astype(np.uint64) * knuth) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        key = logw + (-np.log(-np.log(u)))
        order = np.lexsort((df["doc_id"].to_numpy(), -key))
        exp_ids = df["doc_id"].to_numpy()[order][:200]
        assert list(got["doc_id"]) == list(exp_ids)
        assert np.allclose(got["gumbel_key"], key[order][:200], atol=1e-12)
        # weighting bites: high-weight rows are 10% of corpus but dominate
        frac_high = (got["doc_id"] % 10 == 0).mean()
        assert frac_high > 0.5

    def test_rerun_deterministic(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import gumbel_weighted_sample

        df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                           "dsir_logw": np.zeros(1000)})
        a = gumbel_weighted_sample(ray.data.from_pandas(df).repartition(3),
                                   "dsir_logw", 50, "doc_id").to_pandas()
        b = gumbel_weighted_sample(ray.data.from_pandas(df).repartition(9),
                                   "dsir_logw", 50, "doc_id").to_pandas()
        assert list(a["doc_id"]) == list(b["doc_id"])


class TestDuplicatedSpans:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.ops.text import duplicated_span_stats

        rng = np.random.default_rng(41)
        words = ["aaaa", "bbbb", "cccc", "dddd", "eeee"]
        texts = [" ".join(rng.choice(words, size=rng.integers(10, 25)))
                 for _ in range(120)]
        # plant an exact 40-char duplicated span across two docs
        span = "THIS EXACT SPAN IS DUPLICATED VERBATIM!"
        texts[3] = texts[3] + " " + span
        texts[77] = span + " " + texts[77]
        docs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                             "text": texts})
        L = 12
        got = (
            duplicated_span_stats(
                ray.data.from_pandas(docs).repartition(5), L=L, num_buckets=8
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )

        # brute force on gram strings
        from collections import Counter

        grams_by_doc = {
            i: [t[p : p + L] for p in range(len(t) - L + 1)]
            for i, t in enumerate(texts)
        }
        cnt = Counter(g for gs in grams_by_doc.values() for g in gs)
        for i, gs in grams_by_doc.items():
            nd = sum(1 for g in gs if cnt[g] > 1)
            assert got.loc[i, "n_grams"] == len(gs), i
            assert got.loc[i, "n_dup_grams"] == nd, i
        # the planted span must register on both carriers
        assert got.loc[3, "n_dup_grams"] >= len(span) - L + 1
        assert got.loc[77, "n_dup_grams"] >= len(span) - L + 1


class TestRangeJoin:
    def test_overlaps_and_misses_match_pandas(self, ray_session):
        import ray.data

        from edkray.ops.joins import range_join_broadcast

        rng = np.random.default_rng(47)
        n = 5000
        on = rng.integers(0, 1000, n)
        left = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                             "x": on.astype(np.int64)})
        # overlapping intervals + a gap nothing falls into
        ivs = pa.table({
            "iv": pa.array(np.arange(5, dtype=np.int64)),
            "lo": pa.array(np.array([0, 50, 100, 2000, 900], dtype=np.int64)),
            "hi": pa.array(np.array([100, 150, 200, 2100, 1000], dtype=np.int64)),
        })
        got = (
            range_join_broadcast(
                ray.data.from_pandas(left).repartition(4), ivs, "x", "lo", "hi",
                chunk=2,
            )
            .to_pandas()
        )
        exp_rows = []
        for rid, x in zip(left["rid"], left["x"]):
            for iv, lo, hi in zip([0, 1, 2, 3, 4], [0, 50, 100, 2000, 900],
                                  [100, 150, 200, 2100, 1000]):
                if lo <= x < hi:
                    exp_rows.append((rid, x, iv, lo, hi))
        exp = pd.DataFrame(exp_rows, columns=["rid", "x", "iv", "lo", "hi"])
        _df_eq(got, exp)
        assert (got["iv"] != 3).all()  # empty window matches nothing
        # overlap emits twice: values in [50,100) or [100,150) etc.
        assert len(got) > n * 0.3

    def test_timestamp_on_col_and_name_collision(self, ray_session):
        import ray.data

        from edkray.ops.joins import range_join_broadcast

        ts = pd.to_datetime(["2024-01-01 06:00", "2024-01-02 06:00"])
        left = pd.DataFrame({"event_id": [1, 2], "ts": ts,
                             "win_id": [7, 7]})  # collides with interval col
        base = np.datetime64("2024-01-01T00:00:00", "us")
        day = np.timedelta64(86400_000_000, "us")
        ivs = pa.table({
            "win_id": pa.array(np.array([0], dtype=np.int64)),
            "ws": pa.array(np.array([base])),
            "we": pa.array(np.array([base + day])),
        })
        got = range_join_broadcast(
            ray.data.from_pandas(left), ivs, "ts", "ws", "we"
        ).to_pandas()
        assert list(got["event_id"]) == [1]
        assert "win_id_r" in got.columns and got["win_id_r"].iloc[0] == 0


class TestGlobalShuffleShard:
    def test_matches_global_order_and_shards(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import global_shuffle_shard

        n, S = 4000, 100
        ids = np.random.default_rng(51).permutation(n).astype(np.int64)
        df = pd.DataFrame({"doc_id": ids})
        got = (
            global_shuffle_shard(
                ray.data.from_pandas(df).repartition(7), "doc_id", S, range_bits=5
            )
            .to_pandas()
        )
        knuth = np.uint64(2654435761)
        h = (ids.astype(np.uint64) * knuth) % np.uint64(1 << 32)
        order = np.lexsort((ids, h))
        exp_pos = np.empty(n, dtype=np.int64)
        exp_pos[order] = np.arange(n)
        exp = pd.DataFrame(
            {"doc_id": ids, "shard": exp_pos // S, "pos_in_shard": exp_pos % S}
        )
        _df_eq(got, exp)
        # every shard but the last is exactly full
        sizes = got.groupby("shard")["doc_id"].count()
        assert (sizes.iloc[:-1] == S).all() if len(sizes) > 1 else True
        assert sizes.sum() == n

    def test_permutation_is_shuffled(self, ray_session):
        """The hash order must not be the identity order (sanity that
        this is a shuffle, not a sort by id)."""
        import ray.data

        from edkray.ops.aggregate import global_shuffle_shard

        df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
        got = (
            global_shuffle_shard(ray.data.from_pandas(df), "doc_id", 50)
            .to_pandas()
            .sort_values("doc_id")
        )
        pos = (got["shard"] * 50 + got["pos_in_shard"]).to_numpy()
        # correlation of id order vs shuffled position ~ 0
        corr = np.corrcoef(np.arange(2000), pos)[0, 1]
        assert abs(corr) < 0.1


class TestHeavyHitters:
    def test_exact_set_zipf(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import heavy_hitters

        rng = np.random.default_rng(61)
        items = np.concatenate(
            [np.zeros(4000), np.ones(2000), rng.integers(2, 102, 4000)]
        ).astype(int)
        rng.shuffle(items)
        df = pd.DataFrame({"w": [f"it{i}" for i in items]})
        k = 10
        got = (
            heavy_hitters(ray.data.from_pandas(df).repartition(6), "w", k=k)
            .to_pandas()
        )
        exact = df["w"].value_counts()
        thresh = len(df) / (k + 1)
        exp = exact[exact > thresh]
        assert set(got["w"]) == set(exp.index)
        assert dict(zip(got["w"], got["cnt"])) == exp.to_dict()

    def test_no_heavy_hitters_and_uniform(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import heavy_hitters

        # 100 uniform items, k=5 → threshold n/6 far above any count
        df = pd.DataFrame({"w": [f"u{i % 100}" for i in range(5000)]})
        got = heavy_hitters(ray.data.from_pandas(df).repartition(4), "w", k=5).to_pandas()
        assert len(got) == 0


class TestNormalizeText:
    def test_normalizer_and_dedup(self, ray_session):
        import ray.data

        from edkray.ops.dedup import exact_dedup
        from edkray.ops.text import normalize_text

        tab = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    ["Same   Text!!", "same text", "  other  ", "OTHER."]
                ),
            }
        )
        out = normalize_text(tab)
        assert out["text_norm"].to_pylist() == [
            "same text", "same text", "other", "other"
        ]
        ds = ray.data.from_arrow(out.select(["doc_id", "text_norm"]))
        kept = exact_dedup(ds, ["text_norm"], ["doc_id"], num_buckets=2).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 3]


class TestCcnetBuckets:
    def test_terciles_partition_the_corpus(self, ray_session, sf_dir=None):
        from edkray.queries import q_ccnet_buckets

        out = q_ccnet_buckets("/root/testdata/sf0.001").to_pandas()
        assert set(out["bucket"]) == {"head", "middle", "tail"}
        assert out["n_docs"].sum() == 500
        # head has the best (largest) mean ln-prob
        m = out.set_index("bucket")["avg_score"]
        assert m["head"] > m["middle"] > m["tail"]
        # terciles: buckets within ±40% of each other (rounding ties shift a few)
        assert out["n_docs"].max() <= out["n_docs"].min() * 1.8


class TestPackSequences:
    def test_per_shard_prefix_sums(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import pack_sequences

        rng = np.random.default_rng(71)
        n = 3000
        df = pd.DataFrame(
            {
                "shard": rng.integers(0, 20, n).astype(np.int64),
                "pos_in_shard": np.zeros(n, dtype=np.int64),
                "n_tokens": rng.integers(1, 400, n).astype(np.int64),
            }
        )
        # positions unique within shard
        df["pos_in_shard"] = df.groupby("shard").cumcount()
        got = (
            pack_sequences(
                ray.data.from_pandas(df.sample(frac=1, random_state=2)).repartition(6),
                "shard", "pos_in_shard", "n_tokens", 512, num_buckets=8,
            )
            .to_pandas()
            .sort_values(["shard", "pos_in_shard"])
            .reset_index(drop=True)
        )
        exp = df.sort_values(["shard", "pos_in_shard"]).reset_index(drop=True)
        exp["tok_offset"] = exp.groupby("shard")["n_tokens"].cumsum() - exp["n_tokens"]
        exp["seq_id"] = exp["tok_offset"] // 512
        _df_eq(got, exp)
        # packing is dense: within a shard offsets have no gaps
        for _, g in got.groupby("shard"):
            toks = g.sort_values("pos_in_shard")
            assert (toks["tok_offset"].to_numpy()[1:]
                    == (toks["tok_offset"] + toks["n_tokens"]).to_numpy()[:-1]).all()


class TestUnicodeRobustness:
    """The new text ops must not crash or miscount on non-ASCII input
    (the synthetic corpus is ASCII; real webtext is not)."""

    def test_paragraph_dedup_unicode(self, ray_session):
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["héllo wörld\nสวัสดี ครับ", "héllo wörld\nunique züile"],
            }
        )
        out = (
            paragraph_dedup(ray.data.from_pandas(docs), num_buckets=2, doc_buckets=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "n_kept"] == 2
        assert out.loc[2, "n_kept"] == 1
        assert out.loc[2, "text_dedup"] == "unique züile"

    def test_dup_spans_unicode_multibyte(self, ray_session):
        import ray.data

        from edkray.ops.text import duplicated_span_stats

        # multibyte chars: engine grams are BYTE-grams; totals must agree
        # with the engine's own byte length, not char count
        docs = pd.DataFrame(
            {"doc_id": [1, 2],
             "text": ["ñ" * 40, "ñ" * 40]}
        )
        out = (
            duplicated_span_stats(ray.data.from_pandas(docs), L=16, num_buckets=2)
            .to_pandas()
            .set_index("doc_id")
        )
        # identical docs: every gram duplicated
        assert (out["dup_frac"] == 1.0).all()
        assert (out["n_grams"] == 80 - 16 + 1).all()  # 80 BYTES per doc

    def test_bm25_and_dsir_unicode(self, ray_session):
        import ray.data

        from edkray.ops.search import bm25_topk
        from edkray.ops.text import dsir_logweights

        docs = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["café noir café", "thé vert"],
                "lang": ["fr", "fr"],
            }
        )
        top = bm25_topk(ray.data.from_pandas(docs), ["café"], k=2).to_pandas()
        assert list(top["doc_id"]) == [0]
        w = dsir_logweights(
            ray.data.from_pandas(docs), "lang", ["fr"], hash_buckets=8
        ).to_pandas()
        assert len(w) == 2 and w["dsir_logw"].notna().all()


class TestParagraphDedupStringIds:
    def test_url_keys(self, ray_session):
        import ray.data

        from edkray.ops.dedup import paragraph_dedup

        docs = pd.DataFrame(
            {
                "url": [f"https://x.example/{i}" for i in range(3)],
                "text": ["a b\nc d", "c d\nz z", "a b\nq q"],
            }
        )
        out = (
            paragraph_dedup(
                ray.data.from_pandas(docs), id_col="url",
                num_buckets=2, doc_buckets=2,
            )
            .to_pandas()
            .set_index("url")
        )
        assert out.loc["https://x.example/0", "n_kept"] == 2
        assert out.loc["https://x.example/1", "text_dedup"] == "z z"
        assert out.loc["https://x.example/2", "text_dedup"] == "q q"


class TestPageRank:
    """ops/graph.py:pagerank — power iteration vs a numpy reference."""

    @staticmethod
    def _np_pagerank(edges, num_iters=5, d=0.85):
        import collections

        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        outdeg = collections.Counter(a for a, _ in edges)
        rank = np.full(n, 1.0 / n)
        for _ in range(num_iters):
            new = np.full(n, (1.0 - d) / n)
            for a, b in edges:
                new[idx[b]] += rank[idx[a]] * d / outdeg[a]
            rank = new
        return dict(zip(nodes, rank))

    @staticmethod
    def _edges_ds(edges):
        import ray.data

        return ray.data.from_arrow(
            pa.table({
                "src": pa.array([a for a, _ in edges], type=pa.int64()),
                "dst": pa.array([b for _, b in edges], type=pa.int64()),
            })
        )

    def test_matches_numpy_reference_both_modes(self, ray_session):
        from edkray.ops.graph import pagerank

        rng = np.random.default_rng(3)
        edges = [(int(a), int(b)) for a, b in zip(
            rng.integers(0, 40, 200), rng.integers(0, 40, 200))]
        exp = self._np_pagerank(edges)
        for mode in ("dense", "shuffle"):
            got = pagerank(
                self._edges_ds(edges), num_iters=5, num_buckets=4, mode=mode
            ).to_pandas()
            assert len(got) == len(exp), mode
            for node, rank in zip(got["node"], got["rank"]):
                assert abs(rank - exp[node]) < 1e-9, (mode, node)

    def test_dense_limit_enforced(self, ray_session):
        import pytest as _pytest

        from edkray.ops.graph import pagerank

        ds = self._edges_ds([(0, 1), (1, 0)])
        with _pytest.raises(ValueError):
            pagerank(ds, num_iters=1, mode="dense", dense_limit=1)
        # auto falls back to shuffle instead of raising
        out = pagerank(ds, num_iters=1, mode="auto", dense_limit=1).to_pandas()
        assert len(out) == 2

    def test_dangling_mass_dropped(self, ray_session):
        from edkray.ops.graph import pagerank

        # node 2 has no out-edges: its rank leaks (ranks sum < 1)
        edges = [(0, 1), (1, 2), (0, 2)]
        got = pagerank(self._edges_ds(edges), num_iters=3, num_buckets=2).to_pandas()
        exp = self._np_pagerank(edges, num_iters=3)
        assert len(got) == 3
        for node, rank in zip(got["node"], got["rank"]):
            assert abs(rank - exp[node]) < 1e-12
        assert got["rank"].sum() < 1.0

    def test_duplicate_edges_are_multiedges(self, ray_session):
        from edkray.ops.graph import pagerank

        edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
        got = pagerank(self._edges_ds(edges), num_iters=4, num_buckets=2).to_pandas()
        exp = self._np_pagerank(edges, num_iters=4)
        for node, rank in zip(got["node"], got["rank"]):
            assert abs(rank - exp[node]) < 1e-12


class TestHits:
    """ops/graph.py:hits — hubs & authorities vs a numpy reference
    (L1-normalized per half-iteration, multigraph, dangling → 0)."""

    @staticmethod
    def _np_hits(edges, num_iters=3):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        si = np.array([idx[a] for a, _ in edges])
        di = np.array([idx[b] for _, b in edges])
        hub = np.ones(n)
        auth = np.zeros(n)
        for _ in range(num_iters):
            auth = np.bincount(di, weights=hub[si], minlength=n)
            auth = auth / auth.sum()
            hub = np.bincount(si, weights=auth[di], minlength=n)
            hub = hub / hub.sum()
        return {v: (auth[idx[v]], hub[idx[v]]) for v in nodes}

    def test_matches_numpy_reference(self, ray_session):
        from edkray.ops.graph import hits

        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in zip(
            rng.integers(0, 30, 120), rng.integers(0, 30, 120))]
        exp = self._np_hits(edges)
        got = hits(TestPageRank._edges_ds(edges), num_iters=3, num_buckets=4).to_pandas()
        assert len(got) == len(exp)
        for node, a, h in zip(got["node"], got["score_auth"], got["score_hub"]):
            ea, eh = exp[node]
            assert abs(a - ea) < 1e-9 and abs(h - eh) < 1e-9, node

    def test_dangling_nodes_zero(self, ray_session):
        from edkray.ops.graph import hits

        # 2 has no out-edges → hub 0; 0 has no in-edges → auth 0
        got = hits(TestPageRank._edges_ds([(0, 1), (1, 2)]), num_iters=2,
                   num_buckets=2).to_pandas().set_index("node")
        assert got.loc[2, "score_hub"] == 0.0
        assert got.loc[0, "score_auth"] == 0.0
        assert abs(got["score_auth"].sum() - 1.0) < 1e-12
        assert abs(got["score_hub"].sum() - 1.0) < 1e-12

    def test_empty_edges_keep_schema(self, ray_session):
        import ray.data

        from edkray.ops.graph import hits

        empty = ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
        out = hits(empty, num_iters=1, num_buckets=2)
        assert out.schema() is not None
        assert set(out.schema().names) == {"node", "score_auth", "score_hub"}


class TestGopherRules:
    """ops/text.py:gopher_rules — pinned rule semantics (no Ray needed)."""

    def _run(self, texts, **kw):
        from edkray.ops.text import gopher_rules

        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        import polars as pl

        return pl.from_arrow(gopher_rules(t, **kw))

    def test_word_count_bounds(self):
        out = self._run(["w " * 10, "the " + "word " * 60], min_words=50)
        assert out["rule_words"].to_list() == [False, True]

    def test_zero_words_fails_everything(self):
        out = self._run(["", "   "])
        for c in ("rule_words", "rule_wordlen", "rule_symbol", "rule_alpha",
                  "rule_stop", "keep"):
            assert out[c].to_list() == [False, False], c

    def test_mean_word_length(self):
        # 2-char words → mwl 2 < 3 fails; 5-char words pass
        out = self._run(["ab " * 60, "abcde " * 60])
        assert out["rule_wordlen"].to_list() == [False, True]
        assert abs(out["mean_word_len"][1] - 5.0) < 1e-12

    def test_symbol_ratio(self):
        ok = "the " + "word " * 99
        bad = "the " + "word " * 79 + "# " * 20
        out = self._run([ok, bad])
        assert out["rule_symbol"].to_list() == [True, False]

    def test_alpha_fraction(self):
        mostly_num = "the " + "123 " * 99
        out = self._run([mostly_num])
        assert out["rule_alpha"].to_list() == [False]

    def test_stopword_threshold(self):
        no_stop = "word " * 60
        one_stop = "the " + "word " * 60
        two_stop = "the and " + "word " * 60
        out = self._run([no_stop, one_stop, two_stop], min_stopwords=2)
        assert out["rule_stop"].to_list() == [False, False, True]
        out1 = self._run([no_stop, one_stop], min_stopwords=1)
        assert out1["rule_stop"].to_list() == [False, True]

    def test_keep_composite(self):
        good = "the " + "word " * 60
        out = self._run([good])
        assert out["keep"].to_list() == [True]

    def test_sql_mirror_agrees(self):
        import duckdb

        from edkray.queries import _SQL_GOPHER

        texts = ["", "the " + "word " * 60, "ab " * 70, "the " + "123 " * 99,
                 "x # " * 60, "the quick brown fox " * 20]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        eng = self._run(texts).select(
            ["doc_id", "n_words", "mean_word_len", "rule_words", "rule_wordlen",
             "rule_symbol", "rule_alpha", "rule_stop", "keep"]).to_pandas()
        con = duckdb.connect()
        con.register("documents", t)
        ora = con.sql(_SQL_GOPHER).df()
        pd.testing.assert_frame_equal(
            eng.sort_values("doc_id").reset_index(drop=True),
            ora.sort_values("doc_id").reset_index(drop=True),
            check_dtype=False,
        )


class TestChunkDocuments:
    """ops/text.py:chunk_documents — overlapping window semantics."""

    def _run(self, texts, chunk=3, stride=2):
        from edkray.ops.text import chunk_documents

        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        import polars as pl

        return pl.from_arrow(chunk_documents(t, chunk_words=chunk, stride_words=stride))

    def test_windows_and_tail(self):
        out = self._run(["w1 w2 w3 w4 w5"])
        assert out["chunk_text"].to_list() == ["w1 w2 w3", "w3 w4 w5", "w5"]
        assert out["n_chunk_words"].to_list() == [3, 3, 1]
        assert out["chunk_id"].to_list() == [0, 1, 2]

    def test_empty_doc_emits_nothing(self):
        out = self._run(["", "a b"])
        assert out["doc_id"].to_list() == [1]

    def test_doc_shorter_than_chunk(self):
        out = self._run(["only two"], chunk=16, stride=8)
        assert out["chunk_text"].to_list() == ["only two"]
        assert out["n_chunk_words"].to_list() == [2]

    def test_exact_multiple_no_empty_tail(self):
        # n=4, stride=2, chunk=2: offsets 0,2 only (4 is not < 4)
        out = self._run(["a b c d"], chunk=2, stride=2)
        assert out["chunk_text"].to_list() == ["a b", "c d"]

    def test_whitespace_collapse(self):
        out = self._run(["a   b\tc"], chunk=2, stride=2)
        assert out["chunk_text"].to_list() == ["a b", "c"]

    def test_bad_params_raise(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(["a"], chunk=0)
        with _pytest.raises(ValueError):
            self._run(["a"], stride=0)

    def test_sql_mirror_agrees(self):
        import duckdb

        from edkray.queries import _SQL_DOC_CHUNKS

        texts = ["", "one", " ".join(f"w{i}" for i in range(40)), "a b c"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        eng = self._run(texts, chunk=16, stride=8).to_pandas()
        con = duckdb.connect()
        con.register("documents", t)
        ora = con.sql(_SQL_DOC_CHUNKS).df()
        key = ["doc_id", "chunk_id"]
        pd.testing.assert_frame_equal(
            eng.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True)[eng.columns],
            check_dtype=False,
        )


class TestRandomProjection:
    """ops/search.py:projection_matrix / random_projection."""

    def test_matrix_deterministic_and_sparse(self):
        from edkray.ops.search import projection_matrix

        r1 = projection_matrix(64, 8)
        r2 = projection_matrix(64, 8)
        assert np.array_equal(r1, r2)
        assert set(np.unique(r1)) <= {-1.0, 0.0, 1.0}
        # Achlioptas density: ~2/3 zeros
        assert 0.5 < (r1 == 0).mean() < 0.8

    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.search import projection_matrix, random_projection

        rng = np.random.default_rng(5)
        x = rng.normal(size=(30, 16)).astype(np.float32)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        }))
        out = random_projection(ds, d_out=4).to_pandas()
        y = (x.astype(np.float64) @ projection_matrix(16, 4)) * np.sqrt(3.0 / 16)
        assert len(out) == 120
        for _, row in out.iterrows():
            assert abs(row["proj"] - y[int(row["vec_id"]), int(row["dim"])]) < 1e-12


class TestEmbeddingStats:
    """ops/search.py:embedding_stats — streaming per-dim mean/std."""

    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.search import embedding_stats

        rng = np.random.default_rng(11)
        x = rng.normal(loc=0.5, scale=2.0, size=(200, 6)).astype(np.float32)
        ds = ray.data.from_arrow(pa.table({
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        })).repartition(5)  # force multi-block partial combine
        out = embedding_stats(ds, batch_size=32).to_pandas().sort_values("dim")
        xd = x.astype(np.float64)
        np.testing.assert_allclose(out["mean_val"].to_numpy(), xd.mean(axis=0), atol=1e-10)
        np.testing.assert_allclose(out["std_val"].to_numpy(), xd.std(axis=0), atol=1e-10)
        assert list(out["dim"]) == list(range(6))


class TestPca:
    """ops/search.py:embedding_cov / pca_fit / pca_transform."""

    def _ds(self, x):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        })).repartition(4)  # force the multi-partial fold

    def test_cov_matches_numpy(self, ray_session):
        from edkray.ops.search import embedding_cov

        rng = np.random.default_rng(3)
        x = rng.normal(size=(150, 5)).astype(np.float32)
        out = embedding_cov(self._ds(x), batch_size=40).to_pandas()
        ref = np.cov(x.astype(np.float64).T, bias=True)
        assert len(out) == 25
        for _, r in out.iterrows():
            assert abs(r["cov_val"] - ref[int(r["dim_i"]), int(r["dim_j"])]) < 1e-10

    def test_fit_matches_numpy_eig(self, ray_session):
        from edkray.ops.search import pca_fit

        rng = np.random.default_rng(7)
        # anisotropic so eigenvalues are well separated
        x = (rng.normal(size=(200, 6)) * np.array([5, 3, 2, 1, 0.5, 0.1])).astype(np.float32)
        m = pca_fit(self._ds(x), k=3, batch_size=64)
        xd = x.astype(np.float64)
        ref_cov = np.cov(xd.T, bias=True)
        w, v = np.linalg.eigh(ref_cov)
        order = np.argsort(w)[::-1][:3]
        np.testing.assert_allclose(m["eigenvalues"], w[order], atol=1e-9)
        # components match up to the pinned sign convention
        for i, col in enumerate(order):
            ref = v[:, col]
            ref = ref * np.sign(ref[np.abs(ref).argmax()])
            np.testing.assert_allclose(m["components"][i], ref, atol=1e-9)
        # orthonormal rows, descending eigenvalues, explained sums <= 1
        np.testing.assert_allclose(m["components"] @ m["components"].T, np.eye(3), atol=1e-9)
        assert np.all(np.diff(m["eigenvalues"]) <= 1e-12)
        assert 0 < m["explained"].sum() <= 1 + 1e-12

    def test_transform_scores(self, ray_session):
        from edkray.ops.search import pca_fit, pca_transform

        rng = np.random.default_rng(9)
        x = (rng.normal(size=(120, 4)) * np.array([4, 2, 1, 0.2])).astype(np.float32)
        ds = self._ds(x)
        m = pca_fit(ds, k=2, batch_size=50)
        out = pca_transform(ds, m, batch_size=50).to_pandas()
        assert len(out) == 240
        xd = x.astype(np.float64)
        ref = (xd - m["mean"]) @ np.asarray(m["components"]).T
        for _, r in out.iterrows():
            assert abs(r["score"] - ref[int(r["vec_id"]), int(r["component"])]) < 1e-9
        # per-component score variance reproduces the eigenvalue
        var0 = ref[:, 0].var()
        np.testing.assert_allclose(var0, m["eigenvalues"][0], atol=1e-9)


class TestGroupSplit:
    """ops/text.py:group_split — leakage-safe group-aware split."""

    def _run(self, groups, **kw):
        from edkray.ops.text import group_split

        t = pa.table({"doc_id": list(range(len(groups))), "source": groups})
        import polars as pl

        return pl.from_arrow(group_split(t, "source", **kw))

    def test_group_consistency(self):
        out = self._run(["a", "b", "a", "c", "b", "a"])
        by = dict(zip(out["source"], out["split"]))
        for s, g in zip(out["split"], out["source"]):
            assert s == by[g]

    def test_deterministic_across_batches(self):
        a = self._run(["g1", "g2", "g3"])
        b = self._run(["g3", "g1", "g2"])
        da = dict(zip(a["source"], a["split"]))
        db = dict(zip(b["source"], b["split"]))
        assert da == db

    def test_distribution_roughly_matches_fracs(self):
        out = self._run([f"dom{i}.example" for i in range(2000)])
        frac_train = (out["split"] == "train").mean()
        assert 0.75 < frac_train < 0.85

    def test_null_group_goes_to_first(self):
        out = self._run([None, "a"])
        assert out["split"][0] == "train"

    def test_bad_fracs_raise(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(["a"], fracs=(0.5, 0.2))


class TestCooccurrence:
    """ops/text.py:token_cooccurrence / pmi_scores."""

    def _pairs(self, ray_session, texts, window=2):
        import ray.data

        from edkray.ops.text import token_cooccurrence

        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
        out = token_cooccurrence(ds, window=window, num_buckets=4).to_pandas()
        return {(r["wa"], r["wb"]): r["n"] for _, r in out.iterrows()}

    def test_window_and_ordering(self, ray_session):
        got = self._pairs(ray_session, ["c a b a"], window=2)
        # pairs (i<j, j-i<=2): (c,a) (c,b) (a,b) (a,a) (b,a) -> ordered
        assert got == {("a", "c"): 1, ("b", "c"): 1, ("a", "b"): 2, ("a", "a"): 1}

    def test_doc_boundary_not_crossed(self, ray_session):
        got = self._pairs(ray_session, ["x y", "z w"], window=2)
        assert got == {("x", "y"): 1, ("w", "z"): 1}

    def test_window_one(self, ray_session):
        got = self._pairs(ray_session, ["a b c"], window=1)
        assert got == {("a", "b"): 1, ("b", "c"): 1}

    def test_pmi_matches_hand_formula(self, ray_session):
        import math

        import ray.data

        from edkray.ops.text import pmi_scores

        ds = ray.data.from_arrow(pa.table({"text": ["a b a b a"]}))
        out = pmi_scores(ds, window=1, min_pair_count=2, num_buckets=4).to_pandas()
        # tokens: a×3 b×2 (T=5); window-1 pairs: (a,b)×4 (P=4)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["wa"], r["wb"], r["n"]) == ("a", "b", 4)
        expect = math.log((4 / 4) / ((3 / 5) * (2 / 5)))
        assert abs(r["pmi"] - expect) < 1e-12

    def test_pmi_bucketed_equals_broadcast(self, ray_session):
        import ray.data

        from edkray.ops.text import pmi_scores

        texts = ["a b a b a c", "b c b c", "d a d a d"]
        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
        key = ["wa", "wb"]
        bc = pmi_scores(ds, window=2, min_pair_count=2, num_buckets=4) \
            .to_pandas().sort_values(key).reset_index(drop=True)
        bk = pmi_scores(ds, window=2, min_pair_count=2, num_buckets=4,
                        join_mode="bucketed") \
            .to_pandas().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, bk[bc.columns], check_dtype=False)
        assert len(bc) > 0


class TestMahalanobis:
    """ops/search.py:mahalanobis_scores — embedding outlier signal."""

    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.search import mahalanobis_scores

        rng = np.random.default_rng(13)
        x = (rng.normal(size=(300, 5)) * np.array([3, 2, 1, 0.5, 0.2])).astype(np.float32)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        })).repartition(4)
        out = mahalanobis_scores(ds, batch_size=64).to_pandas().sort_values("vec_id")
        xd = x.astype(np.float64)
        mu = xd.mean(axis=0)
        prec = np.linalg.inv(np.cov(xd.T, bias=True) + 1e-9 * np.eye(5))
        c = xd - mu
        ref = np.einsum("ij,jk,ik->i", c, prec, c)
        np.testing.assert_allclose(out["mahalanobis_sq"].to_numpy(), ref, rtol=1e-8)
        # on the fitting corpus E[d^2] = d exactly (population cov)
        assert abs(out["mahalanobis_sq"].mean() - 5.0) < 1e-6

    def test_flags_planted_outlier(self, ray_session):
        import ray.data

        from edkray.ops.search import mahalanobis_scores

        rng = np.random.default_rng(17)
        x = rng.normal(size=(200, 4)).astype(np.float32)
        x[7] = 40.0  # far outside the cloud
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        }))
        out = mahalanobis_scores(ds).to_pandas()
        assert int(out.loc[out["mahalanobis_sq"].idxmax(), "vec_id"]) == 7


class TestSnapshotDiff:
    """ops/diff.py:snapshot_diff — corpus churn classification."""

    def _run(self, ray_session, old_rows, new_rows):
        import ray.data

        from edkray.ops.diff import snapshot_diff

        mk = lambda rows: ray.data.from_arrow(pa.table({
            "url": [r[0] for r in rows], "text": [r[1] for r in rows],
        })).repartition(2)
        out = snapshot_diff(mk(old_rows), mk(new_rows), num_buckets=4).to_pandas()
        if len(out) == 0:
            return {}
        return dict(zip(out["url"], out["status"]))

    def test_all_statuses(self, ray_session):
        got = self._run(
            ray_session,
            [("a", "x"), ("b", "y"), ("c", "z")],
            [("b", "y"), ("c", "z2"), ("d", "w")],
        )
        # a removed, b unchanged (dropped), c changed, d added
        assert got == {"a": "removed", "c": "changed", "d": "added"}

    def test_duplicate_keys_collapse_to_min(self, ray_session):
        got = self._run(
            ray_session,
            [("a", "m"), ("a", "zzz")],   # min = "m"
            [("a", "m"), ("a", "qqq")],   # min = "m" -> unchanged
        )
        assert got == {}

    def test_empty_new_side(self, ray_session):
        got = self._run(ray_session, [("a", "x")], [])
        assert got == {"a": "removed"}

    def test_null_content_presence(self, ray_session):
        # Presence is tracked by side markers, not null cmp values:
        # a: only-old with null content -> removed (NOT added)
        # b: both sides, null vs value   -> changed (IS DISTINCT FROM)
        # c: both sides, null vs null    -> unchanged (dropped)
        # d: only-new with null content  -> added
        got = self._run(
            ray_session,
            [("a", None), ("b", None), ("c", None)],
            [("b", "v"), ("c", None), ("d", None)],
        )
        assert got == {"a": "removed", "b": "changed", "d": "added"}


class TestValidatePages:
    """ops/stages.py:validate_pages — quarantine reasons, pinned order."""

    def _reasons(self, urls, ts=None, texts=None, **kw):
        import datetime as dt

        from edkray.ops.stages import validate_pages

        n = len(urls)
        t = pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts or [dt.datetime(2017, 1, 1)] * n,
                                type=pa.timestamp("us")),
            "text": pa.array(texts or ["ok"] * n, type=pa.string()),
        })
        return validate_pages(t, **kw)["reject_reason"].to_pylist()

    def test_each_rule(self):
        import datetime as dt

        assert self._reasons([""])[0] == "null_url"
        assert self._reasons([None])[0] == "null_url"
        assert self._reasons(["no scheme"])[0] == "bad_url"
        assert self._reasons(["https://a.x/p"], ts=[None])[0] == "null_ts"
        assert self._reasons(["https://a.x/p"],
                             ts=[dt.datetime(1970, 1, 1)])[0] == "ts_out_of_range"
        assert self._reasons(["https://a.x/p"], texts=[None])[0] == "null_text"
        assert self._reasons(["https://a.x/p"], texts=["y" * 11],
                             max_text_chars=10)[0] == "oversized_text"
        assert self._reasons(["https://a.x/p"])[0] is None

    def test_precedence_first_rule_wins(self):
        # empty url + null ts + null text -> null_url
        assert self._reasons([""], ts=[None], texts=[None])[0] == "null_url"

    def test_optional_columns_skipped(self):
        from edkray.ops.stages import validate_pages

        t = pa.table({"url": pa.array(["https://a.x/p"], type=pa.string())})
        out = validate_pages(t, ts_col=None, text_col=None)
        assert out["reject_reason"].to_pylist() == [None]

    def test_missing_named_column_raises(self):
        # A typo'd column name must error, not validate everything clean.
        import pytest

        from edkray.ops.stages import validate_pages

        t = pa.table({"url": pa.array(["https://a.x/p"], type=pa.string())})
        with pytest.raises(KeyError, match="ts_col"):
            validate_pages(t, ts_col="wrac_ts", text_col=None)
        with pytest.raises(KeyError, match="text_col"):
            validate_pages(t, ts_col=None, text_col="body")


class TestApproxQuantiles:
    """ops/aggregate.py — KLL sketch kernels + certificate op."""

    def test_kernel_rank_error_bound(self):
        from edkray.ops.aggregate import _kll_compact, _kll_quantile

        rng = np.random.default_rng(2)
        x = rng.lognormal(size=50000)  # skewed on purpose
        levels = _kll_compact([x.astype(np.float64)], 512)
        for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            est = _kll_quantile(levels, q)
            assert abs((x <= est).mean() - q) <= 0.02

    def test_kernel_deterministic(self):
        from edkray.ops.aggregate import _kll_compact, _kll_quantile

        x = np.random.default_rng(3).normal(size=20000).astype(np.float64)
        a = _kll_quantile(_kll_compact([x.copy()], 256), 0.5)
        b = _kll_quantile(_kll_compact([x.copy()], 256), 0.5)
        assert a == b

    def test_merge_equals_whole_within_bound(self):
        from edkray.ops.aggregate import _kll_compact, _kll_merge_rows, _kll_quantile, _kll_rows

        rng = np.random.default_rng(5)
        x = rng.normal(size=40000).astype(np.float64)
        parts = [
            _kll_rows(_kll_compact([c.copy()], 256))
            for c in np.array_split(x, 7)
        ]
        merged = _kll_merge_rows(pa.concat_tables(parts), 256)
        for q in (0.25, 0.5, 0.75):
            est = _kll_quantile(merged, q)
            assert abs((x <= est).mean() - q) <= 0.02

    def test_op_certificate(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import approx_quantiles

        rng = np.random.default_rng(7)
        ds = ray.data.from_arrow(pa.table({
            "v": rng.normal(size=30000).astype(np.float64),
        })).repartition(6)
        out = approx_quantiles(ds, "v", num_buckets=4)
        assert list(out["q"]) == [0.25, 0.5, 0.75, 0.9]
        assert (out["n"] == 30000).all()
        assert out["kll_ok"].all()

    def test_empty_input_raises(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.aggregate import approx_quantiles

        ds = ray.data.from_arrow(pa.table({"v": pa.array([], type=pa.float64())}))
        with pytest.raises(ValueError, match="no non-null values"):
            approx_quantiles(ds, "v", num_buckets=2)


class TestGroupedCentroids:
    """ops/search.py:grouped_centroids — grouped vector mean."""

    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.search import grouped_centroids

        rng = np.random.default_rng(19)
        x = rng.normal(size=(120, 3)).astype(np.float32)
        groups = np.array(["a", "b", "c"])[np.arange(120) % 3]
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array(groups),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        })).repartition(5)  # groups split across blocks
        out = grouped_centroids(ds, "g", num_buckets=2, batch_size=16).to_pandas()
        assert len(out) == 9
        xd = x.astype(np.float64)
        for g in "abc":
            ref = xd[groups == g].mean(axis=0)
            got = out[out["g"] == g].sort_values("dim")["centroid_val"].to_numpy()
            np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_single_group(self, ray_session):
        import ray.data

        from edkray.ops.search import grouped_centroids

        x = np.eye(2, dtype=np.float32)
        ds = ray.data.from_arrow(pa.table({
            "g": ["z", "z"],
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
        }))
        out = grouped_centroids(ds, "g", num_buckets=2).to_pandas().sort_values("dim")
        np.testing.assert_allclose(out["centroid_val"].to_numpy(), [0.5, 0.5])


class TestTriangleCount:
    """Degree-ordered wedge closure (ops/graph.py:triangle_count)."""

    def _brute(self, pairs):
        import itertools

        E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        nodes = sorted({x for e in E for x in e})
        return sum(
            1 for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in E and (y, z) in E and (x, z) in E
        )

    def test_matches_brute_force_random(self, ray_session):
        import ray.data

        from edkray.ops.graph import triangle_count

        rng = np.random.default_rng(7)
        ss, tt = rng.integers(0, 60, 400), rng.integers(0, 60, 400)
        ds = ray.data.from_items(
            [{"src": int(a), "dst": int(b)} for a, b in zip(ss, tt)]
        ).repartition(6)
        got = triangle_count(ds, num_buckets=8)["n_triangles"][0].as_py()
        assert got == self._brute(zip(ss.tolist(), tt.tolist()))

    def test_hub_skew_duplicates_selfloops_direction(self, ray_session):
        import ray.data

        from edkray.ops.graph import triangle_count

        # star hub + ring chords; duplicate edges, both directions and
        # self-loops must not change the count (simple undirected graph)
        pairs = ([(0, i) for i in range(1, 50)] + [(i, i + 1) for i in range(1, 49)]
                 + [(i, 0) for i in range(1, 50)] + [(3, 3), (7, 7)])
        ds = ray.data.from_items([{"src": a, "dst": b} for a, b in pairs])
        got = triangle_count(ds, num_buckets=4)["n_triangles"][0].as_py()
        assert got == 48  # one per (0, i, i+1) fan triangle

    def test_triangle_free_and_empty(self, ray_session):
        import ray.data

        from edkray.ops.graph import triangle_count

        bipartite = ray.data.from_items(
            [{"src": a, "dst": 100 + b} for a in range(5) for b in range(5)]
        )
        assert triangle_count(bipartite, num_buckets=4)["n_triangles"][0].as_py() == 0


class TestRadiusPairs:
    """Distance-band spatial self-join (ops/joins.py:radius_pairs) vs a
    brute-force O(n²) haversine oracle."""

    @staticmethod
    def _brute(keys, lon, lat, radius_km):
        from edkray.geo.distance import haversine_km

        n = len(keys)
        ai, bi = np.triu_indices(n, k=1)
        d = haversine_km(lon[ai], lat[ai], lon[bi], lat[bi])
        m = d <= radius_km
        ka, kb = keys[ai[m]], keys[bi[m]]
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        out = {(int(a), int(b)): float(x) for a, b, x in zip(lo, hi, d[m])}
        return out

    def _run(self, keys, lon, lat, radius_km, **kw):
        import ray.data

        from edkray.ops.joins import radius_pairs

        t = pa.table({"k": pa.array(keys), "lon": pa.array(lon), "lat": pa.array(lat)})
        got = radius_pairs(
            ray.data.from_arrow(t).repartition(4), key_col="k",
            lon_col="lon", lat_col="lat", radius_km=radius_km, **kw
        ).to_pandas()
        if len(got) == 0:  # empty Dataset.to_pandas() loses columns
            return {}
        assert (got["key_a"] < got["key_b"]).all()
        pairs = list(zip(got["key_a"].astype(int), got["key_b"].astype(int)))
        assert len(pairs) == len(set(pairs)), "pair emitted more than once"
        return {p: float(d) for p, d in zip(pairs, got["dist_km"])}

    def test_matches_bruteforce_random(self, ray_session):
        rng = np.random.default_rng(42)
        n = 600
        keys = np.arange(n, dtype=np.int64)
        lon = rng.uniform(-180.0, 180.0, n)
        lat = rng.uniform(-85.0, 85.0, n)
        exp = self._brute(keys, lon, lat, 500.0)
        got = self._run(keys, lon, lat, 500.0, cell_res=6)
        assert set(got) == set(exp)
        for p in exp:
            assert abs(got[p] - exp[p]) < 1e-9

    def test_antimeridian_and_poles(self, ray_session):
        # pairs straddling lon=±180 and near-polar wide-lon pairs must
        # be found (exact per-latitude ring width, wrap across the seam)
        keys = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
        lon = np.array([179.9, -179.9, 10.0, -10.0, 0.0, 0.1])
        lat = np.array([10.0, 10.0, 84.5, 84.5, -84.9, -84.9])
        exp = self._brute(keys, lon, lat, 300.0)
        got = self._run(keys, lon, lat, 300.0, cell_res=7)
        assert (1, 2) in got and (3, 4) in got and (5, 6) in got
        assert set(got) == set(exp)

    def test_dense_cluster_and_isolated(self, ray_session):
        # many points in one cell (segment-vectorized pair-gen path)
        rng = np.random.default_rng(7)
        n = 200
        keys = np.arange(n, dtype=np.int64)
        lon = np.concatenate([rng.uniform(5.0, 5.2, n - 1), [120.0]])
        lat = np.concatenate([rng.uniform(50.0, 50.2, n - 1), [-40.0]])
        exp = self._brute(keys, lon, lat, 25.0)
        got = self._run(keys, lon, lat, 25.0, cell_res=7, num_buckets=8)
        assert set(got) == set(exp)
        assert not any(n - 1 in p for p in got)

    def test_empty_and_no_pairs(self, ray_session):
        keys = np.array([1, 2], dtype=np.int64)
        lon = np.array([0.0, 90.0])
        lat = np.array([0.0, 0.0])
        got = self._run(keys, lon, lat, 100.0)
        assert got == {}

    def test_density_clusters_chain(self, ray_session):
        # radius graph -> connected components: a chain A-B-C where
        # A-C exceeds the radius must still form ONE cluster
        import ray.data

        from edkray.ops.graph import connected_components
        from edkray.ops.joins import radius_pairs

        keys = np.array([10, 20, 30, 99], dtype=np.int64)
        lon = np.array([0.0, 0.9, 1.8, 50.0])
        lat = np.array([0.0, 0.0, 0.0, 0.0])
        t = pa.table({"k": pa.array(keys), "lon": pa.array(lon), "lat": pa.array(lat)})
        edges = radius_pairs(
            ray.data.from_arrow(t), key_col="k", lon_col="lon", lat_col="lat",
            radius_km=110.0, cell_res=7,
        )
        labels = connected_components(edges, a_col="key_a", b_col="key_b", num_buckets=4)
        got = {r["doc_id"]: r["cluster_id"] for r in labels.take_all()}
        assert got == {10: 10, 20: 10, 30: 10}  # 99 isolated, not emitted


class TestEwmaAndWeightedSample:
    def test_ewma_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.window import ewma_by_key

        rng = np.random.default_rng(3)
        n = 500
        t0 = dt.datetime(2024, 1, 1)
        df = pd.DataFrame({
            "k": rng.integers(0, 7, n),
            "ts": [t0 + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 10_000, n)],
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        })
        got = ewma_by_key(
            ray.data.from_pandas(df).repartition(4), ["k"], "ts", "v",
            alpha=0.3, tiebreak=["eid"], num_buckets=4,
        ).to_pandas().set_index("k")["ewma"]
        exp = (
            df.sort_values(["ts", "eid"])
            .groupby("k")["v"]
            .apply(lambda s: s.ewm(alpha=0.3, adjust=True).mean().iloc[-1])
        )
        for k in exp.index:
            assert abs(got[k] - exp[k]) < 1e-10

    def test_ewma_tie_determinism(self, ray_session):
        # identical ts everywhere: tiebreak column alone orders the fold
        import ray.data

        from edkray.ops.window import ewma_by_key

        t0 = dt.datetime(2024, 1, 1)
        df = pd.DataFrame({"k": [1, 1, 1], "ts": [t0] * 3,
                           "eid": [2, 0, 1], "v": [10.0, 1.0, 4.0]})
        got = ewma_by_key(
            ray.data.from_pandas(df), ["k"], "ts", "v",
            alpha=0.5, tiebreak=["eid"], num_buckets=2,
        ).to_pandas()["ewma"][0]
        # order by eid: 1, 4, 10 -> (1*0.25 + 4*0.5 + 10*1) / 1.75
        assert abs(got - (0.25 + 2.0 + 10.0) / 1.75) < 1e-12

    def test_weighted_sample_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import weighted_sample

        rng = np.random.default_rng(9)
        n = 5000
        keys = np.arange(n, dtype=np.int64)
        w = rng.uniform(0.5, 100.0, n)
        t = pa.table({"k": pa.array(keys), "w": pa.array(w)})
        got = weighted_sample(
            ray.data.from_arrow(t).repartition(8), "k", "w", n=50
        ).to_pandas()
        h = (keys.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        score = np.log((h.astype(np.float64) + 0.5) / float(1 << 32)) / w
        exp = keys[np.argsort(-score, kind="stable")][:50]
        assert list(got["k"]) == list(exp)
        assert np.allclose(got["score"], np.sort(score)[::-1][:50])

    def test_weighted_sample_rejects_bad_inputs(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import weighted_sample

        t = pa.table({"k": pa.array([-1, 2], type=pa.int64()),
                      "w": pa.array([1.0, 1.0])})
        with pytest.raises(Exception):
            weighted_sample(ray.data.from_arrow(t), "k", "w", n=1).take_all()
        t2 = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                       "w": pa.array([1.0, 0.0])})
        with pytest.raises(Exception):
            weighted_sample(ray.data.from_arrow(t2), "k", "w", n=1).take_all()


class TestTransitionCounts:
    def test_matches_pandas_lag(self, ray_session):
        import ray.data

        from edkray.ops.window import transition_counts

        rng = np.random.default_rng(17)
        n = 5000
        df = pd.DataFrame({
            "u": rng.integers(0, 200, n),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s"),
            "t": rng.choice(["a", "b", "c", "d"], n),
            "i": np.arange(n),
        })
        out = transition_counts(
            ray.data.from_pandas(df), ["u"], "ts", "t", tiebreak=["i"]
        ).to_pandas()

        s = df.sort_values(["u", "ts", "i"], kind="stable")
        frm = s.groupby("u")["t"].shift(1)
        pairs = pd.DataFrame({"from_type": frm, "to_type": s["t"]}).dropna()
        exp = pairs.groupby(["from_type", "to_type"]).size().rename("n").reset_index()
        exp["p"] = exp["n"] / exp.groupby("from_type")["n"].transform("sum")
        exp["n"] = exp["n"].astype("int64")
        _df_eq(out, exp, float_cols=("p",))

    def test_single_event_keys_emit_nothing(self, ray_session):
        import ray.data

        from edkray.ops.window import transition_counts

        df = pd.DataFrame({
            "u": [1, 2, 3],
            "ts": pd.to_datetime([1, 2, 3], unit="s"),
            "t": ["a", "b", "c"],
        })
        out = transition_counts(ray.data.from_pandas(df), ["u"], "ts", "t")
        assert out.count() == 0
        # schema survives the empty result (the r4 empty-schema lesson)
        assert sorted(out.schema().names) == ["from_type", "n", "p", "to_type"]

    def test_state_bound_enforced(self, ray_session):
        import ray.data

        from edkray.ops.window import transition_counts

        df = pd.DataFrame({
            "u": np.zeros(40, np.int64),
            "ts": pd.to_datetime(np.arange(40), unit="s"),
            "t": [f"t{i}" for i in range(40)],
        })
        with pytest.raises(ValueError, match="max_states"):
            transition_counts(
                ray.data.from_pandas(df), ["u"], "ts", "t", max_states=3
            ).to_pandas()


class TestGroupedCorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_corr

        rng = np.random.default_rng(23)
        n = 30_000
        g = rng.choice(["p", "q", "r"], n)
        x = rng.normal(size=n)
        y = 0.6 * x + rng.normal(scale=0.5, size=n)
        df = pd.DataFrame({"g": g, "x": x, "y": y})
        out = (
            grouped_corr(ray.data.from_pandas(df), ["g"], "x", "y")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for _, row in out.iterrows():
            m = df[df["g"] == row["g"]]
            exp = np.corrcoef(m["x"], m["y"])[0, 1]
            assert abs(row["corr"] - exp) < 1e-9
            assert row["n"] == len(m)

    def test_zero_variance_is_null(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_corr

        df = pd.DataFrame({"g": ["a"] * 5, "x": [2.0] * 5, "y": [1.0, 2, 3, 4, 5]})
        out = grouped_corr(ray.data.from_pandas(df), ["g"], "x", "y").to_pandas()
        assert len(out) == 1 and np.isnan(out["corr"].iloc[0])

    def test_nulls_pairwise_deleted(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_corr

        df = pd.DataFrame({
            "g": ["a"] * 6,
            "x": [1.0, 2, 3, None, 5, 6],
            "y": [2.0, 4, 5, 7, None, 12],
        })
        out = grouped_corr(ray.data.from_pandas(df), ["g"], "x", "y").to_pandas()
        m = df.dropna()
        exp = np.corrcoef(m["x"], m["y"])[0, 1]
        assert out["n"].iloc[0] == 4
        assert abs(out["corr"].iloc[0] - exp) < 1e-9


class TestCubeAgg:
    def test_matches_pandas_grouping_sets(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import cube_agg

        rng = np.random.default_rng(31)
        n = 8000
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["u", "v"], n),
            "v": rng.normal(size=n),
        })
        out = cube_agg(
            ray.data.from_pandas(df), ["a", "b"],
            [("sum", "v", "sv"), ("count", None, "nr"), ("max", "v", "mx")],
        ).to_pandas()

        def lvl(keys):
            if keys:
                g = df.groupby(keys, as_index=False).agg(
                    sv=("v", "sum"), nr=("v", "size"), mx=("v", "max"))
            else:
                g = pd.DataFrame([{"sv": df["v"].sum(), "nr": len(df),
                                   "mx": df["v"].max()}])
            for k in ("a", "b"):
                if k not in keys:
                    g[k] = "ALL"
            return g[["a", "b", "sv", "nr", "mx"]]

        exp = pd.concat([lvl(["a", "b"]), lvl(["a"]), lvl(["b"]), lvl([])],
                        ignore_index=True)
        exp["nr"] = exp["nr"].astype("int64")
        _df_eq(out, exp, float_cols=("sv", "mx"))

    def test_bound_enforced(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import cube_agg

        df = pd.DataFrame({"a": [str(i) for i in range(50)], "v": range(50)})
        with pytest.raises(ValueError, match="max_group_rows"):
            cube_agg(ray.data.from_pandas(df), ["a"], [("sum", "v", "s")],
                     max_group_rows=10)


class TestBfsHops:
    def _hops(self, edges, seeds, max_hops):
        import ray.data

        from edkray.ops.graph import bfs_hops

        eds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
        out = bfs_hops(eds, seeds, max_hops=max_hops).to_pandas()
        return dict(zip(out["node"], out["hop"]))

    def test_chain_and_unreachable(self, ray_session):
        # 0->1->2->3->4 plus an island 9->10
        edges = [(0, 1), (1, 2), (2, 3), (3, 4), (9, 10)]
        got = self._hops(edges, [0], max_hops=3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 beyond max_hops; 9/10 unreachable

    def test_min_hop_wins_and_multi_seed(self, ray_session):
        # two paths to 3: 0->1->3 (hop 2) and 0->2, 2->3 also hop 2; seed 5->3 hop 1
        edges = [(0, 1), (1, 3), (0, 2), (2, 3), (5, 3)]
        got = self._hops(edges, [0, 5], max_hops=4)
        assert got == {0: 0, 5: 0, 1: 1, 2: 1, 3: 1}

    def test_early_stop_on_empty_frontier(self, ray_session):
        got = self._hops([(0, 1)], [0], max_hops=10)
        assert got == {0: 0, 1: 1}

    def test_cycle_terminates(self, ray_session):
        edges = [(0, 1), (1, 2), (2, 0)]
        got = self._hops(edges, [0], max_hops=6)
        assert got == {0: 0, 1: 1, 2: 2}


class TestMergeIntervals:
    def _run(self, rows):
        import ray.data

        from edkray.ops.window import merge_intervals

        df = pd.DataFrame(rows, columns=["k", "s", "e"])
        out = merge_intervals(ray.data.from_pandas(df), ["k"], "s", "e").to_pandas()
        return sorted(map(tuple, out[["k", "start", "end", "n_intervals"]].to_numpy()))

    def test_overlap_touch_and_gap(self, ray_session):
        rows = [
            ("a", 0, 10), ("a", 5, 12), ("a", 12, 20),  # overlap + touch → one island
            ("a", 25, 30),                                # gap → new island
            ("b", 1, 2),
        ]
        assert self._run(rows) == [("a", 0, 20, 3), ("a", 25, 30, 1), ("b", 1, 2, 1)]

    def test_contained_interval_extends_running_max(self, ray_session):
        # [0,100] swallows [10,20]; [30,40] still belongs to the island
        rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40), ("a", 101, 110)]
        assert self._run(rows) == [("a", 0, 100, 3), ("a", 101, 110, 1)]

    def test_matches_pandas_sweep(self, ray_session):
        import ray.data

        from edkray.ops.window import merge_intervals

        rng = np.random.default_rng(41)
        n = 4000
        k = rng.integers(0, 80, n)
        s = rng.integers(0, 100_000, n)
        e = s + rng.integers(1, 5000, n)
        df = pd.DataFrame({"k": k, "s": s, "e": e})
        out = merge_intervals(ray.data.from_pandas(df), ["k"], "s", "e").to_pandas()

        exp = []
        for kk, g in df.sort_values(["k", "s", "e"]).groupby("k"):
            cur_s = cur_e = None
            cnt = 0
            for _, r in g.iterrows():
                if cur_e is None or r["s"] > cur_e:
                    if cur_e is not None:
                        exp.append((kk, cur_s, cur_e, cnt))
                    cur_s, cur_e, cnt = r["s"], r["e"], 1
                else:
                    cur_e = max(cur_e, r["e"])
                    cnt += 1
            if cur_e is not None:
                exp.append((kk, cur_s, cur_e, cnt))
        exp_df = pd.DataFrame(exp, columns=["k", "start", "end", "n_intervals"])
        exp_df["n_intervals"] = exp_df["n_intervals"].astype("int64")
        _df_eq(out, exp_df)


class TestMaxStreak:
    def test_basic_islands(self, ray_session):
        import ray.data

        from edkray.ops.window import max_streak

        days = (["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-07",
                 "2024-01-08", "2024-01-03"])  # dup day collapses
        df = pd.DataFrame({
            "u": [1] * 6,
            "ts": pd.to_datetime(days) + pd.Timedelta(hours=5),
        })
        out = max_streak(ray.data.from_pandas(df), ["u"], "ts").to_pandas()
        assert out["n_days"].iloc[0] == 5 and out["max_streak"].iloc[0] == 3

    def test_matches_pandas_sweep(self, ray_session):
        import ray.data

        from edkray.ops.window import max_streak

        rng = np.random.default_rng(43)
        n = 6000
        df = pd.DataFrame({
            "u": rng.integers(0, 150, n),
            "ts": pd.to_datetime(rng.integers(0, 90, n), unit="D")
                  + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        })
        out = max_streak(ray.data.from_pandas(df), ["u"], "ts").to_pandas()

        rows = []
        for u, g in df.groupby("u"):
            days = np.unique(g["ts"].dt.normalize().to_numpy())
            d = days.astype("datetime64[D]").astype(np.int64)
            runs = np.split(d, np.where(np.diff(d) > 1)[0] + 1)
            rows.append((u, len(d), max(len(r) for r in runs)))
        exp = pd.DataFrame(rows, columns=["u", "n_days", "max_streak"])
        exp["n_days"] = exp["n_days"].astype("int64")
        exp["max_streak"] = exp["max_streak"].astype("int64")
        _df_eq(out, exp)


class TestGroupedEntropy:
    def test_matches_scipy_formula(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_entropy

        rng = np.random.default_rng(41)
        n = 20_000
        df = pd.DataFrame({
            "g": rng.integers(0, 50, n),
            "v": rng.choice(list("abcdef"), n, p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03]),
        })
        out = (
            grouped_entropy(ray.data.from_pandas(df).repartition(7), ["g"], "v")
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            p = m["v"].value_counts(normalize=True).to_numpy()
            exp = -(p * np.log2(p)).sum()
            assert abs(out.loc[g, "entropy"] - exp) < 1e-9
            assert out.loc[g, "n"] == len(m)

    def test_single_category_group_is_zero(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_entropy

        df = pd.DataFrame({"g": ["a"] * 7, "v": ["only"] * 7})
        out = grouped_entropy(ray.data.from_pandas(df), ["g"], "v").to_pandas()
        assert len(out) == 1 and abs(out["entropy"].iloc[0]) < 1e-12


class TestChiSquared:
    def test_matches_full_cell_definition(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import chi_squared

        rng = np.random.default_rng(43)
        n = 10_000
        df = pd.DataFrame({
            "a": rng.choice(["p", "q", "r"], n),
            "b": rng.choice(["x", "y"], n, p=[0.7, 0.3]),
        })
        out = chi_squared(ray.data.from_pandas(df).repartition(5), "a", "b").to_pandas()
        ct = pd.crosstab(df["a"], df["b"])  # includes zero cells
        e = np.outer(ct.sum(1), ct.sum(0)) / ct.values.sum()
        exp = ((ct.values - e) ** 2 / e).sum()
        assert abs(out["chi2"].iloc[0] - exp) < 1e-8
        assert out["dof"].iloc[0] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        assert out["n"].iloc[0] == n

    def test_zero_cells_counted_in_expected(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import chi_squared

        # (a2, y) never observed — the closed form must still equal the
        # all-cells definition, which charges the expected count for it.
        df = pd.DataFrame({
            "a": ["a1"] * 6 + ["a2"] * 4,
            "b": ["x", "y"] * 3 + ["x"] * 4,
        })
        out = chi_squared(ray.data.from_pandas(df), "a", "b").to_pandas()
        ct = pd.crosstab(df["a"], df["b"])
        e = np.outer(ct.sum(1), ct.sum(0)) / ct.values.sum()
        exp = ((ct.values - e) ** 2 / e).sum()
        assert abs(out["chi2"].iloc[0] - exp) < 1e-10

    def test_cell_bound_enforced(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.aggregate import chi_squared

        df = pd.DataFrame({"a": [str(i) for i in range(40)],
                           "b": [str(i) for i in range(40)]})
        with pytest.raises(ValueError, match="max_cells"):
            chi_squared(ray.data.from_pandas(df), "a", "b", max_cells=10)


class TestRankWithTies:
    def test_boundary_ties_all_kept(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import rank_with_ties

        # group g: values 9,8,8,8,7,1 — rank()<=3 keeps 9 and ALL three
        # 8s (rank 2); row_number top-3 would cut one 8 arbitrarily.
        df = pd.DataFrame({
            "g": ["g"] * 6 + ["h"] * 2,
            "v": [9.0, 8, 8, 8, 7, 1, 5, 5],
            "id": range(8),
        })
        out = (
            rank_with_ties(ray.data.from_pandas(df).repartition(4), ["g"], "v", 3)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        got = set(out["id"])
        assert got == {0, 1, 2, 3, 6, 7}
        r = out.set_index("id")["rnk"]
        assert r[0] == 1 and r[1] == 2 and r[2] == 2 and r[3] == 2
        assert r[6] == 1 and r[7] == 1

    def test_matches_pandas_rank_across_batches(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import rank_with_ties

        rng = np.random.default_rng(47)
        n = 30_000
        df = pd.DataFrame({
            "g": rng.integers(0, 20, n),
            "v": rng.integers(0, 200, n).astype(float),  # many ties
            "id": np.arange(n),
        })
        k = 5
        out = rank_with_ties(
            ray.data.from_pandas(df).repartition(9), ["g"], "v", k
        ).to_pandas()
        df["r"] = df.groupby("g")["v"].rank(method="min", ascending=False)
        exp = df[df["r"] <= k]
        assert set(out["id"]) == set(exp["id"])
        merged = out.merge(exp[["id", "r"]], on="id")
        assert (merged["rnk"] == merged["r"]).all()


class TestPairwiseSetJaccard:
    def test_matches_python_sets(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import pairwise_set_jaccard

        rng = np.random.default_rng(53)
        n = 25_000
        df = pd.DataFrame({
            "u": rng.integers(0, 800, n),
            "t": rng.choice(["a", "b", "c", "d"], n, p=[0.4, 0.3, 0.2, 0.1]),
        })
        out = (
            pairwise_set_jaccard(ray.data.from_pandas(df).repartition(6), "u", "t")
            .to_pandas().set_index(["set_a", "set_b"])
        )
        sets = {t: set(m["u"]) for t, m in df.groupby("t")}
        ts = sorted(sets)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                inter = len(sets[ts[i]] & sets[ts[j]])
                if inter == 0:
                    assert (ts[i], ts[j]) not in out.index
                    continue
                row = out.loc[(ts[i], ts[j])]
                assert row["n_common"] == inter
                exp = inter / len(sets[ts[i]] | sets[ts[j]])
                assert abs(row["jaccard"] - exp) < 1e-12

    def test_disjoint_pair_omitted(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import pairwise_set_jaccard

        df = pd.DataFrame({"u": [1, 2, 3, 4], "t": ["a", "a", "b", "b"]})
        out = pairwise_set_jaccard(ray.data.from_pandas(df), "u", "t").to_pandas()
        assert len(out) == 0


class TestGroupedKL:
    def test_matches_direct_formula(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_kl

        rng = np.random.default_rng(59)
        n = 20_000
        df = pd.DataFrame({
            "g": rng.choice(["s1", "s2", "s3"], n, p=[0.5, 0.3, 0.2]),
            "v": rng.choice(list("abcd"), n),
        })
        # skew s3 toward 'a'
        df.loc[df["g"] == "s3", "v"] = rng.choice(
            list("abcd"), (df["g"] == "s3").sum(), p=[0.85, 0.05, 0.05, 0.05])
        out = (
            grouped_kl(ray.data.from_pandas(df).repartition(7), ["g"], "v")
            .to_pandas().set_index("g")
        )
        q = df["v"].value_counts(normalize=True)
        for g, m in df.groupby("g"):
            p = m["v"].value_counts(normalize=True)
            exp = sum(p[v] * np.log2(p[v] / q[v]) for v in p.index)
            assert abs(out.loc[g, "kl"] - exp) < 1e-9
            assert out.loc[g, "n"] == len(m)

    def test_global_distribution_has_zero_kl(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_kl

        # one group == the whole corpus → KL must be exactly 0
        df = pd.DataFrame({"g": ["only"] * 9, "v": list("aaabbbccc")})
        out = grouped_kl(ray.data.from_pandas(df), ["g"], "v").to_pandas()
        assert len(out) == 1 and abs(out["kl"].iloc[0]) < 1e-12


class TestInvertedIndex:
    def test_postings_match_python(self, ray_session):
        import ray.data

        from edkray.ops.text import inverted_index

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "b c d b", "c d e", "a   e"],
        })
        out = (
            inverted_index(ray.data.from_pandas(docs).repartition(3))
            .to_pandas().set_index("term")
        )
        exp = {}
        for _, r in docs.iterrows():
            for t in set(r["text"].split()):
                exp.setdefault(t, set()).add(r["doc_id"])
        assert set(out.index) == set(exp)
        for t, ids in exp.items():
            assert out.loc[t, "df"] == len(ids)
            assert out.loc[t, "postings"] == ",".join(map(str, sorted(ids)))

    def test_max_df_drops_stopwords(self, ray_session):
        import ray.data

        from edkray.ops.text import inverted_index

        docs = pd.DataFrame({
            "doc_id": range(10),
            "text": ["the x%d" % i for i in range(10)],
        })
        out = inverted_index(
            ray.data.from_pandas(docs).repartition(4), max_df=5
        ).to_pandas()
        assert "the" not in set(out["term"])
        assert len(out) == 10  # each x_i survives with df=1


class TestDenseDailyCounts:
    def test_zero_fills_gap_days(self, ray_session):
        import ray.data

        from edkray.ops.window import dense_daily_counts

        ts = pd.to_datetime(
            ["2024-01-01 05:00", "2024-01-01 09:00", "2024-01-04 12:00"])
        df = pd.DataFrame({"ts": ts})
        out = (
            dense_daily_counts(ray.data.from_pandas(df), "ts")
            .to_pandas().sort_values("day").reset_index(drop=True)
        )
        assert len(out) == 4
        assert list(out["n"]) == [2, 0, 0, 1]

    def test_day_bound_enforced(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.window import dense_daily_counts

        df = pd.DataFrame({
            "ts": pd.to_datetime(["2000-01-01", "2024-01-01"])})
        with pytest.raises(ValueError, match="max_days"):
            dense_daily_counts(ray.data.from_pandas(df), "ts", max_days=100)


class TestGapAutocorr:
    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.window import gap_autocorr

        rng = np.random.default_rng(61)
        rows = []
        for u in range(25):
            n = rng.integers(4, 60)
            t = np.cumsum(rng.integers(1, 10_000, n))
            for x in t:
                rows.append((u, x))
        df = pd.DataFrame(rows, columns=["u", "off"])
        df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["off"], unit="us")
        df["eid"] = np.arange(len(df))
        out = (
            gap_autocorr(
                ray.data.from_pandas(df[["u", "ts", "eid"]]).repartition(6),
                ["u"], "ts", tiebreak=["eid"])
            .to_pandas().set_index("u")
        )
        for u, m in df.groupby("u"):
            g = np.diff(np.sort(m["off"].to_numpy()).astype(np.float64))
            x, y = g[:-1], g[1:]
            assert out.loc[u, "n_pairs"] == len(x)
            exp = np.corrcoef(x, y)[0, 1]
            assert abs(out.loc[u, "autocorr"] - exp) < 1e-9

    def test_short_and_constant_groups_null_or_absent(self, ray_session):
        import ray.data

        from edkray.ops.window import gap_autocorr

        ts0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "u": [1, 1, 2, 2, 2, 2, 3],
            "ts": [ts0, ts0 + pd.Timedelta(seconds=1),          # 1 gap, 0 pairs
                   ts0, ts0 + pd.Timedelta(seconds=5),          # constant gaps
                   ts0 + pd.Timedelta(seconds=10),
                   ts0 + pd.Timedelta(seconds=15),
                   ts0],                                        # single event
            "eid": range(7),
        })
        out = gap_autocorr(ray.data.from_pandas(df), ["u"], "ts",
                           tiebreak=["eid"]).to_pandas().set_index("u")
        assert 1 not in out.index and 3 not in out.index
        assert out.loc[2, "n_pairs"] == 2 and np.isnan(out.loc[2, "autocorr"])


class TestGroupedWeightedQuantile:
    def test_weighted_median_matches_python(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_weighted_quantile

        rng = np.random.default_rng(67)
        n = 20_000
        df = pd.DataFrame({
            "g": rng.integers(0, 12, n),
            "v": rng.integers(0, 500, n).astype(float),
            "w": rng.integers(1, 9, n).astype(float),
        })
        out = (
            grouped_weighted_quantile(
                ray.data.from_pandas(df).repartition(7), ["g"], "v", "w", q=0.5)
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            a = m.groupby("v", as_index=False)["w"].sum().sort_values("v")
            cw = a["w"].cumsum()
            exp = a.loc[cw >= 0.5 * a["w"].sum(), "v"].iloc[0]
            assert out.loc[g, "wq"] == exp

    def test_unit_weights_reduce_to_plain_quantile(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_weighted_quantile

        df = pd.DataFrame({"g": ["a"] * 5, "v": [1.0, 2, 3, 4, 100],
                           "w": [1.0] * 5})
        out = grouped_weighted_quantile(
            ray.data.from_pandas(df), ["g"], "v", "w", q=0.5).to_pandas()
        assert out["wq"].iloc[0] == 3.0


class TestGroupedGini:
    def test_matches_direct_pairwise_definition(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_gini

        rng = np.random.default_rng(71)
        n = 12_000
        df = pd.DataFrame({
            "g": rng.integers(0, 8, n),
            "v": rng.exponential(100.0, n).round(2),
        })
        out = (
            grouped_gini(ray.data.from_pandas(df).repartition(5), ["g"], "v")
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            x = np.sort(m["v"].to_numpy())
            k = len(x)
            exp = 2.0 * np.sum(np.arange(1, k + 1) * x) / (k * x.sum()) - (k + 1) / k
            assert abs(out.loc[g, "gini"] - exp) < 1e-9
            assert out.loc[g, "n"] == k

    def test_extremes(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_gini

        df = pd.DataFrame({
            "g": ["eq"] * 4 + ["one"] * 4,
            "v": [5.0, 5, 5, 5, 0, 0, 0, 100],
        })
        out = grouped_gini(ray.data.from_pandas(df), ["g"], "v").to_pandas()
        got = out.set_index("g")["gini"]
        assert abs(got["eq"]) < 1e-12
        assert abs(got["one"] - 0.75) < 1e-12  # (n-1)/n for full concentration

    def test_negative_values_raise(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.aggregate import grouped_gini

        df = pd.DataFrame({"g": ["a"], "v": [-1.0]})
        with pytest.raises(Exception, match="negative"):
            grouped_gini(ray.data.from_pandas(df), ["g"], "v").to_pandas()


class TestGroupedGenmeans:
    def test_matches_scipy_definitions(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_genmeans

        rng = np.random.default_rng(73)
        n = 10_000
        df = pd.DataFrame({
            "g": rng.integers(0, 6, n),
            "v": rng.uniform(0.5, 50.0, n),
        })
        out = (
            grouped_genmeans(ray.data.from_pandas(df).repartition(4), ["g"], "v")
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            x = m["v"].to_numpy()
            assert abs(out.loc[g, "geomean"] - np.exp(np.log(x).mean())) < 1e-9
            assert abs(out.loc[g, "harmmean"] - len(x) / (1.0 / x).sum()) < 1e-9

    def test_nonpositive_raises(self, ray_session):
        import pytest
        import ray.data

        from edkray.ops.aggregate import grouped_genmeans

        df = pd.DataFrame({"g": ["a", "a"], "v": [1.0, 0.0]})
        with pytest.raises(Exception, match="> 0"):
            grouped_genmeans(ray.data.from_pandas(df), ["g"], "v").to_pandas()


class TestBearingSectors:
    def test_cardinal_directions_bin_correctly(self, ray_session):
        import ray.data

        from edkray.ops.window import bearing_sector_counts

        ts0 = pd.Timestamp("2024-01-01")
        # equator moves: due east (sector 2), due north (0), due west (6),
        # due south (4) — one user per leg, two points each
        legs = [
            ((0.0, 0.0), (1.0, 0.0), 2),   # east
            ((0.0, 0.0), (0.0, 1.0), 0),   # north
            ((0.0, 0.0), (-1.0, 0.0), 6),  # west
            ((0.0, 0.0), (0.0, -1.0), 4),  # south
        ]
        rows = []
        for u, ((lo1, la1), (lo2, la2), _s) in enumerate(legs):
            rows.append((u, ts0, 2 * u, lo1, la1))
            rows.append((u, ts0 + pd.Timedelta(seconds=1), 2 * u + 1, lo2, la2))
        df = pd.DataFrame(rows, columns=["u", "ts", "eid", "lon", "lat"])
        out = (
            bearing_sector_counts(
                ray.data.from_pandas(df).repartition(3), ["u"], "ts",
                "lon", "lat", tiebreak=["eid"])
            .to_pandas().set_index("sector")["n"]
        )
        assert dict(out) == {2: 1, 0: 1, 6: 1, 4: 1}

    def test_no_cross_user_legs(self, ray_session):
        import ray.data

        from edkray.ops.window import bearing_sector_counts

        ts0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "u": [1, 2],
            "ts": [ts0, ts0 + pd.Timedelta(seconds=1)],
            "eid": [0, 1],
            "lon": [0.0, 10.0],
            "lat": [0.0, 10.0],
        })
        out = bearing_sector_counts(
            ray.data.from_pandas(df), ["u"], "ts", "lon", "lat",
            tiebreak=["eid"]).to_pandas()
        assert len(out) == 0 or out["n"].sum() == 0


class TestGroupedMad:
    def test_matches_type1_quantile_rule(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_mad

        rng = np.random.default_rng(79)
        n = 15_000
        df = pd.DataFrame({
            "g": rng.integers(0, 9, n),
            "v": rng.integers(1, 60, n).astype(float),
        })

        def q_disc(x):
            x = np.sort(np.asarray(x))
            return x[max(int(np.ceil(0.5 * len(x))), 1) - 1]

        out = (
            grouped_mad(ray.data.from_pandas(df).repartition(6), ["g"], "v")
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            med = q_disc(m["v"])
            mad = q_disc((m["v"] - med).abs())
            assert out.loc[g, "med"] == med
            assert out.loc[g, "mad"] == mad

    def test_outlier_robustness(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_mad

        df = pd.DataFrame({"g": ["a"] * 7,
                           "v": [10.0, 10, 10, 11, 11, 12, 10_000]})
        out = grouped_mad(ray.data.from_pandas(df), ["g"], "v").to_pandas()
        assert out["med"].iloc[0] == 11.0 and out["mad"].iloc[0] == 1.0


class TestGroupedPercentRank:
    def test_matches_pandas_percent_rank(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_percent_rank

        rng = np.random.default_rng(83)
        n = 20_000
        df = pd.DataFrame({
            "g": rng.integers(0, 15, n),
            "v": rng.integers(0, 300, n).astype(float),  # ties
            "id": np.arange(n),
        })
        out = (
            grouped_percent_rank(
                ray.data.from_pandas(df).repartition(7), ["g"], "v")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        grp = df.groupby("g")["v"]
        exp = (grp.rank(method="min") - 1) / (grp.transform("size") - 1)
        assert np.allclose(out["pr"].to_numpy(),
                           exp[out.index].to_numpy(), atol=1e-12)

    def test_single_row_group_is_zero(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_percent_rank

        df = pd.DataFrame({"g": ["solo"], "v": [42.0]})
        out = grouped_percent_rank(ray.data.from_pandas(df), ["g"], "v").to_pandas()
        assert out["pr"].iloc[0] == 0.0


class TestOrderedCumsum:
    def test_matches_sequential_prefix_sum(self, ray_session):
        import ray.data

        from edkray.ops.rank import ordered_cumsum

        rng = np.random.default_rng(89)
        n = 25_000
        df = pd.DataFrame({
            "k": np.arange(n),
            "v": rng.integers(0, 1000, n),          # order col, many ties
            "w": rng.integers(1, 500, n),           # integer summand: exact
        })
        out, total = ordered_cumsum(
            ray.data.from_pandas(df).repartition(9), "v", "w", ["k"],
            descending=True)
        out = out.to_pandas().sort_values("rank").reset_index(drop=True)
        exp = df.sort_values(["v", "k"], ascending=[False, False]).reset_index(drop=True)
        # total order is (v desc, k desc) because lexsort ascends then reverses
        assert int(total) == df["w"].sum()
        assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
        assert (out["cum"].to_numpy() == exp["w"].cumsum().to_numpy()).all()
        assert (out["rank"].to_numpy() == np.arange(1, n + 1)).all()

    def test_ascending_and_float_sums(self, ray_session):
        import ray.data

        from edkray.ops.rank import ordered_cumsum

        df = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 5, 7, 1],
                           "w": [1.5, 2.5, 3.0, 4.0]})
        out, total = ordered_cumsum(
            ray.data.from_pandas(df), "v", "w", ["k"])
        out = out.to_pandas().sort_values("rank")
        assert abs(float(total) - 11.0) < 1e-12
        assert list(out["k"]) == [4, 2, 3, 1]
        assert np.allclose(out["cum"], [4.0, 6.5, 9.5, 11.0])


class TestGroupedWinsorizedMean:
    def test_matches_python_clamped_mean(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_winsorized_mean

        rng = np.random.default_rng(97)
        n = 15_000
        df = pd.DataFrame({
            "g": rng.integers(0, 7, n),
            "v": rng.integers(0, 400, n).astype(float),
        })

        def q_disc(x, p):
            x = np.sort(np.asarray(x))
            return x[max(int(np.ceil(p * len(x))), 1) - 1]

        out = (
            grouped_winsorized_mean(
                ray.data.from_pandas(df).repartition(6), ["g"], "v")
            .to_pandas().set_index("g")
        )
        for g, m in df.groupby("g"):
            lo, hi = q_disc(m["v"], 0.05), q_disc(m["v"], 0.95)
            exp = np.clip(m["v"], lo, hi).mean()
            assert out.loc[g, "lo"] == lo and out.loc[g, "hi"] == hi
            assert abs(out.loc[g, "wmean"] - exp) < 1e-9
            assert out.loc[g, "n"] == len(m)

    def test_outlier_is_clamped(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_winsorized_mean

        # positions 95..99 (of 100, sorted) are 11.0 → hi = ceil(.95·100)=95th = 11
        v = [10.0] * 94 + [11.0] * 5 + [1_000_000.0]
        df = pd.DataFrame({"g": ["a"] * 100, "v": v})
        out = grouped_winsorized_mean(
            ray.data.from_pandas(df), ["g"], "v").to_pandas()
        assert out["hi"].iloc[0] == 11.0
        assert abs(out["wmean"].iloc[0] - (94 * 10 + 6 * 11) / 100) < 1e-12
