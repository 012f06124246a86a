"""Tests for the coordinate transform, count-distinct, top-k-per-group,
semi/anti joins and raster-band-semantics column ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.test_ops import _df_eq


class TestTransform:
    def test_roundtrip(self):
        from edkray.geo.transform import lonlat_to_webmercator, webmercator_to_lonlat

        rng = np.random.default_rng(3)
        lon, lat = rng.uniform(-180, 180, 2000), rng.uniform(-85, 85, 2000)
        x, y = lonlat_to_webmercator(lon, lat)
        lon2, lat2 = webmercator_to_lonlat(x, y)
        assert np.allclose(lon, lon2, atol=1e-10) and np.allclose(lat, lat2, atol=1e-10)

    def test_known_point(self):
        from edkray.geo.transform import lonlat_to_webmercator

        # equator/prime meridian maps to origin; London ~ (-14km, 6.71Mm)
        x, y = lonlat_to_webmercator(np.array([0.0]), np.array([0.0]))
        assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-6
        x, y = lonlat_to_webmercator(np.array([-0.1278]), np.array([51.5074]))
        assert abs(x[0] - (-14226.6)) < 1.0
        assert abs(y[0] - 6711542.5) < 10.0


class TestCountDistinct:
    def test_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import count_distinct

        rng = np.random.default_rng(5)
        tbl = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], 5000)),
                        "v": pa.array(rng.integers(0, 100, 5000))})
        got = count_distinct(ray.data.from_arrow(tbl).repartition(4), ["g"], "v", "nd").to_pandas()
        exp = tbl.to_pandas().groupby("g", as_index=False).agg(nd=("v", "nunique"))
        _df_eq(got, exp)


class TestTopKPerGroup:
    def test_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import top_k_per_group

        rng = np.random.default_rng(7)
        tbl = pa.table({"g": pa.array(rng.integers(0, 50, 10000)),
                        "score": pa.array(rng.normal(size=10000)),
                        "id": pa.array(np.arange(10000))})
        got = top_k_per_group(ray.data.from_arrow(tbl).repartition(4), ["g"],
                              ["score", "id"], k=3, descending=[True, False]).to_pandas()
        df = tbl.to_pandas().sort_values(["score", "id"], ascending=[False, True], kind="stable")
        df["rank"] = df.groupby("g").cumcount()
        exp = df[df["rank"] < 3]
        _df_eq(got, exp, float_cols={"score"})


class TestSemiAntiJoins:
    def test_semi_and_anti(self, ray_session):
        import ray.data

        from edkray.ops.joins import broadcast_join

        left = pa.table({"k": pa.array([1, 2, 3, 4, 5]), "x": pa.array(list("abcde"))})
        right = pa.table({"k": pa.array([2, 4])})
        semi = broadcast_join(ray.data.from_arrow(left), right, on=["k"], how="semi").to_pandas()
        anti = broadcast_join(ray.data.from_arrow(left), right, on=["k"], how="anti").to_pandas()
        assert sorted(semi.k) == [2, 4]
        assert sorted(anti.k) == [1, 3, 5]
        assert list(semi.columns) == ["k", "x"]


class TestBandSemantics:
    def test_mask_scale_rescale(self):
        from edkray.ops.stages import apply_scale_offset, mask_nodata, rescale_255

        tbl = pa.table({"v": pa.array([0.0, 10.0, -999.0, 20.0])})
        out = mask_nodata(tbl, "v", -999.0)
        assert out["v"].to_pylist() == [0.0, 10.0, None, 20.0]
        out = apply_scale_offset(out, "v", scale=2.0, offset=1.0)
        assert out["v"].to_pylist() == [1.0, 21.0, None, 41.0]
        r = rescale_255(pa.table({"v": pa.array([0.0, 50.0, 100.0])}), "v", 0.0, 100.0)
        assert r["v"].to_pylist() == [0.0, 127.5, 255.0]


class TestApproxCountDistinct:
    def test_within_error_bound(self, ray_session):
        import pyarrow as pa
        import ray.data

        from edkray.ops.aggregate import approx_count_distinct

        rng = np.random.default_rng(9)
        n = 40_000
        tbl = pa.table({"g": pa.array(rng.choice(["a", "b"], n)),
                        "v": pa.array(rng.integers(0, 5000, n))})
        got = approx_count_distinct(ray.data.from_arrow(tbl).repartition(4), ["g"], "v").to_pandas()
        exp = tbl.to_pandas().groupby("g")["v"].nunique()
        for _, row in got.iterrows():
            true = exp[row.g]
            assert abs(row.approx_nd - true) / true < 0.1, (row.g, row.approx_nd, true)


class TestGlobalRank:
    def test_rank_matches_argsort(self, ray_session):
        import ray.data

        from edkray.ops.rank import global_rank

        rng = np.random.default_rng(31)
        n = 5000
        # duplicate values so ties exercise the tiebreak path
        v = rng.integers(0, 800, n).astype(np.float64)
        k = rng.permutation(n).astype(np.int64)
        tbl = pa.table({"k": pa.array(k), "v": pa.array(v)})
        ds = ray.data.from_arrow(tbl).repartition(8)
        ranked, total = global_rank(ds, "v", ["k"], num_parts=7, sample_per_batch=16)
        assert total == n
        df = ranked.to_pandas().sort_values("rank").reset_index(drop=True)
        order = np.lexsort((k, v))
        assert df["k"].to_numpy().tolist() == k[order].tolist()
        assert df["rank"].to_list() == list(range(1, n + 1))

    def test_rank_descending(self, ray_session):
        import ray.data

        from edkray.ops.rank import global_rank

        tbl = pa.table({"k": pa.array([1, 2, 3, 4]), "v": pa.array([10.0, 40.0, 20.0, 30.0])})
        ranked, _ = global_rank(ray.data.from_arrow(tbl), "v", ["k"],
                                num_parts=2, descending=True)
        df = ranked.to_pandas().sort_values("rank")
        assert df["k"].to_list() == [2, 4, 3, 1]

    def test_ntile_sizes(self, ray_session):
        import ray.data

        from edkray.ops.rank import ntile

        n, tiles = 103, 10  # 103 = 10*10+3: first 3 tiles get 11 rows
        tbl = pa.table({"k": pa.array(range(n)), "v": pa.array(np.arange(n) % 13)})
        out = ntile(ray.data.from_arrow(tbl).repartition(4), "v", ["k"], tiles,
                    num_parts=5).to_pandas()
        sizes = out.groupby("tile").size()
        assert sizes.to_list() == [11, 11, 11] + [10] * 7
        # tile order must agree with the (v, k) total order
        df = out.sort_values(["v", "k"]).reset_index(drop=True)
        assert (np.diff(df["tile"].to_numpy()) >= 0).all()


class TestRollupAgg:
    def test_levels_and_values(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import rollup_agg

        tbl = pa.table({
            "a": pa.array(["x", "x", "y", "y", "y"]),
            "b": pa.array(["p", "q", "p", "p", "q"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        })
        out = rollup_agg(
            ray.data.from_arrow(tbl).repartition(3),
            ["a", "b"],
            [("sum", "v", "s"), ("count", None, "n"), ("min", "v", "lo")],
        ).to_pandas().set_index(["a", "b"]).sort_index()
        assert len(out) == 4 + 2 + 1  # finest + per-a + grand total
        assert out.loc[("x", "p"), "s"] == 1.0
        assert out.loc[("y", "ALL"), "s"] == 12.0 and out.loc[("y", "ALL"), "n"] == 3
        assert out.loc[("y", "ALL"), "lo"] == 3.0
        assert out.loc[("ALL", "ALL"), "s"] == 15.0 and out.loc[("ALL", "ALL"), "n"] == 5

    def test_bound_enforced(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import rollup_agg

        tbl = pa.table({"a": pa.array([str(i) for i in range(100)]),
                        "v": pa.array([1.0] * 100)})
        with pytest.raises(ValueError, match="max_group_rows"):
            rollup_agg(ray.data.from_arrow(tbl), ["a"], [("sum", "v", "s")],
                       max_group_rows=10)


class TestGroupedMode:
    def test_tiebreak_smaller_value(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_mode

        tbl = pa.table({
            "g": pa.array(["a", "a", "a", "a", "b", "b", "b"]),
            "v": pa.array(["z", "z", "m", "m", "q", "q", "r"]),
        })
        out = grouped_mode(ray.data.from_arrow(tbl).repartition(3), ["g"], "v",
                           alias="mode_v", count_alias="n",
                           num_buckets=4).to_pandas().set_index("g")
        assert out.loc["a", "mode_v"] == "m" and out.loc["a", "n"] == 2  # tie -> smaller
        assert out.loc["b", "mode_v"] == "q" and out.loc["b", "n"] == 2


class TestSkyline:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.ops.rank import skyline_2d

        rng = np.random.default_rng(5)
        n = 2000
        price = rng.integers(0, 500, n).astype(np.float64)  # ties likely
        date = rng.integers(0, 500, n).astype(np.int64)
        tbl = pa.table({"k": pa.array(range(n)), "p": pa.array(price), "d": pa.array(date)})
        got = sorted(skyline_2d(ray.data.from_arrow(tbl).repartition(8),
                                "p", "d").to_pandas()["k"])
        dominated = np.zeros(n, dtype=bool)
        for i in range(n):
            dom = (price >= price[i]) & (date <= date[i]) & (
                (price > price[i]) | (date < date[i]))
            dominated[i] = dom.any()
        exp = sorted(np.flatnonzero(~dominated).tolist())
        assert got == exp


class TestIdwGrid:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from edkray.geo.distance import haversine_km
        from edkray.ops.joins import idw_grid

        rng = np.random.default_rng(12)
        n = 3000
        lon = rng.uniform(-179, 179, n)
        lat = rng.uniform(-80, 80, n)
        val = rng.normal(10, 3, n)
        glon = np.array([-120.0, 0.0, 60.5])
        glat = np.array([40.0, -10.0, 70.0])
        tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat), "v": pa.array(val)})
        out = idw_grid(ray.data.from_arrow(tbl).repartition(6), "lon", "lat", "v",
                       glon, glat, radius_km=3000.0).to_pandas().set_index("gid")
        for g in range(3):
            d = haversine_km(lon, lat, glon[g], glat[g])
            m = d <= 3000.0
            w = 1.0 / (d[m] ** 2 + 1e-9)
            exp = (w * val[m]).sum() / w.sum()
            assert out.loc[g, "n_pts"] == m.sum()
            assert abs(out.loc[g, "idw"] - exp) < 1e-9


class TestQuantileCont:
    def test_matches_numpy_interpolation(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_quantile_cont

        rng = np.random.default_rng(3)
        g = rng.choice(["a", "b", "c"], 4000)
        v = rng.integers(0, 60, 4000).astype(np.float64)
        tbl = pa.table({"g": pa.array(g), "v": pa.array(v)})
        out = grouped_quantile_cont(
            ray.data.from_arrow(tbl).repartition(5), ["g"], "v",
            ps=[0.25, 0.5, 0.9], aliases=["q25", "q50", "q90"],
        ).to_pandas().set_index("g")
        for grp in "abc":
            vals = v[g == grp]
            for p, alias in [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]:
                exp = np.quantile(vals, p)  # linear interpolation = quantile_cont
                assert abs(out.loc[grp, alias] - exp) < 1e-12, (grp, alias)


class TestEd1Pairs:
    def test_mask_cases(self):
        from edkray.ops.editdist import ed1_mask

        a = np.array(["red", "cold", "abc", "abc", "abc", "kitten", "abc"])
        b = np.array(["rod", "old", "abcd", "abc", "axc", "sitten", "bcda"])
        got = ed1_mask(a, b).tolist()
        #      sub    del    ins    eq     sub    sub     far
        assert got == [True, True, True, False, True, True, False]
        # insertion at front / middle / end (symmetric order), then a 2-edit
        assert ed1_mask(np.array(["bc", "ac", "ab", "xabc", "axbz"]),
                        np.array(["abc", "abc", "abc", "abc", "abc"])).tolist() == [
            True, True, True, True, False]

    def test_pairs_match_bruteforce(self, ray_session):
        import itertools

        import ray.data

        from edkray.ops.editdist import ed1_pairs

        rng = np.random.default_rng(77)
        vocab = set()
        base = ["table", "chair", "spark", "shard", "merge", "query"]
        for w in base:
            vocab.add(w)
            for _ in range(3):  # random 1-edits and 2-edits
                i = rng.integers(0, len(w))
                c = chr(ord("a") + rng.integers(0, 26))
                vocab.add(w[:i] + c + w[i + 1:])
                vocab.add(w[:i] + w[i + 1:])
                vocab.add(w[:i] + c + w[i:])
        vocab = sorted(vocab)

        def ed(x, y):
            if len(x) > len(y):
                x, y = y, x
            prev = list(range(len(x) + 1))
            for j, cy in enumerate(y, 1):
                cur = [j]
                for i, cx in enumerate(x, 1):
                    cur.append(min(prev[i] + 1, cur[i - 1] + 1,
                                   prev[i - 1] + (cx != cy)))
                prev = cur
            return prev[-1]

        exp = sorted((x, y) for x, y in itertools.combinations(vocab, 2)
                     if ed(x, y) == 1)
        ds = ray.data.from_arrow(pa.table({"tok": pa.array(vocab)})).repartition(4)
        got = sorted(map(tuple, ed1_pairs(ds).to_pandas().to_numpy()))
        assert got == exp


class TestFunnel:
    def test_counts_and_zero_step(self, ray_session):
        import ray.data

        from edkray.ops.window import funnel_counts

        rows = [
            # u1 completes A->B->C in order
            (1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
            # u2 has B before A: reaches A only
            (2, 5, "B"), (2, 6, "A"),
            # u3: A then C (no B): reaches A only
            (3, 1, "A"), (3, 2, "C"),
            # u4: A, B at same ts as A (strict > excludes), later B ok
            (4, 1, "A"), (4, 1, "B"), (4, 2, "B"),
        ]
        tbl = pa.table({
            "u": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows]),
            "et": pa.array([r[2] for r in rows]),
        })
        out = funnel_counts(ray.data.from_arrow(tbl).repartition(3),
                            ["u"], "ts", "et", steps=["A", "B", "C"],
                            num_buckets=4).to_pandas().set_index("step")
        assert out.loc[1, "n_keys"] == 4
        assert out.loc[2, "n_keys"] == 2  # u1 and u4
        assert out.loc[3, "n_keys"] == 1  # u1
        assert out.loc[3, "step_type"] == "C"
        # a step nobody reaches still appears with 0
        out2 = funnel_counts(ray.data.from_arrow(tbl), ["u"], "ts", "et",
                             steps=["C", "B", "A"], num_buckets=2
                             ).to_pandas().set_index("step")
        assert out2.loc[3, "n_keys"] == 0


class TestGapStats:
    def test_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.window import gap_stats

        rng = np.random.default_rng(8)
        n = 4000
        us = rng.integers(0, 10**9, n) * 1000
        tbl = pa.table({
            "u": pa.array(rng.integers(0, 37, n)),
            "ts": pa.array(us).cast(pa.timestamp("us")),
            "i": pa.array(np.arange(n)),
        })
        got = gap_stats(ray.data.from_arrow(tbl).repartition(5), ["u"], "ts",
                        tiebreak=["i"]).to_pandas().set_index("u").sort_index()
        pdf = tbl.to_pandas().sort_values(["u", "ts", "i"])
        pdf["gap"] = pdf.groupby("u")["ts"].diff().dt.total_seconds()
        exp = pdf.groupby("u")["gap"].agg(["count", "mean", "max"])
        assert (got["n_gaps"] == exp["count"]).all()
        assert np.allclose(got["mean_gap"], exp["mean"], atol=1e-6)
        assert np.allclose(got["max_gap"], exp["max"], atol=1e-9)

    def test_single_event_key(self, ray_session):
        import ray.data

        from edkray.ops.window import gap_stats

        tbl = pa.table({"u": pa.array([1, 2, 2]),
                        "ts": pa.array([10**6, 2 * 10**6, 5 * 10**6]).cast(pa.timestamp("us"))})
        got = gap_stats(ray.data.from_arrow(tbl), ["u"], "ts").to_pandas().set_index("u")
        assert got.loc[1, "n_gaps"] == 0 and np.isnan(got.loc[1, "mean_gap"])
        assert got.loc[2, "n_gaps"] == 1 and got.loc[2, "max_gap"] == 3.0


class TestCumsumPivot:
    def test_cumsum_matches_pandas(self, ray_session):
        import ray.data

        from edkray.ops.window import cumsum_by_key

        rng = np.random.default_rng(21)
        n = 3000
        tbl = pa.table({
            "u": pa.array(rng.integers(0, 23, n)),
            "ts": pa.array(rng.integers(0, 10**8, n)).cast(pa.timestamp("us")),
            "i": pa.array(np.arange(n)),
            "v": pa.array(rng.normal(size=n)),
        })
        got = cumsum_by_key(ray.data.from_arrow(tbl).repartition(4), ["u"], "ts",
                            "v", tiebreak=["i"]).to_pandas().sort_values("i")
        pdf = tbl.to_pandas().sort_values(["u", "ts", "i"])
        pdf["exp"] = pdf.groupby("u")["v"].cumsum()
        exp = pdf.sort_values("i")
        assert np.allclose(got["running_sum"].to_numpy(), exp["exp"].to_numpy(), atol=1e-9)

    def test_pivot_counts(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import pivot_counts

        rng = np.random.default_rng(4)
        n = 5000
        g = rng.integers(0, 40, n)
        c = rng.choice(["x", "y", "z"], n)
        tbl = pa.table({"g": pa.array(g), "c": pa.array(c)})
        got = pivot_counts(ray.data.from_arrow(tbl).repartition(6), ["g"], "c",
                           ["x", "y", "z"]).to_pandas().set_index("g").sort_index()
        pdf = tbl.to_pandas()
        for cat in "xyz":
            exp = pdf[pdf.c == cat].groupby("g").size().reindex(got.index, fill_value=0)
            assert (got[f"n_{cat}"] == exp).all(), cat


class TestSetOps:
    def test_intersect_except(self, ray_session):
        import ray.data

        from edkray.ops.setops import set_op

        a = pa.table({"k": pa.array([1, 1, 2, 3, 4, 4]), "s": pa.array(list("aabcdd"))})
        b = pa.table({"k": pa.array([2, 4, 5]), "s": pa.array(list("bdz"))})
        da = ray.data.from_arrow(a).repartition(3)
        db = ray.data.from_arrow(b).repartition(2)
        inter = set_op(da, db, ["k", "s"], "intersect").to_pandas()
        exc = set_op(da, db, ["k", "s"], "except").to_pandas()
        assert sorted(map(tuple, inter.to_numpy())) == [(2, "b"), (4, "d")]
        assert sorted(map(tuple, exc.to_numpy())) == [(1, "a"), (3, "c")]
        with pytest.raises(ValueError):
            set_op(da, db, ["k"], "union")


class TestHistogram:
    def test_matches_numpy(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import histogram

        rng = np.random.default_rng(19)
        v = rng.uniform(-5, 17, 8000)
        tbl = pa.table({"x": pa.array(v)})
        got = histogram(ray.data.from_arrow(tbl).repartition(5), "x", bins=12
                        ).to_pandas().set_index("bin").sort_index()
        mn, mx = v.min(), v.max()
        idx = np.minimum(np.floor((v - mn) / (mx - mn) * 12).astype(int), 11)
        exp = np.bincount(idx, minlength=12)
        assert got["n"].sum() == len(v)
        for b in got.index:
            assert got.loc[b, "n"] == exp[b]
            assert abs(got.loc[b, "lo"] - (mn + b * (mx - mn) / 12)) < 1e-12

    def test_degenerate_range(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import histogram

        tbl = pa.table({"x": pa.array([3.0, 3.0])})
        with pytest.raises(ValueError, match="degenerate"):
            histogram(ray.data.from_arrow(tbl), "x", bins=4)


class TestStringAggTrajectory:
    def test_string_agg_sorted(self, ray_session):
        import ray.data

        from edkray.ops.aggregate import grouped_string_agg

        tbl = pa.table({"g": pa.array(["a", "a", "b", "a"]),
                        "v": pa.array(["z", "m", "q", "k"])})
        out = grouped_string_agg(ray.data.from_arrow(tbl).repartition(2),
                                 ["g"], "v", alias="s", num_buckets=2
                                 ).to_pandas().set_index("g")
        assert out.loc["a", "s"] == "k,m,z"
        assert out.loc["b", "s"] == "q"

    def test_trajectory_matches_manual(self, ray_session):
        import ray.data

        from edkray.geo.distance import haversine_km
        from edkray.ops.window import trajectory_stats

        # user 1: 3 points; user 2: single point
        lon = np.array([0.0, 10.0, 10.0, 50.0])
        lat = np.array([0.0, 0.0, 20.0, 30.0])
        tbl = pa.table({
            "u": pa.array([1, 1, 1, 2]),
            "ts": pa.array([1, 2, 3, 1]).cast(pa.timestamp("us")),
            "i": pa.array([0, 1, 2, 3]),
            "lon": pa.array(lon), "lat": pa.array(lat),
        })
        out = trajectory_stats(ray.data.from_arrow(tbl).repartition(2),
                               ["u"], "ts", "lon", "lat", tiebreak=["i"],
                               num_buckets=2).to_pandas().set_index("u")
        exp_path = (haversine_km(0, 0, 10, 0) + haversine_km(10, 0, 10, 20))
        assert out.loc[1, "n_legs"] == 2
        assert abs(out.loc[1, "path_km"] - exp_path) < 1e-9
        assert abs(out.loc[1, "net_km"] - haversine_km(0, 0, 10, 20)) < 1e-9
        assert out.loc[2, "n_legs"] == 0 and out.loc[2, "path_km"] == 0.0
        assert out.loc[2, "net_km"] == 0.0
