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
