"""Plot-sink tests (S17 analogue): colormap semantics vs the reference
rules (linear interp, NaN transparent), GeoJSON geometry vs
quadcell_bounds, end-to-end aggregated overlay export."""

from __future__ import annotations

import json

import numpy as np
import pytest

from edkray.ops.plot import linear_colormap, to_geojson


class TestColormap:
    def test_endpoints_and_midrange(self):
        rgba = linear_colormap(np.array([0.0, 5.0, 10.0]), 0.0, 10.0)
        assert rgba.shape == (3, 4) and rgba.dtype == np.uint8
        assert tuple(rgba[0]) == (68, 1, 84, 255)  # viridis low anchor
        assert tuple(rgba[2]) == (253, 231, 37, 255)  # viridis high anchor
        # midrange strictly between the endpoints on the green channel
        assert rgba[0][1] < rgba[1][1] < rgba[2][1]

    def test_nan_transparent_and_clipping(self):
        rgba = linear_colormap(np.array([np.nan, -99.0, 99.0]), 0.0, 10.0)
        assert rgba[0][3] == 0  # NaN → fully transparent
        assert tuple(rgba[1]) == (68, 1, 84, 255)  # clipped to vmin
        assert tuple(rgba[2]) == (253, 231, 37, 255)  # clipped to vmax

    def test_custom_colors_and_degenerate_range(self):
        stops = np.array([[0, 0, 0], [255, 255, 255]])
        rgba = linear_colormap(np.array([1.0, 1.0]), 1.0, 1.0, colors=stops)
        assert tuple(rgba[0]) == (0, 0, 0, 255)  # zero span → vmin color


class TestGeojson:
    def test_geometry_matches_quadcell_bounds(self):
        import pyarrow as pa

        from edkray.geo.cells import quadcell, quadcell_bounds

        cells = quadcell(np.array([10.0, -70.0]), np.array([45.0, -30.0]), 6)
        tbl = pa.table({"tile": cells, "count": [3, 4]})
        doc = json.loads(to_geojson(tbl, "tile"))
        assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 2
        for feat, cell, cnt in zip(doc["features"], cells, (3, 4)):
            xmin, ymin, xmax, ymax = quadcell_bounds(int(cell))
            ring = feat["geometry"]["coordinates"][0]
            assert ring[0] == [xmin, ymin] and ring[2] == [xmax, ymax]
            assert ring[0] == ring[-1]  # closed ring
            assert feat["properties"]["count"] == cnt

    def test_row_cap_enforced(self):
        import pyarrow as pa

        import edkray.ops.plot as plot

        tbl = pa.table({"tile": np.zeros(5, dtype=np.int64), "v": np.arange(5.0)})
        old = plot.MAX_FEATURES
        plot.MAX_FEATURES = 3
        try:
            with pytest.raises(ValueError, match="aggregate before plotting"):
                to_geojson(tbl, "tile")
        finally:
            plot.MAX_FEATURES = old


class TestOverlay:
    def test_plot_overlay_end_to_end(self, ray_session, tmp_path):
        import ray.data

        from edkray.geo.cells import quadcell
        from edkray.ops.plot import plot_overlay

        rng = np.random.default_rng(7)
        lon, lat = rng.uniform(-170, 170, 300), rng.uniform(-80, 80, 300)
        ds = ray.data.from_items(
            [
                {"tile": int(c), "mean_val": float(v)}
                for c, v in zip(quadcell(lon, lat, 4), rng.uniform(0, 50, 300))
            ]
        )
        out = tmp_path / "overlay.geojson"
        doc = json.loads(plot_overlay(ds, "mean_val", "tile", path=str(out)))
        assert len(doc["features"]) == 300
        f0 = doc["features"][0]["properties"]
        assert set(f0) == {"mean_val", "fill", "fill_opacity"}
        assert f0["fill"].startswith("#") and len(f0["fill"]) == 7
        assert f0["fill_opacity"] == 1.0
        # file written identically
        assert json.loads(out.read_text()) == doc


class TestMapHtml:
    def test_rasterize_pixels_match_colormap(self):
        import pyarrow as pa

        from edkray.geo.cells import quadcell
        from edkray.ops.plot import linear_colormap, rasterize_cells

        # four adjacent res-2 cells covering one res-1 quadrant
        lon = np.array([-170.0, -50.0, -170.0, -50.0])
        lat = np.array([-80.0, -80.0, -10.0, -10.0])
        cells = quadcell(lon, lat, 2)
        assert len(set(cells.tolist())) == 4
        vals = np.array([0.0, 1.0, 2.0, np.nan])
        tbl = pa.table({"tile": cells, "v": vals})
        img, (x0, y0, x1, y1) = rasterize_cells(tbl, "v", "tile", max_dim=8)
        assert img.shape == (2, 2, 4) and img.dtype == np.uint8
        assert (x0, y0, x1, y1) == (-180.0, -90.0, 0.0, 0.0)
        exp = linear_colormap(vals, 0.0, 2.0)
        # row 0 = top (max lat): cells 2,3; row 1 = bottom: cells 0,1
        assert tuple(img[1, 0]) == tuple(exp[0])
        assert tuple(img[1, 1]) == tuple(exp[1])
        assert tuple(img[0, 0]) == tuple(exp[2])
        assert img[0, 1, 3] == 0  # NaN cell transparent

    def test_rasterize_mixed_resolution(self):
        import pyarrow as pa

        from edkray.geo.cells import quadcell
        from edkray.ops.plot import rasterize_cells

        # one coarse res-1 cell + one fine res-3 cell inside another quadrant
        coarse = quadcell(np.array([-90.0]), np.array([-45.0]), 1)
        fine = quadcell(np.array([100.0]), np.array([40.0]), 3)
        tbl = pa.table(
            {"tile": np.concatenate([coarse, fine]), "v": [1.0, 2.0]}
        )
        img, _ = rasterize_cells(tbl, "v", "tile", max_dim=64)
        # coarse cell paints a rect of >1 pixel; both colors present
        opaque = img[..., 3] == 255
        assert opaque.sum() > 2
        colors = {tuple(px) for px in img[opaque]}
        assert len(colors) == 2

    def test_write_map_html_roundtrip(self, ray_session, tmp_path):
        import base64
        import re

        import ray.data

        from edkray.geo.cells import quadcell
        from edkray.ops.codecs import decode_png
        from edkray.ops.plot import write_map_html

        rng = np.random.default_rng(3)
        lon, lat = rng.uniform(-170, 170, 50), rng.uniform(-80, 80, 50)
        ds = ray.data.from_items(
            [
                {"tile": int(c), "mean_val": float(v)}
                for c, v in zip(quadcell(lon, lat, 3), rng.uniform(0, 9, 50))
            ]
        )
        out = tmp_path / "map.html"
        html = write_map_html(ds, "mean_val", "tile", path=str(out), max_dim=64)
        assert out.read_text() == html
        assert "L.imageOverlay" in html and "fitBounds" in html
        m = re.search(r'base64,([A-Za-z0-9+/=]+)"', html)
        assert m, "no embedded PNG"
        img = decode_png(base64.b64decode(m.group(1)))
        assert img.ndim == 3 and img.shape[2] == 4
        assert (img[..., 3] == 255).any()  # some covered pixels
        # bounds appear in the JS
        assert "var bounds = [[" in html
