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
