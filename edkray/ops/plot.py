"""Plot sink — the S17 Folium-overlay analogue, offline.

The reference plot sink (``xarray_boosted/plotters/folium.py:30-62``,
``edk_accessor.py:395-420``) transforms the raster bbox to EPSG:4326,
builds a linear viridis colormap over the array's ``[nanmin, nanmax]``,
maps NaN to fully-transparent, and renders a colormapped ImageOverlay
on a folium map. folium/matplotlib are unavailable here, so the
Ray-native analogue produces the same *renderable artifact* without a
viz library:

- colormap bounds come from the distributed ``global_min_max``
  aggregate (A6) — never a driver-side full read;
- value→RGBA mapping is a vectorized ``map_batches`` stage
  (:func:`colorize`), NaN → alpha 0 exactly like the reference's
  ``get_color``;
- the output is a GeoJSON FeatureCollection of colored cell polygons
  (simplestyle ``fill`` / ``fill-opacity`` properties) that any web map
  (folium included) renders directly. The FeatureCollection is written
  driver-side from a SMALL **aggregated** table — the reference
  likewise plots from a full driver-side ``read_as_array()``; plotting
  is inherently a driver-side sink over aggregates, so
  :func:`to_geojson` enforces a row cap rather than pretending to
  stream.

Cells are quadkey cells (``geo/cells.py``), already EPSG:4326, so no
CRS transform is needed (the reference's ``transform_bbox`` step is the
identity here).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

# Viridis anchor colors (matplotlib's CC0/public-domain colormap data),
# linearly interpolated between anchors like branca's LinearColormap.
_VIRIDIS = np.array(
    [
        [68, 1, 84],
        [72, 40, 120],
        [62, 74, 137],
        [49, 104, 142],
        [38, 130, 142],
        [31, 158, 137],
        [53, 183, 121],
        [109, 205, 89],
        [180, 222, 44],
        [253, 231, 37],
    ],
    dtype=np.float64,
)

_HEX_LUT = np.array([format(i, "02x") for i in range(256)])


def linear_colormap(
    values: np.ndarray,
    vmin: float,
    vmax: float,
    colors: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized value → (N, 4) uint8 RGBA; NaN → (255,255,255,0).

    Mirrors the reference ``_create_cmap``: linear interpolation over
    the color stops between ``vmin`` and ``vmax``, NaN transparent.
    """
    stops = _VIRIDIS if colors is None else np.asarray(colors, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    nan = np.isnan(v)
    span = vmax - vmin
    t = np.clip((v - vmin) / span, 0.0, 1.0) if span > 0 else np.zeros_like(v)
    t = np.where(nan, 0.0, t)
    x = np.linspace(0.0, 1.0, len(stops))
    out = np.empty((len(v), 4), dtype=np.uint8)
    # half-up rounding (floor(x+0.5)) — pinned so the SQL oracle can
    # mirror it exactly (np.rint's half-to-even has no clean SQL form)
    for c in range(3):
        out[:, c] = np.floor(np.interp(t, x, stops[:, c]) + 0.5).astype(np.uint8)
    out[:, 3] = 255
    out[nan, :3] = 255
    out[nan, 3] = 0
    return out


def colorize(
    ds: ray.data.Dataset,
    value_col: str,
    vmin: float | None = None,
    vmax: float | None = None,
    colors: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Add simplestyle ``fill`` (#rrggbb) + ``fill_opacity`` columns.

    Bounds default to the DISTRIBUTED global min/max (A6 partial+final
    aggregate) — the ``np.nanmin/np.nanmax`` of the reference without
    materializing the data. The per-batch mapping is one np.interp per
    channel + an LUT hex assembly (no per-row Python).
    """
    if vmin is None or vmax is None:
        from edkray.sources.catalog import global_min_max

        lo, hi = global_min_max(ds, value_col)
        vmin = lo if vmin is None else vmin
        vmax = hi if vmax is None else vmax

    def _fn(batch: pa.Table) -> pa.Table:
        rgba = linear_colormap(
            batch[value_col].to_numpy(zero_copy_only=False), vmin, vmax, colors
        )
        fill = np.char.add(
            np.char.add(
                np.char.add("#", _HEX_LUT[rgba[:, 0]]), _HEX_LUT[rgba[:, 1]]
            ),
            _HEX_LUT[rgba[:, 2]],
        )
        batch = batch.append_column("fill", pa.array(fill.tolist(), type=pa.string()))
        return batch.append_column(
            "fill_opacity", pa.array(rgba[:, 3].astype(np.float64) / 255.0)
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def _cell_bounds_vec(cells: np.ndarray) -> tuple[np.ndarray, ...]:
    """Vectorized quadcell → (xmin, ymin, xmax, ymax) arrays."""
    from edkray.geo.cells import quadcell_decode

    res, ix, iy = quadcell_decode(cells)
    n = np.power(2.0, res.astype(np.float64))
    xmin = ix / n * 360.0 - 180.0
    ymin = iy / n * 180.0 - 90.0
    return xmin, ymin, xmin + 360.0 / n, ymin + 180.0 / n


MAX_FEATURES = 200_000  # a browser map dies far before this anyway


def to_geojson(
    table: pa.Table,
    cell_col: str,
    properties: list[str] | None = None,
    path: str | None = None,
) -> str:
    """Aggregated table → GeoJSON FeatureCollection (driver-side sink).

    One polygon feature per row, geometry from the row's quadcell,
    properties from ``properties`` (default: every non-cell column).
    Raises if the table exceeds ``MAX_FEATURES`` — plot sinks consume
    aggregates, not raw data; aggregate (e.g. ``grouped_agg`` per tile)
    before plotting.
    """
    if hasattr(table, "to_arrow"):  # polars
        table = table.to_arrow()
    if not isinstance(table, pa.Table):
        from edkray.utils import table_from_pandas
        table = table_from_pandas(table)
    if table.num_rows > MAX_FEATURES:
        raise ValueError(
            f"{table.num_rows} rows > MAX_FEATURES={MAX_FEATURES}: "
            "aggregate before plotting (this is a driver-side sink)"
        )
    props = properties or [c for c in table.column_names if c != cell_col]
    cells = table[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
    xmin, ymin, xmax, ymax = _cell_bounds_vec(cells)
    cols = {p: table[p].to_pylist() for p in props}
    features = []
    for i in range(table.num_rows):
        ring = [
            [xmin[i], ymin[i]],
            [xmax[i], ymin[i]],
            [xmax[i], ymax[i]],
            [xmin[i], ymax[i]],
            [xmin[i], ymin[i]],
        ]
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {p: cols[p][i] for p in props},
            }
        )
    doc = json.dumps({"type": "FeatureCollection", "features": features})
    if path is not None:
        with open(path, "w") as f:
            f.write(doc)
    return doc


def plot_overlay(
    ds: ray.data.Dataset,
    value_col: str,
    cell_col: str,
    path: str | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
    colors: np.ndarray | None = None,
) -> str:
    """End-to-end S17 analogue: distributed bounds → colorize →
    GeoJSON overlay. ``ds`` must already be aggregated (≤ MAX_FEATURES
    rows), mirroring the reference's plot-from-driver-array model."""
    import ray

    colored = colorize(ds, value_col, vmin=vmin, vmax=vmax, colors=colors)
    tbl = pa.concat_tables(ray.get(colored.to_arrow_refs()))
    return to_geojson(tbl, cell_col, path=path)


def rasterize_cells(
    table: pa.Table,
    value_col: str,
    cell_col: str,
    vmin: float | None = None,
    vmax: float | None = None,
    colors: np.ndarray | None = None,
    max_dim: int = 1024,
) -> tuple[np.ndarray, tuple[float, float, float, float]]:
    """Aggregated cell table → (RGBA image, EPSG:4326 bbox).

    The raster the reference hands to folium's ImageOverlay
    (``xarray_boosted/plotters/folium.py:30-62``: colormapped array +
    transformed bounds). Cells paint their pixel rectangle with their
    colormap RGBA; uncovered pixels stay fully transparent, exactly
    like the reference's NaN→alpha-0 ``get_color``. Mixed-resolution
    cells are fine — each paints the rect its bounds cover. Driver-side
    sink over an AGGREGATED table (≤ MAX_FEATURES), like
    :func:`to_geojson`; pixel-rect coords are vectorized, the paint is
    one slice-assign per cell.
    """
    if hasattr(table, "to_arrow"):  # polars
        table = table.to_arrow()
    if table.num_rows == 0:
        raise ValueError("rasterize_cells: empty table")
    if table.num_rows > MAX_FEATURES:
        raise ValueError(
            f"{table.num_rows} rows > MAX_FEATURES={MAX_FEATURES}: "
            "aggregate before plotting (this is a driver-side sink)"
        )
    vals = table[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    lo = float(np.nanmin(vals)) if vmin is None else vmin
    hi = float(np.nanmax(vals)) if vmax is None else vmax
    rgba = linear_colormap(vals, lo, hi, colors)
    cells = table[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
    xmin, ymin, xmax, ymax = _cell_bounds_vec(cells)
    bx0, by0 = float(xmin.min()), float(ymin.min())
    bx1, by1 = float(xmax.max()), float(ymax.max())
    # pixel grid: the finest cell edge (per axis — quadcells are
    # 360/n × 180/n) sets the native resolution, capped at max_dim
    step_x = float((xmax - xmin).min())
    step_y = float((ymax - ymin).min())
    w = max(1, min(max_dim, int(round((bx1 - bx0) / step_x))))
    h = max(1, min(max_dim, int(round((by1 - by0) / step_y))))
    img = np.zeros((h, w, 4), dtype=np.uint8)  # alpha 0 = uncovered
    px0 = np.clip(np.floor((xmin - bx0) / (bx1 - bx0) * w), 0, w - 1).astype(np.int64)
    px1 = np.clip(np.ceil((xmax - bx0) / (bx1 - bx0) * w), 1, w).astype(np.int64)
    # row 0 = top of image = max latitude (PNG scanline order)
    py0 = np.clip(np.floor((by1 - ymax) / (by1 - by0) * h), 0, h - 1).astype(np.int64)
    py1 = np.clip(np.ceil((by1 - ymin) / (by1 - by0) * h), 1, h).astype(np.int64)
    for i in range(len(cells)):
        img[py0[i]:py1[i], px0[i]:px1[i]] = rgba[i]
    return img, (bx0, by0, bx1, by1)


_MAP_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>edkray overlay</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div>
<script>
var bounds = [[{y0}, {x0}], [{y1}, {x1}]];
var img = "data:image/png;base64,{b64}";
if (typeof L !== "undefined") {{
  var map = L.map("map");
  L.tileLayer("https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png",
              {{maxZoom: 19, attribution: "&copy; OpenStreetMap"}}).addTo(map);
  L.imageOverlay(img, bounds, {{opacity: {opacity}}}).addTo(map);
  map.fitBounds(bounds);
}} else {{
  // offline fallback: show the raster itself (bounds in the title)
  document.getElementById("map").innerHTML =
    '<img src="' + img + '" title="' + JSON.stringify(bounds) +
    '" style="width:100%;image-rendering:pixelated">';
}}
</script></body></html>
"""


def write_map_html(
    ds: ray.data.Dataset,
    value_col: str,
    cell_col: str,
    path: str | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
    colors: np.ndarray | None = None,
    max_dim: int = 1024,
    opacity: float = 0.7,
) -> str:
    """The actual map artifact — S17 parity with the reference's
    ``ds.plot()`` (``edk_accessor.py:395-420`` → folium ImageOverlay).

    Distributed min/max → vectorized colorize → driver-side rasterize
    of the (small, aggregated) cell table → stdlib PNG encode
    (:func:`edkray.ops.codecs.encode_png`) → one self-contained HTML
    file: a Leaflet map (CDN, like folium's own output) with the PNG
    inlined as a base64 ImageOverlay at the EPSG:4326 bounds, plus a
    no-network fallback that renders the raster directly. Returns the
    HTML string; writes it to ``path`` when given.
    """
    import base64

    import ray

    from edkray.ops.codecs import encode_png

    if vmin is None or vmax is None:
        from edkray.sources.catalog import global_min_max

        lo, hi = global_min_max(ds, value_col)
        vmin = lo if vmin is None else vmin
        vmax = hi if vmax is None else vmax
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    img, (x0, y0, x1, y1) = rasterize_cells(
        tbl, value_col, cell_col, vmin=vmin, vmax=vmax, colors=colors, max_dim=max_dim
    )
    b64 = base64.b64encode(encode_png(img)).decode("ascii")
    html = _MAP_HTML.format(x0=x0, y0=y0, x1=x1, y1=y1, b64=b64, opacity=opacity)
    if path is not None:
        with open(path, "w") as f:
            f.write(html)
    return html
