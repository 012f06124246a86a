"""Stateless per-batch stages (map_batches, zero-copy Arrow).

Covers the reference's per-record maps §2.2 of SURVEY.md: geocoding /
cell assignment (replacing tile-extent computation M5), temporal
bucketing (A1, engines/commons.py:37-54), bbox filtering (M6/J2,
utilities/geo.py:160-163), epoch fill (M8, dataset.py:782-784).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from edkray.geo.cells import quadcell
from edkray.geo.hexgrid import hexcell
from edkray.geo.s2 import s2_cellid, s2_token
from edkray.utils import derive_lonlat

EPOCH = _dt.datetime(1970, 1, 1)


def add_derived_lonlat(batch: pa.Table, id_col: str) -> pa.Table:
    """Deterministic arithmetic geocode from an integer id column
    (synthetic-corpus analogue of domain-hash geocoding, FIXTURES.md §1)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    lon, lat = derive_lonlat(ids)
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


def add_cells(
    batch: pa.Table,
    lon_col: str = "lon",
    lat_col: str = "lat",
    quad_res: tuple[int, ...] = (7, 8, 9),
    hex_res: tuple[int, ...] = (),
    s2_level: int | None = None,
    s2_as_token: bool = False,
) -> pa.Table:
    """Append cell-index columns (quad / hex / s2) for given resolutions."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    for r in quad_res:
        batch = batch.append_column(f"cell_{r}", pa.array(quadcell(lon, lat, r)))
    for r in hex_res:
        batch = batch.append_column(f"hex_{r}", pa.array(hexcell(lon, lat, r)))
    if s2_level is not None:
        ids = s2_cellid(lon, lat, s2_level)
        if s2_as_token:
            batch = batch.append_column("s2_token", pa.array(s2_token(ids)))
        else:
            batch = batch.append_column("s2_cell", pa.array(ids))
    return batch


def temporal_bucket(
    batch: pa.Table,
    ts_col: str,
    freq: str = "day",
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    out_col: str = "date_bucket",
    drop_out_of_range: bool = True,
) -> pa.Table:
    """Left-closed temporal bucketing (reference engines/commons.py:37-54).

    ``freq``: pyarrow ``floor_temporal`` unit ("minute" | "hour" | "day" |
    "week" | "month" | "year"). Rows outside ``[start, end)`` are DROPPED
    when ``drop_out_of_range`` (the reference leaves them date=None then
    groups them under NaT, SURVEY §2.11 — we pick the explicit drop rule).
    """
    ts = batch[ts_col]
    if start is not None or end is not None:
        mask = pa.array(np.ones(len(batch), dtype=bool))
        if start is not None:
            mask = pc.and_(mask, pc.greater_equal(ts, pa.scalar(start, type=ts.type)))
        if end is not None:
            mask = pc.and_(mask, pc.less(ts, pa.scalar(end, type=ts.type)))
        if drop_out_of_range:
            batch = batch.filter(mask)
            ts = batch[ts_col]
    bucket = pc.floor_temporal(ts, unit=freq)
    return batch.append_column(out_col, bucket)


def epoch_fill(batch: pa.Table, ts_col: str) -> pa.Table:
    """Null timestamps → 1970-01-01 sentinel (reference dataset.py:782-784),
    so timeless rows group identically."""
    ts = batch[ts_col]
    filled = pc.fill_null(ts, pa.scalar(EPOCH, type=ts.type))
    return batch.set_column(batch.schema.get_field_index(ts_col), ts_col, filled)


def bbox_filter(
    batch: pa.Table,
    bbox: tuple[float, float, float, float],
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    """Keep rows inside a closed query bbox (xmin, ymin, xmax, ymax) —
    reference's tile↔bbox semi-join predicate (utilities/geo.py:160-163)."""
    xmin, ymin, xmax, ymax = bbox
    lon, lat = batch[lon_col], batch[lat_col]
    mask = pc.and_(
        pc.and_(pc.greater_equal(lon, xmin), pc.less_equal(lon, xmax)),
        pc.and_(pc.greater_equal(lat, ymin), pc.less_equal(lat, ymax)),
    )
    return batch.filter(mask)


def mask_nodata(batch: pa.Table, col: str, nodata: float, out_col: str | None = None) -> pa.Table:
    """``value == nodata → null`` (reference M11, xarray entrypoint.py:75-84)."""
    v = batch[col]
    masked = pc.if_else(pc.equal(v, pa.scalar(nodata, type=v.type)), pa.scalar(None, type=v.type), v)
    if out_col and out_col != col:
        return batch.append_column(out_col, masked)
    return batch.set_column(batch.schema.get_field_index(col), col, masked)


def apply_scale_offset(
    batch: pa.Table, col: str, scale: float = 1.0, offset: float = 0.0,
    out_col: str | None = None,
) -> pa.Table:
    """``value * scale + offset`` null-safe (reference M12, entrypoint.py:86-91)."""
    v = pc.add(pc.multiply(batch[col], pa.scalar(float(scale))), pa.scalar(float(offset)))
    name = out_col or col
    idx = batch.schema.get_field_index(name)
    if idx >= 0:
        return batch.set_column(idx, name, v)
    return batch.append_column(name, v)


def rescale_255(batch: pa.Table, col: str, lo: float, hi: float, out_col: str | None = None) -> pa.Table:
    """Min/max rescale to 0..255 (reference M14, helpers.py:149-172);
    ``lo``/``hi`` come from a prior global Min/Max aggregate."""
    import numpy as np

    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    span = (hi - lo) or 1.0
    scaled = np.clip((v - lo) / span * 255.0, 0.0, 255.0)
    name = out_col or col
    idx = batch.schema.get_field_index(name)
    arr = pa.array(scaled)
    if idx >= 0:
        return batch.set_column(idx, name, arr)
    return batch.append_column(name, arr)


def add_webmercator(batch: pa.Table, lon_col: str = "lon", lat_col: str = "lat") -> pa.Table:
    """Append EPSG:3857 x/y meter columns (reference M15 vectorized)."""
    from edkray.geo.transform import lonlat_to_webmercator

    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    x, y = lonlat_to_webmercator(lon, lat)
    return batch.append_column("merc_x", pa.array(x)).append_column("merc_y", pa.array(y))


def reproject(
    batch: pa.Table,
    source_epsg: int,
    target_epsg: int,
    x_col: str = "lon",
    y_col: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
) -> pa.Table:
    """Upsert ``out_x``/``out_y`` with coordinates reprojected
    ``source_epsg`` → ``target_epsg`` (geo/transform.py:transform_points
    — the vectorized counterpart of the reference's per-point OSR loop,
    utilities/transform.py:8-52). Supports 4326, 3857, WGS84 UTM
    (326xx/327xx) and sinusoidal (6974 MODIS / 54008)."""
    from edkray.geo.transform import transform_points

    x = batch[x_col].to_numpy(zero_copy_only=False)
    y = batch[y_col].to_numpy(zero_copy_only=False)
    tx, ty = transform_points(x, y, source_epsg, target_epsg)
    for name, arr in ((out_x, pa.array(tx)), (out_y, pa.array(ty))):
        if name in batch.schema.names:
            batch = batch.set_column(batch.schema.get_field_index(name), name, arr)
        else:
            batch = batch.append_column(name, arr)
    return batch


def deterministic_sample(
    batch: pa.Table, key_col: str, rate: float, knuth: int = 2654435761
) -> pa.Table:
    """Keep ~``rate`` of rows by Knuth multiplicative hash of an integer
    key — fully deterministic and, for NON-NEGATIVE keys, exactly
    reproducible in ANSI SQL: ``(key * 2654435761) % 4294967296 <
    rate * 2**32`` (cast the product to HUGEINT for keys ≥ 2^32 — DuckDB
    raises on int64 overflow where this uint64 path wraps; since 2^32
    divides 2^64, the wrap never changes the mod-2^32 result). Negative
    keys are rejected: numpy's wrap and SQL modulo sign rules diverge
    there. Sampling is per-KEY, so all rows of a key are kept or dropped
    together (stable joins downstream)."""
    import numpy as np

    signed = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if (signed < 0).any():
        raise ValueError("deterministic_sample requires non-negative keys")
    keys = signed.astype(np.uint64)
    threshold = np.uint64(int(rate * (1 << 32)))
    with np.errstate(over="ignore"):
        keep = (keys * np.uint64(knuth)) % np.uint64(1 << 32) < threshold
    return batch.filter(pa.array(keep))


def normalize_uri(batch: pa.Table, col: str = "url") -> pa.Table:
    """Protocol rewrites (reference M18: s3:// → /vsis3/, https:// →
    /vsicurl/) re-expressed as vectorized prefix normalization."""
    u = batch[col]
    u = pc.replace_substring_regex(u, pattern=r"^s3://", replacement="vfs/s3/")
    u = pc.replace_substring_regex(u, pattern=r"^https?://", replacement="vfs/http/")
    return batch.set_column(batch.schema.get_field_index(col), col, u)


def validate_pages(
    batch: pa.Table,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    text_col: str | None = "text",
    max_text_chars: int = 1_000_000,
    ts_range: tuple[str, str] = ("1990-01-01", "2100-01-01"),
) -> pa.Table:
    """Ingest validation with quarantine REASONS instead of crashes —
    the web-corpus upgrade of the reference's hard property validation
    (dataset.py:446-448 raises on heterogeneity; a 100-TB crawl ingest
    must instead route bad rows aside and keep streaming).

    Appends ``reject_reason`` (null = valid; first matching rule wins,
    rule order pinned and SQL-replayable):

    1. ``null_url``      — url missing or empty after trim
    2. ``bad_url``       — url does not parse as ``scheme://host``
    3. ``null_ts``       — timestamp missing (when ``ts_col`` given)
    4. ``ts_out_of_range`` — outside [1990, 2100) (clock garbage)
    5. ``null_text``     — text missing (when ``text_col`` given)
    6. ``oversized_text`` — > ``max_text_chars`` chars (parser bombs)

    Vectorized single pass (polars when-chain); callers split the
    stream with two cheap filters (``reject_reason IS NULL`` /
    ``IS NOT NULL``) — Ray Data has no multi-output stages, and two
    narrow filters over one pass beat one pass per destination."""
    import datetime as _dt

    import polars as pl

    df = pl.from_arrow(batch)
    u = pl.col(url_col)
    cond = (
        pl.when(u.is_null() | (u.str.strip_chars() == ""))
        .then(pl.lit("null_url"))
        .when(~u.str.strip_chars().str.contains(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+"))
        .then(pl.lit("bad_url"))
    )
    # Skipping the ts/text rules is only allowed via the explicit
    # ts_col=None / text_col=None contract — a named-but-absent column
    # is a caller bug (typo) and must not silently validate every row.
    if ts_col is not None:
        if ts_col not in df.columns:
            raise KeyError(
                f"validate_pages: ts_col={ts_col!r} not in batch columns "
                f"{df.columns}; pass ts_col=None to skip the ts rules"
            )
        lo = _dt.datetime.fromisoformat(ts_range[0])
        hi = _dt.datetime.fromisoformat(ts_range[1])
        t = pl.col(ts_col)
        cond = (
            cond.when(t.is_null()).then(pl.lit("null_ts"))
            .when((t < lo) | (t >= hi)).then(pl.lit("ts_out_of_range"))
        )
    if text_col is not None:
        if text_col not in df.columns:
            raise KeyError(
                f"validate_pages: text_col={text_col!r} not in batch columns "
                f"{df.columns}; pass text_col=None to skip the text rules"
            )
        x = pl.col(text_col)
        cond = (
            cond.when(x.is_null()).then(pl.lit("null_text"))
            .when(x.str.len_chars() > max_text_chars).then(pl.lit("oversized_text"))
        )
    out = df.with_columns(cond.otherwise(None).alias("reject_reason"))
    return out.to_arrow()
