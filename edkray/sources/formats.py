"""Format-adapter interface — one seam, several adapters.

The reference puts 4 format adapters behind one duck-typed interface
(``create_tiles(scan_df, band_locator) -> [Tile]``: formats/geotiff.py:
12-40, formats/netcdf.py:18-91, formats/earth_engine.py:13-107,
formats/stac_asset.py:244-247) selected by an if-chain
(dataset.py:88-100). Here the seam is explicit: an adapter maps a scan
Dataset (rows of ``path``/``tile_name``/``date``) to a CATALOG Dataset
(one row per tile/subdataset with a typed ``bands`` list), registered
in a dict.

Adapters:
- ``parquet``      — per-file footer scan; bands := payload columns
                     (the GeoTIFF per-band metadata analogue).
- ``parquet_dir``  — subdataset expansion: one scan row addressing a
                     DIRECTORY explodes to one row per member file,
                     band description := file stem (the NetCDF/GEE
                     subdataset walk, formats/netcdf.py:18-63).
- ``stac_asset``   — item rows with an assets JSON column explode to
                     one row per allowed data asset
                     (formats/stac_asset.py:25-247).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Protocol

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

_ADAPTERS: dict[str, Callable[..., "FormatAdapter"]] = {}

BAND_TYPE = pa.list_(
    pa.struct(
        [
            ("source_idx", pa.int32()),
            ("description", pa.string()),
            ("dtype", pa.string()),
            ("nodataval", pa.float64()),
        ]
    )
)


class FormatAdapter(Protocol):
    def create_tiles(self, scan: ray.data.Dataset) -> ray.data.Dataset: ...


def register_adapter(name: str, factory: Callable[..., FormatAdapter]) -> None:
    _ADAPTERS[name] = factory


def get_adapter(name: str, **kwargs) -> FormatAdapter:
    if name not in _ADAPTERS:
        raise KeyError(f"unknown format adapter {name!r}; known: {sorted(_ADAPTERS)}")
    return _ADAPTERS[name](**kwargs)


def _bands_from_schema(schema: pa.Schema, skip: set[str]) -> list[dict]:
    """Payload columns → band dicts (reference geo.py:89-95: per-band
    source_idx/description/dtype/nodataval read out of file metadata)."""
    bands = []
    idx = 1  # 1-based like GDAL band indexes
    for field in schema:
        if field.name in skip:
            continue
        bands.append(
            {
                "source_idx": idx,
                "description": field.name,
                "dtype": str(field.type),
                "nodataval": None,
            }
        )
        idx += 1
    return bands


_KEY_COLS = {"path", "tile_name", "date"}


class ParquetAdapter:
    """One tile row per file; bands from the file's own schema."""

    def create_tiles(self, scan: ray.data.Dataset) -> ray.data.Dataset:
        def _tiles(batch: pa.Table) -> pa.Table:
            out = {"path": [], "tile_name": [], "date": [], "subdataset": [],
                   "n_rows": [], "bands": []}
            names = batch.schema.names
            for i in range(len(batch)):
                path = batch["path"][i].as_py()
                f = pq.ParquetFile(path)
                out["path"].append(path)
                out["tile_name"].append(
                    batch["tile_name"][i].as_py() if "tile_name" in names
                    else os.path.basename(path)
                )
                out["date"].append(batch["date"][i].as_py() if "date" in names else None)
                out["subdataset"].append(None)
                out["n_rows"].append(f.metadata.num_rows)
                out["bands"].append(_bands_from_schema(f.schema_arrow, _KEY_COLS))
            return pa.table(
                {
                    "path": pa.array(out["path"], type=pa.string()),
                    "tile_name": pa.array(out["tile_name"], type=pa.string()),
                    "date": pa.array(out["date"], type=pa.timestamp("us")),
                    "subdataset": pa.array(out["subdataset"], type=pa.string()),
                    "n_rows": pa.array(out["n_rows"], type=pa.int64()),
                    "bands": pa.array(out["bands"], type=BAND_TYPE),
                }
            )

        return scan.map_batches(_tiles, batch_format="pyarrow", batch_size=64)


class ParquetDirAdapter:
    """Subdataset expansion: a scan row addressing a directory explodes
    into one tile row per member parquet file (1 → N flat-map, the
    NetCDF subdataset enumeration shape, formats/netcdf.py:18-63);
    band description := member file stem (the varname analogue).

    ``recursive=True`` (default) walks NESTED directories too — the
    reference's recursive subdataset walk (utilities/geo.py:136-157,
    formats/earth_engine.py:13-107, where a subdataset may itself
    expose subdatasets). Nested members get ``:``-joined subdataset
    names (``outer:inner:file``), mirroring GDAL's nested-subdataset
    naming; ``max_depth`` bounds runaway trees/symlink cycles."""

    def __init__(self, recursive: bool = True, max_depth: int = 8):
        self.recursive = recursive
        self.max_depth = max_depth

    def _walk(self, root: str, depth: int = 0) -> list[tuple[str, str]]:
        """[(member_path, subdataset_name)] — files at this level first
        (sorted), then nested subdatasets (sorted), depth-first."""
        files, dirs = [], []
        for m in sorted(os.listdir(root)):
            full = os.path.join(root, m)
            if m.endswith(".parquet") and os.path.isfile(full):
                files.append((full, m.removesuffix(".parquet")))
            elif os.path.isdir(full) and self.recursive and depth < self.max_depth:
                dirs.append((full, m))
        out = list(files)
        for full, name in dirs:
            out.extend((p, f"{name}:{sub}") for p, sub in self._walk(full, depth + 1))
        return out

    def create_tiles(self, scan: ray.data.Dataset) -> ray.data.Dataset:
        def _tiles(batch: pa.Table) -> pa.Table:
            out = {"path": [], "tile_name": [], "date": [], "subdataset": [],
                   "n_rows": [], "bands": []}
            names = batch.schema.names
            for i in range(len(batch)):
                root = batch["path"][i].as_py()
                tname = (batch["tile_name"][i].as_py() if "tile_name" in names
                         else os.path.basename(root.rstrip("/")))
                date = batch["date"][i].as_py() if "date" in names else None
                for m, stem in self._walk(root):
                    f = pq.ParquetFile(m)
                    out["path"].append(m)
                    out["tile_name"].append(tname)
                    out["date"].append(date)
                    out["subdataset"].append(stem)
                    out["n_rows"].append(f.metadata.num_rows)
                    bands = _bands_from_schema(f.schema_arrow, _KEY_COLS)
                    for b in bands:
                        b["description"] = f"{stem}:{b['description']}"
                    out["bands"].append(bands)
            return pa.table(
                {
                    "path": pa.array(out["path"], type=pa.string()),
                    "tile_name": pa.array(out["tile_name"], type=pa.string()),
                    "date": pa.array(out["date"], type=pa.timestamp("us")),
                    "subdataset": pa.array(out["subdataset"], type=pa.string()),
                    "n_rows": pa.array(out["n_rows"], type=pa.int64()),
                    "bands": pa.array(out["bands"], type=BAND_TYPE),
                }
            )

        return scan.map_batches(_tiles, batch_format="pyarrow", batch_size=16)


class StacAssetAdapter:
    """Item rows carrying an ``assets`` JSON column explode to one tile
    row per allowed data asset (media-type/role filter + optional
    signing, formats/stac_asset.py:25-247)."""

    def __init__(self, signer=None):
        from edkray.sources.stac_json import identity_signer

        self.signer = signer or identity_signer

    def create_tiles(self, scan: ray.data.Dataset) -> ray.data.Dataset:
        from edkray.sources.stac_json import ALLOWED_MEDIA_TYPES

        signer = self.signer

        def _tiles(batch: pa.Table) -> pa.Table:
            out = {"path": [], "tile_name": [], "date": [], "subdataset": [],
                   "n_rows": [], "bands": []}
            names = batch.schema.names
            for i in range(len(batch)):
                assets = json.loads(batch["assets"][i].as_py())
                tname = batch["tile_name"][i].as_py()
                date = batch["date"][i].as_py() if "date" in names else None
                for key, asset in assets.items():
                    if asset.get("media_type") not in ALLOWED_MEDIA_TYPES:
                        continue
                    if "data" not in (asset.get("roles") or []):
                        continue
                    path = signer(asset["href"])
                    f = pq.ParquetFile(path)
                    out["path"].append(path)
                    out["tile_name"].append(tname)
                    out["date"].append(date)
                    out["subdataset"].append(key)
                    out["n_rows"].append(f.metadata.num_rows)
                    out["bands"].append(_bands_from_schema(f.schema_arrow, _KEY_COLS))
            return pa.table(
                {
                    "path": pa.array(out["path"], type=pa.string()),
                    "tile_name": pa.array(out["tile_name"], type=pa.string()),
                    "date": pa.array(out["date"], type=pa.timestamp("us")),
                    "subdataset": pa.array(out["subdataset"], type=pa.string()),
                    "n_rows": pa.array(out["n_rows"], type=pa.int64()),
                    "bands": pa.array(out["bands"], type=BAND_TYPE),
                }
            )

        return scan.map_batches(_tiles, batch_format="pyarrow", batch_size=64)


class ParquetMultivarAdapter:
    """Single-FILE multi-variable container — the NetCDF shape proper
    (reference formats/netcdf.py:18-91: one file holds many named
    variables; ``create_tiles`` emits one row per variable with band
    description := varname). Here a variable is a column-name prefix
    before ``sep`` (``temp:v``, ``wind:v`` → subdatasets ``temp``,
    ``wind``); unprefixed columns are shared coordinates and attach to
    every variable's band list (the NetCDF dimension-variable
    analogue). Metadata-only: reads each file's FOOTER, never data."""

    def __init__(self, sep: str = ":"):
        self.sep = sep

    def create_tiles(self, scan: ray.data.Dataset) -> ray.data.Dataset:
        sep = self.sep

        def _tiles(batch: pa.Table) -> pa.Table:
            out = {"path": [], "tile_name": [], "date": [], "subdataset": [],
                   "n_rows": [], "bands": []}
            names = batch.schema.names
            for i in range(len(batch)):
                path = batch["path"][i].as_py()
                tname = (batch["tile_name"][i].as_py() if "tile_name" in names
                         else os.path.basename(path))
                date = batch["date"][i].as_py() if "date" in names else None
                f = pq.ParquetFile(path)
                sch = f.schema_arrow
                variables: dict[str, list] = {}
                shared: list[pa.Field] = []
                for field in sch:
                    if field.name in _KEY_COLS:
                        continue
                    if sep in field.name:
                        var, _ = field.name.split(sep, 1)
                        variables.setdefault(var, []).append(field)
                    else:
                        shared.append(field)
                if not variables:  # no prefixed columns → one subdataset
                    variables = {"": shared}
                    shared = []
                for var in sorted(variables):
                    bands, idx = [], 1
                    for field in variables[var] + shared:
                        bands.append(
                            {
                                "source_idx": idx,
                                # own fields keep their var-qualified name;
                                # shared coordinates keep their bare name
                                "description": field.name,
                                "dtype": str(field.type),
                                "nodataval": None,
                            }
                        )
                        idx += 1
                    out["path"].append(path)
                    out["tile_name"].append(tname)
                    out["date"].append(date)
                    out["subdataset"].append(var or None)
                    out["n_rows"].append(f.metadata.num_rows)
                    out["bands"].append(bands)
            return pa.table(
                {
                    "path": pa.array(out["path"], type=pa.string()),
                    "tile_name": pa.array(out["tile_name"], type=pa.string()),
                    "date": pa.array(out["date"], type=pa.timestamp("us")),
                    "subdataset": pa.array(out["subdataset"], type=pa.string()),
                    "n_rows": pa.array(out["n_rows"], type=pa.int64()),
                    "bands": pa.array(out["bands"], type=BAND_TYPE),
                }
            )

        return scan.map_batches(_tiles, batch_format="pyarrow", batch_size=64)


register_adapter("parquet", ParquetAdapter)
register_adapter("parquet_dir", ParquetDirAdapter)
register_adapter("parquet_multivar", ParquetMultivarAdapter)
register_adapter("stac_asset", StacAssetAdapter)
