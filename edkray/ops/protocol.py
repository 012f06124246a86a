"""Formal Stage protocol + registry + list composition (SURVEY §2.10b).

The reference's extension surface is duck-typed if-chains
(``dataset.py:79-100``); the Source half is already a real protocol
(`sources/registry.py:Source`, `sources/formats.py:FormatAdapter`).
This module completes the triple: a ``Stage`` is any
``fn(batch: pa.Table) -> pa.Table`` (task stage) or a callable CLASS
with that ``__call__`` (actor-pool stage — state built once per actor
in ``__init__``), registered in a plain dict and composed as a plain
list by :func:`apply_stages`.

List elements accepted by :func:`apply_stages`:

- a per-batch callable — fused task stage;
- a class — actor-pool ``map_batches(Cls, concurrency=...)`` stage;
- ``(stage, opts)`` — ``opts`` forwarded to ``map_batches``
  (``batch_size``, ``concurrency``, ``num_cpus``,
  ``fn_constructor_kwargs``);
- a registered name ``"mask_nodata"`` or ``("mask_nodata", {...})`` —
  kwargs go to the registered factory, which returns the stage.

Per-stage resources stay first-class so a pipeline can size each
stage's ``concurrency × num_cpus`` to the node (heavy decode stages
small-batched, cheap maps fused), per the 100-TB sizing rules.
"""

from __future__ import annotations

import functools
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa
import ray.data

_MAP_OPTS = {"batch_size", "concurrency", "num_cpus", "fn_constructor_kwargs"}


@runtime_checkable
class Stage(Protocol):
    """Per-batch transform: Arrow in, Arrow out."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


_STAGES: dict[str, Callable[..., Stage | type]] = {}


def register_stage(name: str, factory: Callable[..., Stage | type]) -> None:
    """Register a stage factory: ``factory(**kwargs)`` returns a
    per-batch callable or an actor class."""
    _STAGES[name] = factory


def get_stage(name: str, **kwargs) -> Stage | type:
    if name not in _STAGES:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_STAGES)}")
    return _STAGES[name](**kwargs)


def apply_stages(ds: ray.data.Dataset, steps: list) -> ray.data.Dataset:
    """Compose pipeline steps from a plain list (SURVEY §2.10)."""
    for step in steps:
        opts: dict = {}
        if isinstance(step, tuple):
            step, opts = step
        if isinstance(step, str):
            factory_kwargs = {k: v for k, v in opts.items() if k not in _MAP_OPTS}
            opts = {k: v for k, v in opts.items() if k in _MAP_OPTS}
            step = get_stage(step, **factory_kwargs)
        bad = set(opts) - _MAP_OPTS
        if bad:
            raise ValueError(f"unknown map_batches opts {sorted(bad)}")
        if isinstance(step, type):
            opts.setdefault("concurrency", (1, 4))
        ds = ds.map_batches(step, batch_format="pyarrow", **opts)
    return ds


def _fn_factory(fn: Callable) -> Callable[..., Stage]:
    """Function stage: factory(**kwargs) → partial(fn, **kwargs)."""

    def factory(**kwargs):
        return functools.partial(fn, **kwargs)

    return factory


def _actor_factory(cls: type) -> Callable[..., type]:
    """Actor stage: factory(**kwargs) → subclass with kwargs pinned in
    __init__ (apply_stages passes the CLASS so Ray builds state once
    per actor, not once per batch)."""

    def factory(**kwargs):
        if not kwargs:
            return cls
        return type(
            cls.__name__,
            (cls,),
            {"__init__": functools.partialmethod(cls.__init__, **kwargs)},
        )

    return factory


def _register_builtins() -> None:
    from edkray.ops import multimodal, stages, text

    for name in (
        "epoch_fill",
        "bbox_filter",
        "mask_nodata",
        "apply_scale_offset",
        "rescale_255",
        "add_webmercator",
        "deterministic_sample",
        "normalize_uri",
        "add_derived_lonlat",
        "add_cells",
        "temporal_bucket",
    ):
        _STAGES[name] = _fn_factory(getattr(stages, name))
    for cls in (multimodal.ImageStats, multimodal.ImageResize,
                multimodal.AudioFeatures, multimodal.FrameSample,
                multimodal.AxisTranspose, text.LangId):
        _STAGES[cls.__name__.lower()] = _actor_factory(cls)


_register_builtins()
