"""Stage protocol + registry tests (SURVEY §2.10b): registry lookup,
list composition with per-stage map_batches options, actor-class
stages with pinned constructor kwargs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from edkray.ops.protocol import Stage, apply_stages, get_stage, register_stage


class TestRegistry:
    def test_builtin_function_stage(self):
        st = get_stage("mask_nodata", col="v", nodata=-1.0)
        tbl = pa.table({"v": [1.0, -1.0, 3.0]})
        out = st(tbl)
        assert out["v"].to_pylist() == [1.0, None, 3.0]
        assert isinstance(st, Stage)  # runtime-checkable protocol

    def test_builtin_actor_stage_kwargs_pinned(self):
        cls = get_stage("imageresize", width=4, height=4)
        inst = cls()  # kwargs pinned in __init__, as Ray would build it
        assert (inst.w, inst.h) == (4, 4)

    def test_unknown_stage_raises(self):
        with pytest.raises(KeyError, match="unknown stage"):
            get_stage("nope")

    def test_register_custom(self):
        register_stage("double_v", lambda col: lambda b: b.set_column(
            b.column_names.index(col), col, pa.compute.multiply(b[col], 2)))
        st = get_stage("double_v", col="v")
        assert st(pa.table({"v": [2]}))["v"].to_pylist() == [4]


class TestApplyStages:
    def test_list_composition(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table({"v": np.array([1.0, -9999.0, 5.0, 7.0]), "k": [1, 2, 3, 4]})
        )
        out = apply_stages(
            ds,
            [
                ("mask_nodata", {"col": "v", "nodata": -9999.0}),
                ("apply_scale_offset", {"col": "v", "scale": 2.0, "offset": 1.0}),
                lambda b: b.filter(pa.compute.is_valid(b["v"])),
            ],
        ).to_pandas()
        assert sorted(out["v"]) == [3.0, 11.0, 15.0]

    def test_actor_stage_in_list(self, ray_session):
        import ray.data

        from edkray.ops.multimodal import decode_image, make_media

        media = make_media()
        imgs = media.filter(pa.compute.equal(media["kind"], "image")).slice(0, 8)
        out = apply_stages(
            ray.data.from_arrow(imgs),
            [("imageresize", {"width": 8, "height": 8,
                              "concurrency": (1, 2), "batch_size": 4})],
        ).to_pandas()
        assert all(decode_image(p).shape[:2] == (8, 8) for p in out.payload)

    def test_bad_opts_raise(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.table({"v": [1.0]}))
        with pytest.raises(ValueError, match="unknown map_batches opts"):
            apply_stages(ds, [(lambda b: b, {"concurency": 2})])
