"""Multimodal stage tests: toy-format codecs round-trip, actor-pool
stats/resize/frame-sample stages, stub boundary for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from edkray.ops.multimodal import (
    decode_audio,
    decode_image,
    decode_video_header,
    encode_audio,
    encode_image,
    encode_video,
    make_media,
)


class TestCodecs:
    def test_image_roundtrip(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
        assert (decode_image(encode_image(arr)) == arr).all()

    def test_grayscale_image(self):
        arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = decode_image(encode_image(arr))
        assert out.shape == (3, 4, 1)
        assert (out[:, :, 0] == arr).all()

    def test_audio_roundtrip(self):
        s = np.array([0, 100, -100, 32000], dtype=np.int16)
        out, rate = decode_audio(encode_audio(s, 16000))
        assert rate == 16000 and (out == s).all()

    def test_video_header(self):
        frames = np.zeros((5, 4, 6), dtype=np.uint8)
        assert decode_video_header(encode_video(frames)) == (6, 4, 5)

    def test_unknown_format_raises_stub(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n....")
        with pytest.raises(NotImplementedError):
            decode_audio(b"RIFF....")


class TestStages:
    @pytest.fixture(scope="class")
    def media(self):
        return make_media()

    def test_image_stats(self, ray_session, media):
        import pyarrow.compute as pc
        import ray.data

        from edkray.ops.multimodal import image_stats

        imgs = media.filter(pc.equal(media["kind"], "image"))
        out = image_stats(ray.data.from_arrow(imgs)).to_pandas()
        assert len(out) == 50
        # recompute one row directly
        row0 = out[out.media_id == 0].iloc[0]
        arr = decode_image(imgs["payload"][0].as_py())
        assert (row0.width, row0.height, row0.channels) == (arr.shape[1], arr.shape[0], arr.shape[2])
        assert abs(row0.pix_mean - arr.mean()) < 1e-9

    def test_image_resize(self, ray_session, media):
        import pyarrow.compute as pc
        import ray.data

        from edkray.ops.multimodal import image_resize

        imgs = media.filter(pc.equal(media["kind"], "image"))
        out = image_resize(ray.data.from_arrow(imgs), 16, 16).to_pandas()
        for payload in out.payload:
            arr = decode_image(payload)
            assert arr.shape[:2] == (16, 16)

    def test_audio_features(self, ray_session, media):
        import pyarrow.compute as pc
        import ray.data

        from edkray.ops.multimodal import audio_features

        auds = media.filter(pc.equal(media["kind"], "audio"))
        out = audio_features(ray.data.from_arrow(auds)).to_pandas()
        assert len(out) == 20
        s, rate = decode_audio(auds["payload"][0].as_py())
        row = out[out.media_id == 1000].iloc[0]
        assert row.sample_rate == rate
        assert abs(row.duration_s - len(s) / rate) < 1e-9
        assert abs(row.rms - np.sqrt(np.mean(s.astype(float) ** 2))) < 1e-6

    def test_frame_sample(self, ray_session, media):
        import pyarrow.compute as pc
        import ray.data

        from edkray.ops.multimodal import decode_video_header, frame_sample

        vids = media.filter(pc.equal(media["kind"], "video"))
        out = frame_sample(ray.data.from_arrow(vids), n_frames=3).to_pandas()
        # each video yields min(3, n_frames) rows
        for i in range(vids.num_rows):
            mid = vids["media_id"][i].as_py()
            _, _, nf = decode_video_header(vids["payload"][i].as_py())
            assert (out.media_id == mid).sum() == min(3, nf)
        # every sampled frame decodes as a valid single-frame image
        arr = decode_image(out.frame.iloc[0])
        assert arr.ndim == 3

    def test_axis_transpose(self, ray_session, media):
        import pyarrow.compute as pc
        import ray.data

        from edkray.ops.multimodal import axis_transpose

        imgs = media.filter(pc.equal(media["kind"], "image"))
        out = axis_transpose(ray.data.from_arrow(imgs), order="chw").to_pandas()
        assert len(out) == 50 and "payload" not in out.columns
        row0 = out[out.media_id == 0].iloc[0]
        arr = decode_image(imgs["payload"][0].as_py())  # hwc
        chw = arr.transpose(2, 0, 1)
        assert tuple(row0["shape"]) == chw.shape
        assert (np.asarray(row0.tensor, dtype=np.uint8) == chw.ravel()).all()
        # identity order preserves layout
        hwc = axis_transpose(ray.data.from_arrow(imgs.slice(0, 4)), order="hwc").to_pandas()
        r = hwc.iloc[0]
        a = decode_image(imgs["payload"][0].as_py())
        assert tuple(r["shape"]) == a.shape
        assert (np.asarray(r.tensor, dtype=np.uint8) == a.ravel()).all()

    def test_axis_transpose_bad_order(self):
        from edkray.ops.multimodal import AxisTranspose

        with pytest.raises(ValueError):
            AxisTranspose(order="xyz")
