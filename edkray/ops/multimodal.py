"""Multimodal (image / audio / video) stages over opaque binary columns.

Media travel as ``binary`` payload columns with typed metadata — the
north-star treatment for image/audio/video at 100 TB. Codec layers:

- the Ray-side plumbing (schemas, actor-pool stages, chunked batch
  sizing, output layout) is REAL and tested;
- REAL formats decode with no external dependency: baseline 8-bit PNG
  (stdlib zlib decoder) and RIFF PCM-16 WAV (stdlib ``wave``) via
  :mod:`edkray.ops.codecs` — payloads produced by any standard tool;
- the deterministic EDK toy container below (length-prefixed header +
  raw samples) remains the fixture format and the video container;
- everything else (JPEG/WebP/compressed audio/real video) raises
  ``NotImplementedError`` unless PIL happens to be importable — the
  remaining clearly-marked stub boundary per the build spec.

Toy container layouts (little-endian):
  image: b"EDKI" u16 width u16 height u8 channels  then w*h*c bytes
  audio: b"EDKA" u32 sample_rate u32 n_samples     then n*2 bytes (i16)
  video: b"EDKV" u16 width u16 height u16 n_frames then frames of w*h bytes

Batch sizing: decoded payloads are large; stages default to SMALL
batch_size (256) so batch x concurrency fits worker heaps (the
"large binary payloads need small batches" rule).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None

IMAGE_MAGIC = b"EDKI"
AUDIO_MAGIC = b"EDKA"
VIDEO_MAGIC = b"EDKV"


# --- toy-container codecs (deterministic, fixture-shared) -----------------


def encode_image(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 array → EDKI payload."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return IMAGE_MAGIC + struct.pack("<HHB", w, h, c) + arr.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Payload → (h, w, c) uint8 array. Codec dispatch by magic:
    EDKI toy container → REAL baseline PNG (stdlib zlib decoder,
    edkray.ops.codecs — any standard tool's 8-bit PNG decodes here) →
    PIL when importable → NotImplementedError for everything else
    (JPEG/WebP/...: the remaining clearly-marked stub boundary)."""
    if payload[:4] == IMAGE_MAGIC:
        w, h, c = struct.unpack_from("<HHB", payload, 4)
        return np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=9).reshape(h, w, c)
    from edkray.ops.codecs import PNG_SIG, decode_png

    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if _PIL_Image is not None:  # pragma: no cover
        import io

        return np.asarray(_PIL_Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        "no codec for this image format (not EDKI toy, not baseline PNG; PIL absent)"
    )


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, len(samples)) + (
        samples.astype(np.int16).tobytes()
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Payload → (int16 samples, rate). EDKA toy container → REAL RIFF
    PCM-16 WAV (stdlib ``wave`` decoder, edkray.ops.codecs) →
    NotImplementedError (compressed formats: the stub boundary)."""
    if payload[:4] == AUDIO_MAGIC:
        rate, n = struct.unpack_from("<II", payload, 4)
        return np.frombuffer(payload, dtype=np.int16, count=n, offset=12), rate
    # RIFF is a container family (WAVE audio, but also WEBP/AVI): only
    # RIFF....WAVE routes to the WAV decoder; other RIFF payloads fall
    # through to the documented stub boundary instead of a wave.Error
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from edkray.ops.codecs import decode_wav

        return decode_wav(payload)
    raise NotImplementedError(
        "no codec for this audio format (not EDKA toy, not RIFF PCM WAV)"
    )


def encode_video(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 grayscale frames → EDKV payload."""
    n, h, w = frames.shape
    return VIDEO_MAGIC + struct.pack("<HHH", w, h, n) + frames.astype(np.uint8).tobytes()


def decode_video_header(payload: bytes) -> tuple[int, int, int]:
    if payload[:4] != VIDEO_MAGIC:
        raise NotImplementedError("payload is not EDKV toy format")
    w, h, n = struct.unpack_from("<HHH", payload, 4)
    return w, h, n


# --- actor-pool stages ----------------------------------------------------


class ImageStats:
    """Actor-pool stage: decode + per-image stats (width, height,
    channels, mean/std over pixels). Decode state (codec selection) is
    per-actor; work is per batch."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"width": [], "height": [], "channels": [], "pix_mean": [], "pix_std": []}
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image(payload)
            out["width"].append(arr.shape[1])
            out["height"].append(arr.shape[0])
            out["channels"].append(arr.shape[2])
            out["pix_mean"].append(float(arr.mean()))
            out["pix_std"].append(float(arr.std()))
        batch = batch.drop_columns([self.payload_col])
        for k, v in out.items():
            typ = pa.int32() if k in ("width", "height", "channels") else pa.float64()
            batch = batch.append_column(k, pa.array(v, type=typ))
        return batch


class ImageResize:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode.

    Nearest-neighbor on index grids is pure numpy (no codec needed) and
    deterministic; output stays a binary column in toy format.
    """

    def __init__(self, width: int, height: int, payload_col: str = "payload"):
        self.w, self.h = width, height
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = []
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image(payload)
            ys = (np.arange(self.h) * arr.shape[0] // self.h).clip(0, arr.shape[0] - 1)
            xs = (np.arange(self.w) * arr.shape[1] // self.w).clip(0, arr.shape[1] - 1)
            resized.append(encode_image(arr[np.ix_(ys, xs)]))
        idx = batch.schema.get_field_index(self.payload_col)
        return batch.set_column(idx, self.payload_col, pa.array(resized, type=pa.binary()))


class AxisTranspose:
    """Actor-pool stage: decode image → axis transpose → tensor column.

    The reference's M13 axis-transpose normalizes raster array layout
    (band/y/x order) before compute; the model-pipeline equivalent is
    HWC→CHW (channels-first) ahead of batched inference. Output is an
    Arrow ``list<uint8>`` ``tensor`` column plus a ``list<int32>``
    ``shape`` column — list assembly is one offsets array + one
    concatenated values buffer, no per-row Python list building (the
    per-payload decode loop is inherent to codecs, as documented
    above).
    """

    _AXES = "hwc"

    def __init__(self, order: str = "chw", payload_col: str = "payload"):
        if sorted(order) != sorted(self._AXES):
            raise ValueError(f"order must be a permutation of {self._AXES!r}")
        self.perm = tuple(self._AXES.index(a) for a in order)
        self.order = order
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flats, shapes = [], np.empty((len(batch), 3), dtype=np.int32)
        for i, payload in enumerate(batch[self.payload_col].to_pylist()):
            arr = decode_image(payload).transpose(self.perm)
            shapes[i] = arr.shape
            flats.append(np.ascontiguousarray(arr).ravel())
        sizes = shapes.prod(axis=1, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
        values = pa.array(
            np.concatenate(flats) if flats else np.empty(0, dtype=np.uint8), type=pa.uint8()
        )
        tensor = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
        shape_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 3 * (len(batch) + 1), 3, dtype=np.int32), type=pa.int32()),
            pa.array(shapes.ravel(), type=pa.int32()),
        )
        batch = batch.drop_columns([self.payload_col])
        return batch.append_column("tensor", tensor).append_column("shape", shape_col)


class AudioFeatures:
    """Actor-pool stage: decode audio → duration, RMS, zero-crossings."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"sample_rate": [], "duration_s": [], "rms": [], "zero_crossings": []}
        for payload in batch[self.payload_col].to_pylist():
            samples, rate = decode_audio(payload)
            x = samples.astype(np.float64)
            out["sample_rate"].append(rate)
            out["duration_s"].append(len(x) / rate if rate else 0.0)
            out["rms"].append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
            out["zero_crossings"].append(int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0)
        batch = batch.drop_columns([self.payload_col])
        for k, v in out.items():
            typ = pa.int64() if k in ("sample_rate", "zero_crossings") else pa.float64()
            batch = batch.append_column(k, pa.array(v, type=typ))
        return batch


class FrameSample:
    """Actor-pool stage: sample ``n`` evenly-spaced frames per video →
    one output row per (video, frame) with the frame re-encoded as a
    single-frame EDKI image (flat_map shape: 1 row → n rows)."""

    def __init__(self, n_frames: int = 3, id_col: str = "media_id", payload_col: str = "payload"):
        self.n = n_frames
        self.id_col, self.payload_col = id_col, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()):
            w, h, n = decode_video_header(payload)
            take = np.linspace(0, n - 1, min(self.n, n)).astype(int)
            base = 10
            for fi in take:
                off = base + int(fi) * w * h
                frame = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
                ids.append(mid)
                frame_idx.append(int(fi))
                frames.append(encode_image(frame))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def image_stats(ds: ray.data.Dataset, concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(ImageStats, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def image_resize(ds: ray.data.Dataset, width: int, height: int,
                 concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(ImageResize, fn_constructor_kwargs=dict(width=width, height=height),
                          batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def axis_transpose(ds: ray.data.Dataset, order: str = "chw",
                   concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(AxisTranspose, fn_constructor_kwargs=dict(order=order),
                          batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def audio_features(ds: ray.data.Dataset, concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def frame_sample(ds: ray.data.Dataset, n_frames: int = 3,
                 concurrency=(1, 4), batch_size: int = 64) -> ray.data.Dataset:
    return ds.map_batches(FrameSample, fn_constructor_kwargs=dict(n_frames=n_frames),
                          batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


# --- fixture generator ----------------------------------------------------


def make_media(n_images: int = 50, n_audio: int = 20, n_video: int = 10, seed: int = 42) -> pa.Table:
    """Deterministic toy-format media table (media_id, kind, payload)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads = [], [], []
    for i in range(n_images):
        h, w, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), int(rng.choice([1, 3]))
        ids.append(i)
        kinds.append("image")
        payloads.append(encode_image(rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)))
    for j in range(n_audio):
        rate = int(rng.choice([8000, 16000]))
        nsamp = int(rng.integers(100, 4000))
        ids.append(1000 + j)
        kinds.append("audio")
        payloads.append(encode_audio(rng.integers(-2000, 2000, size=nsamp).astype(np.int16), rate))
    for v in range(n_video):
        h, w, nf = int(rng.integers(8, 32)), int(rng.integers(8, 32)), int(rng.integers(2, 12))
        ids.append(2000 + v)
        kinds.append("video")
        payloads.append(encode_video(rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)))
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
