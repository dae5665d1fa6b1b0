"""Multimodal media operators: opaque binary columns + typed metadata.

Task-brief scaffold: image/audio/video travel as ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
run as actor-pool ``map_batches`` stages (state built once per actor in
``__init__``). The IMAGE path is fully real elsewhere in this engine
(idf.codecs + stages/hash_stage). Audio/video codecs are NOT available
in this container, so their decode step is STUBBED — clearly marked —
behind either ``NotImplementedError`` (strict mode) or a deterministic
fake (test mode); everything Ray-side (schemas, batch shapes, actor
signatures, output layout) is real and tested.

Schemas:
  audio:  (media_id: string, bytes: binary, sample_rate: int32,
           n_channels: int32, fmt: string)
  video:  (media_id: string, bytes: binary, fps: float32,
           n_frames: int32, w: int32, h: int32, fmt: string)
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
        ("fmt", pa.string()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("fps", pa.float32()),
        ("n_frames", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
    ]
)


def _stub_pcm(data: bytes, n: int = 4096) -> np.ndarray:
    """Deterministic fake decode: blake2b-seeded pseudo-PCM. Stands in
    for the real audio codec (absent in this container)."""
    seed = int.from_bytes(blake2b(bytes(data[:64]), digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


class AudioFeaturizer:
    """Actor-pool UDF: per-clip feature extraction over the audio table.

    ``__init__`` builds the (stand-in for a) model / filterbank ONCE
    per actor; ``__call__`` handles a zero-copy Arrow batch. With
    ``strict=True`` the stubbed decode raises NotImplementedError —
    swap ``_decode`` for a real codec (e.g. soundfile/ffmpeg) to
    deploy."""

    N_MEL = 16  # toy filterbank size

    def __init__(self, strict: bool = False):
        self.strict = strict
        # per-actor state: a deterministic "filterbank" (model-load analog)
        rng = np.random.default_rng(1234)
        self.filterbank = rng.standard_normal((self.N_MEL, 128)).astype(np.float32)

    def _decode(self, data: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires a codec library not present in this container"
            )
        return _stub_pcm(data)  # STUB: deterministic fake PCM

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        bcol = batch["bytes"].combine_chunks()
        feats = np.empty((len(ids), self.N_MEL), dtype=np.float32)
        for i in range(len(ids)):
            pcm = self._decode(memoryview(bcol[i].as_buffer()))
            # toy spectrogram: windowed energy -> filterbank projection
            frames = pcm[: (len(pcm) // 128) * 128].reshape(-1, 128)
            feats[i] = self.filterbank @ np.abs(frames).mean(axis=0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "features": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


class VideoFrameSampler:
    """Actor-pool UDF: frame sampling over the video table — emits one
    row per sampled frame with the frame payload as an opaque binary
    (``flat_map``-style expansion inside ``map_batches``). The frame
    DECODE is stubbed (no video codec in this container): frames are
    deterministic byte slices standing in for decoded frames."""

    def __init__(self, every_n: int = 30, strict: bool = False):
        self.every_n = every_n
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        nframes = batch["n_frames"].to_pylist()
        bcol = batch["bytes"].combine_chunks()
        out_id, out_idx, out_frame = [], [], []
        for i in range(len(ids)):
            if self.strict:
                raise NotImplementedError(
                    "video decode requires a codec library not present in this container"
                )
            data = bytes(memoryview(bcol[i].as_buffer()))
            n = int(nframes[i] or 0)
            for f in range(0, n, self.every_n):
                # STUB frame bytes: deterministic slice keyed by frame idx
                h = blake2b(data[:32] + f.to_bytes(4, "little"), digest_size=16).digest()
                out_id.append(ids[i])
                out_idx.append(f)
                out_frame.append(h)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_bytes": pa.array(out_frame, pa.binary()),
            }
        )


def audio_features(audio: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    """Actor-pool feature extraction (setup once per actor)."""
    kw = {"concurrency": (1, concurrency)} if concurrency else {"concurrency": (1, 4)}
    return audio.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=64,  # media payloads are large: small batches
        zero_copy_batch=True,
        **kw,
    )


def video_frames(video: rd.Dataset, every_n: int = 30, concurrency: int | None = None) -> rd.Dataset:
    """Actor-pool frame sampling; one output row per sampled frame."""
    kw = {"concurrency": (1, concurrency)} if concurrency else {"concurrency": (1, 4)}
    return video.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=16,
        zero_copy_batch=True,
        **kw,
    )


class ImageThumbnailer:
    """map_batches UDF: decode -> EXIF-orientation normalize -> bilinear
    downscale (longest side <= max_side, never upscaled) -> PNG encode.

    Unlike the audio/video scaffolds above, this stage is FULLY REAL:
    it runs on the engine's own pure-numpy codecs (idf.codecs) and the
    reference-exact bilinear kernel (idf/kernels/preprocess.py,
    core/Format.java analog). Per-record error tolerance mirrors the
    hash stage (M9): undecodable rows emit status='skip' instead of
    failing the task."""

    def __init__(self, max_side: int = 64):
        from idf import codecs
        from idf.kernels.exif import exif_transform
        from idf.kernels.preprocess import bilinear_resize

        self._decode = codecs.decode
        self._encode = codecs.encode
        self._resize = bilinear_resize
        self._orient = exif_transform
        self.max_side = int(max_side)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist() if "fmt" in t.column_names else [None] * len(ids)
        orients = (
            t["orientation"].to_pylist()
            if "orientation" in t.column_names
            else [1] * len(ids)
        )
        out_id, out_bytes, out_w, out_h, out_status = [], [], [], [], []
        for image_id, data, fmt, orient in zip(ids, blobs, fmts, orients):
            try:
                img = self._decode(data, fmt)
                img = self._orient(img, int(orient or 1))
                h, w = img.shape[:2]
                scale = self.max_side / max(h, w)
                if scale < 1.0:
                    oh = max(1, int(round(h * scale)))
                    ow = max(1, int(round(w * scale)))
                    if img.ndim == 2:
                        img = self._resize(img, oh, ow)
                    else:
                        img = np.stack(
                            [self._resize(img[:, :, c], oh, ow) for c in range(img.shape[2])],
                            axis=2,
                        )
                    img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
                else:
                    img = img.astype(np.uint8, copy=False)
                png = self._encode(img, "png")
                out_id.append(image_id)
                out_bytes.append(png)
                out_h.append(img.shape[0])
                out_w.append(img.shape[1])
                out_status.append("ok")
            except Exception:  # noqa: BLE001 — per-record tolerance (M9)
                out_id.append(image_id)
                out_bytes.append(b"")
                out_h.append(0)
                out_w.append(0)
                out_status.append("skip")
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "thumb": pa.array(out_bytes, pa.binary()),
                "w": pa.array(np.asarray(out_w, dtype=np.int32)),
                "h": pa.array(np.asarray(out_h, dtype=np.int32)),
                "status": pa.array(out_status, pa.string()),
            }
        )


def image_thumbnails(
    images: rd.Dataset, max_side: int = 64, concurrency: int | None = None
) -> rd.Dataset:
    """Actor-pool thumbnail stage over (image_id, bytes[, fmt,
    orientation]) rows. Small batches: each input row carries an
    encoded image, so batch bytes — not row count — bound worker heap."""
    kw = {"concurrency": (1, concurrency)} if concurrency else {"concurrency": (1, 8)}
    return images.map_batches(
        ImageThumbnailer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        **kw,
    )


def synth_audio_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic synthetic audio table (AUDIO_SCHEMA) — no external
    data; lets the driver exercise the audio actor-pool plumbing."""
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "media_id": [f"a{i:05d}" for i in range(n)],
            "bytes": pa.array(
                [bytes(rng.integers(0, 256, 256, dtype=np.uint8)) for _ in range(n)],
                pa.binary(),
            ),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_channels": pa.array([1] * n, pa.int32()),
            "fmt": ["wav"] * n,
        },
        schema=AUDIO_SCHEMA,
    )


def synth_video_table(n: int = 32, seed: int = 1) -> pa.Table:
    """Deterministic synthetic video table (VIDEO_SCHEMA)."""
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "media_id": [f"v{i:05d}" for i in range(n)],
            "bytes": pa.array(
                [bytes(rng.integers(0, 256, 512, dtype=np.uint8)) for _ in range(n)],
                pa.binary(),
            ),
            "fps": pa.array([30.0] * n, pa.float32()),
            "n_frames": pa.array([30 * (1 + i % 8) for i in range(n)], pa.int32()),
            "w": pa.array([64] * n, pa.int32()),
            "h": pa.array([48] * n, pa.int32()),
            "fmt": ["mp4"] * n,
        },
        schema=VIDEO_SCHEMA,
    )
