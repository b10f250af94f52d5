"""Multimodal column plumbing: opaque binary payloads with typed metadata.

PNG payloads decode for REAL through the pure-numpy codec in
``rayenc.ops.png`` (zlib is stdlib); jpeg/audio codecs are not in this
container, so those formats stay clearly-marked stubs (raise behind
``strict=True``, deterministic fake otherwise). Everything Ray-side is real
and tested: the schema convention, the actor-pool stage shape (state built
once in ``__init__``), batch sizing for large payloads, and the output
layout.

Schema convention for a media column ``m``:
    m:        binary           (encoded payload)
    m_format: string           ("jpeg" | "png" | "wav" | ...)
    m_w, m_h: int32            (images)  /  m_sr, m_samples (audio)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def synthesize_media_table(
    rows: int, seed: int = 0, payload_bytes: int = 4096, fmt: str = "fake"
) -> pa.Table:
    """Deterministic media table. ``fmt="png"`` emits REAL PNG payloads
    (encoded by rayenc.ops.png) with pixels derived from the row seed, so
    the decode stage exercises a genuine image codec end to end."""
    rng = np.random.default_rng(seed)
    if fmt == "png":
        from . import png as png_mod

        ws = rng.integers(16, 65, rows).astype(np.int32)
        hs = rng.integers(16, 65, rows).astype(np.int32)
        payloads = []
        for i in range(rows):
            img = rng.integers(0, 256, (int(hs[i]), int(ws[i]), 3)).astype(np.uint8)
            payloads.append(png_mod.encode(img))
    else:
        payloads = [
            rng.integers(0, 256, payload_bytes).astype(np.uint8).tobytes()
            for _ in range(rows)
        ]
        ws = rng.integers(16, 65, rows).astype(np.int32)
        hs = rng.integers(16, 65, rows).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(rows), pa.int64()),
            "m": pa.array(payloads, pa.binary()),
            "m_format": pa.array([fmt] * rows, pa.string()),
            "m_w": pa.array(ws, pa.int32()),
            "m_h": pa.array(hs, pa.int32()),
        }
    )


class ImageDecodeStage:
    """Actor-pool stage: decode + resize + feature-extract image payloads.

    Use as ``ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=SMALL, num_cpus=1)`` — batch_size must be small
    because each decoded image is ~W*H*3 bytes in the worker heap.
    """

    def __init__(self, target: int = 16, strict: bool = False):
        # per-actor setup happens ONCE here (in real life: load libjpeg/model)
        self.target = target
        self.strict = strict
        self._resample_grid = np.linspace(0.0, 1.0, target)

    def _decode(self, payload: bytes, w: int, h: int, fmt: str = "fake") -> np.ndarray:
        if fmt == "png":
            from . import png as png_mod

            img = png_mod.decode(payload)
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            return img[:, :, :3]
        if self.strict:
            raise NotImplementedError(
                f"decode of {fmt!r} requires pillow/libjpeg, not present in "
                "this container; PNG decodes natively, other formats need "
                "strict=False for the deterministic fake"
            )
        # deterministic fake: pixels derived from payload bytes
        raw = np.frombuffer(payload, np.uint8)
        need = w * h * 3
        reps = int(np.ceil(need / len(raw)))
        return np.tile(raw, reps)[:need].reshape(h, w, 3)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        yi = (self._resample_grid * (h - 1)).astype(np.int64)
        xi = (self._resample_grid * (w - 1)).astype(np.int64)
        return img[np.ix_(yi, xi)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("m").to_pylist()
        ws = batch.column("m_w").to_numpy(zero_copy_only=False)
        hs = batch.column("m_h").to_numpy(zero_copy_only=False)
        fmts = batch.column("m_format").to_pylist()
        feats = np.empty((len(payloads), self.target * self.target * 3), np.float32)
        for i, p in enumerate(payloads):
            img = self._resize(self._decode(p, int(ws[i]), int(hs[i]), fmts[i]))
            feats[i] = img.reshape(-1).astype(np.float32) / 255.0
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(
            np.arange(len(payloads) + 1, dtype=np.int32) * (self.target * self.target * 3)
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.ListArray.from_arrays(offsets, flat),
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: frame-sample an audio payload. WAV (RIFF/PCM16)
    decodes for real through rayenc.ops.png.decode_wav; other formats stay
    a deterministic fake (or raise with strict=True)."""

    def __init__(self, frames: int = 8, strict: bool = False):
        self.frames = frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = (
            batch.column("m_format").to_pylist()
            if "m_format" in batch.column_names
            else ["fake"] * batch.num_rows
        )
        out_rows = []
        for payload, fmt in zip(batch.column("m").to_pylist(), fmts):
            if fmt == "wav":
                from . import png as media_codecs

                samples, _rate = media_codecs.decode_wav(payload)
                mono = samples.mean(axis=1)
                idx = np.linspace(0, len(mono) - 1, self.frames).astype(np.int64)
                out_rows.append(mono[idx].astype(np.float32))
                continue
            if self.strict:
                raise NotImplementedError(
                    f"audio decode of {fmt!r} needs native codecs; WAV "
                    "decodes natively"
                )
            raw = np.frombuffer(payload, np.uint8).astype(np.float32)
            idx = np.linspace(0, len(raw) - 1, self.frames).astype(np.int64)
            out_rows.append(raw[idx] / 255.0)
        mat = np.stack(out_rows)
        flat = pa.array(mat.reshape(-1))
        offsets = pa.array(np.arange(len(out_rows) + 1, dtype=np.int32) * self.frames)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "frames": pa.ListArray.from_arrays(offsets, flat),
            }
        )


def media_pipeline(ds, target: int = 16, concurrency: int = 2, batch_size: int = 64):
    """The canonical media stage wiring: stateful actor pool, small batches."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"target": target},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
