"""Multimodal (image/audio/video) column plumbing — Ray-side real,
codec stubbed.

Design: media ride as opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages (decoder state built once
per actor in ``__init__`` — the pattern the reference implements with a
mutex-shared slide handle, ``src/input.rs:15-30``, here lock-free).
The image/audio libraries are not in this container, so the actual
codec is STUBBED: ``DecodeMedia`` tries to import PIL and otherwise
uses a deterministic fake decoder (8-byte header = width/height,
features = byte-level moments computed with numpy — real vectorized
kernels over the payload). Requesting a real resize without a codec
raises ``NotImplementedError`` loudly rather than faking silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HEADER_BYTES = 8


def make_payload(data: bytes, width: int, height: int) -> bytes:
    """Deterministic fake media payload: 8-byte header (w, h as uint32
    little-endian) + body."""
    return (int(width).to_bytes(4, "little")
            + int(height).to_bytes(4, "little") + data)


class DecodeMedia:
    """Actor-pool stage: payload(binary) -> typed metadata + features.

    Emits width, height, n_bytes, byte_mean, byte_std (population, like
    the reference's masked std, ``src/features/color.rs:117-134``) and
    byte_entropy. Small ``batch_size`` is the knob for large payloads
    (object-store memory = batch_size x payload x concurrency).
    """

    def __init__(self, payload_col: str = "payload", real_codec: bool = False):
        self.payload_col = payload_col
        self.codec = None
        if real_codec:
            try:
                import PIL.Image  # noqa: F401  (absent in this container)
                self.codec = PIL.Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image codec requested but PIL is unavailable; "
                    "use real_codec=False for the deterministic stub") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        nbytes = np.zeros(n, np.int64)
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        entropy = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if p is None or len(p) < HEADER_BYTES:
                continue  # degenerate -> NaN features, never crash
            width[i] = int.from_bytes(p[:4], "little")
            height[i] = int.from_bytes(p[4:8], "little")
            body = np.frombuffer(p, np.uint8, offset=HEADER_BYTES)
            nbytes[i] = len(body)
            if len(body):
                mean[i] = body.mean()
                std[i] = body.std()
                counts = np.bincount(body, minlength=256)
                pr = counts[counts > 0] / len(body)
                entropy[i] = float(-(pr * np.log2(pr)).sum())
        out = batch.drop_columns([self.payload_col])
        for name, arr in (("width", width), ("height", height),
                          ("n_payload_bytes", nbytes),
                          ("byte_mean", np.round(mean, 6)),
                          ("byte_std", np.round(std, 6)),
                          ("byte_entropy", np.round(entropy, 6))):
            out = out.append_column(name, pa.array(arr))
        return out


class ResizeMedia:
    """Actor-pool stage: payload -> payload resized to (out_w, out_h).

    With ``real_codec=False`` (this container) the body is interpreted
    as the fake format's w x h grayscale raster and resized by
    deterministic nearest-neighbour index sampling — a real vectorized
    numpy kernel over the payload bytes, exercising the exact
    actor/batch plumbing a PIL-backed resize would use. Bodies whose
    length does not match w*h (or degenerate headers) pass through
    null, counted in ``resize_ok``.
    """

    def __init__(self, out_w: int, out_h: int,
                 payload_col: str = "payload", real_codec: bool = False):
        self.out_w, self.out_h = int(out_w), int(out_h)
        self.payload_col = payload_col
        if real_codec:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real image codec requested but PIL is unavailable; "
                    "use real_codec=False for the raster stub") from e

    def _one(self, p: bytes) -> bytes | None:
        if p is None or len(p) < HEADER_BYTES:
            return None
        w = int.from_bytes(p[:4], "little")
        h = int.from_bytes(p[4:8], "little")
        body = np.frombuffer(p, np.uint8, offset=HEADER_BYTES)
        if w <= 0 or h <= 0 or len(body) != w * h:
            return None
        img = body.reshape(h, w)
        yi = (np.arange(self.out_h) * h) // self.out_h
        xi = (np.arange(self.out_w) * w) // self.out_w
        small = img[np.ix_(yi, xi)]
        return make_payload(small.tobytes(), self.out_w, self.out_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self._one(p) for p in
                batch[self.payload_col].to_pylist()]
        ok = pa.array(np.asarray([o is not None for o in outs]))
        batch = batch.drop_columns([self.payload_col])
        batch = batch.append_column(self.payload_col,
                                    pa.array(outs, pa.binary()))
        return batch.append_column("resize_ok", ok)


class FrameSample:
    """Actor-pool stage: video payload -> every ``stride``-th frame.

    The fake video format is the media header (frame w, h) followed by
    T concatenated w*h rasters; sampling slices the body with one
    reshape + stride index — the plumbing (schema, per-actor setup,
    small batch_size for big payloads, flat_map-style row explosion)
    is exactly what an AV-codec-backed sampler would use. Output: one
    row per sampled frame with ``frame_idx`` and the frame payload.
    """

    def __init__(self, stride: int = 2, payload_col: str = "payload",
                 real_codec: bool = False):
        self.stride = max(1, int(stride))
        self.payload_col = payload_col
        if real_codec:
            raise NotImplementedError(
                "AV codecs are not in this container; use "
                "real_codec=False for the raster stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names
                      if c != self.payload_col]
        idx_out, frames, fidx = [], [], []
        payloads = batch[self.payload_col].to_pylist()
        for i, p in enumerate(payloads):
            if p is None or len(p) < HEADER_BYTES:
                continue
            w = int.from_bytes(p[:4], "little")
            h = int.from_bytes(p[4:8], "little")
            body = np.frombuffer(p, np.uint8, offset=HEADER_BYTES)
            if w <= 0 or h <= 0 or len(body) < w * h:
                continue
            t = len(body) // (w * h)
            vid = body[:t * w * h].reshape(t, h * w)
            for j in range(0, t, self.stride):
                idx_out.append(i)
                fidx.append(j)
                frames.append(make_payload(vid[j].tobytes(), w, h))
        out = {c: batch[c].take(pa.array(idx_out, pa.int64()))
               for c in carry_cols}
        out["frame_idx"] = pa.array(np.asarray(fidx, np.int64))
        out["frame"] = pa.array(frames, pa.binary())
        return pa.table(out)


def frame_sample_stub(*_a, **_k):
    """Legacy loud stub (kept for API compatibility): real AV-codec
    frame sampling is unavailable in this container — use FrameSample
    (deterministic raster stub with the real Ray-side plumbing)."""
    raise NotImplementedError(
        "video frame sampling needs an AV codec (not in container); "
        "use stages.multimodal.FrameSample for the raster-stub "
        "pipeline with real actor-pool plumbing")
