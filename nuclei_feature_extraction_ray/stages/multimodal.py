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


def frame_sample_stub(*_a, **_k):
    """Video frame sampling requires a codec absent from this container."""
    raise NotImplementedError(
        "video frame sampling needs an AV codec (not in container); "
        "the Ray-side stage would be map_batches(DecodeMedia-like actor "
        "pool, small batch_size) over a binary frames column")
