"""Multimodal (image/audio/video) column plumbing — Ray-side real,
codec stubbed.

Design: media ride as opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages (decoder state built once
per actor in ``__init__`` — the pattern the reference implements with a
mutex-shared slide handle, ``src/input.rs:15-30``, here lock-free).
Each stage has TWO codec tiers behind ``real_codec``:

* ``real_codec=False`` (default; works everywhere): a deterministic
  fake raster format (8-byte header = width/height, body = grayscale
  bytes) with real vectorized numpy kernels — exercises the exact
  actor/batch/schema plumbing of the real path.
* ``real_codec=True``: PIL-backed decode / resize / frame-iterate
  (png/jpg/gif/...), import-guarded — if PIL is absent (this
  container) it raises ``NotImplementedError`` loudly rather than
  faking silently. Tests exercise this tier and skip gracefully when
  PIL is missing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HEADER_BYTES = 8


def _import_pil(what: str):
    """Import-guarded PIL: the real-codec path is first-class code but
    this container has no image libraries, so requesting it without
    PIL raises loudly instead of faking silently."""
    try:
        import PIL.Image
        return PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "real image codec requested but PIL is unavailable; "
            "use real_codec=False for the deterministic %s" % what) from e


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
        # real path: payloads are actual encoded images (png/jpg/...)
        # decoded by PIL once per row; grayscale pixels feed the same
        # moment kernels as the stub body bytes
        self.codec = _import_pil("stub") if real_codec else None

    def _real_decode(self, p: bytes):
        """(w, h, grayscale-pixel bytes) via PIL, or None if broken."""
        import io
        try:
            img = self.codec.open(io.BytesIO(p))
            arr = np.asarray(img.convert("L"), np.uint8)
            return img.width, img.height, arr.reshape(-1)
        except Exception:
            return None     # degenerate -> NaN features, never crash

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
            if self.codec is not None:
                dec = self._real_decode(p) if p is not None else None
                if dec is None:
                    continue
                width[i], height[i], body = dec
            elif p is None or len(p) < HEADER_BYTES:
                continue  # degenerate -> NaN features, never crash
            else:
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
        # r6 = half-AWAY-from-zero (functions.texture.r6): byte mean /
        # std of a small raster are dyadic rationals that land EXACTLY
        # on 5e-7 boundaries, where numpy's half-even and the SQL
        # oracle's round() differ.
        from ..functions.texture import r6
        out = batch.drop_columns([self.payload_col])
        for name, arr in (("width", width), ("height", height),
                          ("n_payload_bytes", nbytes),
                          ("byte_mean", r6(mean)),
                          ("byte_std", r6(std)),
                          ("byte_entropy", r6(entropy))):
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
        self.codec = _import_pil("raster stub") if real_codec else None

    def _one_real(self, p: bytes) -> bytes | None:
        """PIL path: decode -> nearest-neighbour resize -> PNG bytes."""
        import io
        try:
            img = self.codec.open(io.BytesIO(p))
            small = img.resize((self.out_w, self.out_h),
                               self.codec.NEAREST)
            buf = io.BytesIO()
            small.save(buf, format="PNG")
            return buf.getvalue()
        except Exception:
            return None

    def _one(self, p: bytes) -> bytes | None:
        if p is None:
            return None
        if self.codec is not None:
            return self._one_real(p)
        if len(p) < HEADER_BYTES:
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
        # real path: animated containers PIL can seek (GIF/APNG/TIFF);
        # full AV codecs are out of scope for this container
        self.codec = _import_pil("raster stub") if real_codec else None

    def _frames_real(self, p: bytes) -> list[tuple[int, bytes]]:
        """(frame_idx, PNG bytes) for every stride-th frame via PIL
        ImageSequence; [] when the payload is not decodable."""
        import io
        try:
            from PIL import ImageSequence
            img = self.codec.open(io.BytesIO(p))
            out = []
            for j, frame in enumerate(ImageSequence.Iterator(img)):
                if j % self.stride:
                    continue
                buf = io.BytesIO()
                frame.convert("L").save(buf, format="PNG")
                out.append((j, buf.getvalue()))
            return out
        except Exception:
            return []

    def _frames_stub(self, p: bytes) -> list[tuple[int, bytes]]:
        if len(p) < HEADER_BYTES:
            return []
        w = int.from_bytes(p[:4], "little")
        h = int.from_bytes(p[4:8], "little")
        body = np.frombuffer(p, np.uint8, offset=HEADER_BYTES)
        if w <= 0 or h <= 0 or len(body) < w * h:
            return []
        t = len(body) // (w * h)
        vid = body[:t * w * h].reshape(t, h * w)
        return [(j, make_payload(vid[j].tobytes(), w, h))
                for j in range(0, t, self.stride)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [c for c in batch.column_names
                      if c != self.payload_col]
        idx_out, frames, fidx = [], [], []
        payloads = batch[self.payload_col].to_pylist()
        for i, p in enumerate(payloads):
            if p is None:
                continue
            got = self._frames_real(p) if self.codec is not None \
                else self._frames_stub(p)
            for j, fr in got:
                idx_out.append(i)
                fidx.append(j)
                frames.append(fr)
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
