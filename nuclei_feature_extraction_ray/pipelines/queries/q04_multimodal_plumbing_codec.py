# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (DecodeMedia, _path, make_payload, pa, rd, register)

def _decode_sql() -> str:
    """Recomputed oracle for ``multimodal_decode`` (the _resize_sql
    pattern): the fake payload's body is the FULL UTF-8 byte string of
    ``text`` (header w = length(text) % 640, h = 480), and DecodeMedia
    emits population byte moments + entropy over it. Bytes unnest to
    one row each (oracle scale only); mean is one exact-int division;
    squares are identical float64 values in both engines (sum-order
    error ~1e-11 « the 5e-7 round-6 boundary); rounding is the shared
    half-away convention."""
    return """
    WITH raw AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb,
             length(text) % 640 AS w
      FROM documents
    ), px AS (
      SELECT doc_id, hx, nb, unnest(range(nb)) AS i
      FROM raw WHERE nb > 0
    ), pv AS (
      SELECT doc_id, nb,
             CAST('0x' || substring(hx, 2 * i + 1, 2) AS INTEGER) AS v
      FROM px
    ), mu AS (
      SELECT doc_id, sum(v) / CAST(any_value(nb) AS DOUBLE) AS m,
             CAST(any_value(nb) AS DOUBLE) AS n
      FROM pv GROUP BY doc_id
    ), sd AS (
      SELECT p.doc_id,
             sqrt(sum((p.v - mu.m) * (p.v - mu.m)) / mu.n) AS s
      FROM pv p JOIN mu ON p.doc_id = mu.doc_id
      GROUP BY p.doc_id, mu.n
    ), ec AS (
      SELECT doc_id, v, CAST(count(*) AS DOUBLE) AS c,
             CAST(any_value(nb) AS DOUBLE) AS n
      FROM pv GROUP BY doc_id, v
    ), ent AS (
      SELECT doc_id, -sum((c / n) * log2(c / n)) AS e
      FROM ec GROUP BY doc_id
    )
    SELECT r.doc_id,
           CAST(r.w AS BIGINT) AS width,
           CAST(480 AS BIGINT) AS height,
           CAST(r.nb AS BIGINT) AS n_payload_bytes,
           round(mu.m, 6) AS byte_mean,
           round(sd.s, 6) AS byte_std,
           round(ent.e, 6) AS byte_entropy
    FROM raw r
    LEFT JOIN mu ON r.doc_id = mu.doc_id
    LEFT JOIN sd ON r.doc_id = sd.doc_id
    LEFT JOIN ent ON r.doc_id = ent.doc_id"""


@register("multimodal_decode", sql=_decode_sql())
def multimodal_decode(sf_dir: str):
    """Binary-payload pipeline: documents' text bytes wrapped in a fake
    media container, decoded by the actor-pool stub stage."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        payloads = [
            make_payload(t.encode(), width=len(t) % 640, height=480)
            for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    wrapped = ds.map_batches(wrap, batch_format="pyarrow")
    return wrapped.map_batches(DecodeMedia, batch_format="pyarrow",
                               batch_size=256, concurrency=2)


def _resize_sql() -> str:
    """Recomputed oracle for ``multimodal_resize``: the fake-raster
    wrap -> 16x16 nearest-neighbour resize -> byte-stat decode is
    pure deterministic arithmetic over the UTF-8 bytes of ``text``,
    so the oracle RECOMPUTES it in SQL (the doc_langid pattern).
    Byte access: DuckDB 1.0 has no BLOB substring, so bytes come from
    ``hex(encode(text))`` two-chars-at-a-time with a '0x' cast.
    Mean and std are bit-exact in both engines: every term is an
    integer-scaled dyadic rational, so the sums are EXACT float64
    regardless of fold order; rounding is the shared half-away
    convention (DuckDB round == functions.texture.r6). Geometry:
    body = first w*h of the first 1024 text bytes, w = clamp(nb,
    1, 32), h = nb // w; resized pixel (y, x) reads body index
    ((y*h)//16)*w + (x*w)//16 — the exact ResizeMedia kernel."""
    return """
    WITH raw AS (
      SELECT doc_id,
             substring(hex(encode(text)), 1, 2048) AS hx,
             least(octet_length(encode(text)), 1024) AS nb
      FROM documents
    ), dim AS (
      SELECT doc_id, hx, nb, greatest(1, least(32, nb)) AS w
      FROM raw
    ), dim2 AS (
      SELECT doc_id, hx, nb, w,
             CASE WHEN nb > 0 THEN nb // w ELSE 1 END AS h
      FROM dim
    ), px AS (
      SELECT d.doc_id,
             CAST('0x' || substring(
                 d.hx,
                 2 * ((((i.i // 16) * d.h) // 16) * d.w
                      + ((i.i % 16) * d.w) // 16) + 1,
                 2) AS INTEGER) AS v
      FROM dim2 d, (SELECT unnest(range(256)) AS i) i
      WHERE d.nb > 0
    ), mu AS (
      SELECT doc_id, sum(v) / 256.0 AS m FROM px GROUP BY doc_id
    ), sd AS (
      SELECT p.doc_id,
             sqrt(sum((p.v - mu.m) * (p.v - mu.m)) / 256.0) AS s
      FROM px p JOIN mu ON p.doc_id = mu.doc_id GROUP BY p.doc_id
    ), ec AS (
      SELECT doc_id, v, count(*) AS c FROM px GROUP BY doc_id, v
    ), ent AS (
      SELECT doc_id, -sum((c / 256.0) * log2(c / 256.0)) AS e
      FROM ec GROUP BY doc_id
    )
    SELECT r.doc_id, r.nb > 0 AS resize_ok,
           CAST(CASE WHEN r.nb > 0 THEN 16 ELSE 0 END AS BIGINT)
             AS width,
           CAST(CASE WHEN r.nb > 0 THEN 16 ELSE 0 END AS BIGINT)
             AS height,
           CAST(CASE WHEN r.nb > 0 THEN 256 ELSE 0 END AS BIGINT)
             AS n_payload_bytes,
           round(mu.m, 6) AS byte_mean,
           round(sd.s, 6) AS byte_std,
           round(ent.e, 6) AS byte_entropy
    FROM raw r
    LEFT JOIN mu ON r.doc_id = mu.doc_id
    LEFT JOIN sd ON r.doc_id = sd.doc_id
    LEFT JOIN ent ON r.doc_id = ent.doc_id"""


@register("multimodal_resize", sql=_resize_sql())
def multimodal_resize(sf_dir: str):
    """Image-resize + video frame-sample plumbing over the fake raster
    format (stages/multimodal.ResizeMedia / FrameSample): per-doc
    raster built from the text bytes, resized 16x16, then re-decoded —
    real actor-pool stages, deterministic kernels, codec stubbed."""
    from ...stages.multimodal import ResizeMedia
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            b = t.encode()[:1024]
            w = max(1, min(32, len(b)))
            h = max(1, len(b) // w)
            payloads.append(make_payload(b[:w * h], width=w, height=h))
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    # Two chained actor pools must leave CPUs free for the read/write
    # tasks of the same pipeline (two pools of 2 on a 4-CPU test
    # cluster reserve everything and deadlock the streaming executor).
    from ...util import pool_size
    conc = pool_size(frac=0.25, cap=4)
    wrapped = ds.map_batches(wrap, batch_format="pyarrow")
    resized = wrapped.map_batches(
        ResizeMedia, batch_format="pyarrow", batch_size=256,
        concurrency=conc,
        fn_constructor_kwargs={"out_w": 16, "out_h": 16})
    return resized.map_batches(DecodeMedia, batch_format="pyarrow",
                               batch_size=256, concurrency=conc)
