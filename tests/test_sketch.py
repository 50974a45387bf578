"""HLL approx distinct + exact distinct op + degenerate-class
taxonomy (the shape.rs:142-207 NaN-bail analog)."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nuclei_feature_extraction_ray.functions.sketch import (
    approx_distinct, distinct_count, hll_estimate, hll_merge,
    hll_partial)
from nuclei_feature_extraction_ray.functions.text_stats import (
    text_stats_frame, text_stats_sql)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 10**12, size=60_000)
    true = len(np.unique(vals))
    # partials merged across arbitrary splits == one-shot
    one = hll_partial(vals)
    split = hll_merge([hll_partial(vals[:20_000]),
                       hll_partial(vals[20_000:45_000]),
                       hll_partial(vals[45_000:])])
    assert np.array_equal(one, split)
    est = hll_estimate(one)
    assert abs(est - true) / true < 0.05      # stderr ~1.6% at p=12


def test_distinct_ops_on_dataset():
    vals = np.repeat(np.arange(5000, dtype=np.int64), 3)
    np.random.default_rng(1).shuffle(vals)
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)}))
    assert distinct_count(ds, "k", num_partitions=4) == 5000
    approx = approx_distinct(ds, "k")
    assert abs(approx - 5000) / 5000 < 0.05


def test_degenerate_class_taxonomy():
    texts = pd.Series(["hello world x", "", "   \t", "single",
                       "aa bb cc", "aaa bbb ccc"])
    out = text_stats_frame(texts)
    assert out["degenerate_class"].tolist() == [0, 1, 2, 3, 4, 4]
    # SQL oracle agrees class-for-class
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    expr = text_stats_sql("text")["degenerate_class"]
    ora = con.execute(
        "SELECT %s AS c FROM documents" % expr).df()["c"]
    assert ora.tolist() == [0, 1, 2, 3, 4, 4]


def test_multimodal_resize_and_frame_sample():
    from nuclei_feature_extraction_ray.stages.multimodal import (
        DecodeMedia, FrameSample, ResizeMedia, make_payload)
    rng = np.random.default_rng(2)
    # images: w x h rasters; one degenerate (truncated body)
    imgs = [make_payload(rng.integers(0, 256, size=20 * 10,
                                      dtype=np.uint8).tobytes(), 20, 10),
            make_payload(b"xx", 5, 5)]
    t = pa.table({"i": pa.array([0, 1]),
                  "payload": pa.array(imgs, pa.binary())})
    ds = rd.from_arrow(t)
    out = ds.map_batches(ResizeMedia, batch_format="pyarrow",
                         concurrency=1,
                         fn_constructor_kwargs={"out_w": 4, "out_h": 4}
                         ).to_pandas()
    assert out["resize_ok"].tolist() == [True, False]
    good = out["payload"].iloc[0]
    assert int.from_bytes(good[:4], "little") == 4
    assert len(good) == 8 + 16
    # video: 6 frames of 3x2, sample stride 2 -> frames 0, 2, 4
    vid = make_payload(rng.integers(0, 256, size=6 * 6,
                                    dtype=np.uint8).tobytes(), 3, 2)
    vt = pa.table({"vid_id": pa.array([7]),
                   "payload": pa.array([vid], pa.binary())})
    frames = rd.from_arrow(vt).map_batches(
        FrameSample, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"stride": 2}).to_pandas()
    assert frames["frame_idx"].tolist() == [0, 2, 4]
    assert (frames["vid_id"] == 7).all()
    # each sampled frame decodes
    dec = rd.from_arrow(pa.Table.from_pandas(
        frames.rename(columns={"frame": "payload"}),
        preserve_index=False)).map_batches(
        DecodeMedia, batch_format="pyarrow", concurrency=1).to_pandas()
    assert (dec["n_payload_bytes"] == 6).all()


def _has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def test_real_codec_raises_loudly_without_pil():
    """real_codec=True must never silently fall back to the stub."""
    import pytest
    if _has_pil():
        pytest.skip("PIL present; covered by test_real_codec_with_pil")
    from nuclei_feature_extraction_ray.stages.multimodal import (
        DecodeMedia, FrameSample, ResizeMedia)
    for ctor in (lambda: DecodeMedia(real_codec=True),
                 lambda: ResizeMedia(4, 4, real_codec=True),
                 lambda: FrameSample(real_codec=True)):
        with pytest.raises(NotImplementedError, match="PIL"):
            ctor()


def test_real_codec_with_pil():
    """PIL-backed tier (skips in bare containers): encode a real PNG,
    decode -> metadata/moments, resize -> re-decoded dims, GIF frame
    sampling."""
    import pytest
    if not _has_pil():
        pytest.skip("PIL not available in this container")
    import io

    import PIL.Image as Image

    from nuclei_feature_extraction_ray.stages.multimodal import (
        DecodeMedia, FrameSample, ResizeMedia)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (12, 10), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    png = buf.getvalue()
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "payload": pa.array([png], pa.binary())})
    dec = DecodeMedia(real_codec=True)(tbl).to_pandas()
    assert dec["width"].iloc[0] == 10 and dec["height"].iloc[0] == 12
    assert abs(dec["byte_mean"].iloc[0] - arr.mean()) < 1e-3
    rs = ResizeMedia(4, 6, real_codec=True)(tbl)
    assert rs.to_pandas()["resize_ok"].iloc[0]
    dec2 = DecodeMedia(real_codec=True)(
        rs.drop_columns(["resize_ok"])).to_pandas()
    assert dec2["width"].iloc[0] == 4 and dec2["height"].iloc[0] == 6
    # 4-frame GIF, stride 2 -> frames 0 and 2
    frames = [Image.fromarray(
        np.full((6, 6), 40 * i, np.uint8), mode="L") for i in range(4)]
    gbuf = io.BytesIO()
    frames[0].save(gbuf, format="GIF", save_all=True,
                   append_images=frames[1:])
    gtbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "payload": pa.array([gbuf.getvalue()], pa.binary())})
    fs = FrameSample(stride=2, real_codec=True)(gtbl).to_pandas()
    assert fs["frame_idx"].tolist() == [0, 2]


def test_hist_quantile_accuracy_and_edges():
    from nuclei_feature_extraction_ray.functions.sketch import (
        hist_partial, hist_quantile)

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 4000, 50_000)
    lo, hi, nbins = 0.0, 4096.0, 256
    # partials from 5 chunks merge by addition
    h = sum(hist_partial(c, lo, hi, nbins)
            for c in np.array_split(vals, 5))
    binw = (hi - lo) / nbins
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        assert abs(hist_quantile(h, lo, hi, q) - exact) <= binw
    # out-of-range values clip, empty histogram -> nan
    h2 = hist_partial(np.array([-5.0, 1e9]), lo, hi, nbins)
    assert h2[0] == 1 and h2[-1] == 1
    assert np.isnan(hist_quantile(np.zeros(nbins, np.int64), lo, hi, .5))


def test_bloom_filter_kernels():
    """No false negatives ever; FPP stays near the analytic bound."""
    from nuclei_feature_extraction_ray.functions.hashing import hash64
    from nuclei_feature_extraction_ray.functions.sketch import (
        bloom_contains, bloom_merge, bloom_partial)

    members = np.asarray(["m%d" % i for i in range(5000)], object)
    others = np.asarray(["x%d" % i for i in range(20000)], object)
    M, K = 1 << 17, 7
    hm = hash64(members)
    parts = [bloom_partial(hm[i::4], M, K) for i in range(4)]
    bmp = bloom_merge(parts)
    assert bloom_contains(bmp, hm, K).all()
    # n/m = 5000/131072 -> analytic fpp ~ 4e-5; allow 100x slack
    assert bloom_contains(bmp, hash64(others), K).mean() < 4e-3
    # merge == single-shot build
    np.testing.assert_array_equal(bmp, bloom_partial(hm, M, K))
    assert bloom_contains(bmp, np.empty(0, np.uint64), K).size == 0


def test_decontaminate_bloom_superset_of_exact(sf_small):
    """The Bloom tier never misses a contaminated doc and matches the
    exact tier's hit counts within the FPP budget."""
    from nuclei_feature_extraction_ray.pipelines.queries import QUERIES

    exact = QUERIES["decontaminate"](sf_small).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = QUERIES["decontaminate_bloom"](sf_small).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (exact["doc_id"] == bloom["doc_id"]).all()
    # no false negatives: every exact hit is a bloom hit
    assert (bloom["n_hits"] >= exact["n_hits"]).all()
    assert bool((bloom["contaminated"] >=
                 exact["contaminated"]).all())
    # false positives bounded: at this m/n the tiers agree exactly
    assert (bloom["n_hits"] == exact["n_hits"]).mean() > 0.99


def test_cms_kernels_one_sided_and_merge():
    """Count-min: estimates NEVER undercount; partial merge equals
    the monolithic sketch; zipf heavy hitters estimate exactly when
    distinct keys << counters."""
    import collections

    from nuclei_feature_extraction_ray.functions.hashing import hash64
    from nuclei_feature_extraction_ray.functions.sketch import (
        cms_merge, cms_partial, cms_query)

    rng = np.random.default_rng(7)
    keys = np.asarray(["t%d" % i for i in rng.zipf(1.3, 30000)
                       if i < 800], object)
    h = hash64(keys)
    mono = cms_partial(h)
    merged = cms_merge([cms_partial(h[:9000]), cms_partial(h[9000:])])
    assert (mono == merged).all()

    true = collections.Counter(keys.tolist())
    uniq = np.asarray(list(true), object)
    est = cms_query(merged, hash64(uniq))
    tv = np.asarray([true[k] for k in uniq])
    assert (est >= tv).all()                      # one-sided
    assert (est - tv).mean() <= 0.001 * len(keys)  # eps*N budget


def test_vocab_heavy_approx_vs_exact(sf_small):
    """The CMS+candidates top-25 agrees with the exact exchange-based
    top-k on the corpus: high recall, and every estimate >= the exact
    count (one-sided CMS guarantee)."""
    from nuclei_feature_extraction_ray.pipelines.queries import QUERIES

    approx = QUERIES["vocab_heavy_approx"](sf_small)
    exact = QUERIES["vocab_topk"](sf_small)
    top = exact.head(25)
    recall = len(set(approx["token"]) & set(top["token"])) / 25
    assert recall >= 0.8, recall
    truth = dict(zip(exact["token"], exact["n"]))
    both = approx[approx["token"].isin(truth)]
    assert all(int(e) >= int(truth[t])
               for t, e in zip(both["token"], both["n_est"]))
