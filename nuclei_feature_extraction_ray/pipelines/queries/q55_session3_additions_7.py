# round-5 session-3 additions, batch 7: embedding-norm histogram,
# Freedman-Diaconis optimal bin width, and the Mann-Kendall trend
# test on daily counts.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q07_round_4_additions import _hist_quantile_cont
from .q13_embedding_table_operators import _EMB_UNPACK_SQL, _emb_micro


@register("embedding_norm_hist", sql="""
    WITH m AS ({unpack}),
    ss AS (SELECT vec_id, label, CAST(sum(c * c) AS HUGEINT) AS ssq
           FROM m GROUP BY vec_id, label),
    b AS (SELECT label,
                 CAST(floor(sqrt(CAST(ssq AS DOUBLE)) / 1000000.0
                            * 20.0) AS BIGINT) AS bucket
          FROM ss)
    SELECT label, bucket,
           CAST(bucket AS DOUBLE) / 20.0 AS norm_lo,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM b GROUP BY label, bucket
    ORDER BY label, bucket""".format(unpack=_EMB_UNPACK_SQL))
def embedding_norm_hist(sf_dir: str):
    """Per-label L2-norm histogram of the embedding table (0.05-wide
    buckets) — the first diagnostic before cosine search or
    normalization: a label whose norms spread wide mixes confident
    and near-zero vectors, and un-normalized corpora break dot-
    product ANN. Exactness: components quantize to signed integer
    micro-units (the shared embedding policy), so each vector's
    sum-of-squares is an exact integer and both engines bucket the
    identical sqrt double. Scale plan: map-only — one int matmul row
    sum per batch, (label, bucket) partials into a bounded combine;
    vectors never leave their batch."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["embedding", "label"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        ssq = np.sum(c * c, axis=1)
        bucket = np.floor(np.sqrt(ssq.astype(np.float64)) / 1e6
                          * 20.0).astype(np.int64)
        g = pd.DataFrame({"label": b["label"].to_numpy(np.int64),
                          "bucket": bucket}) \
            .groupby(["label", "bucket"], as_index=False).size()
        g["n_vecs"] = g["size"].astype(np.int64)
        return g[["label", "bucket", "n_vecs"]]

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "bucket"], ["n_vecs"])
    out = out.sort_values(["label", "bucket"],
                          kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "label": out["label"].to_numpy(np.int64),
        "bucket": out["bucket"].to_numpy(np.int64),
        "norm_lo": out["bucket"].to_numpy(np.float64) / 20.0,
        "n_vecs": out["n_vecs"].to_numpy(np.int64)})


@register("fd_binwidth", sql="""
    WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                      AS cents FROM events),
    q AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.25)
                   AS q1,
                 quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.75)
                   AS q3,
                 CAST(min(cents) AS DOUBLE) / 100.0 AS lo,
                 CAST(max(cents) AS DOUBLE) / 100.0 AS hi
          FROM c)
    SELECT n AS n_events, q3 - q1 AS iqr,
           2.0 * (q3 - q1) / pow(CAST(n AS DOUBLE), 1.0 / 3.0)
             AS bin_width,
           CAST(ceil((hi - lo) / (2.0 * (q3 - q1)
                / pow(CAST(n AS DOUBLE), 1.0 / 3.0))) AS BIGINT)
             AS n_bins
    FROM q""")
def fd_binwidth(sf_dir: str):
    """Freedman-Diaconis optimal histogram bin width for the event
    value distribution: 2*IQR/n^(1/3), plus the implied bin count
    over the observed range — the robust binning rule a dashboard or
    density estimator applies before drawing anything. Exactness: the
    2-decimal values quantize losslessly to integer cents, so IQR
    comes from the bounded cents histogram with the shared
    quantile_cont interpolation (the value_quantiles device); min/max
    are exact integers; the width/count arithmetic is one identical
    double expression per engine. Scale plan: one map pass of
    (cents, n) partials into a value-domain-bounded combine — no
    sort at any scale."""
    ds = _events(sf_dir, ["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"cents": cents}) \
            .groupby("cents", as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["cents", "n"]]

    hist = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["cents"], ["n"]).sort_values("cents", kind="mergesort")
    vals = hist["cents"].to_numpy(np.int64).astype(np.float64) / 100.0
    cts = hist["n"].to_numpy(np.int64)
    n = int(cts.sum())
    q1 = float(_hist_quantile_cont(vals, cts, 0.25))
    q3 = float(_hist_quantile_cont(vals, cts, 0.75))
    iqr = q3 - q1
    bw = 2.0 * iqr / np.power(np.float64(n), 1.0 / 3.0)
    nb = int(np.ceil((vals[-1] - vals[0]) / bw))
    return pd.DataFrame({"n_events": np.asarray([n], np.int64),
                         "iqr": np.asarray([iqr], np.float64),
                         "bin_width": np.asarray([bw], np.float64),
                         "n_bins": np.asarray([nb], np.int64)})


@register("mann_kendall", sql="""
    WITH d AS (SELECT event_type,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type, day),
    s AS (SELECT a.event_type,
                 CAST(sum(CASE WHEN b.n > a.n THEN 1
                               WHEN b.n < a.n THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM d a JOIN d b ON a.event_type = b.event_type
                           AND b.day > a.day
          GROUP BY a.event_type),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM d GROUP BY event_type),
    ties AS (SELECT event_type,
                    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                      AS tt
             FROM (SELECT event_type, n,
                          CAST(count(*) AS BIGINT) AS t
                   FROM d GROUP BY event_type, n) g
             GROUP BY event_type),
    v AS (SELECT nn.event_type, s.s_stat, nn.n,
                 CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt
                      AS DOUBLE) / 18.0 AS var_s
          FROM nn JOIN s USING (event_type)
                  JOIN ties USING (event_type))
    SELECT event_type, s_stat, n AS n_days, var_s,
           CASE WHEN s_stat > 0
                THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
                WHEN s_stat < 0
                THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
                ELSE 0.0 END AS z
    FROM v ORDER BY event_type""")
def mann_kendall(sf_dir: str):
    """Mann-Kendall trend test on each event type's daily count
    series: S = sum of sign(x_j - x_i) over ordered day pairs, with
    the tie-corrected variance and continuity-corrected z — the
    nonparametric is-traffic-trending test that pairs with the
    theil_sen_slope estimate (MK decides IF there's a trend,
    Theil-Sen says how steep). Exactness: S and the tie term are
    pure integers; variance and z are one shared double expression.
    Scale plan: per-batch (type, day, count) partials collapse to a
    calendar-bounded combine; the O(days^2) sign sum runs on the
    driver's tiny series (366 days = 67k comparisons)."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"event_type": b["event_type"]
                          .astype(object), "day": day}) \
            .groupby(["event_type", "day"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["event_type", "day", "n"]]

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], ["n"])
    rows = []
    for et, g in d.groupby("event_type"):
        g = g.sort_values("day", kind="mergesort")
        x = g["n"].to_numpy(np.int64)
        n = len(x)
        diff = np.sign(x[None, :] - x[:, None])
        s = int(np.triu(diff, 1).sum())
        t = pd.Series(x).value_counts().to_numpy(np.int64)
        tt = int(np.sum(t * (t - 1) * (2 * t + 5)))
        var_s = float(n * (n - 1) * (2 * n + 5) - tt) / 18.0
        if s > 0:
            z = (float(s) - 1.0) / np.sqrt(var_s)
        elif s < 0:
            z = (float(s) + 1.0) / np.sqrt(var_s)
        else:
            z = 0.0
        rows.append((et, s, n, var_s, float(z)))
    out = pd.DataFrame(rows, columns=["event_type", "s_stat",
                                      "n_days", "var_s", "z"])
    out["s_stat"] = out["s_stat"].astype(np.int64)
    out["n_days"] = out["n_days"].astype(np.int64)
    return out.sort_values("event_type",
                           kind="mergesort").reset_index(drop=True)
