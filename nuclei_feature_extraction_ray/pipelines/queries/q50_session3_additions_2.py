# round-5 session-3 additions, batch 2: exact autocorrelation of the
# daily event-count series, record-breaking value census, and a
# per-language sentence-length census.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pa, pc,
                      pd, rd, register)
from ...stages.partition import partitioned_apply

_ACF_MAX_LAG = 7


@register("daily_acf", sql="""
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    spine AS (SELECT CAST(unnest(generate_series(d0, d1,
                                                 INTERVAL 1 DAY))
                          AS DATE) AS day FROM bounds),
    x AS (SELECT row_number() OVER (ORDER BY s.day) - 1 AS t,
                 CAST(COALESCE(d.n, 0) AS HUGEINT) AS v
          FROM spine s LEFT JOIN d USING (day)),
    st AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(v) AS HUGEINT) AS s FROM x),
    lags AS (SELECT CAST(unnest(generate_series(1, {L})) AS BIGINT)
                    AS lag),
    num AS (SELECT l.lag,
                   CAST(sum((st.n * a.v - st.s)
                            * (st.n * b.v - st.s)) AS HUGEINT) AS nu
            FROM lags l CROSS JOIN st
                 CROSS JOIN x a
                 JOIN x b ON b.t = a.t + l.lag
            GROUP BY l.lag),
    den AS (SELECT CAST(sum((st.n * v - st.s) * (st.n * v - st.s))
                        AS HUGEINT) AS de
            FROM x CROSS JOIN st)
    SELECT lag, CAST(nu AS DOUBLE) / CAST(de AS DOUBLE) AS acf
    FROM num CROSS JOIN den ORDER BY lag""".format(L=_ACF_MAX_LAG))
def daily_acf(sf_dir: str):
    """Sample autocorrelation of the zero-filled daily event-count
    series at lags 1..7 — the weekly-seasonality fingerprint read off
    a traffic series before choosing a forecasting model. Exactness:
    with m = S/n rational, r_l multiplied through by n^2 has INTEGER
    numerator sum((n*x_t - S)(n*x_{t+l} - S)) and denominator
    sum((n*x_t - S)^2); both engines fold them as exact wide integers
    (HUGEINT / python int) and perform ONE int->double division.
    Scale plan: per-batch (day, count) partials collapse to one
    calendar-bounded combine (a 100-TB year is still <= 366 rows);
    the closed form runs on the driver over that tiny series."""
    ds = _events(sf_dir, ["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size()
        return pd.DataFrame({"day": g["day"].to_numpy(np.int64),
                             "n": g["size"].to_numpy(np.int64)})

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"])
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    v = np.zeros(d1 - d0 + 1, np.int64)
    v[d["day"].to_numpy(np.int64) - d0] = d["n"].to_numpy(np.int64)
    xs = [int(x) for x in v]               # exact python-int algebra
    n, s = len(xs), sum(xs)
    c = [n * x - s for x in xs]
    de = sum(ci * ci for ci in c)
    lags, acf = [], []
    for l in range(1, _ACF_MAX_LAG + 1):
        nu = sum(c[t] * c[t + l] for t in range(n - l))
        lags.append(l)
        acf.append(float(nu) / float(de))
    return pd.DataFrame({"lag": np.asarray(lags, np.int64),
                         "acf": np.asarray(acf, np.float64)})


@register("running_records", sql="""
    WITH o AS (SELECT user_id, value,
                      max(value) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED
                                       PRECEDING AND 1 PRECEDING)
                        AS prev_max
               FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_max IS NULL OR value > prev_max
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_records
    FROM o GROUP BY user_id ORDER BY user_id""")
def running_records(sf_dir: str):
    """Record-breaking census: per user, how many events set a new
    all-time-high ``value`` at the moment they arrived (the running-
    maximum breaks a gambler or anomaly monitor watches; a user's
    first event always counts). Order is total — (ts, event_id) —
    so the record set is deterministic, and float comparisons are
    engine-identical (same doubles, no arithmetic). Scale plan: ONE
    user-keyed exchange; each partition sorts its own users' events
    and runs a vectorized grouped cummax/shift — no global sort, no
    driver data; output is one row per user."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def records(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        cm = g.groupby("user_id", sort=False)["value"].cummax()
        prev = cm.groupby(g["user_id"], sort=False).shift(1)
        is_rec = prev.isna() | (g["value"] > prev)
        out = pd.DataFrame({"user_id": g["user_id"],
                            "n_events": 1,
                            "n_records": is_rec.astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_records"] = out["n_records"].astype(np.int64)
        return out

    out = partitioned_apply(ds, "user_id", records, 16).to_pandas()
    return out.sort_values("user_id",
                           kind="mergesort").reset_index(drop=True)


@register("sentence_stats", sql="""
    WITH fr AS (SELECT lang, trim(s, E' \\t\\n\\r\\f') AS s
                FROM (SELECT lang,
                             unnest(string_split_regex(text,
                                                       '[.!?]+')) AS s
                      FROM documents)
                WHERE trim(s, E' \\t\\n\\r\\f') <> '')
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(length(s)) AS BIGINT) AS total_chars,
           CAST(sum(length(s)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_sentence_chars
    FROM fr GROUP BY lang ORDER BY lang""")
def sentence_stats(sf_dir: str):
    """Per-language sentence-length census: split every document on
    terminal punctuation runs ([.!?]+), trim whitespace, drop empty
    fragments, and report sentence count + mean length in characters
    per language — the sentence-segmentation sanity stats a quality
    pipeline reads before setting min/max-sentence filters. Integer
    sums with ONE final division (bit-exact across engines); unicode
    char counts via pyarrow utf8_length == DuckDB length. Scale plan:
    map-only — the split/trim/filter/length chain is pure Arrow
    compute per batch; per-lang (count, chars) partials collapse to a
    langs-sized driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "text"])

    def partial(b: pa.Table) -> pd.DataFrame:
        parts = pc.split_pattern_regex(b["text"], pattern="[.!?]+")
        k = pc.list_value_length(parts).to_numpy() \
            .astype(np.int64)
        flat = pc.list_flatten(parts)
        lang = np.repeat(
            b["lang"].to_numpy(zero_copy_only=False), k)
        s = pc.utf8_trim(flat, characters=" \t\n\r\f")
        keep = pc.not_equal(s, "").to_numpy(zero_copy_only=False)
        ln = pc.utf8_length(s).to_numpy().astype(np.int64)
        g = pd.DataFrame({"lang": lang[keep],
                          "n_sentences": np.ones(int(keep.sum()),
                                                 np.int64),
                          "total_chars": ln[keep]}) \
            .groupby("lang", as_index=False).sum()
        g["n_sentences"] = g["n_sentences"].astype(np.int64)
        g["total_chars"] = g["total_chars"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["n_sentences", "total_chars"])
    out = out.sort_values("lang", kind="mergesort") \
        .reset_index(drop=True)
    return pd.DataFrame({
        "lang": out["lang"].astype(object),
        "n_sentences": out["n_sentences"].to_numpy(np.int64),
        "total_chars": out["total_chars"].to_numpy(np.int64),
        "mean_sentence_chars": out["total_chars"].to_numpy(np.float64)
        / out["n_sentences"].to_numpy(np.float64)})
