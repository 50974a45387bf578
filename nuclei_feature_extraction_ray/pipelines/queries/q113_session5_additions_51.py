# round-5 session-5 additions, batch 51: Markov removal-effect
# attribution with closed-form absorption, the brevity-law check on
# token lengths, and the out-of-order arrival census.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _events,
                      _path, np, pd, rd, register)
from ...stages.partition import partitioned_apply, partition_map
from ...stages.window import segment_codes

_BL_BUCKETS = ((1, 10), (11, 100), (101, 1000), (1001, 10 ** 12))


@register("markov_attribution", sql="""
    WITH s AS (SELECT user_id, event_type, ts, event_id,
                      lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
               FROM events
               WHERE event_type IN ('click', 'view', 'purchase')),
    t AS (SELECT CASE WHEN event_type = 'click' THEN 'A'
                      ELSE 'B' END AS st,
                 CASE WHEN nxt = 'purchase' THEN 'conv'
                      WHEN nxt = 'click' THEN 'A'
                      WHEN nxt = 'view' THEN 'B'
                      ELSE 'null' END AS dst
          FROM s WHERE event_type IN ('click', 'view')),
    c AS (SELECT st, dst, CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY st, dst),
    m AS (SELECT
        CAST(COALESCE((SELECT n FROM c WHERE st = 'A'
                       AND dst = 'A'), 0) AS DOUBLE) AS aa,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'A'
                       AND dst = 'B'), 0) AS DOUBLE) AS ab,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'A'
                       AND dst = 'conv'), 0) AS DOUBLE) AS ac,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'A'
                       AND dst = 'null'), 0) AS DOUBLE) AS an,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'B'
                       AND dst = 'A'), 0) AS DOUBLE) AS ba,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'B'
                       AND dst = 'B'), 0) AS DOUBLE) AS bb,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'B'
                       AND dst = 'conv'), 0) AS DOUBLE) AS bc,
        CAST(COALESCE((SELECT n FROM c WHERE st = 'B'
                       AND dst = 'null'), 0) AS DOUBLE) AS bn),
    p AS (SELECT
        aa / (aa + ab + ac + an) AS paa,
        ab / (aa + ab + ac + an) AS pab,
        ac / (aa + ab + ac + an) AS pac,
        ba / (ba + bb + bc + bn) AS pba,
        bb / (ba + bb + bc + bn) AS pbb,
        bc / (ba + bb + bc + bn) AS pbc
      FROM m),
    f AS (SELECT
        ((1.0 - pbb) * pac + pab * pbc)
        / ((1.0 - paa) * (1.0 - pbb) - pab * pba) AS va,
        ((1.0 - paa) * pbc + pba * pac)
        / ((1.0 - paa) * (1.0 - pbb) - pab * pba) AS vb,
        pbc / (1.0 - pbb) AS vb_noa,
        pac / (1.0 - paa) AS va_nob
      FROM p)
    SELECT va AS p_conv_from_click,
           vb AS p_conv_from_view,
           1.0 - vb_noa / va AS removal_effect_click,
           1.0 - va_nob / vb AS removal_effect_view
    FROM f""")
def markov_attribution(sf_dir: str):
    """MARKOV REMOVAL-EFFECT ATTRIBUTION on the two-channel journey
    chain (click=A, view=B, absorbing conv/null): absorption
    probabilities solve the 2x2 system IN CLOSED FORM
    (v_A = ((1-p_BB)p_Ac + p_AB p_Bc) / det), and each channel's
    removal effect is the conversion drop when its state is
    short-circuited to null — the data-driven attribution model
    that replaces linear_attribution's positional heuristics with
    chain structure. Transition counts are exact integer folds
    inside the user exchange; every probability and both removal
    effects are shared float expressions on those counts. Scale
    plan: event_transitions' plan — the lead() runs inside sorted
    user partitions, the driver sees only the 2x4 count matrix."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts",
                          "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(g["event_type"].to_numpy(object),
                       ["click", "view", "purchase"])
        sub = g.loc[keep]
        codes = segment_codes(sub["user_id"].to_numpy())
        et = sub["event_type"].to_numpy(object)
        if len(et) == 0:
            return pd.DataFrame({
                "st": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        nxt = np.roll(et, -1)
        same = np.zeros(len(et), bool)
        same[:-1] = codes[1:] == codes[:-1]
        src_m = np.isin(et, ["click", "view"])
        st = np.where(et == "click", "A", "B")
        dst = np.where(~same, "null",
                       np.where(nxt == "purchase", "conv",
                                np.where(nxt == "click", "A",
                                         "B")))
        out = pd.DataFrame({"st": st[src_m],
                            "dst": dst[src_m],
                            "n": np.ones(int(src_m.sum()),
                                         np.int64)}) \
            .groupby(["st", "dst"], as_index=False).sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    c = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["st", "dst"], ["n"])
    cnt = {(r["st"], r["dst"]): np.float64(int(r["n"]))
           for _, r in c.iterrows()}

    def g(st, dst):
        return cnt.get((st, dst), np.float64(0.0))

    ra = g("A", "A") + g("A", "B") + g("A", "conv") \
        + g("A", "null")
    rb = g("B", "A") + g("B", "B") + g("B", "conv") \
        + g("B", "null")
    paa, pab, pac = g("A", "A") / ra, g("A", "B") / ra, \
        g("A", "conv") / ra
    pba, pbb, pbc = g("B", "A") / rb, g("B", "B") / rb, \
        g("B", "conv") / rb
    det = (1.0 - paa) * (1.0 - pbb) - pab * pba
    va = ((1.0 - pbb) * pac + pab * pbc) / det
    vb = ((1.0 - paa) * pbc + pba * pac) / det
    vb_noa = pbc / (1.0 - pbb)
    va_nob = pac / (1.0 - paa)
    return pd.DataFrame({
        "p_conv_from_click": [np.float64(va)],
        "p_conv_from_view": [np.float64(vb)],
        "removal_effect_click": [1.0 - vb_noa / va],
        "removal_effect_view": [1.0 - va_nob / vb]})


@register("brevity_law", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS n,
                 CAST(length(term) AS BIGINT) AS ln_
          FROM w GROUP BY term),
    r AS (SELECT n, ln_,
                 row_number() OVER (ORDER BY n DESC, term) AS i
          FROM c),
    b AS (SELECT CASE WHEN i <= 10 THEN 1
                      WHEN i <= 100 THEN 2
                      WHEN i <= 1000 THEN 3 ELSE 4 END AS bucket,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(sum(n * ln_) AS HUGEINT) AS len_sum
          FROM r GROUP BY 1)
    SELECT CAST(bucket AS BIGINT) AS rank_bucket, n_types,
           n_tokens,
           CAST(len_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS mean_token_len
    FROM b ORDER BY bucket""")
def brevity_law(sf_dir: str):
    """ZIPF'S BREVITY LAW check: token-weighted mean word length by
    frequency-rank bucket (top-10 / 11-100 / 101-1000 / tail) —
    natural language makes its frequent words SHORT, so a flat or
    inverted curve flags synthetic or templated text (the
    length-frequency companion of zipf_fit's rank-frequency slope;
    a cheap corpus-authenticity screen). Ranks are exact
    row_numbers (count DESC, term tie-break); per-bucket
    type/token/length sums are exact integer folds with ONE
    division per bucket. Scale plan: term counts through the
    term-keyed exchange; ranking is the guarded driver merge
    (two-phase rank exchange at fleet scale); 4 bucket cells
    out."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def tcount(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = tokens_flat(b["text"])
        un = pd.Series(vals.to_numpy(zero_copy_only=False),
                       dtype=object).value_counts()
        return pd.DataFrame({"term": un.index.to_numpy(object),
                             "n": un.to_numpy(np.int64)})

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["n"].sum()
        a["n"] = a["n"].astype(np.int64)
        return a

    c = _combine_partials(
        partition_map(ds.map_batches(tcount, batch_format="pandas"),
                      ["term"], cell, 16),
        ["term"], ["n"])
    if len(c) > _COMBINE_MAX_ROWS:
        raise ValueError("brevity_law: vocabulary exceeds the "
                         "driver bound")
    c = c.sort_values(["n", "term"], ascending=[False, True],
                      kind="mergesort").reset_index(drop=True)
    n = c["n"].to_numpy(np.int64)
    ln_ = np.array([len(t) for t in c["term"]], np.int64)
    i = np.arange(1, len(c) + 1)
    bucket = np.where(i <= 10, 1,
                      np.where(i <= 100, 2,
                               np.where(i <= 1000, 3, 4)))
    rows = []
    for bk in sorted(set(bucket.tolist())):
        m = bucket == bk
        nt = int(n[m].sum())
        ls = int((n[m].astype(object)
                  * ln_[m].astype(object)).sum())
        rows.append({
            "rank_bucket": np.int64(bk),
            "n_types": np.int64(int(m.sum())),
            "n_tokens": np.int64(nt),
            "mean_token_len": np.float64(ls) / np.float64(nt)})
    return pd.DataFrame(rows)


@register("out_of_order_census", sql="""
    WITH s AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY event_id) AS prev_ts
               FROM events),
    g AS (SELECT user_id,
                 CAST(count(prev_ts) AS BIGINT) AS n_pairs,
                 CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0
                          END) AS BIGINT) AS inv
          FROM s GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
           CAST(sum(inv) AS BIGINT) AS n_inversions,
           CAST(sum(CASE WHEN inv > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_users_affected,
           CAST(sum(inv) AS DOUBLE)
             / CAST(sum(n_pairs) AS DOUBLE) AS inversion_rate
    FROM g""")
def out_of_order_census(sf_dir: str):
    """OUT-OF-ORDER ARRIVAL CENSUS: within each user's stream in
    EVENT-ID (arrival) order, count adjacent steps whose event
    time goes backwards — the late-data rate that decides how much
    watermark slack the streaming pipeline (sessionize, the
    flagship's as-of join) must carry; zero means arrival order is
    already event-time order and watermarks can be tight. Pure
    integer comparisons of exact microsecond timestamps inside the
    user exchange; all censuses are exact integer folds with one
    final rate division. Scale plan: the lag runs inside sorted
    user partitions (sorted by ARRIVAL id, the point of the
    audit); partitions emit per-user 2-cell counts."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        all_users = np.unique(uid)
        if len(us) < 2:
            same = np.zeros(0, bool)
            inv = np.zeros(0, bool)
            pairs_uid = np.zeros(0, np.int64)
        else:
            same = codes[1:] == codes[:-1]
            inv = (us[1:] < us[:-1]) & same
            pairs_uid = uid[1:][same]
        out = pd.DataFrame({"user_id": pairs_uid,
                            "n_pairs": np.ones(len(pairs_uid),
                                               np.int64),
                            "inv": inv[same].astype(np.int64)
                            if len(us) >= 2
                            else np.zeros(0, np.int64)}) \
            .groupby("user_id", as_index=False).sum() \
            .set_index("user_id") \
            .reindex(all_users, fill_value=0).reset_index()
        for c in ("n_pairs", "inv"):
            out[c] = out[c].astype(np.int64)
        return out

    g = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "event_id"]),
        ["user_id"], ["n_pairs", "inv"])
    np_ = int(g["n_pairs"].sum())
    inv = int(g["inv"].sum())
    return pd.DataFrame({
        "n_users": [np.int64(len(g))],
        "n_pairs": [np.int64(np_)],
        "n_inversions": [np.int64(inv)],
        "n_users_affected": [np.int64(int((g["inv"] > 0).sum()))],
        "inversion_rate": [np.float64(inv) / np.float64(np_)]})
