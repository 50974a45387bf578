# round-5 session-2 additions, batch 6: rank statistics computed
# exactly from value-domain histograms (Spearman rho with tie-average
# ranks, Kendall tau-b with full tie corrections) and a title-body
# token-overlap relevance signal over the raw pages corpus.
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _path, np, pa,
                      partition_map, pc, pd, ray, rd, register)
from ...functions.texture import _sql_r6, r6
from .q05_pages_flagship import _corpus_scale


@register("spearman_qty_discount", sql="""
    WITH h AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2),
    mx AS (SELECT x, CAST(sum(n) AS BIGINT) AS c FROM h GROUP BY 1),
    my AS (SELECT y, CAST(sum(n) AS BIGINT) AS c FROM h GROUP BY 1),
    rx AS (SELECT x, 2 * (sum(c) OVER (ORDER BY x
                          ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r
           FROM mx),
    ry AS (SELECT y, 2 * (sum(c) OVER (ORDER BY y
                          ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r
           FROM my),
    s AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                 CAST(sum(CAST(n AS HUGEINT) * rx.r) AS HUGEINT) AS sx,
                 CAST(sum(CAST(n AS HUGEINT) * ry.r) AS HUGEINT) AS sy,
                 CAST(sum(CAST(n AS HUGEINT) * rx.r * ry.r)
                      AS HUGEINT) AS sxy,
                 CAST(sum(CAST(n AS HUGEINT) * rx.r * rx.r)
                      AS HUGEINT) AS sxx,
                 CAST(sum(CAST(n AS HUGEINT) * ry.r * ry.r)
                      AS HUGEINT) AS syy
          FROM h JOIN rx USING (x) JOIN ry USING (y))
    SELECT CAST(nn AS BIGINT) AS n_rows,
           CASE WHEN (nn*sxx - sx*sx) = 0 OR (nn*syy - sy*sy) = 0
                THEN NULL ELSE {r} END AS rho
    FROM s""".format(
        r=_sql_r6("CAST(nn*sxy - sx*sy AS DOUBLE)"
                  " / sqrt(CAST(nn*sxx - sx*sx AS DOUBLE)"
                  " * CAST(nn*syy - sy*sy AS DOUBLE))")))
def spearman_qty_discount(sf_dir: str):
    """SPEARMAN rank correlation of (discount, quantity) with exact
    tie-average ranks — the monotonic-association statistic Pearson
    (discount_quantity_corr) cannot see. Both value domains are
    bounded, so the corpus collapses to a (discount-pct, quantity)
    cell histogram; tie-average ranks are held as 2x-SCALED INTEGERS
    (2*avg_rank = 2*c_below + c_tied + 1 — always integral), every
    sufficient statistic folds as an exact python int (SQL HUGEINT),
    and rho is ONE shared-r6 double expression. No sort, no per-row
    rank assignment — the rank of a VALUE is a histogram prefix
    sum."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_discount", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": np.round(b["l_discount"].to_numpy()
                          * 100).astype(np.int64),
            "y": b["l_quantity"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby(["x", "y"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["x", "y"], ["n"])
    n_cell = h["n"].to_numpy(np.int64).astype(object)

    def ranks2x(vals: np.ndarray, cnts: np.ndarray) -> dict:
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], cnts[order].astype(object)
        below = np.concatenate(([0], np.cumsum(c)[:-1]))
        return {int(vv): 2 * int(b) + int(cc) + 1
                for vv, b, cc in zip(v, below, c)}

    mx = h.groupby("x", as_index=False)["n"].sum()
    my = h.groupby("y", as_index=False)["n"].sum()
    rx = ranks2x(mx["x"].to_numpy(np.int64), mx["n"].to_numpy(np.int64))
    ry = ranks2x(my["y"].to_numpy(np.int64), my["n"].to_numpy(np.int64))
    xr = np.asarray([rx[int(v)] for v in h["x"]], object)
    yr = np.asarray([ry[int(v)] for v in h["y"]], object)
    nn = int(sum(n_cell))
    sx = int(sum(n_cell * xr))
    sy = int(sum(n_cell * yr))
    sxy = int(sum(n_cell * xr * yr))
    sxx = int(sum(n_cell * xr * xr))
    syy = int(sum(n_cell * yr * yr))
    da, db = nn * sxx - sx * sx, nn * syy - sy * sy
    rho = (np.nan if da == 0 or db == 0 else
           float(r6(float(nn * sxy - sx * sy)
                    / np.sqrt(float(da) * float(db)))))
    return pd.DataFrame({"n_rows": [np.int64(nn)],
                         "rho": [np.float64(rho)]})


@register("kendall_tau_b", sql="""
    WITH h AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2),
    cd AS (SELECT
             CAST(coalesce(sum(CASE WHEN b.x > a.x AND b.y > a.y
                  THEN CAST(a.n AS HUGEINT) * b.n END), 0)
                  AS HUGEINT) AS conc,
             CAST(coalesce(sum(CASE WHEN b.x > a.x AND b.y < a.y
                  THEN CAST(a.n AS HUGEINT) * b.n END), 0)
                  AS HUGEINT) AS disc
           FROM h a CROSS JOIN h b),
    t AS (SELECT CAST(sum(n) AS HUGEINT) AS nn FROM h),
    tx AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) / 2)
                  AS HUGEINT) AS n1
           FROM (SELECT CAST(sum(n) AS BIGINT) AS c FROM h
                 GROUP BY x) q),
    ty AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) / 2)
                  AS HUGEINT) AS n2
           FROM (SELECT CAST(sum(n) AS BIGINT) AS c FROM h
                 GROUP BY y) q)
    SELECT CAST(t.nn AS BIGINT) AS n_rows,
           CAST(cd.conc AS BIGINT) AS concordant,
           CAST(cd.disc AS BIGINT) AS discordant,
           CASE WHEN (t.nn*(t.nn-1)/2 - tx.n1) = 0
                  OR (t.nn*(t.nn-1)/2 - ty.n2) = 0 THEN NULL
                ELSE {r} END AS tau_b
    FROM cd CROSS JOIN t CROSS JOIN tx CROSS JOIN ty""".format(
        r=_sql_r6("CAST(cd.conc - cd.disc AS DOUBLE)"
                  " / sqrt(CAST(t.nn*(t.nn-1)/2 - tx.n1 AS DOUBLE)"
                  " * CAST(t.nn*(t.nn-1)/2 - ty.n2 AS DOUBLE))")))
def kendall_tau_b(sf_dir: str):
    """KENDALL tau-b of (discount, quantity) with full tie
    correction — the pairwise-concordance rank statistic, exact over
    arbitrarily many rows because concordant/discordant PAIR COUNTS
    come from the bounded cell histogram, not from row pairs:
    conc = sum n_ij * n_kl over cells strictly greater in both dims
    (an object-int outer pass over ~500 cells), ties from the
    marginals, tau_b = (C-D)/sqrt((n0-n1)(n0-n2)) as ONE shared-r6
    double. The SQL replays the identical cell self-join in
    HUGEINT."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_discount", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": np.round(b["l_discount"].to_numpy()
                          * 100).astype(np.int64),
            "y": b["l_quantity"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby(["x", "y"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["x", "y"], ["n"])
    x = h["x"].to_numpy(np.int64)
    y = h["y"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64).astype(object)
    gx = x[:, None] < x[None, :]
    gy_gt = y[:, None] < y[None, :]
    gy_lt = y[:, None] > y[None, :]
    pair_n = n[:, None] * n[None, :]
    conc = int((pair_n * (gx & gy_gt)).sum())
    disc = int((pair_n * (gx & gy_lt)).sum())
    nn = int(sum(n))
    n0 = nn * (nn - 1) // 2
    n1 = sum(int(c) * (int(c) - 1) // 2
             for c in h.groupby("x")["n"].sum())
    n2 = sum(int(c) * (int(c) - 1) // 2
             for c in h.groupby("y")["n"].sum())
    da, db = n0 - n1, n0 - n2
    tau = (np.nan if da == 0 or db == 0 else
           float(r6(float(conc - disc)
                    / np.sqrt(float(da) * float(db)))))
    return pd.DataFrame({
        "n_rows": [np.int64(nn)],
        "concordant": [np.int64(conc)],
        "discordant": [np.int64(disc)],
        "tau_b": [np.float64(tau)]})


def title_text_overlap_sql(scale: str) -> str:
    """DuckDB oracle for ``title_text_overlap`` — decode() only
    reaches parseable pages (text IS NOT NULL); tokens are the house
    whitespace-run split; distinct-token set semantics on BOTH
    sides."""
    from .q05_pages_flagship import _pages_glob
    return """
    WITH v AS (
      SELECT url, warc_ts,
             regexp_extract(decode(html),
                            '<title>([^<]*)</title>', 1) AS title,
             text
      FROM read_parquet('{glob}')
      WHERE text IS NOT NULL),
    t AS (
      SELECT url, warc_ts,
             list_distinct(string_split_regex(
               trim(title, E' \\t\\n\\r\\f'),
               '[ \\t\\n\\r\\f]+')) AS tt,
             list_distinct(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'),
               '[ \\t\\n\\r\\f]+')) AS bt
      FROM v
      WHERE trim(title, E' \\t\\n\\r\\f') <> ''
        AND trim(text, E' \\t\\n\\r\\f') <> '')
    SELECT url, warc_ts,
           CAST(len(tt) AS BIGINT) AS n_title_tokens,
           CAST(len(list_intersect(tt, bt)) AS BIGINT) AS n_overlap,
           len(list_intersect(tt, bt)) * 1.0 / len(tt) AS overlap
    FROM t""".format(glob=_pages_glob(scale))


@register("title_text_overlap")
def title_text_overlap(sf_dir: str):
    """Title-body token overlap per page: the fraction of a page's
    distinct <title> tokens that also appear in its extracted text —
    the cheap relevance/clickbait signal (a title disjoint from its
    body marks templated or misleading pages). Plan: zero-copy Arrow
    batches; ONE vectorized RE2 title extract over the html cast
    (parseable pages only, validity-masked); title and body token
    sets are exploded FLAT (no per-row Python sets) and the overlap
    is one pandas merge on (row, token) of the two deduped frames;
    the ratio is int/int — bit-identical, no rounding. Map-only: no
    exchange at all."""
    from ...corpus import corpus_dir
    import os

    d = corpus_dir(_corpus_scale(sf_dir))
    ds = rd.read_parquet(os.path.join(d, "pages"),
                         columns=["url", "warc_ts", "html", "text"])

    def fn(b: pa.Table) -> pd.DataFrame:
        t = b.filter(pc.is_valid(b["text"]))
        empty = pd.DataFrame({
            "url": pd.Series(dtype=object),
            "warc_ts": pd.Series(dtype="datetime64[us]"),
            "n_title_tokens": pd.Series(dtype=np.int64),
            "n_overlap": pd.Series(dtype=np.int64),
            "overlap": pd.Series(dtype=np.float64)})
        if t.num_rows == 0:
            return empty
        html = pc.cast(t["html"].combine_chunks(), pa.string())
        ext = pc.extract_regex(html, "<title>(?P<t>[^<]*)</title>")
        titles = pc.fill_null(pc.struct_field(ext, "t"), "")
        from ...functions.hashing import tokens_flat
        tt, tk = tokens_flat(titles)
        bt, bk = tokens_flat(t["text"].combine_chunks())
        keep = (tk > 0) & (bk > 0)

        def distinct_pairs(vals, k) -> pd.DataFrame:
            row = np.repeat(np.arange(len(k)), k)
            f = pd.DataFrame({
                "row": row,
                "tok": vals.to_numpy(zero_copy_only=False)})
            return f.drop_duplicates()

        tf = distinct_pairs(tt, tk)
        bf = distinct_pairs(bt, bk)
        n_title = tf.groupby("row").size()
        inter = tf.merge(bf, on=["row", "tok"]).groupby("row").size()
        idx = np.flatnonzero(keep)
        nt = n_title.reindex(idx, fill_value=0).to_numpy(np.int64)
        ov = inter.reindex(idx, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame({
            "url": t["url"].to_numpy(zero_copy_only=False)[idx],
            "warc_ts": t["warc_ts"].to_numpy(
                zero_copy_only=False)[idx],
            "n_title_tokens": nt,
            "n_overlap": ov,
            "overlap": ov / nt})

    return ds.map_batches(fn, batch_format="pyarrow")
