# round-5 session-2 additions, batch 2: shard-assignment balance
# census (the partitioning-skew audit as a first-class query), PSI
# distribution drift (the industry variant beside source_kl's KL),
# a decision-stump best-split search (feature selection over a
# value-domain-bounded cumulative), grouped top-k with DENSE-RANK tie
# semantics (vs topk_per_group's row_number), and a title-based
# template census straight off the raw page HTML.
from __future__ import annotations

from ._shared import (ORACLE, QUERIES, _combine_partials, _events,
                      _path, np, pa, partition_map, pc, pd, ray, rd,
                      register)
from ...functions.hashing import md5_upper64_flat
from ...functions.texture import _sql_r6, r6
from .q05_pages_flagship import _corpus_scale, _pages_glob

#: shard_balance: shard count — the fan-out a sharded writer would use
_N_SHARDS = 64

#: value_psi: bucket width in cents ($10) over the bounded value
#: domain (events.value ≤ ~$500 → ≤ ~50 buckets)
_PSI_BUCKET = 1_000

#: lang_top_terms: dense ranks kept per language
_TOP_RANKS = 5

#: pages_titles: result size
_TITLES_TOP = 25


@register("shard_balance", sql="""
    WITH s AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                  1, 16))::UBIGINT % {n} AS BIGINT)
               AS shard,
             n_chars
      FROM documents)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY shard ORDER BY shard""".format(n=_N_SHARDS))
def shard_balance(sf_dir: str):
    """Shard-assignment balance census: the md5-hash shard each doc
    would land in under a {n}-way sharded writer, with per-shard doc
    and byte totals — the skew audit run BEFORE committing to a
    partitioning key (SURVEY §2.8's explicit-skew story as a
    first-class query; a hot shard here means salting is needed).
    Plan: the shard id is one vectorized md5 kernel over the id
    column (md5_upper64_flat — bit-identical to the SQL hex-prefix
    UBIGINT), partials fold by shard through one tiny combine; the
    output is shard-count-bounded no matter the corpus size."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        shard = (md5_upper64_flat(
            pa.array([str(i) for i in ids], pa.string()))
            % _N_SHARDS).astype(np.int64)
        g = pd.DataFrame({
            "shard": shard,
            "n_docs": np.ones(len(b), np.int64),
            "total_chars": b["n_chars"].to_numpy(np.int64)}) \
            .groupby("shard", as_index=False).sum()
        for c in ("n_docs", "total_chars"):
            g[c] = g[c].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["shard"], ["n_docs", "total_chars"])
    out["shard"] = out["shard"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    return out.sort_values("shard",
                           kind="mergesort").reset_index(drop=True)


@register("value_psi", sql="""
    WITH e AS (
      SELECT epoch_us(ts) AS us,
             CAST(floor(value * 100 + 0.5) AS BIGINT)
               // {w} AS bucket
      FROM events),
    m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
    c AS (SELECT bucket,
                 CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS na,
                 CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS nb
          FROM e CROSS JOIN m GROUP BY bucket),
    t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb,
                 CAST(count(*) AS BIGINT) AS nbuckets,
                 CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 0 ELSE 1
                          END) AS BIGINT) AS skipped
          FROM c),
    term AS (
      SELECT (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)
              - CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
             * ln((CAST(nb AS HUGEINT) * ta)
                  / CAST(CAST(na AS HUGEINT) * tb AS DOUBLE)) AS tt
      FROM c CROSS JOIN t WHERE na > 0 AND nb > 0)
    SELECT t.ta AS n_first, t.tb AS n_second,
           t.nbuckets AS n_buckets, t.skipped AS n_skipped,
           CAST(coalesce(sum(CASE WHEN tt >= 0
               THEN CAST(floor(tt * 1e6 + 0.5) AS BIGINT)
               ELSE -CAST(floor(-tt * 1e6 + 0.5) AS BIGINT) END), 0)
             AS BIGINT) AS psi_micro
    FROM t LEFT JOIN term ON true
    GROUP BY t.ta, t.tb, t.nbuckets, t.skipped""".format(
        w=_PSI_BUCKET))
def value_psi(sf_dir: str):
    """Population Stability Index of the event-value distribution
    between the first and second half of the time range (split at the
    integer-microsecond midpoint) — the drift gate a scoring pipeline
    runs before trusting a model trained on last epoch's data
    (source_kl's KL in its industry-standard symmetric-ish form).
    The value domain is bounded, so a fixed-width cents-bucket
    histogram with (first-half, second-half) counts replaces any
    row-grain state; buckets empty on either side are counted out
    loudly (n_skipped). Each PSI term is ONE double expression from
    exact integer ratios, quantized half-away to micro-nats, summed
    as int64 — the source_kl fold policy."""
    ds = _events(sf_dir, columns=["ts", "value"])

    # pass 1: the time range (one min/max row per block — integer
    # micros reduce exactly on the driver; block count is bounded)
    rng_pdf = ds.map_batches(
        lambda b: pd.DataFrame({
            "mn": [b["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).min()],
            "mx": [b["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()
    mid = (int(rng_pdf["mn"].min()) + int(rng_pdf["mx"].max())) // 2

    def split_counts(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        first = us <= mid
        g = pd.DataFrame({
            "bucket": cents // _PSI_BUCKET,
            "na": first.astype(np.int64),
            "nb": (~first).astype(np.int64)}) \
            .groupby("bucket", as_index=False).sum()
        for c in ("na", "nb"):
            g[c] = g[c].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(split_counts, batch_format="pandas"),
        ["bucket"], ["na", "nb"])
    ta = int(hist["na"].sum())
    tb = int(hist["nb"].sum())
    na = hist["na"].to_numpy(np.int64)
    nb = hist["nb"].to_numpy(np.int64)
    both = (na > 0) & (nb > 0)
    psi = 0
    for a, b_ in zip(na[both], nb[both]):
        tt = ((np.float64(int(b_)) / np.float64(tb)
               - np.float64(int(a)) / np.float64(ta))
              * np.log((int(b_) * ta)
                       / np.float64(int(a) * tb)))
        psi += int(np.copysign(np.floor(np.abs(tt) * 1e6 + 0.5), tt))
    return pd.DataFrame({
        "n_first": [np.int64(ta)], "n_second": [np.int64(tb)],
        "n_buckets": [np.int64(len(hist))],
        "n_skipped": [np.int64(int((~both).sum()))],
        "psi_micro": [np.int64(psi)]})


@register("best_split_value", sql="""
    WITH h AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS p
      FROM events GROUP BY cents),
    c AS (SELECT cents,
                 sum(n) OVER w AS nl, sum(p) OVER w AS pl,
                 (SELECT sum(n) FROM h) AS nt,
                 (SELECT sum(p) FROM h) AS pt
          FROM h WINDOW w AS (ORDER BY cents
                              ROWS UNBOUNDED PRECEDING)),
    g AS (
      SELECT cents,
             CAST(nl AS BIGINT) AS n_left,
             CAST(nt - nl AS BIGINT) AS n_right,
             (CASE WHEN pt = 0 OR pt = nt THEN 0.0 ELSE
               -(CAST(pt AS DOUBLE)/CAST(nt AS DOUBLE))
                 * ln(CAST(pt AS DOUBLE)/CAST(nt AS DOUBLE))
               -(CAST(nt-pt AS DOUBLE)/CAST(nt AS DOUBLE))
                 * ln(CAST(nt-pt AS DOUBLE)/CAST(nt AS DOUBLE)) END)
             - (CAST(nl AS DOUBLE)/CAST(nt AS DOUBLE))
               * (CASE WHEN pl = 0 OR pl = nl THEN 0.0 ELSE
                 -(CAST(pl AS DOUBLE)/CAST(nl AS DOUBLE))
                   * ln(CAST(pl AS DOUBLE)/CAST(nl AS DOUBLE))
                 -(CAST(nl-pl AS DOUBLE)/CAST(nl AS DOUBLE))
                   * ln(CAST(nl-pl AS DOUBLE)/CAST(nl AS DOUBLE))
                 END)
             - (CAST(nt-nl AS DOUBLE)/CAST(nt AS DOUBLE))
               * (CASE WHEN pt-pl = 0 OR pt-pl = nt-nl THEN 0.0 ELSE
                 -(CAST(pt-pl AS DOUBLE)/CAST(nt-nl AS DOUBLE))
                   * ln(CAST(pt-pl AS DOUBLE)/CAST(nt-nl AS DOUBLE))
                 -(CAST((nt-nl)-(pt-pl) AS DOUBLE)
                   /CAST(nt-nl AS DOUBLE))
                   * ln(CAST((nt-nl)-(pt-pl) AS DOUBLE)
                        /CAST(nt-nl AS DOUBLE)) END) AS gain
      FROM c WHERE nl < nt)
    SELECT CAST(cents AS BIGINT) AS threshold_cents,
           {g6} AS gain, n_left, n_right
    FROM g ORDER BY gain DESC, cents LIMIT 1""".format(
        g6=_sql_r6("gain")))
def best_split_value(sf_dir: str):
    """Decision-stump feature selection: the single value threshold
    that best separates purchases from everything else by information
    gain — the split search inside tree learners and score-calibration
    audits, run over the corpus WITHOUT a sort: the value domain is
    bounded, so a (cents, count, positives) histogram + one cumulative
    pass evaluates EVERY candidate threshold on the driver. Both
    engines compute the gain as the identical double expression over
    exact integer cumulative counts (same guards for 0·ln0), so the
    argmax — raw-double compare, smallest threshold on ties — agrees
    bit-for-bit; only the winning row is returned (gain shared-r6)."""
    ds = _events(sf_dir, columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        pos = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({"cents": cents,
                          "n": np.ones(len(b), np.int64),
                          "p": pos}) \
            .groupby("cents", as_index=False).sum()
        for c in ("n", "p"):
            g[c] = g[c].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["cents"], ["n", "p"]).sort_values(
            "cents", kind="mergesort").reset_index(drop=True)
    cents = hist["cents"].to_numpy(np.int64)
    nl = np.cumsum(hist["n"].to_numpy(np.int64))
    pl = np.cumsum(hist["p"].to_numpy(np.int64))
    nt, pt = int(nl[-1]), int(pl[-1])

    def ent(p: np.ndarray, n: np.ndarray) -> np.ndarray:
        # -(p/n)ln(p/n) - ((n-p)/n)ln((n-p)/n), 0·ln0 := 0 — the
        # exact expression mirrored in the SQL CASE guards
        out = np.zeros(len(p), np.float64)
        ok = (p > 0) & (p < n)
        pp = p[ok].astype(np.float64) / n[ok].astype(np.float64)
        qq = (n[ok] - p[ok]).astype(np.float64) \
            / n[ok].astype(np.float64)
        out[ok] = -pp * np.log(pp) - qq * np.log(qq)
        return out

    keep = nl < nt                      # right side must be non-empty
    nl_, pl_ = nl[keep], pl[keep]
    nr_, pr_ = nt - nl_, pt - pl_
    h_root = float(ent(np.asarray([pt]), np.asarray([nt]))[0])
    gain = (h_root
            - (nl_.astype(np.float64) / np.float64(nt))
            * ent(pl_, nl_)
            - (nr_.astype(np.float64) / np.float64(nt))
            * ent(pr_, nr_))
    i = int(np.lexsort((cents[keep], -gain))[0])
    return pd.DataFrame({
        "threshold_cents": [np.int64(cents[keep][i])],
        "gain": [np.float64(r6(gain[i]))],
        "n_left": [np.int64(nl_[i])],
        "n_right": [np.int64(nr_[i])]})


@register("lang_top_terms", sql="""
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'),
               '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
          FROM toks GROUP BY lang, token),
    rk AS (SELECT lang, token, n,
                  CAST(dense_rank() OVER (
                    PARTITION BY lang ORDER BY n DESC)
                    AS BIGINT) AS rnk
           FROM c)
    SELECT lang, token, n, rnk FROM rk WHERE rnk <= {k}
    ORDER BY lang, n DESC, token""".format(k=_TOP_RANKS))
def lang_top_terms(sf_dir: str):
    """Grouped top-k with DENSE-RANK TIE semantics: the {k} highest
    token-count VALUES per language, keeping every token tied at each
    count — topk_per_group's row_number cousin for when ties must
    surface (vocabulary heads, leaderboards). Plan: per-batch (lang,
    token, count) partials, ONE token hash exchange completes the
    counts (a token's lang rows co-locate with it); each partition
    keeps only rows whose count reaches its local top-{k} DISTINCT
    counts per lang — a row in the global dense top-{k} is necessarily
    in its partition's — and the driver merge re-ranks the bounded
    candidate set."""
    import re as _re

    from ...functions.text_stats import WS_CLASS
    ws_re = _re.compile(WS_CLASS + "+")
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "lang"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ls: list[str] = []
        for t, lang in zip(b["text"], b["lang"]):
            if not isinstance(t, str):
                continue
            t = t.strip(" \t\n\r\f")
            if not t:
                continue
            w = ws_re.split(t)
            toks.extend(w)
            ls.extend([lang] * len(w))
        if not toks:
            return pd.DataFrame({
                "lang": pd.Series(dtype=object),
                "token": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"lang": np.asarray(ls, object),
                          "token": np.asarray(toks, object)}) \
            .groupby(["lang", "token"], as_index=False).agg(
                n=("token", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["lang", "token"], as_index=False).agg(
            n=("n", "sum"))
        c["n"] = c["n"].astype(np.int64)
        # per-lang top-K DISTINCT counts in this partition
        keep_parts = []
        for lang, gg in c.groupby("lang", sort=False):
            vals = np.sort(pd.unique(gg["n"]))[::-1][:_TOP_RANKS]
            keep_parts.append(gg[gg["n"].isin(vals)])
        return pd.concat(keep_parts) if keep_parts else c

    cand = partition_map(
        ds.map_batches(explode, batch_format="pandas"),
        ["token"], candidates, 16).to_pandas()
    rows = []
    for lang, g in cand.groupby("lang", sort=True):
        vals = np.sort(pd.unique(g["n"]))[::-1][:_TOP_RANKS]
        rank_of = {int(v): i + 1 for i, v in enumerate(vals)}
        g = g[g["n"].isin(vals)]
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort")
        for tok, n in zip(g["token"], g["n"]):
            rows.append({"lang": lang, "token": tok,
                         "n": np.int64(n),
                         "rnk": np.int64(rank_of[int(n)])})
    return pd.DataFrame(rows)


def pages_titles_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_titles`` — decode() only reaches
    parseable pages (text IS NOT NULL, the corpus contract), and the
    title regex is anchored on ASCII tags so byte/char semantics
    agree with the engine's Arrow kernel."""
    return """
    WITH v AS (
      SELECT url,
             regexp_extract(decode(html),
                            '<title>([^<]*)</title>', 1) AS title
      FROM read_parquet('{glob}')
      WHERE text IS NOT NULL),
    c AS (SELECT title,
                 CAST(count(*) AS BIGINT) AS n_pages,
                 CAST(count(DISTINCT url) AS BIGINT) AS n_urls
          FROM v WHERE title <> '' GROUP BY title)
    SELECT title, n_pages, n_urls
    FROM c ORDER BY n_pages DESC, title LIMIT {top}""".format(
        glob=_pages_glob(scale), top=_TITLES_TOP)


@register("pages_titles")
def pages_titles(sf_dir: str):
    """Template census off the raw page bytes: the {top} most
    duplicated <title> strings with page and distinct-url counts —
    shared titles across many urls flag boilerplate templates (the
    C4/CCNet template-removal precursor). Plan: zero-copy Arrow
    batches; the title is pulled by ONE vectorized RE2
    pc.extract_regex over the html cast utf8 (only parseable pages —
    validity bitmap of the text column — reach the cast, so it cannot
    throw); per-batch (title, url, n) partials feed ONE title hash
    exchange whose partitions emit complete counts + a partial
    top-{top}, so the driver merge sees partitions×{top} rows."""
    from ...corpus import corpus_dir
    import os

    d = corpus_dir(_corpus_scale(sf_dir))
    ds = rd.read_parquet(os.path.join(d, "pages"),
                         columns=["url", "html", "text"])

    def partial(b: pa.Table) -> pd.DataFrame:
        t = b.filter(pc.is_valid(b["text"]))
        if t.num_rows == 0:
            return pd.DataFrame({
                "title": pd.Series(dtype=object),
                "url": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        html = pc.cast(t["html"].combine_chunks(), pa.string())
        ext = pc.extract_regex(
            html, "<title>(?P<t>[^<]*)</title>")
        titles = pc.struct_field(ext, "t")
        ok = pc.fill_null(pc.and_(pc.is_valid(titles),
                                  pc.not_equal(titles, "")), False)
        g = pd.DataFrame({
            "title": titles.to_numpy(zero_copy_only=False),
            "url": t["url"].to_numpy(zero_copy_only=False),
            "keep": ok.to_numpy(zero_copy_only=False)})
        g = g[g["keep"]]
        out = g.groupby(["title", "url"], as_index=False).agg(
            n=("title", "size"))
        out["n"] = out["n"].astype(np.int64)
        return out

    def count_top(g: pd.DataFrame) -> pd.DataFrame:
        per_url = g.groupby(["title", "url"], as_index=False).agg(
            n=("n", "sum"))
        out = per_url.groupby("title", as_index=False).agg(
            n_pages=("n", "sum"), n_urls=("url", "nunique"))
        out["n_pages"] = out["n_pages"].astype(np.int64)
        out["n_urls"] = out["n_urls"].astype(np.int64)
        out = out.sort_values(["n_pages", "title"],
                              ascending=[False, True],
                              kind="mergesort")
        return out.head(_TITLES_TOP)

    parts = partition_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["title"], count_top, 16).to_pandas()
    top = parts.sort_values(["n_pages", "title"],
                            ascending=[False, True],
                            kind="mergesort").head(_TITLES_TOP)
    return pd.DataFrame({
        "title": top["title"].to_numpy(object),
        "n_pages": top["n_pages"].to_numpy(np.int64),
        "n_urls": top["n_urls"].to_numpy(np.int64)})
