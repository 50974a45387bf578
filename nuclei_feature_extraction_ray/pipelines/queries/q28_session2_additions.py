# round-5 session-2 additions: six operator shapes the registry did
# not yet cover — weighted quantiles (two-pass bucketed histogram),
# information-theoretic column association (MI / NMI, integer
# micro-nat folds), cross-group SET similarity (vocabulary Jaccard
# matrix via lang bitmasks), full-sequence path census (two bounded
# exchanges), a binary-kernel markup census over the raw page HTML,
# and argmax-gap analytics via partial top-k combine.
from __future__ import annotations

from ._shared import (ORACLE, QUERIES, _combine_partials, _events,
                      _path, _read_dim, np, pa, partition_map, pc, pd,
                      ray, rd, register)
from ...functions.texture import _sql_r6, r6
from .q05_pages_flagship import _corpus_scale, _pages_glob

#: weighted_median: coarse-bucket width in cents for pass 1 — the
#: value domain (extendedprice ≤ ~$120k → ≤1.2e7 cents) folds into
#: ≤ ~120 buckets per flag, so the pass-1 histogram is tiny while the
#: pass-2 refine only ever sees one bucket's worth of distinct cents.
_WM_BUCKET = 100_000

#: user_path_census: path length cap (first-K events per user) and
#: result size. The cap bounds the path-string domain so the census
#: key stays small no matter how long a user's history is.
_PATH_K = 8
_PATH_TOP = 25


@register("weighted_median", sql="""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_quantity) AS BIGINT) AS w
      FROM lineitem),
    g AS (SELECT flag, cents, CAST(sum(w) AS BIGINT) AS wc
          FROM x GROUP BY flag, cents),
    c AS (SELECT flag, cents, wc,
                 sum(wc) OVER (PARTITION BY flag ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(wc) OVER (PARTITION BY flag) AS tw
          FROM g)
    SELECT flag AS l_returnflag,
           CAST(min(cents) AS BIGINT) AS wmedian_cents,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tw
    GROUP BY flag ORDER BY flag""")
def weighted_median(sf_dir: str):
    """Weighted median (lower weighted median: the smallest value v
    with 2·cumweight(v) ≥ total) of the line price per return flag,
    weighted by quantity — the weighted-quantile shape (reweighted
    corpora, importance-sampled mixes) that a plain quantile operator
    cannot express. Exact at any scale WITHOUT a global sort: pass 1
    folds a coarse fixed-width bucket histogram (value domain /
    $1000 → ≤ ~130 buckets per flag) to locate each flag's median
    bucket and the cumulative weight below it; pass 2 re-scans with a
    (flag → bucket) broadcast predicate so only the single target
    bucket's distinct cents — a value-domain-bounded set — reach the
    driver, where the exact within-bucket cumulative finishes the
    job. Both passes move integer (cents, weight) partials only."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def coarse(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({
            "flag": b["l_returnflag"].to_numpy(object),
            "bucket": cents // _WM_BUCKET,
            "w": np.round(b["l_quantity"].to_numpy(np.float64))
                  .astype(np.int64)}) \
            .groupby(["flag", "bucket"], as_index=False).agg(
                w=("w", "sum"))
        return g

    hist = _combine_partials(
        ds.map_batches(coarse, batch_format="pandas"),
        ["flag", "bucket"], ["w"])
    # driver: locate each flag's median bucket + weight below it
    target: dict[str, int] = {}
    below: dict[str, int] = {}
    totals: dict[str, int] = {}
    for flag, g in hist.groupby("flag", sort=True):
        g = g.sort_values("bucket", kind="mergesort")
        w = g["w"].to_numpy(np.int64)
        tw = int(w.sum())
        cum = np.cumsum(w)
        i = int(np.searchsorted(2 * cum, tw))
        target[flag] = int(g["bucket"].to_numpy(np.int64)[i])
        below[flag] = int(cum[i - 1]) if i else 0
        totals[flag] = tw
    tgt_ref = ray.put(target)

    def fine(b: pd.DataFrame) -> pd.DataFrame:
        tgt = ray.get(tgt_ref)
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        flags = b["l_returnflag"].to_numpy(object)
        keep = np.zeros(len(b), bool)
        for f, bk in tgt.items():
            keep |= (flags == f) & (cents // _WM_BUCKET == bk)
        g = pd.DataFrame({
            "flag": flags[keep], "cents": cents[keep],
            "w": np.round(b["l_quantity"].to_numpy(np.float64))
                  .astype(np.int64)[keep]}) \
            .groupby(["flag", "cents"], as_index=False).agg(
                w=("w", "sum"))
        return g

    fine_hist = _combine_partials(
        ds.map_batches(fine, batch_format="pandas"),
        ["flag", "cents"], ["w"])
    rows = []
    for flag, g in fine_hist.groupby("flag", sort=True):
        g = g.sort_values("cents", kind="mergesort")
        cum = below[flag] + np.cumsum(g["w"].to_numpy(np.int64))
        i = int(np.searchsorted(2 * cum, totals[flag]))
        rows.append({
            "l_returnflag": flag,
            "wmedian_cents":
                np.int64(g["cents"].to_numpy(np.int64)[i]),
            "total_weight": np.int64(totals[flag])})
    return pd.DataFrame(rows)


@register("lang_source_mi", sql="""
    WITH c AS (SELECT lang, source,
                      CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    rl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c
           GROUP BY lang),
    rs AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c
           GROUP BY source),
    mi AS (SELECT CAST(sum(CASE WHEN tt >= 0
                 THEN CAST(floor(tt * 1e6 + 0.5) AS BIGINT)
                 ELSE -CAST(floor(-tt * 1e6 + 0.5) AS BIGINT) END)
               AS BIGINT) AS mi_micro
           FROM (SELECT (CAST(c.n AS DOUBLE) / CAST(t.nn AS DOUBLE))
                        * ln(CAST(CAST(c.n AS HUGEINT) * t.nn
                                  AS DOUBLE)
                             / CAST(CAST(rl.nl AS HUGEINT) * rs.ns
                                    AS DOUBLE)) AS tt
                 FROM c JOIN rl USING (lang) JOIN rs USING (source)
                 CROSS JOIN t)),
    hl AS (SELECT CAST(sum(CAST(floor(
                 -(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))
                 * ln(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))
                 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS h_micro
           FROM rl CROSS JOIN t),
    hs AS (SELECT CAST(sum(CAST(floor(
                 -(CAST(ns AS DOUBLE) / CAST(t.nn AS DOUBLE))
                 * ln(CAST(ns AS DOUBLE) / CAST(t.nn AS DOUBLE))
                 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS h_micro
           FROM rs CROSS JOIN t)
    SELECT t.nn AS n_docs, mi.mi_micro,
           hl.h_micro AS h_lang_micro, hs.h_micro AS h_source_micro,
           {nmi} AS nmi
    FROM t CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs""".format(
        nmi=_sql_r6("CAST(mi.mi_micro AS DOUBLE) / "
                    "sqrt(CAST(hl.h_micro AS DOUBLE) "
                    "* CAST(hs.h_micro AS DOUBLE))")))
def lang_source_mi(sf_dir: str):
    """Column-association census: mutual information between the lang
    and source columns plus both marginal entropies (integer
    micro-nats) and the normalized MI — the statistic that tells a
    mixing plan whether language composition is independent of the
    source buckets (chi2_lang_source's counterpart on the
    information-theory side). The (lang, source) grid is bounded, so
    per-batch count partials fold through one tiny combine; each MI /
    entropy term is ONE double expression from exact integer ratios,
    quantized half-away to micro-nats and summed as int64 (the
    source_kl fold policy), and NMI is one shared r6 expression over
    the three integer sums — bit-exact in both engines."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).agg(
            n=("lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n"])
    nn = int(grid["n"].sum())
    nl = grid.groupby("lang")["n"].sum()
    ns = grid.groupby("source")["n"].sum()

    def _micro(x: float) -> int:
        return int(np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x))

    mi = 0
    for lang, src, c in zip(grid["lang"], grid["source"],
                            grid["n"].astype(int)):
        tt = ((np.float64(c) / np.float64(nn))
              * np.log(np.float64(c * nn)
                       / np.float64(int(nl[lang]) * int(ns[src]))))
        mi += _micro(tt)
    hl = sum(_micro(-(np.float64(int(v)) / np.float64(nn))
                    * np.log(np.float64(int(v)) / np.float64(nn)))
             for v in nl)
    hs = sum(_micro(-(np.float64(int(v)) / np.float64(nn))
                    * np.log(np.float64(int(v)) / np.float64(nn)))
             for v in ns)
    nmi = r6(np.float64(mi) / np.sqrt(np.float64(hl)
                                      * np.float64(hs)))
    return pd.DataFrame({
        "n_docs": [np.int64(nn)], "mi_micro": [np.int64(mi)],
        "h_lang_micro": [np.int64(hl)],
        "h_source_micro": [np.int64(hs)],
        "nmi": [np.float64(nmi)]})


@register("vocab_jaccard_langs", sql="""
    WITH tl AS (
      SELECT DISTINCT lang,
             unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'),
               '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM tl
           GROUP BY lang),
    ix AS (SELECT a.lang AS la, b.lang AS lb,
                  CAST(count(*) AS BIGINT) AS i
           FROM tl a JOIN tl b
             ON a.token = b.token AND a.lang < b.lang
           GROUP BY a.lang, b.lang)
    SELECT sa.lang AS lang_a, sb.lang AS lang_b,
           sa.c AS n_a, sb.c AS n_b,
           CAST(coalesce(ix.i, 0) AS BIGINT) AS n_common,
           {jac} AS jaccard
    FROM sz sa JOIN sz sb ON sa.lang < sb.lang
    LEFT JOIN ix ON ix.la = sa.lang AND ix.lb = sb.lang
    ORDER BY lang_a, lang_b""".format(
        jac=_sql_r6("CAST(coalesce(ix.i, 0) AS DOUBLE) / "
                    "CAST(sa.c + sb.c - coalesce(ix.i, 0) "
                    "AS DOUBLE)")))
def vocab_jaccard_langs(sf_dir: str):
    """Cross-group SET similarity: the pairwise Jaccard matrix of
    token vocabularies between languages — how much surface form two
    language slices share, the signal behind contamination checks
    between corpus slices. Tokenization matches vocab_topk. Plan:
    per-batch DISTINCT (lang, token) explode, ONE token hash exchange,
    then each partition folds its tokens into a lang-BITMASK census —
    for L languages the partial is ≤ 2^L−1 rows per partition (31
    here), never a token row — and the driver recovers every pairwise
    intersection and per-lang vocabulary size from popcount sums over
    the mask census. Jaccard is one shared r6 expression from the
    exact integer counts."""
    import re as _re

    from ...functions.text_stats import WS_CLASS
    ws_re = _re.compile(WS_CLASS + "+")

    # tiny pass: the lang universe (bounded dimension) -> bit ids
    langs_pdf = _combine_partials(
        rd.read_parquet(_path(sf_dir, "documents"), columns=["lang"])
        .map_batches(
            lambda b: pd.DataFrame(
                {"lang": pd.unique(b["lang"]),
                 "n": np.ones(len(pd.unique(b["lang"])), np.int64)}),
            batch_format="pandas"),
        ["lang"], ["n"])
    langs = sorted(langs_pdf["lang"])
    bit = {l: 1 << i for i, l in enumerate(langs)}
    bit_ref = ray.put(bit)

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
            w = set(ws_re.split(t))
            toks.extend(w)
            ls.extend([lang] * len(w))
        if not toks:
            return pd.DataFrame({
                "token": pd.Series(dtype=object),
                "mask": pd.Series(dtype=np.int64)})
        bm = ray.get(bit_ref)
        # distinct (token, single-lang bit) pairs — masks stay
        # ONE-HOT on the wire, so the partition-side OR reduces to a
        # groupby SUM over distinct bits (fully vectorized)
        g = pd.DataFrame({
            "token": np.asarray(toks, object),
            "mask": np.asarray([bm[l] for l in ls], np.int64)}) \
            .drop_duplicates()
        g["mask"] = g["mask"].astype(np.int64)
        return g

    def mask_census(g: pd.DataFrame) -> pd.DataFrame:
        # tokens are partition-local after the exchange: masks are
        # one-hot, so OR == sum over the DISTINCT (token, bit) pairs
        m = g.drop_duplicates(["token", "mask"]) \
            .groupby("token", as_index=False).agg(
                mask=("mask", "sum"))
        out = m.groupby("mask", as_index=False).agg(
            n=("mask", "size"))
        out["mask"] = out["mask"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    census = _combine_partials(
        partition_map(
            ds.map_batches(explode, batch_format="pandas"),
            ["token"], mask_census, 16),
        ["mask"], ["n"])
    masks = census["mask"].to_numpy(np.int64)
    cnts = census["n"].to_numpy(np.int64)
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            ba, bb = bit[la], bit[lb]
            n_a = int(cnts[(masks & ba) != 0].sum())
            n_b = int(cnts[(masks & bb) != 0].sum())
            inter = int(cnts[((masks & ba) != 0)
                             & ((masks & bb) != 0)].sum())
            union = n_a + n_b - inter
            rows.append({
                "lang_a": la, "lang_b": lb,
                "n_a": np.int64(n_a), "n_b": np.int64(n_b),
                "n_common": np.int64(inter),
                "jaccard": np.float64(
                    r6(np.float64(inter) / np.float64(union))
                    if union else 0.0)})
    return pd.DataFrame(rows)


@register("user_path_census", sql="""
    WITH e AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    p AS (SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM e WHERE rn <= {k} GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT {top}""".format(
        k=_PATH_K, top=_PATH_TOP))
def user_path_census(sf_dir: str):
    """Full-sequence path census: each user's early journey — the
    ordered signature of their first {k} event types — counted across
    the corpus, top {top} signatures. The onboarding-funnel shape that
    per-transition censuses (event_transitions) and fixed-length
    pattern mining (seq3_mining) cannot express: the PATH is the key.
    Plan: ONE user_id hash exchange; each partition sorts its users'
    events by (ts, event_id), keeps rank < {k} via vectorized
    cumcount, joins the per-user signature strings, and emits (path,
    count) partials; a SECOND path hash exchange completes the counts
    and keeps a per-partition top-{top}, so only partitions×{top}
    rows reach the driver merge. The head-{k} cap bounds the path
    domain regardless of history length."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        rk = g.groupby("user_id").cumcount()
        g = g[rk < _PATH_K]
        # per-user join: bounded by users-per-partition, each join is
        # ≤ _PATH_K short tokens
        p = g.groupby("user_id")["event_type"].agg(">".join)
        out = pd.DataFrame({"path": p.to_numpy(object)}) \
            .groupby("path", as_index=False).agg(n=("path", "size"))
        out["n"] = out["n"].astype(np.int64)
        return out

    def count_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("path", as_index=False).agg(n=("n", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out = out.sort_values(["n", "path"],
                              ascending=[False, True],
                              kind="mergesort")
        return out.head(_PATH_TOP)

    parts = partition_map(
        partition_map(ds, ["user_id"], paths, 16),
        ["path"], count_top, 16).to_pandas()
    top = parts.sort_values(["n", "path"], ascending=[False, True],
                            kind="mergesort").head(_PATH_TOP)
    return pd.DataFrame({
        "path": top["path"].to_numpy(object),
        "n_users": top["n"].to_numpy(np.int64)})


def pages_markup_census_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_markup_census`` — decode() is only
    applied to pages whose extracted text is non-null (the corpus
    contract makes text null for every page whose html is empty,
    invalid UTF-8, or not html — corpus.py extract_text_one), so the
    VARCHAR path never sees undecodable bytes. Occurrence counts via
    the length-difference idiom; the patterns are pure ASCII, so
    character counts equal the engine's byte-level substring counts
    on the identical UTF-8 payload."""
    tags = {"p_tags": "<p>", "li_tags": "<li>",
            "script_tags": "<script>", "amp_entities": "&amp;"}
    cols = ", ".join(
        "CAST(sum((length(h) - length(replace(h, '{pat}', ''))) "
        "/ {n}) AS BIGINT) AS {name}".format(
            pat=p, n=len(p), name=name)
        for name, p in tags.items())
    return """
    WITH v AS (
      SELECT lang, decode(html) AS h
      FROM read_parquet('{glob}')
      WHERE text IS NOT NULL)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_pages, {cols}
    FROM v GROUP BY lang ORDER BY lang""".format(
        glob=_pages_glob(scale), cols=cols)


_MARKUP_TAGS = [("p_tags", b"<p>"), ("li_tags", b"<li>"),
                ("script_tags", b"<script>"),
                ("amp_entities", b"&amp;")]


@register("pages_markup_census")
def pages_markup_census(sf_dir: str):
    """Markup census over the RAW page bytes: per language, how many
    parseable pages and how many <p> / <li> / <script> tags and &amp;
    entities their html carries — the structural-profile signal a
    boilerplate / template analysis starts from, computed WITHOUT
    decoding or parsing. Plan: zero-copy Arrow batches over the
    corpus parquet; pc.count_substring runs byte-level on the binary
    html column (the patterns are ASCII, so byte counts equal the
    oracle's character counts on valid UTF-8); pages with null
    extracted text (empty / invalid-UTF-8 / non-html payloads) are
    masked out by the text column's validity bitmap — no Python row
    loop, no decode, partials fold by lang through one tiny
    combine."""
    from ...corpus import corpus_dir
    import os

    d = corpus_dir(_corpus_scale(sf_dir))
    ds = rd.read_parquet(os.path.join(d, "pages"),
                         columns=["lang", "html", "text"])

    def partial(b: pa.Table) -> pd.DataFrame:
        ok = pc.is_valid(b["text"])
        t = b.filter(ok)
        if t.num_rows == 0:
            return pd.DataFrame({
                "lang": pd.Series(dtype=object),
                "n_pages": pd.Series(dtype=np.int64),
                **{n: pd.Series(dtype=np.int64)
                   for n, _ in _MARKUP_TAGS}})
        html = t["html"].combine_chunks()
        cols = {
            n: pc.count_substring(html, pat.decode("ascii"))
                 .to_numpy(zero_copy_only=False).astype(np.int64)
            for n, pat in _MARKUP_TAGS}
        g = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "n_pages": np.ones(t.num_rows, np.int64), **cols}) \
            .groupby("lang", as_index=False).sum()
        for c in ("n_pages", *cols):
            g[c] = g[c].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["n_pages"] + [n for n, _ in _MARKUP_TAGS])
    for c in out.columns:
        if c != "lang":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("lang", kind="mergesort") \
        .reset_index(drop=True)


@register("nation_top2_gap", sql="""
    WITH b AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             c_custkey,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                        c_custkey) AS rn
      FROM customer),
    t AS (SELECT c_nationkey,
                 max(CASE WHEN rn = 1 THEN cents END) AS top_cents,
                 max(CASE WHEN rn = 2 THEN cents END)
                     AS second_cents
          FROM b WHERE rn <= 2 GROUP BY c_nationkey
          HAVING count(*) >= 2)
    SELECT n_name,
           CAST(top_cents AS BIGINT) AS top_bal_cents,
           CAST(second_cents AS BIGINT) AS second_bal_cents,
           CAST(top_cents - second_cents AS BIGINT) AS gap_cents
    FROM t JOIN nation ON c_nationkey = n_nationkey
    ORDER BY n_name""")
def nation_top2_gap(sf_dir: str):
    """Argmax-gap analytics: per nation, the top two customer account
    balances and their gap — the winner-dominance census (auction /
    leaderboard shape) that needs a top-2, not an aggregate. The
    partial-top-k combine pattern at its smallest: every batch emits
    its LOCAL top-2 (cents desc, custkey asc) per nation — ≤ 2·|nation|
    rows per block, ties broken identically to the oracle's window —
    and the driver merge re-applies the same rank over blocks×2·25
    rows; nations with one customer are dropped like the oracle's
    HAVING. The nation-name attach is a guarded dimension broadcast."""
    ds = rd.read_parquet(_path(sf_dir, "customer"),
                         columns=["c_nationkey", "c_acctbal",
                                  "c_custkey"])

    def local_top2(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "nationkey": b["c_nationkey"].to_numpy(np.int64),
            "cents": np.round(b["c_acctbal"].to_numpy()
                              * 100).astype(np.int64),
            "custkey": b["c_custkey"].to_numpy(np.int64)})
        g = g.sort_values(["nationkey", "cents", "custkey"],
                          ascending=[True, False, True],
                          kind="mergesort")
        keep = g.groupby("nationkey").cumcount() < 2
        return g[keep]

    # partials are nation-dimension-bounded (≤ 2·|nation| per block);
    # the guarded limit+raise pull matches _combine_partials policy
    parts = ds.map_batches(local_top2, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("nation_top2_gap: partial top-2 rows exceed "
                         "the driver-combine bound — nation key "
                         "cardinality is not dimension-sized")
    parts = parts.sort_values(["nationkey", "cents", "custkey"],
                              ascending=[True, False, True],
                              kind="mergesort")
    top2 = parts[parts.groupby("nationkey").cumcount() < 2]
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_name"])
    rows = []
    for nk, g in top2.groupby("nationkey", sort=True):
        if len(g) < 2:
            continue
        c = g["cents"].to_numpy(np.int64)
        rows.append({
            "nationkey": int(nk),
            "top_bal_cents": np.int64(c[0]),
            "second_bal_cents": np.int64(c[1]),
            "gap_cents": np.int64(c[0] - c[1])})
    out = pd.DataFrame(rows).merge(
        nat.rename(columns={"n_nationkey": "nationkey"}),
        on="nationkey")
    out = out[["n_name", "top_bal_cents", "second_bal_cents",
               "gap_cents"]]
    return out.sort_values("n_name",
                           kind="mergesort").reset_index(drop=True)
