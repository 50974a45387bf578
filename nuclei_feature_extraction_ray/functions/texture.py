"""Texture-analog feature families — the graft recast of the
reference's GLCM / GLRLM / Gabor texture payload (SURVEY.md §2.7):

* ``cooc``  — GLCM analog (``src/features/texture.rs:22-172``): the
  co-occurrence matrix of QUANTIZED TOKEN-LENGTH CLASSES at token
  distance d, for a grid of quantization caps Q (the gray-level-count
  grid ``GLCM_LEVELS`` at ``texture.rs:19``) and distances D (the
  offset grid at ``texture.rs:20``). The matrix is symmetric-normalized
  exactly like the reference (``glcm(.., true)``, ``texture.rs:40-46``)
  and reduced to Haralick statistics named after the reference's
  (``texture.rs:82-157``): correlation, contrast, dissimilarity,
  entropy, angular_second_moment, sum_average,
  inverse_difference_moment, plus max_prob.
  Column grid: ``cooc_{stat}_d{d}_q{q}`` — 8 stats x 2 x 2 = 32.

* ``runlen`` — GLRLM analog (``texture.rs:174-315``): run-length matrix
  over CHARACTER-CLASS runs (alpha=1, digit=2, whitespace=3, other=4 —
  the 4 "gray levels"; text is 1-D so there is one direction, vs the
  reference's 4), run length capped at 16 (``GLRLM_MAX_LENGTH``,
  ``texture.rs:175``), normalized by total run count with
  run-percentage normalized by character count (the masked-pixel-count
  normalization, ``texture.rs:196``). All 17 reference statistics are
  recast with the same names (``texture.rs:244-301``), prefix ``rl_``.
  Mid/extreme gray-level weights use center c=(G+1)/2: mid(g) =
  1/(1+(g-c)^2), extreme(g) = (g-c)^2.

* ``spectrum`` — Gabor analog (``texture.rs:317-374``): band responses
  of the token-length sequence at lag frequencies L = {1,2,3,4,6,8}
  (6 bands, like the reference's 6-frequency bank, ``texture.rs:320``),
  each emitting the pair (autocovariance, autocorrelation) — the
  response (mean, variance) pair of ``texture.rs:339-344`` — plus the
  total-power column ``spec_var``. Columns ``spec_lag{l}_{cov|corr}``.

Degenerate inputs produce NaN columns, never a crash — the
reference's degenerate-geometry policy (``src/features/shape.rs:142-147``).

Every family has (a) a vectorized batch kernel (numpy bincount /
einsum — no per-row Python in the hot path beyond tokenisation),
(b) a generated DuckDB oracle SQL over the ``documents`` table, and
(c) a slow per-document Python oracle for unit tests.

Float policy: every emitted float is ``round(x, 6)`` in BOTH engines
(see pipelines/queries.py module docstring).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .text_stats import WS_CLASS

# --- deterministic grids (config-derived schema, texture.rs:19-20) ---------
COOC_QUANTS = [8, 16]          # token-length caps = gray-level counts
COOC_DISTS = [1, 2]            # token distances = offsets
COOC_STATS = ["correlation", "contrast", "dissimilarity", "entropy",
              "angular_second_moment", "sum_average",
              "inverse_difference_moment", "max_prob"]

RL_CLASSES = [  # (gray level g, regex)
    (1, r"[A-Za-z]+"),
    (2, r"[0-9]+"),
    (3, WS_CLASS + "+"),
    (4, r"[^A-Za-z0-9 \t\n\r\f]+"),
]
RL_MAXLEN = 16
RL_CENTER = 2.5                # (G+1)/2 for G=4
RL_STATS = [
    "short_run_emphasis", "long_run_emphasis",
    "gray_level_nonuniformity", "run_length_nonuniformity",
    "low_gray_level_run_emphasis", "high_gray_level_run_emphasis",
    "short_run_low_gray_level_emphasis",
    "short_run_high_gray_level_emphasis",
    "long_run_low_gray_level_emphasis",
    "long_run_high_gray_level_emphasis",
    "short_run_mid_gray_level_emphasis",
    "long_run_mid_gray_level_emphasis",
    "short_run_extreme_gray_level_emphasis",
    "long_run_extreme_gray_level_emphasis",
    "run_percentage", "run_length_mean", "run_length_variance",
]

SPEC_LAGS = [1, 2, 3, 4, 6, 8]


def r6(x):
    """round-half-AWAY-from-zero to 6 digits — matching the SQL
    oracles' explicit floor formula, NOT numpy's half-to-even. Texture
    stats are full of dyadic rationals (denominators = powers of two
    from the pair-count totals) that land EXACTLY on the 5e-7 rounding
    boundary, where the two conventions differ; both engines therefore
    use this one formula so identical doubles round identically."""
    x = np.asarray(x, np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _sql_r6(expr: str) -> str:
    return ("CASE WHEN ({e}) IS NULL THEN NULL WHEN ({e}) >= 0 THEN "
            "floor(({e})*1000000.0 + 0.5)/1000000.0 ELSE "
            "-floor(-({e})*1000000.0 + 0.5)/1000000.0 END").format(e=expr)

COOC_COLUMNS = ["cooc_%s_d%d_q%d" % (s, d, q)
                for q in COOC_QUANTS for d in COOC_DISTS
                for s in COOC_STATS]
RUNLEN_COLUMNS = ["rl_" + s for s in RL_STATS]
SPECTRUM_COLUMNS = (["spec_var"] +
                    ["spec_lag%d_%s" % (l, k)
                     for l in SPEC_LAGS for k in ("cov", "corr")])
TEXTURE_COLUMNS = COOC_COLUMNS + RUNLEN_COLUMNS + SPECTRUM_COLUMNS


# ===========================================================================
# tokenisation (shared with text_stats semantics)
# ===========================================================================

def token_lens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(sizes, flat_lens): per-doc token counts and the flattened
    per-token character lengths, doc-major order. A doc of only
    whitespace (or empty) has 0 tokens — same rule as text_stats."""
    s = texts.fillna("")
    trimmed = s.str.strip(" \t\n\r\f")
    tok_lists = trimmed.str.split(WS_CLASS + "+")
    sizes = np.fromiter(
        ((0 if len(t) == 1 and t[0] == "" else len(t))
         for t in tok_lists), np.int64, count=len(tok_lists))
    flat = np.fromiter(
        (len(w) for t, n in zip(tok_lists, sizes) if n for w in t),
        np.int64)
    return sizes, flat


# ===========================================================================
# cooc — GLCM analog
# ===========================================================================

def _cooc_block(sizes: np.ndarray, flat: np.ndarray) -> pd.DataFrame:
    n_docs = len(sizes)
    out: dict[str, np.ndarray] = {}
    doc_idx = np.repeat(np.arange(n_docs), sizes)
    ends = np.cumsum(sizes)
    end_per_pos = np.repeat(ends, sizes)
    pos = np.arange(len(flat))

    for q in COOC_QUANTS:
        cls = np.minimum(flat, q) - 1         # 0-based class per token
        ii = np.repeat(np.arange(q), q).astype(np.float64)   # flat i
        jj = np.tile(np.arange(q), q).astype(np.float64)     # flat j
        # All weighted sums below are EXACT integer-valued (counts x
        # integer weights) and go through ONE BLAS matmul, followed by
        # a single division (or a deterministic k-ordered fold for
        # IDM), so the pre-rounding double is bit-identical to the
        # DuckDB oracle regardless of either engine's aggregation
        # order (integer sums are order-exact in float64).
        wmat = np.stack([
            (ii - jj) ** 2,            # contrast
            np.abs(ii - jj),           # dissimilarity
            ii + jj,                   # sum_average
            ii,                        # Sa
            ii * ii,                   # Saa
            ii * jj,                   # Sab
        ], axis=1)                                          # (q*q, 6)
        kind = np.abs(ii - jj).astype(np.int64)
        kmat = np.zeros((q * q, q))
        kmat[np.arange(q * q), kind] = 1.0                  # (q*q, q)
        for d in COOC_DISTS:
            valid = pos + d < end_per_pos
            docs_v = doc_idx[valid]
            a = cls[valid]
            b = cls[pos[valid] + d]
            codes = (docs_v * q + a) * q + b
            m = np.bincount(codes, minlength=n_docs * q * q) \
                .reshape(n_docs, q, q).astype(np.float64)
            m = m + m.transpose(0, 2, 1)       # symmetric (texture.rs:46)
            mf = m.reshape(n_docs, q * q)
            tot = mf.sum(axis=1)
            has = tot > 0
            tots = np.where(has, tot, 1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                sums = mf @ wmat                            # (n, 6)
                contrast = sums[:, 0] / tots
                dissim = sums[:, 1] / tots
                sumavg = sums[:, 2] / tots
                asm = (mf * mf).sum(axis=1) / (tots * tots)
                maxp = mf.max(axis=1) / tots
                # IDM: fold counts grouped by k = |i-j| in ascending k
                # (the oracle writes the same explicit left-to-right sum)
                ck = mf @ kmat                              # (n, q)
                idm_s = np.zeros(n_docs)
                for k in range(q):
                    idm_s = idm_s + ck[:, k] / (1.0 + k * k)
                idm = idm_s / tots
                # entropy = log2(tot) - sum(c*log2(c))/tot (same form
                # in the oracle; c = 0 and c = 1 terms contribute 0)
                pos_m = mf > 1          # c == 1 contributes 0 anyway
                clog = np.where(pos_m, mf * np.log2(
                    np.where(pos_m, mf, 1.0)), 0.0).sum(axis=1)
                ent = np.log2(tots) - clog / tots
                mu = sums[:, 3] / tots
                sig2 = sums[:, 4] / tots - mu * mu
                cov = sums[:, 5] / tots - mu * mu
                # degenerate: a single occupied class -> sigma == 0
                nnz = ((m.sum(axis=2) > 0).sum(axis=1))
                corr_ok = has & (nnz > 1)
                corr = np.where(corr_ok, cov / np.where(corr_ok, sig2, 1),
                                np.nan)
            nan = ~has
            for name, arr in (("correlation", corr), ("contrast", contrast),
                              ("dissimilarity", dissim), ("entropy", ent),
                              ("angular_second_moment", asm),
                              ("sum_average", sumavg),
                              ("inverse_difference_moment", idm),
                              ("max_prob", maxp)):
                arr = np.where(nan, np.nan, arr)
                out["cooc_%s_d%d_q%d" % (name, d, q)] = r6(arr)
    return pd.DataFrame(out)


# ===========================================================================
# runlen — GLRLM analog
# ===========================================================================

_RL_RES = [(g, re.compile(pat)) for g, pat in RL_CLASSES]


def _char_class_runs(s: pd.Series):
    """(docv, g, l) arrays of all char-class runs, fully vectorized:
    the batch's text is encoded once as UTF-32 (one uint32 per code
    point, so positions == character offsets), classes come from
    vectorized range tests, and runs from one diff over the class
    array with doc boundaries forcing breaks. Semantics identical to
    per-class regex findall (maximal same-class runs)."""
    lens = s.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    n_docs = len(s)
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    codes = np.frombuffer("".join(s.tolist()).encode("utf-32-le"),
                          np.uint32)
    cls = np.full(total, 4, np.int8)                      # other
    cls[((codes >= 65) & (codes <= 90))
        | ((codes >= 97) & (codes <= 122))] = 1           # alpha
    cls[(codes >= 48) & (codes <= 57)] = 2                # digit
    for w in (32, 9, 10, 13, 12):
        cls[codes == w] = 3                               # whitespace
    ends = np.cumsum(lens)
    is_start = np.zeros(total, bool)
    is_start[0] = True
    starts_of_docs = ends[:-1][ends[:-1] < total]
    is_start[starts_of_docs] = True
    change = np.empty(total, bool)
    change[0] = True
    change[1:] = (cls[1:] != cls[:-1])
    change |= is_start
    run_starts = np.nonzero(change)[0]
    run_ends = np.append(run_starts[1:], total)
    l = np.minimum(run_ends - run_starts, RL_MAXLEN)
    g = cls[run_starts].astype(np.int64)
    docv = np.searchsorted(ends, run_starts, side="right")
    return docv, g, l.astype(np.int64)


#: order of the 14 weighted run sums (cooperates with runlen_sql)
_RL_WEIGHT_NAMES = ["sre", "lre", "lgre", "hgre", "srlge", "srhge",
                    "lrlge", "lrhge", "srmge", "lrmge", "srege",
                    "lrege", "l", "l2"]


def _rl_weights() -> np.ndarray:
    """(64, 14) weight grid, g-major / l-minor cell order."""
    gv = np.repeat(np.arange(1, 5), RL_MAXLEN).astype(np.float64)
    lv = np.tile(np.arange(1, RL_MAXLEN + 1), 4).astype(np.float64)
    mid = 1.0 / (1.0 + (gv - RL_CENTER) ** 2)
    ext = (gv - RL_CENTER) ** 2
    il2 = 1.0 / (lv * lv)
    l2 = lv * lv
    ig2 = 1.0 / (gv * gv)
    g2 = gv * gv
    return np.stack([il2, l2, ig2, g2, ig2 * il2, g2 * il2, ig2 * l2,
                     g2 * l2, mid * il2, mid * l2, ext * il2,
                     ext * l2, lv, l2], axis=1)


def _runlen_block(texts: pd.Series) -> pd.DataFrame:
    s = texts.fillna("")
    n_docs = len(s)
    docv, g_arr, l_arr = _char_class_runs(s)
    out: dict[str, np.ndarray] = {}
    if len(docv) == 0:
        for c in RUNLEN_COLUMNS:
            out[c] = np.full(n_docs, np.nan)
        return pd.DataFrame(out)
    # Aggregate runs into per-doc (g, l) cell counts with ONE integer
    # bincount, then fold every weighted sum over the 64 cells in
    # DETERMINISTIC g-major/l-minor order — the SQL oracle writes the
    # same explicit left-to-right 64-term sum, so inexact weights
    # (1/9, 2.25/25, ...) accumulate identically in both engines and
    # can never straddle a rounding boundary.
    ncell = 4 * RL_MAXLEN
    cell = (g_arr - 1) * RL_MAXLEN + (l_arr - 1)
    R = np.bincount(docv * ncell + cell,
                    minlength=n_docs * ncell) \
        .reshape(n_docs, ncell).astype(np.float64)
    W = _rl_weights()                                    # (64, 14)
    S = np.zeros((n_docs, 14))
    for j in range(ncell):
        S += R[:, j:j + 1] * W[j]                        # ordered fold
    nr = R.sum(axis=1)
    has = nr > 0
    gcnt = R.reshape(n_docs, 4, RL_MAXLEN).sum(axis=2)
    lcnt = R.reshape(n_docs, 4, RL_MAXLEN).sum(axis=1)
    n_chars = s.str.len().to_numpy(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        nr_s = np.where(has, nr, np.nan)
        vals = {
            "short_run_emphasis": S[:, 0] / nr_s,
            "long_run_emphasis": S[:, 1] / nr_s,
            "gray_level_nonuniformity": (gcnt ** 2).sum(axis=1) / nr_s,
            "run_length_nonuniformity": (lcnt ** 2).sum(axis=1) / nr_s,
            "low_gray_level_run_emphasis": S[:, 2] / nr_s,
            "high_gray_level_run_emphasis": S[:, 3] / nr_s,
            "short_run_low_gray_level_emphasis": S[:, 4] / nr_s,
            "short_run_high_gray_level_emphasis": S[:, 5] / nr_s,
            "long_run_low_gray_level_emphasis": S[:, 6] / nr_s,
            "long_run_high_gray_level_emphasis": S[:, 7] / nr_s,
            "short_run_mid_gray_level_emphasis": S[:, 8] / nr_s,
            "long_run_mid_gray_level_emphasis": S[:, 9] / nr_s,
            "short_run_extreme_gray_level_emphasis": S[:, 10] / nr_s,
            "long_run_extreme_gray_level_emphasis": S[:, 11] / nr_s,
            "run_percentage": nr_s / n_chars,
            "run_length_mean": S[:, 12] / nr_s,
        }
        mean_l = vals["run_length_mean"]
        vals["run_length_variance"] = S[:, 13] / nr_s - mean_l * mean_l
    for name in RL_STATS:
        out["rl_" + name] = r6(vals[name])
    return pd.DataFrame(out)


# ===========================================================================
# spectrum — Gabor analog
# ===========================================================================

def _spectrum_block(sizes: np.ndarray, flat: np.ndarray) -> pd.DataFrame:
    n_docs = len(sizes)
    doc_idx = np.repeat(np.arange(n_docs), sizes)
    pos = np.arange(len(flat))
    ends = np.cumsum(sizes)
    end_per_pos = np.repeat(ends, sizes)
    szf = sizes.astype(np.float64)
    has = sizes > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(
            has, np.bincount(doc_idx, weights=flat,
                             minlength=n_docs) / szf, np.nan)
        cent = flat.astype(np.float64) - mean[doc_idx]
        var = np.where(has, np.bincount(
            doc_idx, weights=cent * cent, minlength=n_docs) / szf, np.nan)
        # constant sequence (integer check, robust to float zero-noise)
        lmax = np.full(n_docs, np.int64(np.iinfo(np.int64).min))
        lmin = np.full(n_docs, np.int64(np.iinfo(np.int64).max))
        np.maximum.at(lmax, doc_idx, flat)
        np.minimum.at(lmin, doc_idx, flat)
        const = has & (lmin == lmax)
        out = {"spec_var": r6(var)}
        for lag in SPEC_LAGS:
            denom = sizes - lag
            ok = denom >= 1
            valid = pos + lag < end_per_pos
            prod = cent[pos[valid]] * cent[pos[valid] + lag]
            cov = np.where(ok, np.bincount(
                doc_idx[valid], weights=prod,
                minlength=n_docs) / np.where(ok, denom, 1), np.nan)
            corr = np.where(ok & ~const, cov / np.where(const, 1, var),
                            np.nan)
            out["spec_lag%d_cov" % lag] = r6(cov)
            out["spec_lag%d_corr" % lag] = r6(corr)
    return pd.DataFrame(out)


# ===========================================================================
# public kernel
# ===========================================================================

def texture_frame(texts: pd.Series,
                  which: tuple[str, ...] = ("cooc", "runlen", "spectrum")
                  ) -> pd.DataFrame:
    """All requested texture-analog columns for one batch, one output
    row per input row, index-aligned with ``texts``."""
    parts = []
    if "cooc" in which or "spectrum" in which:
        sizes, flat = token_lens(texts)
        if "cooc" in which:
            parts.append(_cooc_block(sizes, flat))
        if "spectrum" in which:
            parts.append(_spectrum_block(sizes, flat))
    if "runlen" in which:
        # keep declared column order (cooc, runlen, spectrum)
        pos = 1 if "cooc" in which else 0
        parts.insert(pos, _runlen_block(texts))
    out = pd.concat(parts, axis=1)
    out.index = texts.index
    return out


# ===========================================================================
# DuckDB oracle SQL generators
# ===========================================================================

_TRIM = "trim(text, E' \\t\\n\\r\\f')"
_TOKX = ("CASE WHEN {trim} = '' THEN CAST([] AS BIGINT[]) "
         "ELSE list_transform(string_split_regex({trim}, '{ws}+'), "
         "s -> length(s)) END").format(trim=_TRIM, ws=WS_CLASS)


def cooc_sql(table: str = "documents") -> str:
    ctes = ["tokx AS (SELECT doc_id, %s AS x FROM %s)" % (_TOKX, table)]
    selects = []
    for d in COOC_DISTS:
        ctes.append(
            "p{d}0 AS (SELECT doc_id, x, unnest(range(1, len(x)-{d}+1)) "
            "AS i FROM tokx)".format(d=d))
        ctes.append(
            "p{d} AS (SELECT doc_id, x[i] AS la, x[i+{d}] AS lb "
            "FROM p{d}0)".format(d=d))
    for q in COOC_QUANTS:
        for d in COOC_DISTS:
            tag = "%d_%d" % (d, q)
            # exact-integer cell counts; every stat is an integer sum
            # with ONE final division (IDM: explicit ascending-k fold)
            # so doubles match the engine bit-for-bit.
            idm_terms = " + ".join(
                "sum(CASE WHEN abs(a-b) = {k} THEN c ELSE 0 END) / {w}"
                .format(k=k, w=1 + k * k) for k in range(q))
            ctes.append("""cells_{tag} AS (
  SELECT doc_id, a, b, count(*) AS c FROM (
    SELECT doc_id, least(la,{q})-1 AS a, least(lb,{q})-1 AS b FROM p{d}
    UNION ALL
    SELECT doc_id, least(lb,{q})-1 AS a, least(la,{q})-1 AS b FROM p{d})
  GROUP BY doc_id, a, b)""".format(tag=tag, q=q, d=d))
            ctes.append("""st_{tag} AS (
  SELECT doc_id,
    CASE WHEN min(a) = max(a) THEN NULL ELSE
      (sum(c*a*b) / CAST(sum(c) AS DOUBLE)
         - (sum(c*a) / CAST(sum(c) AS DOUBLE)) * (sum(c*a) / CAST(sum(c) AS DOUBLE)))
      / (sum(c*a*a) / CAST(sum(c) AS DOUBLE)
         - (sum(c*a) / CAST(sum(c) AS DOUBLE)) * (sum(c*a) / CAST(sum(c) AS DOUBLE)))
      END AS correlation,
    sum(c*(a-b)*(a-b)) / CAST(sum(c) AS DOUBLE) AS contrast,
    sum(c*abs(a-b)) / CAST(sum(c) AS DOUBLE) AS dissimilarity,
    log2(CAST(sum(c) AS DOUBLE)) - sum(c*log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE) AS entropy,
    sum(c*c) / (CAST(sum(c) AS DOUBLE)*sum(c)) AS angular_second_moment,
    sum(c*(a+b)) / CAST(sum(c) AS DOUBLE) AS sum_average,
    ({idm}) / CAST(sum(c) AS DOUBLE) AS inverse_difference_moment,
    max(c) / CAST(sum(c) AS DOUBLE) AS max_prob
  FROM cells_{tag} GROUP BY doc_id)""".format(tag=tag, idm=idm_terms))
            for s in COOC_STATS:
                selects.append("%s AS cooc_%s_d%d_q%d"
                               % (_sql_r6("st_%s.%s" % (tag, s)), s, d, q))
    joins = " ".join(
        "LEFT JOIN st_%d_%d USING(doc_id)" % (d, q)
        for q in COOC_QUANTS for d in COOC_DISTS)
    return ("WITH %s SELECT dd.doc_id, %s FROM %s dd %s"
            % (", ".join(ctes), ", ".join(selects), table, joins))


def runlen_sql(table: str = "documents") -> str:
    unions = " UNION ALL ".join(
        "SELECT doc_id, {g} AS g, unnest(list_transform("
        "regexp_extract_all(text, '{p}'), s -> least(length(s), {m}))) "
        "AS l FROM {t}".format(g=g, p=pat, m=RL_MAXLEN, t=table)
        for g, pat in RL_CLASSES)
    # every weighted sum is the engine's exact 64-cell left-to-right
    # fold: sum(CASE cell)*weight + ... in g-major/l-minor order, with
    # weights emitted via repr (shortest round-trip decimal -> the
    # same double the engine computes)
    W = _rl_weights()
    gs = np.repeat(np.arange(1, 5), RL_MAXLEN)
    ls = np.tile(np.arange(1, RL_MAXLEN + 1), 4)

    def fold(col: int) -> str:
        return " + ".join(
            "sum(CASE WHEN g = {g} AND l = {l} THEN c ELSE 0 END) "
            "* CAST({w!r} AS DOUBLE)".format(g=int(gs[j]), l=int(ls[j]),
                                             w=float(W[j, col]))
            for j in range(len(gs)))

    base_sums = ("CAST(sum(c) AS DOUBLE) AS nr, " + ", ".join(
        "(%s) AS s_%s" % (fold(i), name)
        for i, name in enumerate(_RL_WEIGHT_NAMES)))
    pairs = [
        ("short_run_emphasis", "b.s_sre/b.nr"),
        ("long_run_emphasis", "b.s_lre/b.nr"),
        ("gray_level_nonuniformity", "gt.s/b.nr"),
        ("run_length_nonuniformity", "rt.s/b.nr"),
        ("low_gray_level_run_emphasis", "b.s_lgre/b.nr"),
        ("high_gray_level_run_emphasis", "b.s_hgre/b.nr"),
        ("short_run_low_gray_level_emphasis", "b.s_srlge/b.nr"),
        ("short_run_high_gray_level_emphasis", "b.s_srhge/b.nr"),
        ("long_run_low_gray_level_emphasis", "b.s_lrlge/b.nr"),
        ("long_run_high_gray_level_emphasis", "b.s_lrhge/b.nr"),
        ("short_run_mid_gray_level_emphasis", "b.s_srmge/b.nr"),
        ("long_run_mid_gray_level_emphasis", "b.s_lrmge/b.nr"),
        ("short_run_extreme_gray_level_emphasis", "b.s_srege/b.nr"),
        ("long_run_extreme_gray_level_emphasis", "b.s_lrege/b.nr"),
        ("run_percentage", "b.nr/length(dd.text)"),
        ("run_length_mean", "b.s_l/b.nr"),
        ("run_length_variance",
         "b.s_l2/b.nr - (b.s_l/b.nr)*(b.s_l/b.nr)"),
    ]
    selects = ", ".join("%s AS rl_%s" % (_sql_r6(expr), name)
                        for name, expr in pairs)
    return """WITH r0 AS ({unions}),
cells AS (SELECT doc_id, g, l, count(*) AS c FROM r0 GROUP BY 1,2,3),
base AS (SELECT doc_id, {sums} FROM cells GROUP BY doc_id),
gt AS (SELECT doc_id, sum(cnt*cnt) AS s FROM
  (SELECT doc_id, g, CAST(sum(c) AS DOUBLE) AS cnt FROM cells GROUP BY 1,2)
  GROUP BY doc_id),
rt AS (SELECT doc_id, sum(cnt*cnt) AS s FROM
  (SELECT doc_id, l, CAST(sum(c) AS DOUBLE) AS cnt FROM cells GROUP BY 1,2)
  GROUP BY doc_id)
SELECT dd.doc_id, {selects}
FROM {t} dd LEFT JOIN base b USING(doc_id)
LEFT JOIN gt USING(doc_id) LEFT JOIN rt USING(doc_id)""".format(
        unions=unions, sums=base_sums, selects=selects, t=table)


def spectrum_sql(table: str = "documents") -> str:
    lag_cols = []
    for lag in SPEC_LAGS:
        cov = ("list_sum(list_transform(range(1, n-{l}+1), "
               "i -> (x[i]-m)*(x[i+{l}]-m))) / (n-{l})").format(l=lag)
        lag_cols.append(
            "CASE WHEN n-{l} < 1 THEN NULL ELSE {r} END "
            "AS spec_lag{l}_cov".format(l=lag, r=_sql_r6(cov)))
        lag_cols.append(
            "CASE WHEN n-{l} < 1 OR list_min(x) = list_max(x) THEN NULL "
            "ELSE {r} END AS spec_lag{l}_corr"
            .format(l=lag, r=_sql_r6("(%s) / var" % cov)))
    return """WITH tokx AS (SELECT doc_id, {tokx} AS x FROM {t}),
st AS (SELECT doc_id, x, len(x) AS n, CAST(list_sum(x) AS DOUBLE)/len(x) AS m
       FROM tokx WHERE len(x) > 0),
v AS (SELECT doc_id, x, n, m,
      list_sum(list_transform(x, e -> (e-m)*(e-m)))/n AS var FROM st)
SELECT dd.doc_id, {var} AS spec_var, {lags}
FROM {t} dd LEFT JOIN v USING(doc_id)""".format(
        tokx=_TOKX, t=table, var=_sql_r6("v.var"),
        lags=", ".join(lag_cols))


# ===========================================================================
# slow per-document oracles (unit tests only)
# ===========================================================================

def slow_cooc_row(text: str) -> dict[str, float]:
    toks = [t for t in re.split(WS_CLASS + "+",
                                text.strip(" \t\n\r\f")) if t != ""]
    lens = [len(t) for t in toks]
    out: dict[str, float] = {}
    for q in COOC_QUANTS:
        cls = [min(x, q) - 1 for x in lens]
        for d in COOC_DISTS:
            pairs = [(cls[i], cls[i + d])
                     for i in range(len(cls) - d)] if len(cls) > d else []
            cells: dict[tuple[int, int], float] = {}
            for a, b in pairs:
                cells[(a, b)] = cells.get((a, b), 0) + 1
                cells[(b, a)] = cells.get((b, a), 0) + 1
            tot = sum(cells.values())
            pre = "cooc_%%s_d%d_q%d" % (d, q)
            if tot == 0:
                for s in COOC_STATS:
                    out[pre % s] = np.nan
                continue
            p = {k: v / tot for k, v in cells.items()}
            out[pre % "contrast"] = sum(
                pv * (a - b) ** 2 for (a, b), pv in p.items())
            out[pre % "dissimilarity"] = sum(
                pv * abs(a - b) for (a, b), pv in p.items())
            out[pre % "inverse_difference_moment"] = sum(
                pv / (1 + (a - b) ** 2) for (a, b), pv in p.items())
            out[pre % "angular_second_moment"] = sum(
                pv * pv for pv in p.values())
            out[pre % "entropy"] = -sum(
                pv * np.log2(pv) for pv in p.values())
            out[pre % "max_prob"] = max(p.values())
            out[pre % "sum_average"] = sum(
                pv * (a + b) for (a, b), pv in p.items())
            classes = {a for a, _ in p}
            if len(classes) <= 1:
                out[pre % "correlation"] = np.nan
            else:
                mu = sum(pv * a for (a, b), pv in p.items())
                s2 = sum(pv * a * a for (a, b), pv in p.items()) - mu * mu
                cv = sum(pv * a * b for (a, b), pv in p.items()) - mu * mu
                out[pre % "correlation"] = cv / s2
    return {k: (float(r6(v)) if np.isfinite(v) else v)
            for k, v in out.items()}


def slow_runlen_row(text: str) -> dict[str, float]:
    runs: list[tuple[int, int]] = []
    for g, rx in _RL_RES:
        runs.extend((g, min(len(r), RL_MAXLEN)) for r in rx.findall(text))
    out: dict[str, float] = {}
    nr = len(runs)
    if nr == 0:
        return {"rl_" + s: np.nan for s in RL_STATS}
    c = RL_CENTER

    def s(f):
        return sum(f(g, l) for g, l in runs)

    gcnt: dict[int, int] = {}
    lcnt: dict[int, int] = {}
    for g, l in runs:
        gcnt[g] = gcnt.get(g, 0) + 1
        lcnt[l] = lcnt.get(l, 0) + 1
    mean_l = s(lambda g, l: l) / nr
    vals = {
        "short_run_emphasis": s(lambda g, l: 1 / l ** 2) / nr,
        "long_run_emphasis": s(lambda g, l: l ** 2) / nr,
        "gray_level_nonuniformity": sum(v * v for v in gcnt.values()) / nr,
        "run_length_nonuniformity": sum(v * v for v in lcnt.values()) / nr,
        "low_gray_level_run_emphasis": s(lambda g, l: 1 / g ** 2) / nr,
        "high_gray_level_run_emphasis": s(lambda g, l: g ** 2) / nr,
        "short_run_low_gray_level_emphasis":
            s(lambda g, l: 1 / (g * g * l * l)) / nr,
        "short_run_high_gray_level_emphasis":
            s(lambda g, l: g * g / (l * l)) / nr,
        "long_run_low_gray_level_emphasis":
            s(lambda g, l: l * l / (g * g)) / nr,
        "long_run_high_gray_level_emphasis":
            s(lambda g, l: g * g * l * l) / nr,
        "short_run_mid_gray_level_emphasis":
            s(lambda g, l: 1 / ((1 + (g - c) ** 2) * l * l)) / nr,
        "long_run_mid_gray_level_emphasis":
            s(lambda g, l: l * l / (1 + (g - c) ** 2)) / nr,
        "short_run_extreme_gray_level_emphasis":
            s(lambda g, l: (g - c) ** 2 / (l * l)) / nr,
        "long_run_extreme_gray_level_emphasis":
            s(lambda g, l: (g - c) ** 2 * l * l) / nr,
        "run_percentage": nr / len(text),
        "run_length_mean": mean_l,
        "run_length_variance": s(lambda g, l: l * l) / nr - mean_l ** 2,
    }
    return {"rl_" + k: float(r6(v)) for k, v in vals.items()}


def slow_spectrum_row(text: str) -> dict[str, float]:
    toks = [t for t in re.split(WS_CLASS + "+",
                                text.strip(" \t\n\r\f")) if t != ""]
    x = np.asarray([len(t) for t in toks], np.float64)
    n = len(x)
    out: dict[str, float] = {}
    if n == 0:
        out["spec_var"] = np.nan
        for lag in SPEC_LAGS:
            out["spec_lag%d_cov" % lag] = np.nan
            out["spec_lag%d_corr" % lag] = np.nan
        return out
    m = x.mean()
    var = ((x - m) ** 2).mean()
    out["spec_var"] = float(r6(var))
    for lag in SPEC_LAGS:
        if n - lag < 1:
            out["spec_lag%d_cov" % lag] = np.nan
            out["spec_lag%d_corr" % lag] = np.nan
            continue
        cov = ((x[:-lag] - m) * (x[lag:] - m)).sum() / (n - lag)
        out["spec_lag%d_cov" % lag] = r6(cov)
        out["spec_lag%d_corr" % lag] = (
            np.nan if x.min() == x.max() else float(r6(cov / var)))
    return out
