# round-5 session-5 additions, batch 64: Kish effective sample size
# of the raking weights, the 80% user-concentration census, and the
# caliper match feasibility audit.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map
from .q81_session5_additions_19 import ipf_raking

_UC_PCT = 80
_MF_CALIPER = 2


@register("kish_neff", sql="""
    WITH cell AS (SELECT source, lang,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents GROUP BY 1, 2),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(DISTINCT source) AS BIGINT) AS nr,
                 CAST(count(DISTINCT lang) AS BIGINT) AS nc
          FROM cell),
    w0 AS (SELECT source, lang, CAST(c * 1000000 AS BIGINT) AS w
           FROM cell),
    r1 AS (SELECT w0.source, w0.lang,
                  CAST(floor(CAST(w0.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nr FROM t) AS DOUBLE))
                       / (CAST(rs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM w0 JOIN (SELECT source,
                                CAST(sum(w) AS BIGINT) AS s
                         FROM w0 GROUP BY source) rs
                ON rs.source = w0.source),
    c1 AS (SELECT r1.source, r1.lang,
                  CAST(floor(CAST(r1.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nc FROM t) AS DOUBLE))
                       / (CAST(cs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM r1 JOIN (SELECT lang, CAST(sum(w) AS BIGINT) AS s
                         FROM r1 GROUP BY lang) cs
                ON cs.lang = r1.lang),
    r2 AS (SELECT c1.source, c1.lang,
                  CAST(floor(CAST(c1.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nr FROM t) AS DOUBLE))
                       / (CAST(rs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM c1 JOIN (SELECT source,
                                CAST(sum(w) AS BIGINT) AS s
                         FROM c1 GROUP BY source) rs
                ON rs.source = c1.source),
    c2 AS (SELECT r2.source, r2.lang,
                  CAST(floor(CAST(r2.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nc FROM t) AS DOUBLE))
                       / (CAST(cs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM r2 JOIN (SELECT lang, CAST(sum(w) AS BIGINT) AS s
                         FROM r2 GROUP BY lang) cs
                ON cs.lang = r2.lang),
    k AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(w) AS HUGEINT) AS sw,
                 CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT)
                   AS sw2
          FROM c2)
    SELECT n_cells,
           CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sw2 AS DOUBLE) AS kish_neff,
           (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
            / CAST(sw2 AS DOUBLE))
           / CAST(n_cells AS DOUBLE) AS efficiency
    FROM k""")
def kish_neff(sf_dir: str):
    """KISH EFFECTIVE SAMPLE SIZE of the ipf_raking weights:
    neff = (sum w)^2 / sum w^2 over the raked source x lang grid —
    the survey-statistics price tag of calibration (weights that
    vary cost effective sample; efficiency = neff/cells), the
    missing second half of ipf_raking (which balances margins but
    never reports what the reweighting COSTS). The weights are
    recomputed by the SAME two raking cycles (micro ints,
    identical on both engines); the Kish moments fold as exact big
    ints and both outputs are shared float expressions. Scale
    plan: the bounded grid; sweeps and moments are driver grid
    arithmetic."""
    w = ipf_raking(sf_dir)
    wm = w["weight_micro"].to_numpy(np.int64)
    n_cells = len(w)
    sw = sum(int(x) for x in wm)
    sw2 = sum(int(x) * int(x) for x in wm)
    neff = np.float64(sw) * np.float64(sw) / np.float64(sw2)
    return pd.DataFrame({
        "n_cells": [np.int64(n_cells)],
        "kish_neff": [np.float64(neff)],
        "efficiency": [neff / np.float64(n_cells)]})


@register("user_concentration", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS k FROM u),
    r AS (SELECT n,
                 CAST(sum(n) OVER (ORDER BY n DESC, user_id)
                      AS HUGEINT) AS cum,
                 row_number() OVER (ORDER BY n DESC, user_id)
                   AS i
          FROM u),
    q AS (SELECT CAST(min(i) AS BIGINT) AS k80 FROM r
          WHERE cum * 100 >= (SELECT tot FROM t) * {p})
    SELECT (SELECT k FROM t) AS n_users,
           (SELECT tot FROM t) AS n_events,
           (SELECT k80 FROM q) AS users_for_{p}pct,
           CAST((SELECT k80 FROM q) AS DOUBLE)
             / CAST((SELECT k FROM t) AS DOUBLE)
             AS user_share""".format(p=_UC_PCT))
def user_concentration(sf_dir: str):
    """USER CONCENTRATION: the minimum number of users (heaviest
    first, user_id tie-break) whose events cover {p}% of all
    traffic — the 'how few accounts could take the platform down /
    skew every metric' number, sharper than gini-style indexes for
    ops decisions because it IS a headcount. The threshold test is
    the exact integer cross-multiplication cum*100 >= tot*{p} on
    exact prefix sums. Scale plan: per-user counts through one
    user exchange; the ranked prefix is the two-phase rank
    exchange at fleet scale (here the guarded driver merge)."""
    ds = _events(sf_dir, ["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["n"])
    u = u.sort_values(["n", "user_id"], ascending=[False, True],
                      kind="mergesort").reset_index(drop=True)
    n = u["n"].to_numpy(np.int64)
    tot = int(n.sum())
    k = len(u)
    cum = np.cumsum(n)
    k80 = int(np.argmax(cum * 100 >= tot * _UC_PCT)) + 1
    return pd.DataFrame({
        "n_users": [np.int64(k)], "n_events": [np.int64(tot)],
        "users_for_%dpct" % _UC_PCT: [np.int64(k80)],
        "user_share": [np.float64(k80) / np.float64(k)]})


@register("match_feasibility", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS pc
               FROM events GROUP BY user_id),
    h AS (SELECT arm, pc, CAST(count(*) AS BIGINT) AS c
          FROM u GROUP BY arm, pc),
    t1 AS (SELECT pc, c FROM h WHERE arm = 1),
    ok AS (SELECT t1.pc, t1.c,
                  CAST(CASE WHEN EXISTS (
                       SELECT 1 FROM h h0
                       WHERE h0.arm = 0
                         AND h0.pc BETWEEN t1.pc - {c}
                                       AND t1.pc + {c})
                       THEN 1 ELSE 0 END AS BIGINT) AS matched
           FROM t1)
    SELECT CAST((SELECT sum(c) FROM t1) AS BIGINT)
             AS n_treatment,
           CAST(sum(c * matched) AS BIGINT) AS n_matchable,
           CAST(sum(c * matched) AS DOUBLE)
             / CAST((SELECT sum(c) FROM t1) AS DOUBLE)
             AS match_rate
    FROM ok""".format(c=_MF_CALIPER))
def match_feasibility(sf_dir: str):
    """CALIPER MATCH FEASIBILITY audit: the share of treatment
    (odd-parity) users for whom at least one control user exists
    within +-{c} purchases — the pre-flight check every matching
    estimator needs BEFORE matching (a low rate means common
    support fails and smd_balance's covariate gaps cannot be
    matched away). Built entirely on the bounded per-arm
    purchase-count histograms: existence within the caliper is an
    integer window test, censuses are exact integer folds, one
    final rate divides. Scale plan: per-user counts through one
    user exchange into bounded arm histograms; the caliper scan
    is O(domain) driver work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["pc"].sum()
        arm = (a["user_id"].to_numpy(np.int64) % 2) \
            .astype(np.int64)
        out = pd.DataFrame({"arm": arm,
                            "pc": a["pc"].to_numpy(np.int64),
                            "c": np.ones(len(a), np.int64)}) \
            .groupby(["arm", "pc"], as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["arm", "pc"], ["c"])
    ctrl = set(int(r["pc"]) for _, r in
               h[h["arm"] == 0].iterrows())
    t1 = h[h["arm"] == 1]
    ntr = int(t1["c"].sum())
    matched = 0
    for _, r in t1.iterrows():
        pc, c = int(r["pc"]), int(r["c"])
        if any((pc + d) in ctrl
               for d in range(-_MF_CALIPER, _MF_CALIPER + 1)):
            matched += c
    return pd.DataFrame({
        "n_treatment": [np.int64(ntr)],
        "n_matchable": [np.int64(matched)],
        "match_rate": [np.float64(matched) / np.float64(ntr)]})
