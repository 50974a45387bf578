# round-5 session-2 additions, batch 20: sorted-neighborhood
# blocking (halo-exchange candidate pairs), MATCH_RECOGNIZE-lite
# event sequence pattern matching, and a keyed snapshot diff (CDC
# derivation between two table versions).
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat
from ._shared import (EVENTS_P, ORACLE, _combine_partials, _events,
                      _path, np, pa, partition_map,
                      partitioned_apply, pc, pd, ray, rd, register)

_SNM_W = 2            # sorted-neighborhood window (rank distance)
_SNM_BLOCK = 64       # ranks per halo block
_PAT = "cv{0,2}p"     # click, view{0,2}, purchase (type initials)


@register("sorted_neighborhood_pairs", sql="""
    WITH r AS (SELECT c_custkey, c_name,
                 row_number() OVER (ORDER BY c_name, c_custkey)
                   AS rn
               FROM customer)
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_gap
    FROM r a JOIN r b
      ON b.rn > a.rn AND b.rn <= a.rn + {w}
    ORDER BY a.rn, b.rn""".format(w=_SNM_W))
def sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood blocking for record linkage: customers
    sorted by name, candidate pairs = every pair within rank
    distance ≤ 2 — the classic SNM alternative to key blocking
    (catches typos that land lexicographic neighbors where hash
    blocks would separate them). Distributed via the two-pass rank
    (systematic_sample's machinery: range histogram → driver offsets
    → per-range local sort) plus a HALO exchange: each row is
    emitted to its own rank block AND to the previous block when it
    sits within w of the block start, so every window pair is
    complete in the block of its FIRST element and no pair is
    emitted twice (the ghost-cell pattern of stencil computations,
    here on ranks). Pair
    volume is n·w — linear, never quadratic."""
    ds = rd.read_parquet(_path(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        # range partial: count per 16-char name prefix range
        # (disjoint, order-consistent; granularity is a tuning knob
        # per name distribution)
        rng = b["c_name"].astype(str).str.slice(0, 16)
        g = pd.DataFrame({"rng": rng.to_numpy(object),
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("rng", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(hist, batch_format="pandas"),
        ["rng"], ["n"]).sort_values("rng")
    offsets = dict(zip(
        h["rng"].to_numpy(object),
        np.concatenate(([0], np.cumsum(h["n"].to_numpy(np.int64))))
        [:-1]))
    off_ref = ray.put(offsets)

    def rank_rows(g: pd.DataFrame) -> pd.DataFrame:
        # whole name ranges per partition: local sort + offset
        off = ray.get(off_ref)
        outs = []
        for rng, sub in g.groupby("rng", sort=True):
            sub = sub.sort_values(["c_name", "c_custkey"],
                                  kind="mergesort")
            rn = np.arange(1, len(sub) + 1, dtype=np.int64) \
                + off[rng]
            outs.append(pd.DataFrame({
                "c_name": sub["c_name"].to_numpy(object),
                "rn": rn}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"c_name": pd.Series(dtype=object),
                          "rn": pd.Series(dtype=np.int64)})

    def add_rng(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["rng"] = out["c_name"].astype(str).str.slice(0, 16)
        return out

    ranked = partition_map(
        ds.map_batches(add_rng, batch_format="pandas"),
        ["rng"], rank_rows, 16)

    def halo(b: pd.DataFrame) -> pd.DataFrame:
        rn = b["rn"].to_numpy(np.int64)
        blk = (rn - 1) // _SNM_BLOCK
        # ghost copy into the PREVIOUS block for the first w rows of
        # each block: a pair (a, b), b-a <= w, forms exactly once, in
        # the block where its FIRST element natively lives
        ghost = (rn - 1) % _SNM_BLOCK < _SNM_W
        own = pd.DataFrame({"c_name": b["c_name"].to_numpy(object),
                            "rn": rn, "blk": blk,
                            "is_ghost": np.zeros(len(b), np.int64)})
        gh = own[ghost & (blk > 0)].copy()
        gh["blk"] = gh["blk"] - 1
        gh["is_ghost"] = 1
        return pd.concat([own, gh], ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby("blk", sort=True):
            sub = sub.sort_values("rn", kind="mergesort")
            rn = sub["rn"].to_numpy(np.int64)
            nm = sub["c_name"].to_numpy(object)
            ghost = sub["is_ghost"].to_numpy(np.int64)
            for d in range(1, _SNM_W + 1):
                if len(rn) <= d:
                    continue
                m = (rn[d:] - rn[:-d] == d) & (ghost[:-d] == 0)
                outs.append(pd.DataFrame({
                    "name_a": nm[:-d][m], "name_b": nm[d:][m],
                    "rank_gap": np.full(int(m.sum()), d, np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"name_a": pd.Series(dtype=object),
                          "name_b": pd.Series(dtype=object),
                          "rank_gap": pd.Series(dtype=np.int64)})

    haloed = ranked.map_batches(halo, batch_format="pandas")
    return partition_map(haloed, ["blk"], pairs, 16) \
        .sort(["name_a", "name_b", "rank_gap"])


@register("event_pattern_match", sql="""
    WITH s AS (SELECT user_id,
                 string_agg(substr(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS seq
               FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, '{p}')) AS BIGINT)
             AS n_matches
    FROM s ORDER BY user_id""".format(p=_PAT))
def event_pattern_match(sf_dir: str):
    """MATCH_RECOGNIZE-lite: per user, the count of non-overlapping
    matches of the behavioral pattern click → (view ×0–2) → purchase
    in strict event order — sequence pattern matching expressed by
    the sequence-as-string trick: encode each user's ordered event
    types as a string of initials (c/v/p/s/e from the 5-type
    vocabulary) and run ONE vectorized RE2 scan per user string.
    Both engines count leftmost non-overlapping matches of the same
    regex, so semantics align by construction. ONE user_id exchange
    builds the strings (C mergesort + groupby join, entity-grain);
    the regex pass is a single Arrow count_substring_regex kernel
    over the user-string column — the whole per-event stream never
    leaves its partition."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id",
                          "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        initials = g["event_type"].astype(str).str.slice(0, 1)
        seq = initials.groupby(uid, sort=True).agg("".join)
        arr = pa.array(seq.to_numpy(object), pa.string())
        cnt = pc.count_substring_regex(arr, _PAT) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({
            "user_id": seq.index.to_numpy(np.int64),
            "n_matches": cnt})

    out = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                            sort_cols=["user_id", "ts", "event_id"])
    return out.sort("user_id")


@register("snapshot_diff", sql="""
    WITH a AS (SELECT event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events
               WHERE ('0x' || substr(md5(
                       CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
                     % 10 <> 0),
    b AS (SELECT event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT)
                 + CASE WHEN event_id % 13 = 0
                        THEN 1 ELSE 0 END AS cents
               FROM events
               WHERE ('0x' || substr(md5(
                       CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
                     % 7 <> 0)
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows FROM (
      SELECT CASE WHEN a.event_id IS NULL THEN 'added'
                  WHEN b.event_id IS NULL THEN 'removed'
                  WHEN a.cents <> b.cents THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
    GROUP BY status ORDER BY status""")
def snapshot_diff(sf_dir: str):
    """Keyed snapshot diff — the CDC derivation between two table
    versions: rows added, removed, changed (same key, different
    payload), unchanged. The two versions are DERIVED
    deterministically from the events table (membership by md5 of
    the key mod 10 / mod 7; version B perturbs every 13th key's
    cents) so the diff is reproducible with no external state; the
    operator itself is the general one: full-outer key alignment +
    payload compare. ONE hash exchange on the key co-locates both
    versions (tagged rows, the fk_audit pattern); each partition
    full-outer-merges locally and emits status count partials —
    integer cents, no driver data beyond statuses × partitions."""
    ds = _events(sf_dir, ["event_id", "value"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        h = md5_upper64_flat(pd.Series(eid).astype(str)
                             .to_numpy(object))
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        in_a = (h % np.uint64(10)) != 0
        in_b = (h % np.uint64(7)) != 0
        a = pd.DataFrame({"event_id": eid[in_a],
                          "cents": cents[in_a],
                          "ver": np.zeros(int(in_a.sum()),
                                          np.int64)})
        bb = pd.DataFrame({
            "event_id": eid[in_b],
            "cents": cents[in_b] + (eid[in_b] % 13 == 0)
            .astype(np.int64),
            "ver": np.ones(int(in_b.sum()), np.int64)})
        return pd.concat([a, bb], ignore_index=True)

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["ver"] == 0]
        b = g[g["ver"] == 1]
        m = a.merge(b, on="event_id", how="outer",
                    suffixes=("_a", "_b"), indicator=True)
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(m["cents_a"] != m["cents_b"],
                              "changed", "unchanged")))
        out = pd.DataFrame({"status": status}) \
            .groupby("status", as_index=False).size()
        return pd.DataFrame({
            "status": out["status"].to_numpy(object),
            "n_rows": out["size"].to_numpy(np.int64)})

    tagged = ds.map_batches(tag, batch_format="pandas")
    p = _combine_partials(
        partition_map(tagged, ["event_id"], diff, EVENTS_P),
        ["status"], ["n_rows"])
    p["n_rows"] = p["n_rows"].astype(np.int64)
    return p.sort_values("status", kind="mergesort") \
        .reset_index(drop=True)
