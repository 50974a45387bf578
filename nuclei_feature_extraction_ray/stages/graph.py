"""Distributed connected components over a pair/edge list — the step
that turns near-duplicate PAIRS into a dedup DECISION (cluster id +
one representative per component). No analog in the reference (its
nearest-centroid step is a per-patch spatial lookup, src/utils.rs);
this is the standard training-data "dedup clustering" pass that runs
after MinHash/Jaccard/embedding pair generation.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node adopts the minimum label among
itself and its neighbors; converged when no label changes. Labels and
edges only ever move through hash exchanges keyed on node id — no
driver-side graph, no broadcast of anything node-sized.

Scale shape per round: TWO keyed exchanges over edge-sized data
(labels->edges co-partition to emit messages, then messages->labels
co-partition to fold the min), each via ``partition_map``. Rounds =
graph diameter; near-dup components are overwhelmingly tiny cliques
(diameter 1-2), so 3-4 rounds in practice. For adversarial long-chain
graphs the documented upgrade is the large-star/small-star rewrite
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log n) rounds with the SAME two-
exchange round shape — the propagation loop below is the shared
skeleton. ``max_rounds`` is a loud guard, not a silent truncation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .partition import partition_map

#: tags for the union'd co-partition frames
_T_LABEL, _T_EDGE, _T_MSG = 0, 1, 2


def _frame(key, val, tag) -> pd.DataFrame:
    return pd.DataFrame({
        "key": np.asarray(key, np.int64),
        "val": np.asarray(val, np.int64),
        "tag": np.full(len(key), tag, np.int64)})


def _union_find(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Vectorized-ish union-find with path halving over an edge list
    that FITS (guarded by the caller). Returns (node, label) with
    label = min node id of the component."""
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]    # path halving
            i = parent[i]
        return i

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            # union by smaller NODE id so the root IS the min id
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.asarray([find(i) for i in range(len(nodes))])
    return pd.DataFrame({"node": nodes.astype(np.int64),
                         "label": nodes[roots].astype(np.int64)})


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b",
                         num_partitions: int = 8,
                         max_rounds: int = 64,
                         max_driver_edges: int = 5_000_000):
    """``edges_ds``: Dataset with two int64 node columns. Returns a
    MATERIALIZED Dataset ``(node, label)`` covering every node that
    appears in an edge, ``label`` = min node id of its component.
    Deterministic and retry-idempotent (min is idempotent).

    Two tiers, same results (asserted equal in pytest):
    * edge count <= ``max_driver_edges``: near-dup pair lists are tiny
      relative to the corpus, so a driver union-find (guarded, like
      every driver combine in this repo) beats paying the per-round
      exchange overhead;
    * above the guard: the distributed min-label propagation loop —
      nothing edge- or node-sized ever sits on the driver."""

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        a = b[a_col].to_numpy(np.int64)
        d = b[b_col].to_numpy(np.int64)
        return _frame(np.concatenate([a, d]), np.concatenate([d, a]),
                      _T_EDGE)

    # Both orientations, materialized ONCE — re-streamed every round.
    edges = edges_ds.map_batches(
        undirect, batch_format="pandas").materialize()

    n_edges = edges.count() // 2
    if n_edges <= max_driver_edges:
        pairs = edges.to_pandas()            # guarded: fits by the tier test
        half = pairs[pairs["key"] < pairs["val"]]
        labels = _union_find(half["key"].to_numpy(np.int64),
                             half["val"].to_numpy(np.int64))
        import ray.data as rd
        return rd.from_pandas(labels).materialize()

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["key"].to_numpy(np.int64))
        return _frame(nodes, nodes, _T_LABEL)

    labels = partition_map(edges, ["key"], init_labels,
                           num_partitions).materialize()

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["tag"] == _T_LABEL]
        ed = g[g["tag"] == _T_EDGE]
        if not len(ed):
            return _frame([], [], _T_MSG)
        m = ed.merge(lab[["key", "val"]].rename(columns={"val": "lbl"}),
                     on="key")
        return _frame(m["val"].to_numpy(np.int64),
                      m["lbl"].to_numpy(np.int64), _T_MSG)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("key", as_index=False)["val"].min()
        old = g[g["tag"] == _T_LABEL][["key", "val"]] \
            .rename(columns={"val": "old"})
        m = new.merge(old, on="key")     # every node has a label row
        m["changed"] = (m["val"] < m["old"]).astype(np.int64)
        return m[["key", "val", "changed"]]

    for _ in range(max_rounds):
        msgs = partition_map(labels.union(edges), ["key"], send,
                             num_partitions)
        upd = partition_map(labels.union(msgs), ["key"], fold,
                            num_partitions).materialize()
        changed = upd.sum("changed")
        labels = upd.map_batches(
            lambda b: _frame(b["key"], b["val"], _T_LABEL),
            batch_format="pandas").materialize()
        if not changed:
            break
    else:
        raise RuntimeError(
            "connected_components: no convergence in %d rounds — "
            "pathological chain graph; use the large-star/small-star "
            "variant (docstring)" % max_rounds)

    def out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": b["key"].to_numpy(np.int64),
            "label": b["val"].to_numpy(np.int64)})

    return labels.map_batches(out, batch_format="pandas").materialize()


def attach_clusters(ids_ds, cc_ds, id_col: str,
                    num_partitions: int = 8):
    """Left-join the CC labels back onto the full id set: ids absent
    from every edge become their own singleton cluster. One keyed
    exchange (union + co-partition); nothing node-sized touches the
    driver. Returns ``(id_col, cluster, is_rep)``."""

    def tag_ids(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        return _frame(ids, ids, _T_LABEL)

    def tag_cc(b: pd.DataFrame) -> pd.DataFrame:
        return _frame(b["node"].to_numpy(np.int64),
                      b["label"].to_numpy(np.int64), _T_MSG)

    both = ids_ds.map_batches(tag_ids, batch_format="pandas").union(
        cc_ds.map_batches(tag_cc, batch_format="pandas"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[g["tag"] == _T_LABEL][["key"]]
        cc = g[g["tag"] == _T_MSG][["key", "val"]] \
            .rename(columns={"val": "cluster"})
        m = ids.merge(cc, on="key", how="left")
        cl = m["cluster"].fillna(m["key"]).astype(np.int64)
        return pd.DataFrame({
            id_col: m["key"].to_numpy(np.int64),
            "cluster": cl,
            "is_rep": (cl == m["key"]).astype(np.int64)})

    return partition_map(both, ["key"], resolve, num_partitions)
