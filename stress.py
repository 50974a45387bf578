"""Scale-stress harness: run the flagship and the most expensive
registered queries at sf0.1 AND a 10x replicated "sf1-equivalent"
input (plus the flagship at 600k and 2M pages), recording wall time,
peak memory, and object-store spill — the evidence that the engine's
"scale-safe by design" claims hold one order of magnitude up
(VERDICT r4, next-round item 1).

Usage:
  python stress.py --build          # materialize /tmp/nfx_stress/sf1
  python stress.py --run           # full matrix -> SCALE_STRESS.json
  python stress.py --one NAME DIR  # internal: one query, one scale

The sf1 build replicates every fact table 10x with per-replica key
offsets (orderkey/custkey/partkey/suppkey/user/doc ids), preserving
referential integrity inside each replica; dimension tables
(nation/region) are shared, exactly like TPC-H scaling. Document text
gets a per-replica marker token spliced every 4 words so replicas are
NOT near-duplicates of each other — dedup workloads grow linearly
instead of quadratically, which is the honest 10x-corpus model.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading
import time

SRC = "/root/testdata/sf0.1"
DST = "/tmp/nfx_stress/sf1"
REPS = 10
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: the 10 most expensive benched queries (VERDICT r4) — the stress set
QUERIES = ["basket_lift", "rfm_segments", "dup_spans",
           "dup_spans_apply", "near_dedup_keep", "triangle_count",
           "corpus_curation", "decile_lift", "dsir_weights",
           "q7_trade_flow"]

#: per-table int key columns that get a +i*K replica offset
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY = ["nation", "region", "embeddings"]


def build() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    if os.path.isdir(DST):
        print("exists:", DST)
        return
    tmp = DST + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    for t in COPY:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{tmp}/{t}.parquet")
    for t, keys in OFFSETS.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        os.makedirs(f"{tmp}/{t}.parquet", exist_ok=True)
        bases = {k: int(pa.compute.max(src[k]).as_py()) + 1
                 for k in keys}
        texts = (src["text"].to_pylist() if t == "documents" else None)
        for i in range(REPS):
            cols = {}
            for name in src.column_names:
                col = src[name]
                if name in keys and i > 0:
                    arr = col.to_numpy(zero_copy_only=False)
                    col = pa.chunked_array([pa.array(
                        arr + np.int64(i) * bases[name],
                        type=src.schema.field(name).type)])
                elif t == "documents" and name == "text" and i > 0:
                    # splice a replica marker token every 4 words so
                    # replicas are not near-duplicates of each other
                    mark = f"zq{i}z"
                    out = []
                    for s in texts:
                        if not isinstance(s, str):
                            out.append(s)
                            continue
                        w = s.split(" ")
                        out.append(" ".join(
                            x if j % 4 or not j else f"{mark} {x}"
                            for j, x in enumerate(w)))
                    col = pa.chunked_array([pa.array(out, pa.string())])
                cols[name] = col
            pq.write_table(pa.table(cols),
                           f"{tmp}/{t}.parquet/part-{i:02d}.parquet")
    os.rename(tmp, DST)
    print("built:", DST)


class Watcher(threading.Thread):
    """Samples system memory-in-use and Ray spill-dir bytes."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.base_used = self._used()
        self.peak_used = 0
        self.peak_spill = 0

    @staticmethod
    def _used() -> int:
        info = {}
        with open("/proc/meminfo") as f:
            for ln in f:
                k, v = ln.split(":", 1)
                info[k] = int(v.split()[0]) * 1024
        return info["MemTotal"] - info["MemAvailable"]

    @staticmethod
    def _spill() -> int:
        tot = 0
        for d in glob.glob("/tmp/ray/session_*/**/*spill*",
                           recursive=True):
            if os.path.isdir(d):
                for root, _, files in os.walk(d):
                    for fn in files:
                        try:
                            tot += os.path.getsize(
                                os.path.join(root, fn))
                        except OSError:
                            pass
        return tot

    def run(self):
        while not self.stop.is_set():
            self.peak_used = max(self.peak_used,
                                 self._used() - self.base_used)
            self.peak_spill = max(self.peak_spill, self._spill())
            self.stop.wait(0.5)


def run_one(name: str, sf_dir: str) -> None:
    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry
    import pandas as pd
    t0 = time.time()
    res = entry.queries()[name](sf_dir)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    print(json.dumps({"sec": round(time.time() - t0, 2),
                      "rows": len(res)}))
    ray.shutdown()


def _sub(cmd: list[str], env: dict | None = None) -> dict:
    w = Watcher()
    w.start()
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       env={**os.environ, **(env or {})})
    wall = time.time() - t0
    w.stop.set()
    w.join()
    rec = {"wall_sec": round(wall, 2),
           "peak_mem_gb": round(w.peak_used / 2**30, 2),
           "spill_gb": round(w.peak_spill / 2**30, 2)}
    if p.returncode != 0:
        rec["error"] = (p.stderr or p.stdout)[-400:]
    else:
        try:
            rec.update(json.loads(p.stdout.strip().splitlines()[-1]))
        except (ValueError, IndexError):
            rec["error"] = "unparsed: " + p.stdout[-200:]
    return rec


def run_matrix() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    out: dict = {"ncpu": NCPU, "reps": REPS, "queries": {}}
    for scale, label in ((os.environ.get("STRESS_FLAGSHIP_LO",
                                         "scaling"), "600k"),
                         (os.environ.get("STRESS_FLAGSHIP_HI",
                                         "2000000"), "2M")):
        print(f"flagship @{label} ...", flush=True)
        out[f"flagship_{label}"] = _sub(
            [sys.executable, os.path.join(here, "bench.py")],
            {"BENCH_HEADLINE_ONLY": "1", "BENCH_SCALE": scale,
             "RAY_GRAFT_CPUS": str(NCPU)})
        print(" ", out[f"flagship_{label}"], flush=True)
    for name in QUERIES:
        rec = {}
        for sf_dir, label in ((SRC, "sf0.1"), (DST, "sf1")):
            print(f"{name} @{label} ...", flush=True)
            rec[label] = _sub([sys.executable,
                               os.path.join(here, "stress.py"),
                               "--one", name, sf_dir])
            print(" ", rec[label], flush=True)
        lo = rec["sf0.1"].get("sec")
        hi = rec["sf1"].get("sec")
        if lo and hi:
            rec["ratio_vs_linear"] = round(hi / (REPS * lo), 3)
        out["queries"][name] = rec
    with open(os.path.join(here, "SCALE_STRESS.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "queries"}, indent=1))


if __name__ == "__main__":
    if "--build" in sys.argv:
        build()
    elif "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 1], sys.argv[i + 2])
    else:
        build()
        run_matrix()
