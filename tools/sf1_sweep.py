"""Run EVERY registered query against the 10x replicated
sf1-equivalent input (stress.py --build) and record per-query wall
time + rows + any guard trip / failure. The point is coverage, not
timing precision: one pass proves that no registered pipeline
materializes, broadcasts, or driver-combines something that stops
fitting one order of magnitude up.

Usage: python tools/sf1_sweep.py [name ...]   (default: all)
Writes SF1_SWEEP.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF1 = "/tmp/nfx_stress/sf1"
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

import pandas as pd  # noqa: E402
import ray  # noqa: E402

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR")
import __ray_entry__ as entry  # noqa: E402

#: the five quadratic exact-Jaccard oracle twins are excluded exactly
#: as in bench.py: their all-pair verification tier is quadratic in
#: near-dup cluster size BY DESIGN (they exist to oracle the LSH scale
#: path, which IS swept via minhash_pairs / near_dedup_keep*)
EXCLUDE = {"jaccard_pairs", "dedup_clusters", "containment_pairs",
           "dup_cluster_hist", "dedup_survivor"}

qs = entry.queries()
names = sys.argv[1:] or [n for n in qs if n not in EXCLUDE]
out: dict = {}
path = os.path.join(REPO, "SF1_SWEEP.json")
if os.path.exists(path):          # resume a interrupted sweep
    out = json.load(open(path))
for i, name in enumerate(names):
    if name in out and "error" not in out[name]:
        continue
    t0 = time.time()
    rec: dict = {}
    try:
        res = qs[name](SF1)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        rec["rows"] = len(res)
    except Exception as ex:
        rec["error"] = "%s: %s" % (type(ex).__name__, str(ex)[:300])
    rec["sec"] = round(time.time() - t0, 2)
    out[name] = rec
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[{i + 1}/{len(names)}] {name}: "
          f"{rec.get('rows', rec.get('error'))} {rec['sec']}s",
          flush=True)
errs = {n: r["error"] for n, r in out.items() if "error" in r}
print(json.dumps({"n": len(out), "errors": errs}, indent=1))
ray.shutdown()
