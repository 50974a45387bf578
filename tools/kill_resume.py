"""Kill-and-resume durability harness at bench scale (SURVEY §5 item
5 at real scale; VERDICT r4 next-round item 5).

Protocol:
  1. reference run — flagship ``run_checkpointed`` over the 600k-page
     bench corpus to completion (out_ref);
  2. killed run — the same job in a subprocess (its own session);
     the parent polls the checkpoint directory and SIGKILLs the whole
     process group mid-job, while partitions are still committing
     (i.e. mid-shuffle: the url-hash exchange feeds the sink);
  3. resume — re-run the job over out_kill with ``resume=True``;
  4. assert — (a) partitions committed before the kill are NOT
     recomputed (MANIFEST.json mtimes unchanged), (b) the resumed
     output is ROW-IDENTICAL to the reference run (exact frame
     equality after sorting on (url, warc_ts)).

Writes RESUME_STRESS.json next to this repo's other artifacts.

Usage: python tools/kill_resume.py           (orchestrate)
       python tools/kill_resume.py --child OUT_DIR   (internal)
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE = os.environ.get("RESUME_SCALE", "scaling")   # 600k pages
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PARTS = 64
KILL_MIN, KILL_MAX = 8, 40   # kill while 8..40 of 64 parts committed


def _run_flagship(out_dir: str, resume: bool) -> None:
    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from nuclei_feature_extraction_ray.corpus import corpus_dir
    from nuclei_feature_extraction_ray.pipelines.pages_features \
        import run_checkpointed
    pages = rd.read_parquet(
        os.path.join(corpus_dir(SCALE), "pages"),
        columns=["url", "warc_ts", "html", "lang"])
    run_checkpointed(pages, out_dir, num_partitions=PARTS,
                     resume=resume).materialize()
    ray.shutdown()


def main() -> None:
    from nuclei_feature_extraction_ray.corpus import corpus_dir
    from nuclei_feature_extraction_ray.state.manifest import (
        committed_parts, read_output)
    corpus_dir(SCALE)   # generate/cache outside all timers
    root = "/tmp/nfx_resume"
    out_ref = os.path.join(root, "ref")
    out_kill = os.path.join(root, "kill")
    for d in (out_ref, out_kill):
        subprocess.run(["rm", "-rf", d], check=True)
        os.makedirs(d)

    rec: dict = {"scale": SCALE, "ncpu": NCPU, "partitions": PARTS}

    t0 = time.time()
    _run_flagship(out_ref, resume=False)
    rec["ref_sec"] = round(time.time() - t0, 1)
    rec["ref_parts"] = len(committed_parts(out_ref))

    # killed run in its own process group
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         out_kill],
        start_new_session=True, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    killed_at = None
    while child.poll() is None:
        n = len(committed_parts(out_kill))
        if KILL_MIN <= n <= KILL_MAX:
            os.killpg(child.pid, signal.SIGKILL)
            killed_at = n
            break
        time.sleep(0.05)
    child.wait()
    if killed_at is None:
        rec["error"] = ("job finished before the kill window — "
                        f"{len(committed_parts(out_kill))} parts")
        _write(rec)
        sys.exit(1)
    time.sleep(2.0)   # let the raylet notice the driver died
    survivors = sorted(committed_parts(out_kill))
    rec["killed_at_parts"] = killed_at
    rec["survivor_parts"] = len(survivors)
    mtimes = {p: os.path.getmtime(os.path.join(
        out_kill, "part=%05d" % p, "MANIFEST.json"))
        for p in survivors}

    t0 = time.time()
    _run_flagship(out_kill, resume=True)
    rec["resume_sec"] = round(time.time() - t0, 1)
    rec["resume_parts"] = len(committed_parts(out_kill))

    recomputed = [p for p in survivors if os.path.getmtime(
        os.path.join(out_kill, "part=%05d" % p,
                     "MANIFEST.json")) != mtimes[p]]
    rec["recomputed_committed_parts"] = recomputed

    # byte-identical output check
    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    a = read_output(out_ref).to_pandas()
    b = read_output(out_kill).to_pandas()
    ray.shutdown()
    b = b[a.columns]
    key = list(a.columns)   # full-row sort: tolerates duplicate keys
    a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                      check_exact=True)
        rec["output_identical"] = True
    except AssertionError as ex:
        rec["output_identical"] = False
        rec["diff"] = str(ex)[:400]
    rec["rows"] = len(a)
    rec["pass"] = (rec["output_identical"] and not recomputed
                   and rec["resume_parts"] == rec["ref_parts"])
    _write(rec)
    print(json.dumps(rec, indent=1))
    sys.exit(0 if rec["pass"] else 1)


def _write(rec: dict) -> None:
    with open(os.path.join(REPO, "RESUME_STRESS.json"), "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        _run_flagship(sys.argv[sys.argv.index("--child") + 1],
                      resume=False)
    else:
        main()
