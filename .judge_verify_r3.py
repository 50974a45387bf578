"""Judge round-3: driver-style oracle check for queries NOT covered by
CORRECTNESS_r03.json (the driver capped at 50 entries)."""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True)

import __ray_entry__ as e

SF = "/root/testdata/sf0.01"
qs = e.queries()
oracles = e.oracle_sql()
done = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
todo = [n for n in qs if n not in done]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

out = {}
for n in todo:
    t0 = time.time()
    rec = {}
    try:
        res = qs[n](SF)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        rec["rows"] = len(res)
        if n in oracles and oracles[n]:
            ora = con.execute(oracles[n]).df()
            a, b = norm(res), norm(ora)
            rec["schema_match"] = list(a.columns) == list(b.columns) and all(
                str(a[c].dtype) == str(b[c].dtype) for c in a.columns)
            rec["rows_match"] = len(a) == len(b)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=True)
                rec["hash_match"] = True
            except AssertionError as ex:
                rec["hash_match"] = False
                rec["diff"] = str(ex)[:300]
        else:
            rec["err"] = "no_oracle"
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
    rec["sec"] = round(time.time() - t0, 2)
    out[n] = rec
    print(json.dumps({n: rec}), flush=True)

json.dump(out, open("/root/repo/.judge_verify_r3.json", "w"), indent=1)
npass = sum(1 for v in out.values()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
print("DONE_JUDGE total", len(out), "pass", npass,
      "no_oracle", sum(1 for v in out.values() if v.get("err") == "no_oracle"),
      "err", sum(1 for v in out.values() if v.get("err") and v.get("err") != "no_oracle"))
