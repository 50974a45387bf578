"""Driver-style oracle check for named queries (or all with --all)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         ignore_reinit_error=True)

import __ray_entry__ as e

SF = "/root/testdata/sf0.01"
qs = e.queries()
oracles = e.oracle_sql()
names = sys.argv[1:]
if names == ["--all"]:
    names = list(qs)


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

fails = 0
for n in names:
    t0 = time.time()
    try:
        res = qs[n](SF)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        if n in oracles and oracles[n]:
            ora = con.execute(oracles[n]).df()
            a, b = norm(res), norm(ora)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=True)
                print(f"{n}: PASS rows={len(a)} {time.time()-t0:.1f}s")
            except AssertionError as ex:
                fails += 1
                print(f"{n}: FAIL {str(ex)[:300]}")
        else:
            print(f"{n}: rows-only rows={len(res)} {time.time()-t0:.1f}s")
    except Exception as ex:
        fails += 1
        print(f"{n}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
ray.shutdown()
sys.exit(1 if fails else 0)
