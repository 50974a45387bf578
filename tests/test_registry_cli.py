"""Feature-family registry, alias expansion, CLI, sinks, salting."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nuclei_feature_extraction_ray.config import (ALIASES, FAMILIES,
                                                  expand_families,
                                                  feature_schema)
from nuclei_feature_extraction_ray.corpus import corpus_dir, generate_pages
from nuclei_feature_extraction_ray.pipelines.pages_features import (
    FEATURE_COLUMNS, compute_features)
from nuclei_feature_extraction_ray.sources.io import (check_output,
                                                      read_table,
                                                      write_table)


def test_alias_expansion_and_order():
    assert [f.name for f in expand_families(["all"])] == ALIASES["all"]
    assert [f.name for f in expand_families(["text"])] == [
        "structure", "charclass"]
    # dedup preserving order
    assert [f.name for f in expand_families(["session", "all"])][0] == \
        "session"


def test_unknown_family_is_error():
    with pytest.raises(ValueError, match="unknown feature family"):
        expand_families(["nope"])


def test_all_schema_matches_feature_columns():
    assert feature_schema(["all"]) == FEATURE_COLUMNS


def test_family_subset_pipeline():
    tbl = generate_pages(200)
    ds = rd.from_arrow(tbl.select(["url", "warc_ts", "html", "lang"]))
    out = compute_features(ds, num_partitions=4,
                           families=["text"]).to_pandas()
    assert list(out.columns) == feature_schema(["text"])
    assert "session_id" not in out.columns

    full = compute_features(ds, num_partitions=4).to_pandas()
    a = out.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = full.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_write_read_formats(tmp_path):
    ds = rd.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    for fmt in ("parquet", "csv", "json", "ipc"):
        d = str(tmp_path / fmt)
        write_table(ds, d, fmt)
        assert os.path.isdir(d) and os.listdir(d)
    back = read_table(str(tmp_path / "parquet"))
    assert back.count() == 2
    with pytest.raises(ValueError, match="unsupported output format"):
        write_table(ds, str(tmp_path / "zz"), "orc")


def test_ipc_round_trip(tmp_path):
    # reference's 4th output format (src/main.rs:175-182): feather/ipc
    df = pd.DataFrame({"a": np.arange(50, dtype=np.int64),
                       "b": ["s%d" % i for i in range(50)],
                       "c": np.linspace(0, 1, 50)})
    ds = rd.from_pandas(df)
    d = str(tmp_path / "ipc_rt")
    write_table(ds, d, "feather")
    back = read_table(d, "feather").to_pandas() \
        .sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_combine_partials_guard():
    import ray.data
    from nuclei_feature_extraction_ray.pipelines import queries as q
    small = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a", "b", "a"], "v": [1, 2, 3]}))
    out = q._combine_partials(small, ["k"], ["v"])
    assert out.set_index("k")["v"].to_dict() == {"a": 4, "b": 2}
    big = ray.data.range(q._COMBINE_MAX_ROWS + 10).map_batches(
        lambda b: pd.DataFrame({"k": b["id"], "v": 1}),
        batch_format="pandas")
    with pytest.raises(ValueError, match="cardinality is too high"):
        q._combine_partials(big, ["k"], ["v"])


def test_overwrite_guard(tmp_path):
    p = str(tmp_path / "out")
    os.makedirs(p)
    with pytest.raises(FileExistsError, match="overwrite"):
        check_output(p, overwrite=False)
    check_output(p, overwrite=True)      # removed
    assert not os.path.exists(p)
    check_output(p, overwrite=False)     # now fine


def test_cli_end_to_end(tmp_path):
    d = corpus_dir("t1")
    out = str(tmp_path / "cli_out")
    pout = str(tmp_path / "cli_probes")
    r = subprocess.run(
        [sys.executable, "-m", "nuclei_feature_extraction_ray.cli",
         "--input", os.path.join(d, "pages"),
         "--output", out, "--probes", os.path.join(d, "probes.parquet"),
         "--probe-output", pout, "--partitions", "4",
         "--features", "all", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["partitions"] == 4
    assert summary["rows"] > 0
    assert os.path.isdir(pout)
    # second run without --overwrite/--resume must refuse
    r2 = subprocess.run(
        [sys.executable, "-m", "nuclei_feature_extraction_ray.cli",
         "--input", os.path.join(d, "pages"), "--output", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r2.returncode != 0


def test_salted_partition_splits_hot_keys():
    from nuclei_feature_extraction_ray.stages.partition import (
        PART_COL, salted_partition)
    tbl = pa.table({
        "url": pa.array(["hot"] * 500 + ["cold%d" % i for i in range(100)]),
        "ts": pa.array(np.arange(600, dtype=np.int64)),
    })
    ds = rd.from_arrow(tbl)
    out = salted_partition(ds, "url", num_partitions=8, salt_col="ts",
                           salt_buckets=4, hot_keys={"hot"}).to_pandas()
    hot = out[out["url"] == "hot"]
    cold = out[out["url"] != "hot"]
    # hot key fans out over several sub-partitions, all >= base range
    assert hot[PART_COL].nunique() > 1
    assert (hot[PART_COL] >= 8).all()
    # cold keys keep plain hash partitioning and never collide with
    # salted ids
    assert (cold[PART_COL] < 8).all()
    # deterministic
    out2 = salted_partition(ds, "url", num_partitions=8, salt_col="ts",
                            salt_buckets=4, hot_keys={"hot"}).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["url", "ts"]).reset_index(drop=True),
        out2.sort_values(["url", "ts"]).reset_index(drop=True))


def test_filter_cli_slice(tmp_path):
    """filter-geojson analog (src/filter_geojson.rs:16-67): window
    predicate + rebase, standalone CLI."""
    import pyarrow.parquet as pq
    d = corpus_dir("t1")
    src = os.path.join(d, "pages")
    out = str(tmp_path / "sliced")
    r = subprocess.run(
        [sys.executable, "-m",
         "nuclei_feature_extraction_ray.filter_cli",
         "--input", src, "--output", out,
         "--from", "1970-03-01", "--to", "1971-01-01",
         "--rebase", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert r.returncode == 0, r.stderr[-1500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] > 0
    got = pq.read_table(out)
    assert "ts_rebased_sec" in got.schema.names
    assert "warc_ts" not in got.schema.names
    reb = got["ts_rebased_sec"].to_numpy()
    assert (reb >= 0).all()


def test_cli_env_config(tmp_path):
    """E3 env-config surface (run.sh:48 / Dockerfile:16 analog):
    NFX_FEATURES / NFX_OUTPUT_FORMAT feed the parser defaults."""
    import importlib
    import nuclei_feature_extraction_ray.cli as cli
    old = dict(os.environ)
    try:
        os.environ["NFX_FEATURES"] = "text"
        os.environ["NFX_OUTPUT_FORMAT"] = "csv"
        args = cli.build_parser().parse_args(
            ["--input", "x", "--output", "y"])
        assert args.features == ["text"]
        assert args.output_format == "csv"
        # explicit flags win
        args2 = cli.build_parser().parse_args(
            ["--input", "x", "--output", "y", "--features", "all",
             "--output-format", "parquet"])
        assert args2.features == ["all"]
        assert args2.output_format == "parquet"
    finally:
        os.environ.clear()
        os.environ.update(old)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "ipc"])
def test_single_file_roundtrip(fmt, tmp_path):
    """--single-file parity (reference writes one output file per
    slide, src/main.rs:161-189): exactly ONE file, values intact."""
    tbl = pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                    "v": pa.array(["a", "b", "c"])})
    path = str(tmp_path / ("one." + fmt))
    write_table(rd.from_arrow(tbl), path, fmt, single_file=True)
    assert os.path.isfile(path)
    if fmt == "json":
        got = pd.read_json(path, lines=True)
    else:
        got = read_table(path, fmt).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    want = tbl.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"k": np.int64}), want)
