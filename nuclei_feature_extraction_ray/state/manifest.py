"""Per-partition lineage manifests + checkpointed, resumable sink.

The reference restarts from zero on failure (only an overwrite guard,
``src/args.rs:147-153``); here every hash partition commits its output
atomically (write to a temp name, fsync, rename) together with a
manifest recording lineage: partition id, row/dropped counts, a content
checksum over the sorted key column, and wall time. A resumed run
lists committed manifests and filters those partitions out BEFORE the
shuffle, so finished work is neither recomputed nor re-shuffled.

Layout:  <out>/part=<id>/data.parquet
         <out>/part=<id>/MANIFEST.json        (commit marker, atomic)
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "MANIFEST.json"


def part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "part=%05d" % part)


def committed_parts(out_dir: str) -> set[int]:
    """Partition ids with a committed manifest."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
                os.path.join(out_dir, name, MANIFEST)):
            done.add(int(name.split("=")[1]))
    return done


def key_checksum(table: pa.Table, key_cols: list[str]) -> str:
    """Order-insensitive content checksum over the key columns (keys are
    hashed row-wise then XOR-combined, so block order can't matter)."""
    import numpy as np
    import pandas as pd
    acc = np.uint64(0)
    h = None
    for c in key_cols:
        col = table[c].to_pandas()
        hv = pd.util.hash_array(col.to_numpy(), categorize=False)
        h = hv if h is None else h * np.uint64(31) + hv
    if h is not None and len(h):
        acc = np.bitwise_xor.reduce(h)
    return hashlib.sha256(int(acc).to_bytes(8, "little")).hexdigest()[:16]


def commit_partition(out_dir: str, part: int, table: pa.Table,
                     key_cols: list[str], dropped_rows: int = 0,
                     extra: dict | None = None) -> dict:
    """Atomically write one partition's parquet + manifest; returns the
    manifest dict. Idempotent: a retry of an already-committed partition
    is a no-op (first rename wins)."""
    t0 = time.monotonic()
    d = part_dir(out_dir, part)
    if os.path.exists(os.path.join(d, MANIFEST)):
        with open(os.path.join(d, MANIFEST)) as f:
            return json.load(f)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".tmp-data.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(d, "data.parquet"))
    man = {
        "partition": part,
        "rows": table.num_rows,
        "dropped_rows": int(dropped_rows),
        "key_checksum": key_checksum(table, key_cols),
        "bytes": os.path.getsize(os.path.join(d, "data.parquet")),
        "wall_sec": round(time.monotonic() - t0, 4),
        **(extra or {}),
    }
    mtmp = os.path.join(d, "." + MANIFEST)
    with open(mtmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, os.path.join(d, MANIFEST))
    return man


def read_output(out_dir: str):
    """The committed output as a Dataset (one file per partition).
    ``partitioning=None``: the ``part=<id>`` directory names are sink
    layout, not hive partition columns — without this the read would
    inject a spurious ``part`` column into the schema."""
    import ray.data as rd
    files = [os.path.join(part_dir(out_dir, p), "data.parquet")
             for p in sorted(committed_parts(out_dir))]
    return rd.read_parquet(files, partitioning=None)


def summarize(out_dir: str) -> dict:
    """Aggregate manifest metrics (rows, dropped, bytes, skew stats)."""
    mans = []
    for p in sorted(committed_parts(out_dir)):
        with open(os.path.join(part_dir(out_dir, p), MANIFEST)) as f:
            mans.append(json.load(f))
    rows = [m["rows"] for m in mans] or [0]
    return {
        "partitions": len(mans),
        "rows": sum(rows),
        "dropped_rows": sum(m["dropped_rows"] for m in mans),
        "bytes": sum(m.get("bytes", 0) for m in mans),
        "max_part_rows": max(rows),
        "min_part_rows": min(rows),
    }
