"""Sources & sinks: format-dispatched read/write + overwrite guard —
the reference's multi-format writer and path validation recast
(``src/main.rs:161-189`` csv/parquet/json/ipc dispatch on extension;
``src/args.rs:147-166`` whitelist + overwrite guard).

Differences by design: sinks write DIRECTORIES of part files (never
one giant file — resumable, parallel), and an unsupported format is a
``ValueError`` instead of ``exit(1)``.
"""

from __future__ import annotations

import os

import ray.data as rd

READ_FORMATS = {
    "parquet": rd.read_parquet,
    "csv": rd.read_csv,
    "json": rd.read_json,
}

WRITE_FORMATS = ("parquet", "csv", "json")


def read_table(path: str, fmt: str | None = None, **kwargs):
    """Read with format sniffing from the extension when fmt is None
    (src/main.rs:20-35 extension dispatch analog)."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pqt": "parquet"}.get(ext, ext) or "parquet"
    if fmt not in READ_FORMATS:
        raise ValueError("unsupported input format %r (supported: %s)"
                         % (fmt, sorted(READ_FORMATS)))
    return READ_FORMATS[fmt](path, **kwargs)


def check_output(path: str, overwrite: bool, resume: bool = False) -> None:
    """Refuse to clobber existing output unless --overwrite; resume
    mode instead expects it (src/args.rs:147-153 analog)."""
    if os.path.exists(path) and not (overwrite or resume):
        raise FileExistsError(
            "%s exists; pass --overwrite to replace it or --resume to "
            "continue a checkpointed run" % path)
    if overwrite and os.path.exists(path) and not resume:
        import shutil
        shutil.rmtree(path)


def write_table(ds, path: str, fmt: str = "parquet", **kwargs) -> None:
    """Write a Dataset as a directory of part files in the given
    format."""
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    else:
        raise ValueError("unsupported output format %r (supported: %s)"
                         % (fmt, WRITE_FORMATS))
