"""Symlink-format manifest export — external engines read the txn table.

Delta's ``GENERATE symlink_format_manifest``: a transactional table's data
directory is full of staged, orphaned, and superseded files that only the
log knows to skip, so an external engine pointed at the directory reads
garbage. The manifest fixes interop without teaching anyone the log
format: one text file per partition listing the ABSOLUTE paths of exactly
the files live in one snapshot. Trino/Presto/Hive mount it as a symlink
table; DuckDB/pandas read the listed paths directly; and because the
manifest pins a snapshot version, external readers get a CONSISTENT view
— concurrent commits never tear their scan (they simply aren't in the
manifest).

Driver-side metadata only (the manifest is proportional to the file count,
not the data); regenerate after commits to publish a newer snapshot.
"""

from __future__ import annotations

import os
import shutil
import uuid

from .txnlog import TxnTable

__all__ = ["write_symlink_manifest", "read_manifest_paths"]

_MANIFEST_DIR = "_symlink_format_manifest"


def write_symlink_manifest(table: TxnTable, version: int | None = None) -> str:
    """Write ``<table>/_symlink_format_manifest/<partition>/manifest`` files
    for the snapshot at ``version`` (default head). Atomic via
    write-to-temp + directory swap: readers see the old manifest or the new
    one, never a mix. Returns the manifest root."""
    snap = table.snapshot(version)
    if snap.dvs:
        # A manifest is a bare file list — it cannot express merge-on-read
        # deletes, so external readers would see DV-deleted rows resurrected.
        # Same rule as Delta (GENERATE is blocked on DV tables): compact()
        # first to fold the DVs into rewritten files.
        raise ValueError(
            "cannot write a symlink manifest while deletion vectors are "
            "live; run compact() to materialize the deletes first"
        )
    root = os.path.join(table.path, _MANIFEST_DIR)
    tmp = root + f".tmp-{uuid.uuid4().hex}"
    by_part: dict = {}
    for rel, pv in sorted(snap.files.items()):
        by_part.setdefault(pv, []).append(
            os.path.abspath(os.path.join(table.path, rel))
        )
    for pv, paths in by_part.items():
        part_dir = (
            os.path.join(tmp, f"{snap.partition_col}={pv}")
            if pv is not None
            else tmp
        )
        os.makedirs(part_dir, exist_ok=True)
        with open(os.path.join(part_dir, "manifest"), "w") as fh:
            fh.write("\n".join(paths) + "\n")
    os.makedirs(tmp, exist_ok=True)  # empty table still publishes a manifest
    old = root + f".old-{uuid.uuid4().hex}"
    if os.path.isdir(root):
        os.replace(root, old)
    os.replace(tmp, root)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return root


def read_manifest_paths(manifest_root: str) -> list[str]:
    """All data-file paths a manifest publishes (what an external engine
    globs) — flat, sorted, partition directories walked."""
    paths: list[str] = []
    for dirpath, _dirs, files in os.walk(manifest_root):
        for f in files:
            if f == "manifest":
                with open(os.path.join(dirpath, f)) as fh:
                    paths += [ln for ln in fh.read().splitlines() if ln]
    return sorted(paths)
