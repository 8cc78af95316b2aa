"""Snapshot repositories (reference: ``repositories/fs/FsRepository.java``
+ ``snapshots/SnapshotsService.java``): point-in-time copies of an index
into a repository directory, restorable by name.

The index tables are immutable parquet generations, so a snapshot is a
FILE-LEVEL copy — hardlinked when the repository shares a filesystem
with the index (the reference's incremental segment reuse: unchanged
files cost zero bytes), byte-copied otherwise. Restore materializes the
file set under a fresh index root.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import List

_SNAP_META = "snapshot.json"
_DATA_DIRS = ("postings", "docstats", "termstats", "deletes")
_META_FILES = ("manifest.json", "lineage.json")


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into ``repo_dir/name``. Fails if the name
    exists (snapshots are immutable, like the reference)."""
    dest = os.path.join(repo_dir, name)
    if os.path.exists(dest):
        raise ValueError(f"snapshot {name!r} already exists")
    os.makedirs(dest)
    n_files = 0
    for d in _DATA_DIRS:
        src_d = os.path.join(index_dir, d)
        if not os.path.isdir(src_d):
            continue
        for f in glob.glob(os.path.join(src_d, "**", "*"), recursive=True):
            if os.path.isdir(f):
                continue
            rel = os.path.relpath(f, index_dir)
            out = os.path.join(dest, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            _link_or_copy(f, out)
            n_files += 1
    for mf in _META_FILES:
        p = os.path.join(index_dir, mf)
        if os.path.exists(p):
            shutil.copy2(p, os.path.join(dest, mf))
    meta = {
        "name": name,
        "source": os.path.abspath(index_dir),
        "n_files": n_files,
        "created_unix": int(time.time()),
        "state": "SUCCESS",
    }
    with open(os.path.join(dest, _SNAP_META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def list_snapshots(repo_dir: str) -> List[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(repo_dir, "*", _SNAP_META))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def restore_snapshot(repo_dir: str, name: str, dest_index_dir: str) -> dict:
    """Materialize snapshot ``name`` as a fresh index at
    ``dest_index_dir`` (hardlink/copy back)."""
    src = os.path.join(repo_dir, name)
    meta_p = os.path.join(src, _SNAP_META)
    if not os.path.exists(meta_p):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(dest_index_dir) and os.listdir(dest_index_dir):
        raise ValueError(f"restore target {dest_index_dir} is not empty")
    os.makedirs(dest_index_dir, exist_ok=True)
    for f in glob.glob(os.path.join(src, "**", "*"), recursive=True):
        if os.path.isdir(f) or os.path.basename(f) == _SNAP_META:
            continue
        rel = os.path.relpath(f, src)
        out = os.path.join(dest_index_dir, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _link_or_copy(f, out)
    with open(meta_p) as f:
        return json.load(f)
