"""Warehouse snapshots — O(files) hardlink clones for backup, blue/
green serving, and time-travel-ish rollback:

* :func:`snapshot_warehouse` clones a warehouse into a new directory
  by HARDLINKING every data file (bytes are shared, so a 100 TB
  warehouse snapshots in metadata time) and copying the manifest
  (small, mutated in place by appends — never linked). Safe because
  every writer in this engine REPLACES files (parquet writes +
  ``os.replace`` manifests) and the incremental compactor itself
  hardlinks unaffected buckets — no code path ever appends to or
  mutates an existing data file, so shared bytes can never change
  under a snapshot.
* A snapshot is a fully independent warehouse: serve it, fsck it,
  append to the ORIGINAL — the snapshot keeps answering from the
  state at snapshot time (regression-tested).

Cross-device targets degrade to copies (hardlinks cannot span
filesystems) — correct either way, just not O(1) bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import time

# mutable metadata files: copied, never hardlinked (appends rewrite
# the manifest via os.replace — a hardlinked manifest would tear the
# snapshot's view if any tool edited in place instead)
_COPY_BASENAMES = {"_manifest.json"}


def snapshot_warehouse(src: str, dst: str) -> dict:
    """Clone ``src`` into ``dst`` (must not exist). Returns
    ``{files, linked, copied, bytes_shared, wall_s}``."""
    if not os.path.isdir(src):
        raise ValueError(f"snapshot: no such warehouse {src!r}")
    if os.path.exists(dst):
        raise ValueError(
            f"snapshot: destination {dst!r} already exists (snapshots "
            "never overwrite — pick a fresh directory)")
    t0 = time.time()
    files = linked = copied = shared = 0
    for root, _dirs, names in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(troot, exist_ok=True)
        for name in names:
            s = os.path.join(root, name)
            t = os.path.join(troot, name)
            files += 1
            if name in _COPY_BASENAMES:
                shutil.copy2(s, t)
                copied += 1
                continue
            try:
                os.link(s, t)
                linked += 1
                shared += os.path.getsize(s)
            except OSError:
                # cross-device (EXDEV) or FS without hardlinks
                shutil.copy2(s, t)
                copied += 1
    # stamp provenance into the snapshot's manifest copy
    mpath = os.path.join(dst, "_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        m.setdefault("metrics", {})["snapshot"] = {
            "source": os.path.abspath(src), "ts": time.time()}
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, mpath)
    return {"files": files, "linked": linked, "copied": copied,
            "bytes_shared": shared,
            "wall_s": round(time.time() - t0, 3)}
