"""Checkpoint/resume for PDECO optimization runs.

The reference only has write-only CSV dumps and an in-memory backup of the
best solution (SURVEY §5: "no resume path anywhere"); this module provides
real save/restore of the optimizer state: control trajectory, best-solution
backup, iteration counters and history. Stored as ``.npz`` + JSON metadata —
small, atomic, dependency-free; trajectories are recomputed from the control
on resume (the state solve is cheap relative to the optimization).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np


def save_pgd_checkpoint(path: str, *, control, it: int, cost_old: float,
                        history: dict, fail_count: int, fail_restart_count: int,
                        fail_pass: bool, backup_control=None, backup_it=None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {"control": np.asarray(control)}
    if backup_control is not None:
        arrays["backup_control"] = np.asarray(backup_control)
    meta = {
        "it": it,
        "cost_old": cost_old,
        "history": history,
        "fail_count": fail_count,
        "fail_restart_count": fail_restart_count,
        "fail_pass": fail_pass,
        "backup_it": backup_it,
    }
    # atomic write: tmp file + rename
    d = os.path.dirname(os.path.abspath(path))
    with tempfile.NamedTemporaryFile(dir=d, suffix=".npz", delete=False) as f:
        np.savez_compressed(f, **arrays)
        tmp = f.name
    os.replace(tmp, path)
    with tempfile.NamedTemporaryFile("w", dir=d, suffix=".json", delete=False) as f:
        json.dump(meta, f)
        tmp = f.name
    os.replace(tmp, path + ".json")


def load_pgd_checkpoint(path: str):
    if not (os.path.exists(path) and os.path.exists(path + ".json")):
        return None
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    with open(path + ".json") as f:
        meta = json.load(f)
    return {**meta, **arrays}
