"""Checkpoint / resume.

The reference has NO persistence during a run — a killed 240 s solve loses
everything (SURVEY.md §5 "Checkpoint / resume: None").  Here:

* solver-level: any solver state pytree can be saved/restored as an .npz
  keyed by flattened leaf paths, plus JSON metadata (elapsed time, log so
  far), so a host-driven run can resume mid-budget;
* sweep-level: the simulator skips (instance, initial point, solver) jobs
  whose outputs already exist (``skip_existing``), making multirun sweeps
  restartable shard-by-shard.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_state(path: str, state: Any, meta: Optional[dict] = None) -> None:
    """Atomically persist a solver-state pytree + metadata."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    dir_ = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=dir_, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_state(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a solver-state pytree using ``template`` for the structure."""
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        new_leaves = [
            np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype)
            for i, l in enumerate(leaves)
        ]
    state = jax.tree.unflatten(treedef, new_leaves)
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def job_done_marker(output_path: str, solver_display_name: str) -> str:
    return f"{output_path}/{solver_display_name}_log.csv"


def job_is_done(output_path: str, solver_display_name: str) -> bool:
    return os.path.exists(job_done_marker(output_path, solver_display_name))
