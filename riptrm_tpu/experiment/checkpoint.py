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


def _leaf_names(tree: Any):
    """Stable per-leaf archive keys from the pytree key path (e.g.
    ``leaf.x``, ``leaf.h_lam``), so checkpoints key fields by NAME: adding
    or reordering state fields (as solver refactors do) cannot silently
    misalign a resume — a missing field fails loudly instead."""
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [
        "leaf" + jax.tree_util.keystr(kp) for kp, _ in paths_leaves
    ], [l for _, l in paths_leaves]


def _atomic_write(path: str, write_fn) -> None:
    dir_ = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=dir_, suffix=".tmp")
    os.close(fd)
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save_state(path: str, state: Any, meta: Optional[dict] = None) -> None:
    """Atomically persist a solver-state pytree + metadata.

    Metadata is embedded INSIDE the npz (key ``__meta__``), so state and
    meta are one atomic ``os.replace`` — a kill cannot leave a new state
    with stale or torn meta (resume accounting depends on it).  A sidecar
    ``.meta.json`` is also written (atomically) for human inspection only.
    """
    names, leaves = _leaf_names(state)
    arrays = {n: np.asarray(l) for n, l in zip(names, leaves)}
    arrays["__meta__"] = np.asarray(json.dumps(meta or {}))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write_npz(tmp):
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)

    _atomic_write(path, write_npz)

    def write_meta(tmp):
        with open(tmp, "w") as f:
            json.dump(meta or {}, f)

    _atomic_write(path + ".meta.json", write_meta)


def load_state(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a solver-state pytree using ``template`` for the structure."""
    names, leaves = _leaf_names(template)
    _, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        missing = [n for n in names if n not in data]
        if missing:
            # Pre-name-keying checkpoints used positional leaf_<i> keys;
            # load them positionally when the leaf count matches exactly.
            old = [f"leaf_{i}" for i in range(len(leaves))]
            n_old = sum(
                1 for k in data.files
                if k.startswith("leaf_") and k[len("leaf_"):].isdigit()
            )
            # Leaf COUNT alone is not identity: a legacy checkpoint from a
            # different state layout with the same number of leaves would be
            # silently misassigned.  Require every positional leaf's shape
            # to match the template's too.
            shapes_ok = all(k in data for k in old) and n_old == len(old) and all(
                data[k].shape == np.asarray(l).shape
                for k, l in zip(old, leaves)
            )
            if shapes_ok:
                names = old
            else:
                raise ValueError(
                    f"checkpoint {path} lacks field(s) {missing}: it was "
                    "saved by a different solver-state layout and cannot "
                    "be resumed"
                )
        new_leaves = [
            np.asarray(data[n], dtype=np.asarray(l).dtype)
            for n, l in zip(names, leaves)
        ]
        meta = (
            json.loads(str(data["__meta__"])) if "__meta__" in data else None
        )
    state = jax.tree.unflatten(treedef, new_leaves)
    if meta is None:  # legacy checkpoint: meta only in the sidecar
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
