"""Shared solver machinery: option merging, outputs, host-driven logging.

Parity targets: ``Solver``/``BaseOutput`` (``/root/reference/src/base/base_solver.py``)
and ``Output`` (``/root/reference/src/solver/utils.py:13-16``).

Design: every solver is a pair of pure functions

    init(problem, option)            -> state (pytree)
    step(problem, option, state)     -> (state, info dict of jnp scalars)

``step`` is jitted once and reused; the *host runner* adds wall-clock
budgeting and per-iteration log accumulation (the reference's
``excluded_time`` bookkeeping becomes unnecessary because evaluation is
fused into the compiled step), while ``lax.while_loop`` runners compile the
entire solve for vmapped sweeps.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import numpy as np


@dataclasses.dataclass
class Output:
    """Reference ``Output`` (``utils.py:13-16``)."""

    name: str
    x: Any
    ineqLagmult: Any
    eqLagmult: Any
    option: Optional[Dict]
    log: Optional[Dict]


def merge_options(default: dict, *overrides: dict) -> dict:
    """Layered option merging (``base_solver.py:29-31``): defaults <- common
    <- solver-specific <- problem hooks."""
    out = dict(default)
    for o in overrides:
        if o:
            out.update(o)
    return out


class LogAccumulator:
    """Per-iteration log dict of lists (``base_solver.py:58-83``)."""

    def __init__(self):
        self.log: Dict[str, list] = {}

    @staticmethod
    def _to_python(v):
        if v is None or isinstance(v, (str, bool)):
            return v
        arr = np.asarray(v)
        if arr.ndim == 0:
            return arr.item()
        return arr

    def add(self, iteration: int, run_time: float, *dicts):
        row = {"iteration": iteration, "time": run_time}
        for d in dicts:
            for k, v in d.items():
                row[k] = self._to_python(v)
        for k, v in row.items():
            self.log.setdefault(k, []).append(v)

    def as_dict(self):
        return self.log


class WallClock:
    """Wall-clock budget for the host runner (``base_solver.py:85-107``).

    ``initial_elapsed`` seeds the clock when resuming from a checkpoint so
    the total budget spans the whole logical run.
    """

    def __init__(self, maxtime: float, initial_elapsed: float = 0.0):
        self.maxtime = maxtime
        self.start = time.time() - initial_elapsed
        self.excluded = 0.0

    def elapsed(self) -> float:
        return time.time() - self.start - self.excluded

    def exceeded(self) -> bool:
        return self.elapsed() >= self.maxtime


def maybe_wandb_init(option: dict, name: str):
    if not option.get("wandb_logging", False):
        return None
    import wandb  # optional dependency, reference uses it the same way

    wandb.finish()
    return wandb.init(project=option.get("wandb_project", "riptrm_tpu"), name=name, config={k: v for k, v in option.items() if not callable(v)})


def maybe_wandb_log(option: dict, row: dict):
    if not option.get("wandb_logging", False):
        return
    import wandb

    wandb.log({k: v for k, v in row.items() if not isinstance(v, (list, np.ndarray))})


def maybe_wandb_finish(option: dict):
    if not option.get("wandb_logging", False):
        return
    import wandb

    wandb.finish()
