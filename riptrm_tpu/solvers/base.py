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
        # Keep every column the same length: backfill keys first seen now
        # (e.g. checkTRSoptimality's TRS_* fields missing from the
        # iteration-0 row) and pad keys absent from this row — otherwise
        # pd.DataFrame(log) raises at save time and the run's log is lost.
        n_prev = len(self.log["iteration"]) if "iteration" in self.log else 0
        for k, v in row.items():
            self.log.setdefault(k, [None] * n_prev).append(v)
        for k, col in self.log.items():
            if len(col) == n_prev:
                col.append(None)

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


def host_run(
    *,
    name: str,
    option: dict,
    state,
    step,  # state -> (state, info dict)
    evaluate,  # (x_prev, state) -> eval dict (jnp scalars)
    status_row,  # (state, info) -> status dict for the log
    get_x,  # state -> x
    verbosity_line=None,  # (iteration, eval) -> str, optional
    stop_flag=None,  # (state, info) -> Optional[str]: solver-raised stop
):
    """Shared host-driven loop for the single-level solvers (RIPM / RSQO /
    RALM): evaluate -> log -> stop checks -> step, with the reference's
    stopping semantics (``base_solver.py:85-107``) and per-step
    ``do_exit_on_error`` (e.g. ``RSQO.py:319-324``).

    Returns (final_state, log_dict, stop_reason).
    """
    log = LogAccumulator()
    clock = WallClock(option["maxtime"])
    info: dict = {}
    x_prev = get_x(state)
    iteration = 0
    stop_reason = None
    while True:
        try:
            ev = evaluate(x_prev, state)
        except Exception as e:
            if option["do_exit_on_error"]:
                print(f"Error: {e}")
                break
            raise
        run_time = 0.0 if iteration == 0 else clock.elapsed()
        # Log accumulation is host bookkeeping, not solve time: exclude it
        # from the wall-clock budget (the reference's ``excluded_time``,
        # ``base_solver.py:58-93``).  On 1e5-row runs the device->host
        # conversions here are a material fraction of the budget.
        t_log = time.time()
        log.add(iteration, run_time, ev, status_row(state, info))
        maybe_wandb_log(option, {k: float(v) for k, v in ev.items()} | {"time": run_time})
        clock.excluded += time.time() - t_log

        residual = float(ev["residual"])
        x_prev = get_x(state)
        if option.get("verbosity") and verbosity_line:
            print(verbosity_line(iteration, ev))
        if residual <= option["tolresid"]:
            stop_reason = (
                f"KKT residual tolerance reached; current residual={residual} "
                f"and tolresid={option['tolresid']}"
            )
            break
        if clock.exceeded():
            stop_reason = (
                f"Max time exceeded; runtime={clock.elapsed():.2f} and "
                f"maxtime={option['maxtime']}"
            )
            break
        if iteration >= option["maxiter"]:
            stop_reason = (
                f"Max iteration count reached; maxiter={option['maxiter']} "
                f"after {clock.elapsed():.2f} seconds"
            )
            break
        iteration += 1
        try:
            state, info = step(state)
        except Exception as e:
            if option["do_exit_on_error"]:
                print(f"Error: {e}")
                break
            raise
        if stop_flag is not None:
            reason = stop_flag(state, info)
            if reason:
                # Log the flagged iteration's row before exiting so the
                # diagnosis is in the CSV (the reference's graceful
                # exit-with-logs on solver errors, ``RIPM.py:764-769``).
                ev = evaluate(x_prev, state)
                log.add(iteration, clock.elapsed(), ev, status_row(state, info))
                stop_reason = reason
                break
    return state, log.as_dict(), stop_reason


def max_abs_multiplier(*mult_arrays) -> float:
    """maxabsLagmult log field (e.g. ``RIPTRM.py:1020-1023``)."""
    vals = [
        abs(float(v))
        for arr in mult_arrays
        for v in np.atleast_1d(np.asarray(arr))
    ]
    return max(vals, default=float("-inf"))


def _wandb():
    """Optional wandb import: disabled with a one-time warning when absent
    (it is an optional extra, as in the reference's pip list)."""
    try:
        import wandb

        return wandb
    except ImportError:
        import warnings

        warnings.warn("wandb_logging requested but wandb is not installed; disabled.")
        return None


def maybe_wandb_init(option: dict, name: str):
    if not option.get("wandb_logging", False):
        return None
    wandb = _wandb()
    if wandb is None:
        option["wandb_logging"] = False
        return None
    wandb.finish()
    # Default project name mirrors the reference's template
    # ``${problem_name}-${problem_instance}-${problem_initialpoint}``
    # (``/root/reference/src/base/base_solver.py:36-41`` +
    # ``NonnegPCA/config_simulation.yaml:18``).  Config-driven runs get it
    # via YAML interpolation; direct-API callers get the same contract from
    # the problem-identity option keys when present.
    project = option.get("wandb_project")
    if not project:
        keys = ("problem_name", "problem_instance", "problem_initialpoint")
        if all(k in option for k in keys):
            project = "-".join(str(option[k]) for k in keys)
        else:
            project = "riptrm_tpu"
    return wandb.init(
        project=project,
        name=name,
        config={k: v for k, v in option.items() if not callable(v)},
    )


def maybe_wandb_log(option: dict, row: dict):
    if not option.get("wandb_logging", False):
        return
    wandb = _wandb()
    if wandb is None:
        option["wandb_logging"] = False
        return
    wandb.log({k: v for k, v in row.items() if not isinstance(v, (list, np.ndarray))})


def maybe_wandb_finish(option: dict):
    if not option.get("wandb_logging", False):
        return
    wandb = _wandb()
    if wandb is not None:
        wandb.finish()


def compiled_best_while(step1, state0, target, max_steps, best0,
                        stall_window=None, stall_rtol=1e-2,
                        track_best_state=False):
    """THE shared compiled solve loop for all four solvers (the
    freeze-when-done, NaN-robust-running-min, and per-lane-target-stop
    invariants live here and nowhere else).

    ``step1(st) -> (new_st, res, counted, stop)``: one solver step with its
    residual, whether that residual COUNTS toward the protocol best (RIPTRM
    counts inner-converged steps only, matching the reference analyzers'
    row filter), and the solver's own stopping predicate.

    ``best0`` seeds the running minimum with the INITIAL point's residual:
    the host protocol's best-within-budget includes the iteration-0 row, so
    a lane whose target equals its starting residual must stop immediately
    rather than burn the whole budget.

    ``stall_window`` (opt-in, throughput sweeps only): freeze a lane whose
    best residual has not improved by a relative ``stall_rtol`` in that
    many steps — under vmap ONE floor-stalled lane otherwise forces every
    lane through the full ``max_steps`` budget (measured: a single
    8.6e-4-floored RSQO lane cost a 16-lane sweep 60 lockstep steps where
    ~20 sufficed).  Leave None for protocol runs: plateaus there are
    legitimately escaped late (the speedrun's full-schedule semantics).

    ``track_best_state`` (opt-in): carry a snapshot of the state that
    achieved the running-best residual and RETURN it in place of the final
    state.  RALM needs this: its KKT residual is non-monotone (the
    clipped-multiplier/rho updates overshoot after the dip — measured on
    NonnegPCA: dips to 3.96e-4 around the reference's protocol best, then
    RISES to ~0.7 by the budget's end), so a sweep reporting the final
    state reads as a 0.6-residual "stall" when the solver did reach the
    target; the reference's analyzer notebooks plot the full residual
    trajectory (``src/*/analyzer.ipynb``), where the dip is what a reader
    scores.  Costs one extra state copy in the carry.

    Returns (state, steps, done, best).
    """
    import jax as _jax
    import jax.numpy as _jnp

    def cond(carry):
        st, k, done, best, since, best_st = carry
        return (~done) & (k < max_steps)

    def body(carry):
        # Freeze per-lane state when done: under vmap the loop runs until
        # ALL lanes finish; without the freeze finished lanes would keep
        # stepping past their stopping point.
        st, k, done, best, since, best_st = carry
        new_st, res, counted, stop = step1(st)
        # strict-compare min: a NaN residual (diverged step) must not
        # poison the running best (jnp.minimum propagates NaN)
        improved = (~done) & counted & (res < best)
        best_new = _jnp.where(improved, res, best)
        if track_best_state:
            best_st = _jax.tree.map(
                lambda b, n: _jnp.where(improved, n, b), best_st, new_st
            )
        if stall_window is not None:
            big_improve = improved & (res < (1.0 - stall_rtol) * best)
            since = _jnp.where(done, since, _jnp.where(big_improve, 0, since + 1))
            stalled = since >= stall_window
        else:
            stalled = False
        new_done = done | stop | stalled | (best_new <= target)
        st_out = _jax.tree.map(lambda o, n: _jnp.where(done, o, n), st, new_st)
        return (
            st_out, k + _jnp.where(done, 0, 1), new_done, best_new, since,
            best_st,
        )

    done0 = best0 <= target
    # () when untracked: an always-unchanged duplicate state in the carry
    # would not be DCE'd out of the while_loop.
    best_st0 = state0 if track_best_state else ()
    st, k, done, best, _, best_st = _jax.lax.while_loop(
        cond, body,
        (state0, _jnp.asarray(0), done0, best0, _jnp.asarray(0), best_st0),
    )
    return (best_st if track_best_state else st), k, done, best
