"""Analysis layer: plots + strict-complementarity checks from the CSV logs.

Replaces the reference's Colab notebooks (``src/*/analyzer.ipynb``) and
``StableIdentification/analyzer_strict_complementarity.py`` as importable,
scriptable functions:

* residual-vs-time curves with the RIPTRM row convention (only
  ``inner_status in {converged, initial/NaN}`` — NonnegPCA analyzer cell 5)
* second-order-residual curves with arctan squashing (Rosenbrock cell 5)
* per-initial-point box plots of the best log10 residual within the
  wall-clock budget (StableIdentification cell 5)
* RSQO-delta ablation box plot (StableIdentification cell 6)
* strict-complementarity flagging (|y_i| and |g_i(x)| both <= tol)

Colors follow the Paul Tol colorblind-safe palette used by the reference
(NonnegPCA analyzer cells 3-4).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np
import pandas as pd

# Paul Tol bright palette (reference NonnegPCA analyzer cell 3)
TOL_COLORS = ["#4477AA", "#EE6677", "#228833", "#CCBB44", "#66CCEE", "#AA3377", "#BBBBBB"]

DISPLAY_NAMES = {
    "RIPTRM_tCG": "RIPTRM (tCG)",
    "RIPTRM_Exact_RepMat": "RIPTRM (exact)",
    "RALM_SteepestDescent": "RALM",
    "RSQO_reghess_corr1e-02": "RSQO ($\\delta$=1e-2)",
    "RSQO_reghess_corr1e-04": "RSQO ($\\delta$=1e-4)",
}


def load_log(output_dir: str, solver_name: str) -> pd.DataFrame:
    return pd.read_csv(f"{output_dir}/{solver_name}_log.csv")


def filter_riptrm_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Keep only outer-converged (+ initial) rows for RIPTRM logs — the
    analyzers' plotted-iteration convention (BASELINE.md)."""
    if "inner_status" not in df.columns:
        return df
    mask = df["inner_status"].isna() | df["inner_status"].isin(["converged", "initial"])
    return df[mask]


def best_residual_within(df: pd.DataFrame, budget: float = 240.0) -> float:
    sel = df[df["time"] <= budget]
    if len(sel) == 0:
        return float("nan")
    return float(sel["residual"].min())


def plot_residual_curves(
    output_dir: str,
    solver_names: Iterable[str],
    save_path: Optional[str] = None,
    budget: float = 240.0,
    value: str = "residual",
    logy: bool = True,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for i, name in enumerate(solver_names):
        df = load_log(output_dir, name)
        if name.startswith("RIPTRM"):
            df = filter_riptrm_rows(df)
        df = df[df["time"] <= budget]
        ax.plot(
            df["time"],
            df[value],
            label=DISPLAY_NAMES.get(name, name),
            color=TOL_COLORS[i % len(TOL_COLORS)],
        )
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("KKT residual" if value == "residual" else value)
    ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=150)
    return fig


def plot_second_order_curves(
    output_dir: str,
    solver_names: Iterable[str],
    save_path: Optional[str] = None,
    budget: float = 240.0,
):
    """Second-order residual curves, arctan-squashed (Rosenbrock cell 5)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for i, name in enumerate(solver_names):
        df = load_log(output_dir, name)
        if name.startswith("RIPTRM"):
            df = filter_riptrm_rows(df)
        df = df[df["time"] <= budget]
        ax.plot(
            df["time"],
            np.arctan(df["second_order_residual"]),
            label=DISPLAY_NAMES.get(name, name),
            color=TOL_COLORS[i % len(TOL_COLORS)],
        )
    ax.axhline(0.0, color="gray", lw=0.5)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("arctan(second-order residual)")
    ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=150)
    return fig


def box_plot_best_residuals(
    intermediate_root: str,
    instance,
    initialpoints: Iterable[str],
    solver_names: Iterable[str],
    save_path: Optional[str] = None,
    budget: float = 240.0,
):
    """Box plots of log10 best residual within budget over initial points
    (StableIdentification cell 5)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data: Dict[str, List[float]] = {}
    for name in solver_names:
        vals = []
        for pt in initialpoints:
            path = f"{intermediate_root}/{instance}/{pt}"
            try:
                df = load_log(path, name)
            except FileNotFoundError:
                continue
            if name.startswith("RIPTRM"):
                df = filter_riptrm_rows(df)
            v = best_residual_within(df, budget)
            if np.isfinite(v) and v > 0:
                vals.append(np.log10(v))
        data[DISPLAY_NAMES.get(name, name)] = vals

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.boxplot(list(data.values()), tick_labels=list(data.keys()))
    ax.set_ylabel("log10 best KKT residual within budget")
    plt.setp(ax.get_xticklabels(), rotation=20, ha="right")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=150)
    return fig, data


def strict_complementarity(
    problem,
    x,
    y,
    tol: float = 1e-8,
):
    """Indices where both |y_i| and |g_i(x)| are <= tol — strict
    complementarity violations
    (``analyzer_strict_complementarity.py:51-68``)."""
    g = np.asarray(problem.ineq_val(x))
    y = np.asarray(y)
    return np.where((np.abs(y) <= tol) & (np.abs(g) <= tol))[0]


def check_strict_complementarity_outputs(
    dataset_path: str,
    intermediate_root: str,
    instance,
    initialpoints: Iterable[str],
    solver_names: Iterable[str],
    tol: float = 1e-8,
):
    """Post-check saved outputs for all (solver, initial point) pairs.

    Returns {(solver, point): violated index array}.
    """
    from riptrm_tpu.experiment.simulator import load_block_file
    from riptrm_tpu.problems import stable_identification as si

    results = {}
    for pt in initialpoints:
        problem = si.load_problem(dataset_path, pt)
        for name in solver_names:
            out_dir = f"{intermediate_root}/{instance}/{pt}"
            x_path = f"{out_dir}/{name}_x.csv"
            y_path = f"{out_dir}/{name}_ineqLagmult.csv"
            if not (os.path.exists(x_path) and os.path.exists(y_path)):
                continue
            with open(x_path) as f:
                first = f.readline()
            if first.startswith("# block"):
                x = tuple(load_block_file(x_path))
            else:
                x = np.loadtxt(x_path)
            y = np.loadtxt(y_path)
            results[(name, pt)] = strict_complementarity(problem, x, y, tol)
    return results
