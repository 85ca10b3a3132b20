"""Analysis CLI: render the reference's notebook figures from CSV logs.

    python -m riptrm_tpu.experiment.analyze --problem NonnegPCA \
        [--instance 1] [--initialpoints a,b,...] [--budget 240]

Outputs land in ``result/<problem>/`` (the reference's notebook output
directory contract; SURVEY.md §1 "Persistence").
"""

from __future__ import annotations

import os
import sys

from riptrm_tpu.experiment.analyzer import (
    box_plot_best_residuals,
    plot_residual_curves,
    plot_second_order_curves,
)


def _discover_solvers(output_dir: str):
    names = set()
    if not os.path.isdir(output_dir):
        return []
    for f in os.listdir(output_dir):
        if f.endswith("_log.csv"):
            names.add(f[: -len("_log.csv")])
    return sorted(names)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from riptrm_tpu.experiment.cfg import maybe_help

    maybe_help(argv, __doc__)
    problem = "NonnegPCA"
    instance = "1"
    initialpoints = ["a"]
    budget = 240.0
    it = iter(argv)
    for a in it:
        if a == "--problem":
            problem = next(it)
        elif a == "--instance":
            instance = next(it)
        elif a == "--initialpoints":
            initialpoints = next(it).split(",")
        elif a == "--budget":
            budget = float(next(it))
        else:
            raise SystemExit(f"unknown arg {a}")

    result_dir = f"result/{problem}"
    os.makedirs(result_dir, exist_ok=True)
    root = f"intermediate/{problem}"

    first_dir = f"{root}/{instance}/{initialpoints[0]}"
    solvers = _discover_solvers(first_dir)
    if not solvers:
        raise SystemExit(f"no *_log.csv under {first_dir}; run the simulator first")

    plot_residual_curves(
        first_dir, solvers,
        save_path=f"{result_dir}/residual_{instance}_{initialpoints[0]}.png",
        budget=budget,
    )
    print(f"wrote {result_dir}/residual_{instance}_{initialpoints[0]}.png")

    if problem == "Rosenbrock":
        plot_second_order_curves(
            first_dir, solvers,
            save_path=f"{result_dir}/second_order_{instance}_{initialpoints[0]}.png",
            budget=budget,
        )
        print(f"wrote {result_dir}/second_order_{instance}_{initialpoints[0]}.png")

    if len(initialpoints) > 1:
        _, data = box_plot_best_residuals(
            root, instance, initialpoints, solvers,
            save_path=f"{result_dir}/box_{instance}.png", budget=budget,
        )
        print(f"wrote {result_dir}/box_{instance}.png")
        for k, v in data.items():
            print(f"  {k}: {len(v)} points")


if __name__ == "__main__":
    main()
