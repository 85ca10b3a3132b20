"""Segmented RIPM long-horizon solve for StableIdentification d=32.

The measure_sweep methodology (reps of the whole sweep inside one jit
scan) multiplies device-call length by the rep count, and at d=32 a
300-step RIPM-Krylov call already crashes the tunnel worker (~2-min
single-call limit).  Here each device call is ONE short segment
(``--segment-steps`` Newton steps, ~3 s) and the host loop carries the
batched RipmState between calls — the RIPM analogue of
``run_sweep_checkpointed``'s segmenting.

    python scripts/sid32_ripm_longrun.py [--batch 8] [--segments 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--segments", type=int, default=8)
    parser.add_argument("--segment-steps", type=int, default=75)
    parser.add_argument("--option", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="extra RIPM option override (e.g. "
                             "KrylovPreconditioner=jacobi_theta)")
    args = parser.parse_args()
    option_overrides = {}
    for kv in args.option:
        k, _, v = kv.partition("=")
        lv = v.lower()
        if lv in ("true", "false"):
            option_overrides[k] = lv == "true"
        else:
            try:
                option_overrides[k] = int(v)
            except ValueError:
                try:
                    option_overrides[k] = float(v)
                except ValueError:
                    option_overrides[k] = v

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_matmul_precision", "high")
    import jax.numpy as jnp

    from riptrm_tpu.experiment.chip_sweep import build_sweep
    from riptrm_tpu.ops.kkt import compute_residual
    from riptrm_tpu.parallel.sweep import _solver_plumbing
    from riptrm_tpu.utils.retry import retry_transient

    t0 = time.time()
    problem, xs0, ys0 = build_sweep(
        "StableIdentification", args.size, args.batch
    )
    gen_s = time.time() - t0

    option = {
        "maxiter": args.segment_steps,
        "tolresid": 3e-3,
        "KrylovIterMethod": True,
        "KrylovMaxIteration": 150,
    }
    option.update(option_overrides)
    solve, start, resid_args = _solver_plumbing(
        problem, "RIPM", option, args.segment_steps
    )
    st, extras = jax.vmap(start)(xs0, ys0)

    @jax.jit
    def segment(st, extras):
        st, k, _ = jax.vmap(
            lambda s, *e: solve(s, *e, -jnp.inf)
        )(st, *extras)
        x, ineq, eq = jax.vmap(resid_args)(st)
        res = jax.vmap(
            lambda x_, i_, e_: compute_residual(problem, x_, i_, e_)[0]
        )(x, ineq, eq)
        return st, k, res

    t1 = time.time()
    seg_rows = []
    best = None
    for i in range(args.segments):
        st, k, res = retry_transient(
            lambda: jax.tree.map(np.asarray, segment(st, extras)),
            label=f"ripm_segment_{i}",
        )
        st = jax.tree.map(jnp.asarray, st)
        res_clean = np.where(np.isnan(res), np.inf, res)
        best = res_clean if best is None else np.minimum(best, res_clean)
        row = {
            "segment": i,
            "steps": (i + 1) * args.segment_steps,
            "median_residual": float(np.median(res)),
            "min_residual": float(np.min(res)),
            "max_residual": float(np.max(res)),
            "best_median": float(np.median(best)),
            "best_min": float(np.min(best)),
            "t": round(time.time() - t1, 1),
        }
        seg_rows.append(row)
        print(json.dumps(row), flush=True)
    run_s = time.time() - t1
    print(json.dumps({
        "problem": "StableIdentification",
        "size": args.size,
        "batch": args.batch,
        "solver": "RIPM",
        "option_overrides": {k: str(v) for k, v in option_overrides.items()},
        "mode": "krylov_segmented",
        "total_steps": args.segments * args.segment_steps,
        "median_residual": seg_rows[-1]["median_residual"],
        "min_residual": seg_rows[-1]["min_residual"],
        "max_residual": seg_rows[-1]["max_residual"],
        "best_median": seg_rows[-1]["best_median"],
        "best_min": seg_rows[-1]["best_min"],
        "solves_per_sec": round(args.batch / run_s, 3),
        "run_s": round(run_s, 1),
        "gen_s": round(gen_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
