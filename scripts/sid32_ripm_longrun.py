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
    parser.add_argument("--staged-at", type=int, default=None,
                        help="segment index at which to REBUILD the "
                             "problem with matmul_precision='highest' and "
                             "continue the same states (staged-precision "
                             "RIPM, VERDICT r4 item 3) — host-side "
                             "continuation, merit scalars refreshed")
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
    problem_hi = None
    if args.staged_at is not None:
        from riptrm_tpu.experiment.chip_sweep import _cache_load
        from riptrm_tpu.problems import stable_identification as si

        payload = _cache_load("StableIdentification", args.size,
                              args.batch, 0)
        starts = (payload["b_J"], payload["b_R"], payload["b_Q"])
        problem_hi = si.make_problem(
            args.size, list(payload["trajs"]), payload["constset"],
            tuple(a[0] for a in starts), dtype=jnp.float32,
            matmul_precision="highest",
        )
    gen_s = time.time() - t0

    option = {
        "maxiter": args.segment_steps,
        "tolresid": 3e-3,
        "KrylovIterMethod": True,
        "KrylovMaxIteration": 150,
    }
    option.update(option_overrides)
    def make_segment(prob):
        solve, start, resid_args = _solver_plumbing(
            prob, "RIPM", option, args.segment_steps
        )

        @jax.jit
        def segment(st, extras):
            st, k, _ = jax.vmap(
                lambda s, *e: solve(s, *e, -jnp.inf)
            )(st, *extras)
            x, ineq, eq = jax.vmap(resid_args)(st)
            res = jax.vmap(
                lambda x_, i_, e_: compute_residual(prob, x_, i_, e_)[0]
            )(x, ineq, eq)
            return st, k, res

        return segment, start

    segment, start = make_segment(problem)
    st, extras = jax.vmap(start)(xs0, ys0)

    def refresh_merit(prob, st):
        """Recompute phi/sigma/rho (and tau extras) under the new
        program's precision — mirrors batched_ripm_continue."""
        from riptrm_tpu.solvers import ripm as ripm_mod

        m = prob.num_ineq

        def one(stl):
            f = ripm_mod._kkt_field(prob, stl.x, stl.y, stl.z, stl.s)
            phi = ripm_mod._phi(prob, stl.x, *f)
            stl = stl._replace(
                phi=phi, sigma=jnp.minimum(0.5, phi**0.25),
                rho=jnp.vdot(stl.z, stl.s) / m,
            )
            t1 = jnp.min(stl.z * stl.s) * m / jnp.vdot(stl.z, stl.s)
            t2 = jnp.vdot(stl.z, stl.s) / jnp.sqrt(phi)
            return stl, t1, t2

        return jax.jit(jax.vmap(one))(st)

    t1 = time.time()
    seg_rows = []
    best = None
    for i in range(args.segments):
        if args.staged_at is not None and i == args.staged_at:
            segment, _ = make_segment(problem_hi)
            st, t1s, t2s = refresh_merit(problem_hi, st)
            extras = (t1s, t2s)
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
