"""StableIdentification d=32 long-horizon chip solve (VERDICT r3 item 7).

d=32 (dim 1,552, m=714) needs tens of thousands of inner steps — far
past the tunnel's ~2-minute single-XLA-call worker-crash limit — so the
solve runs SEGMENTED through ``run_sweep_checkpointed`` (the
fault-tolerance layer doubles as the long-horizon driver).  Reports
aggregate solves/s over the whole horizon and the per-lane residual
trajectory across segments.

    python scripts/sid32_longrun.py [--batch 8] [--max-steps 24000]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--max-steps", type=int, default=24000)
    parser.add_argument("--segment-steps", type=int, default=1200)
    parser.add_argument("--size", type=int, default=32)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_matmul_precision", "high")
    import jax.numpy as jnp

    from riptrm_tpu.experiment.chip_sweep import build_sweep
    from riptrm_tpu.parallel.sweep import run_sweep_checkpointed
    from riptrm_tpu.utils.retry import retry_transient

    t0 = time.time()
    problem, xs0, ys0 = build_sweep(
        "StableIdentification", args.size, args.batch
    )
    gen_s = time.time() - t0

    compl_floor = 2e-4 * max(1.0, (problem.num_ineq / 200.0) ** 0.5)
    option = {
        "maxiter": 5000,
        "tolresid": 3e-3,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": (
            lambda mu: jnp.maximum(1e-3 * mu, compl_floor)
        ),
    }

    seg_log = []

    def on_segment(i, total, res, done):
        row = {
            "segment": i,
            "steps": int(total),
            "median_residual": float(np.median(res)),
            "min_residual": float(np.min(res)),
            "done": int(np.sum(done)),
            "t": round(time.time() - t1, 1),
        }
        seg_log.append(row)
        print(json.dumps(row), flush=True)

    t1 = time.time()
    x, y, ks, res = retry_transient(
        lambda: run_sweep_checkpointed(
            problem, option, xs0, ys0,
            max_steps=args.max_steps, segment_steps=args.segment_steps,
            checkpoint_path="/tmp/sid32_longrun.npz",
            on_segment=on_segment,
        ),
        label="sid32_longrun",
    )
    run_s = time.time() - t1
    res = np.asarray(res)
    print(json.dumps({
        "problem": "StableIdentification",
        "size": args.size,
        "batch": args.batch,
        "solver": "RIPTRM",
        "max_steps": args.max_steps,
        "steps_run": int(np.max(np.asarray(ks))),
        "median_residual": float(np.median(res)),
        "min_residual": float(np.min(res)),
        "max_residual": float(np.max(res)),
        "solves_per_sec": round(args.batch / run_s, 3),
        "inner_steps_per_sec": round(
            float(np.max(np.asarray(ks))) / run_s * args.batch, 1
        ),
        "run_s": round(run_s, 1),
        "gen_s": round(gen_s, 1),
        "segments": seg_log[-3:],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
