"""Data-sharded vs plain step-time ratio for large StableIdentification.

VERDICT r3 item 7 overhead accounting: at d=32 (dim 1,552) the HVP's
trajectory contractions can be sharded over a ``data`` mesh axis
(``problems/stable_identification.py::make_problem(mesh=, data_axis=)``).
On one host with N virtual CPU devices the sharded program pays the
collective/partition overhead WITHOUT any extra FLOP/s, so

    ratio = sharded_step_time / plain_step_time

is a pure overhead measurement: ratio ~ 1 means the sharding insertion is
cheap and the path is ready for real multi-chip ICI; ratio >> 1 flags
partition-induced recompute or bad layouts.  (On real chips the sharded
path additionally gains N-way FLOP/s and HBM bandwidth.)

Timing: marginal rate between two scan lengths of the compiled solver
step, each ending in a forced host fetch (CLAUDE.md tunnel rules apply on
CPU too for consistency).

    python -m riptrm_tpu.experiment.sid_sharded_ratio --d 32 \
        --virtual-devices 8 [--steps 12]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _step_rate(jax, jnp, problem, option, steps_pair=(4, 20), tries=5):
    from riptrm_tpu.solvers.riptrm import init_state, make_step

    step = make_step(problem, option)
    st0 = init_state(problem, option)

    def make_chain(k):
        def run(st):
            def body(st, _):
                new_st, info = step(st)
                return new_st, info["residual"]

            st, res = jax.lax.scan(body, st, None, length=k)
            return res[-1]

        return jax.jit(run)

    f_s, f_l = make_chain(steps_pair[0]), make_chain(steps_pair[1])
    np.asarray(f_s(st0)), np.asarray(f_l(st0))  # compile both

    def timed(f):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(f(st0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(timed(f_l) - timed(f_s), 1e-4)
    return (steps_pair[1] - steps_pair[0]) / dt  # steps/s


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--d", type=int, default=32)
    parser.add_argument("--virtual-devices", type=int, default=8)
    parser.add_argument("--n-trajs", type=int, default=4)
    parser.add_argument("--traj-steps", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    if args.virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual_devices}"
        )

    from riptrm_tpu.config import setup

    jax = setup(cpu=True, x64=False)
    import jax.numpy as jnp

    from riptrm_tpu.parallel.sweep import make_mesh
    from riptrm_tpu.problems import stable_identification as si

    d = args.d
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    _, _, _, true_a = si.generate_true_system(key, d)
    constset = si.generate_constraints(rng, d, true_a, 0.2, 0.1)
    trajs = [
        si.generate_trajectory(rng, d, true_a, h=0.02,
                               n_steps=args.traj_steps, snr=10)[1]
        for _ in range(args.n_trajs)
    ]
    j0, r0, q0, _ = si.generate_interior_initialpoint_lsq(
        jax.random.PRNGKey(args.seed + 1), d, constset
    )
    option_dict = {
        "maxiter": 60,
        "tolresid": 3e-4,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": (
            lambda mu: jnp.maximum(1e-3 * mu, 2e-4)
        ),
    }
    from riptrm_tpu.solvers.riptrm import RIPTRM

    option = RIPTRM(option_dict).option

    plain = si.make_problem(d, trajs, constset, (j0, r0, q0),
                            dtype=jnp.float32)
    mesh = make_mesh({"data": args.virtual_devices})
    sharded = si.make_problem(d, trajs, constset, (j0, r0, q0),
                              dtype=jnp.float32, mesh=mesh,
                              data_axis="data")

    rate_plain = _step_rate(jax, jnp, plain, option)
    rate_sharded = _step_rate(jax, jnp, sharded, option)
    print(json.dumps({
        "d": d,
        "dim": int(plain.manifold.dim),
        "virtual_devices": args.virtual_devices,
        "plain_steps_per_s": round(rate_plain, 2),
        "sharded_steps_per_s": round(rate_sharded, 2),
        "sharded_over_plain_step_time": round(rate_plain / rate_sharded, 3),
        "device": "virtual-cpu-mesh",
    }))


if __name__ == "__main__":
    main()
