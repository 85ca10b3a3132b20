"""Exact/second-order-mode step throughput at several n (BENCH.md row).

Marginal-rate (fetch-canceling) timing of the compiled RIPTRM step chain in
Exact_RepMat + second-order mode on the default device.

    python -m riptrm_tpu.experiment.measure_exact_mode [n ...]
"""

import json
import sys
import time

import numpy as np


def main(ns, out="result/exact_mode.json"):
    from riptrm_tpu.config import setup

    jax = setup(x64=False)  # compile cache on the default (TPU) device
    import jax.numpy as jnp

    from riptrm_tpu.problems import nonneg_pca
    from riptrm_tpu.solvers.riptrm import RIPTRM, init_state, make_step

    rows = []
    for n in ns:
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        data = nonneg_pca.generate_instance(k1, n)
        x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
        x0 = x0 / np.linalg.norm(x0)
        problem = nonneg_pca.make_problem(data["Z"], x0, dtype=jnp.float32)
        option = {
            "maxiter": 10_000,
            "tolresid": 1e-5,
            "TRS_solver": "Exact_RepMat",
            "second_order_stationarity": True,
            "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
            "forcing_function_complementarity": lambda mu: jnp.maximum(
                1e-3 * mu, 2e-4
            ),
        }
        solver = RIPTRM(option)
        step = make_step(problem, solver.option)
        state0 = init_state(problem, solver.option)

        def chain(k_steps):
            def run(st):
                def body(s, _):
                    s2, info = step(s)
                    return s2, info["residual"]

                s_fin, res = jax.lax.scan(body, st, None, length=k_steps)
                return res[-1]

            return jax.jit(run)

        K_S, K_L = 8, 72
        f_s, f_l = chain(K_S), chain(K_L)
        np.asarray(f_s(state0)), np.asarray(f_l(state0))  # compile

        def timed(f):
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                np.asarray(f(state0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = max(timed(f_l) - timed(f_s), 2e-3)
        rate = (K_L - K_S) / dt
        rows.append(
            {
                "n": n,
                "exact2nd_steps_per_sec": round(rate, 1),
                "ms_per_step": round(1e3 / rate, 3),
                "device": str(jax.devices()[0]),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    from riptrm_tpu.experiment.cfg import maybe_help

    maybe_help(sys.argv[1:], __doc__)
    ns = [int(a) for a in sys.argv[1:]] or [200, 500, 1000]
    main(ns)
