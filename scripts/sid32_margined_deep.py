"""End-to-end solve evidence for the well-margined d=32 generator variant.

Round 5 attributed the d=32 deep-residual floor (3.6e-3, the deepest any
solver reaches on the default instance) to the instance itself: every
constraint width scales with |true_A[r, c]|, so a near-zero entry gets a
razor corridor (1.9e-3 widest segment; barrier conditioning ~1e12) —
`result/sid32_margins.json`.  The documented mitigation,
``generate_constraints(min_segment_width=...)``, was unit-tested but had
NO solve evidence.  This driver closes that loop: generate a d=32
instance with a margin floor, same trajectory/start pipeline as the
default instance (``chip_sweep._generate_payload`` semantics, lsq
interior search), then run the segmented CPU/x64 RIPM-Krylov deep solve
(same arm as `scripts/sid32_cpu_deep.py`).  If the corridor attribution
is right, lanes should converge well below the default instance's
3.6e-3 floor.

    python scripts/sid32_margined_deep.py [--floor 0.05] [--segments 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_margined_payload(d, batch, seed, floor):
    """Mirror of chip_sweep._generate_payload's StableIdentification
    branch (chip_sweep.py:164-199) with the min_segment_width variant,
    cached under a floor-tagged problem name."""
    import jax

    from riptrm_tpu.experiment.chip_sweep import _cache_load, _cache_store
    from riptrm_tpu.problems import stable_identification as si
    from riptrm_tpu.utils.devices import local_cpu

    name = f"StableIdentificationMW{floor:g}"
    payload = _cache_load(name, d, batch, seed)
    if payload is not None:
        return payload, True
    rng = np.random.default_rng(seed)
    with jax.default_device(local_cpu()):
        key = jax.random.PRNGKey(seed)
        _, _, _, true_a = si.generate_true_system(key, d)
        constset = si.generate_constraints(
            rng, d, true_a, oneboxratio=0.2, twoboxratio=0.1,
            min_segment_width=floor,
        )
        trajs = [
            si.generate_trajectory(rng, d, true_a, h=0.02, n_steps=20,
                                   snr=10)[1]
            for _ in range(5)
        ]
        starts = []
        for _ in range(batch):
            key, sub = jax.random.split(key)
            j_m, r_m, q_m, _ = si.generate_interior_initialpoint_lsq(
                sub, d, constset
            )
            starts.append((j_m, r_m, q_m))
    payload = {
        "trajs": np.stack(trajs),
        "constset": np.asarray(constset),
        "b_J": np.stack([s[0] for s in starts]),
        "b_R": np.stack([s[1] for s in starts]),
        "b_Q": np.stack([s[2] for s in starts]),
    }
    _cache_store(name, d, batch, seed, payload)
    return payload, False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--floor", type=float, default=0.05)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--segments", type=int, default=24)
    parser.add_argument("--segment-steps", type=int, default=50)
    parser.add_argument("--krylov-iters", type=int, default=400)
    parser.add_argument("--tolresid", type=float, default=1e-9)
    args = parser.parse_args()

    from riptrm_tpu.config import setup

    jax = setup(cpu=True, x64=True)
    import jax.numpy as jnp

    from riptrm_tpu.ops.kkt import compute_residual
    from riptrm_tpu.problems import stable_identification as si
    from riptrm_tpu.solvers import ripm

    t0 = time.time()
    payload, cache_hit = build_margined_payload(
        args.size, args.batch, args.seed, args.floor
    )
    # instance margin summary (same analysis as scripts/sid32_margins.py)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sid32_margins import entry_segments

    widths = np.array([
        e["widest"] for e in entry_segments(payload["constset"]).values()
    ])
    starts = (payload["b_J"], payload["b_R"], payload["b_Q"])
    problem = si.make_problem(
        args.size, list(payload["trajs"]), payload["constset"],
        tuple(a[0] for a in starts), dtype=jnp.float64,
    )
    xs0 = tuple(jnp.asarray(a, jnp.float64) for a in starts)
    ys0 = jnp.ones((args.batch, problem.num_ineq), jnp.float64)
    gen_s = time.time() - t0
    print(json.dumps({
        "floor": args.floor,
        "cache_hit": cache_hit,
        "widest_segment_min": float(widths.min()),
        "widest_segment_median": float(np.median(widths)),
        "n_constrained_entries": int(widths.size),
        "gen_s": round(gen_s, 1),
    }), flush=True)

    option = ripm.RIPM({
        "maxiter": 100_000,
        "tolresid": args.tolresid,
        "KrylovIterMethod": True,
        "KrylovMaxIteration": args.krylov_iters,
    }).option
    raw_step = ripm.make_step(problem, option)

    def start(x0, y0):
        m = problem.num_ineq
        f = ripm._kkt_field(problem, x0, jnp.zeros((0,), jnp.float64),
                            y0, y0)
        phi0 = ripm._phi(problem, x0, *f)
        st0 = ripm.RipmState(
            x=x0, y=jnp.zeros((0,), jnp.float64), z=y0, s=y0, phi=phi0,
            sigma=jnp.minimum(0.5, phi0**0.25),
            rho=jnp.vdot(y0, y0) / m,
            gamma=jnp.asarray(option["gamma"], jnp.float64),
            iteration=jnp.asarray(0),
        )
        tau_1 = jnp.min(y0 * y0) * m / jnp.vdot(y0, y0)
        tau_2 = jnp.vdot(y0, y0) / jnp.sqrt(phi0)
        return st0, tau_1, tau_2

    sts, t1s, t2s = jax.vmap(start)(xs0, ys0)

    def segment(sts):
        def one(st, t1, t2):
            def body(st, _):
                new_st, _ = raw_step(st, t1, t2)
                return new_st, None

            st, _ = jax.lax.scan(body, st, None,
                                 length=args.segment_steps)
            return st

        return jax.vmap(one)(sts, t1s, t2s)

    seg_c = jax.jit(segment)
    res_fn = jax.jit(jax.vmap(
        lambda st: compute_residual(problem, st.x, st.z, st.y)[0]
    ))

    best = np.asarray(res_fn(sts))
    t1 = time.time()
    for i in range(args.segments):
        sts = seg_c(sts)
        res = np.asarray(res_fn(sts))
        best = np.minimum(best, np.where(np.isnan(res), np.inf, res))
        print(json.dumps({
            "segment": i,
            "steps": (i + 1) * args.segment_steps,
            "median_residual": float(np.median(res)),
            "min_residual": float(np.min(res)),
            "best_median": float(np.median(best)),
            "best_min": float(np.min(best)),
            "t": round(time.time() - t1, 1),
        }), flush=True)
        if float(np.median(best)) <= args.tolresid:
            break
    print(json.dumps({
        "final": True,
        "arm": "ripm",
        "floor": args.floor,
        "batch": args.batch,
        "steps": (i + 1) * args.segment_steps,
        "best_median": float(np.median(best)),
        "best_min": float(np.min(best)),
        "best_per_lane": [float(b) for b in best],
        "run_s": round(time.time() - t1, 1),
        "gen_s": round(gen_s, 1),
        "x64": True,
    }), flush=True)


if __name__ == "__main__":
    main()
