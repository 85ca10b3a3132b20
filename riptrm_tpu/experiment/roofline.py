"""Roofline / MFU accounting for the fused batched Pallas tCG kernels.

Anchors "fast" to the hardware instead of the NumPy baseline (BENCH.md
MFU section): measures achieved FLOP/s of the batched sphere and stiefel
tCG kernels and states them against (a) the chip's raw bf16 MXU peak and
(b) an EMPIRICAL speed-of-light: a bare VMEM-resident matvec chain
(``ops/pallas_kernels.py::bare_matvec_chain``) with the same matvec
shape, precision scheme, orientation and residency as each kernel, run
under the same marginal-timing methodology.

Utilization model (round-4 revision): the previous derived
"row-fill-adjusted peak" (achieved / (B/128 linear fill cap)) measured
**117%** at B=16 — the linear fill model is NOT an upper bound for
skinny MXU operands (pipelined weight reuse beats B/128 proportionality)
— so all derived-cap columns are gone.  What is reported per row:

  pct_bf16_peak            achieved hardware bf16-pass FLOP/s over the
                           197 TFLOP/s chip peak (raw, model-free)
  pct_of_bare_matvec_chain tCG iterations/s over the bare chain's
                           iterations/s at the kernel's own block shape.
                           The tCG body does a superset of the chain's
                           work per iteration, so this is structurally
                           <= 100% (small noise excursions aside) and
                           directly answers "how much of the kernel's
                           time is its matvec" — 100% = the fused control
                           flow is free.

FLOP accounting: sphere matvec is hand-rolled bf16x3 ("high": 3 MXU
passes -> 6*B*n^2 hw FLOPs/iter + VPU elementwise); stiefel matvec is
HIGHEST (bf16x6 -> 12*Bp*n^2 hw FLOPs/iter; round 3 counted 3 passes and
under-reported stiefel by 2x — corrected here, noted in BENCH.md).
Kernels grid over lane blocks (sphere: 64 lanes; stiefel:
``stiefel_lane_block``), so the chain denominator is measured at the
per-block shape and scaled by the grid's sequential block count.

Methodology: marginal rate between two scan-chain lengths, each ending in
a forced host fetch (CLAUDE.md tunnel rules); iteration counts read back
from the kernel's own stats output.

    python -m riptrm_tpu.experiment.roofline [--sizes 1000] [--batches 16 64 128]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

PEAK_BF16 = 197e12  # TPU v5e single-chip MXU peak, FLOP/s


def _measure_chain(make_chain, lens=(50, 1050), tries=5):
    """Marginal kernel-iteration rate between two chain lengths.

    Each chain returns the per-call iteration counts [k_calls, B]; the
    FLOP-relevant count is sum over calls of max-over-lanes (frozen lanes
    still compute in lockstep).  Counting ACTUAL iterations matters: the
    data-coupled chain hands each call a different gradient, so later calls
    may exit earlier than the probe call — a fixed per-call FLOP model
    overestimates.  Chain lengths are chosen so the marginal time (~50 ms
    at these calls' ~50 us) clearly exceeds the ~ms host-fetch jitter
    (CLAUDE.md tunnel timing rules); the earlier (2, 10) lens measured
    noise and reported >100%-of-peak nonsense.

    Returns (iters_per_s, calls_per_s, mean_trips_per_call).
    """
    f_s, f_l = make_chain(lens[0]), make_chain(lens[1])
    it_s = np.asarray(f_s())  # compile + warm, [k, B]
    it_l = np.asarray(f_l())
    trips_s = int(it_s.max(axis=1).sum())
    trips_l = int(it_l.max(axis=1).sum())

    def timed(f):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(f())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(timed(f_l) - timed(f_s), 1e-4)
    d_calls = lens[1] - lens[0]
    return (trips_l - trips_s) / dt, d_calls / dt, (trips_l - trips_s) / d_calls


def bare_chain_rate(jax, jnp, z, v0, precision, left, lens=(1024, 16384),
                    tries=5):
    """Iterations/s of the bare matvec chain at this shape (marginal)."""
    from riptrm_tpu.ops.pallas_kernels import bare_matvec_chain

    def make(k):
        f = jax.jit(lambda v: bare_matvec_chain(z, v, k, precision, left))
        return f

    f_s, f_l = make(lens[0]), make(lens[1])
    np.asarray(f_s(v0)), np.asarray(f_l(v0))  # compile both

    def timed(f):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(f(v0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(timed(f_l) - timed(f_s), 1e-4)
    return (lens[1] - lens[0]) / dt


def sphere_case(jax, jnp, n, b, maxinner):
    from riptrm_tpu.ops.pallas_kernels import (
        max_batched_block,
        pallas_tcg_sphere_quadratic_batched,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    # MFU measurement wants the kernel in STEADY STATE (~maxinner tCG
    # iterations/call), so the quadratic is made PD with a wide eigenvalue
    # spread and every stop condition is pushed out of reach: Z scaled tiny
    # (the [B,n]x[n,n] matvec cost is data-independent; the barrier diagonal
    # w in [1, 100] then dominates and keeps curvature positive), radius
    # effectively infinite (no boundary exit), kappa -> 0 (no convergence
    # exit), mininner = maxinner.  Early runs with a realistic indefinite
    # quadratic exited at iteration 1 (negative curvature) and measured call
    # overhead, not throughput.
    z = jax.random.normal(ks[0], (n, n), jnp.float32)
    z = (z + z.T) * (1e-3 / (2 * np.sqrt(n)))
    xs = jnp.abs(jax.random.normal(ks[1], (b, n), jnp.float32)) + 0.1
    xs = xs / jnp.linalg.norm(xs, axis=1, keepdims=True)
    # condition number ~1e4: CG's per-iteration model decrease stays well
    # above f32 noise for > maxinner iterations (a kappa=100 spread stalled
    # the model_inc exit at ~8 iterations)
    ws = 10.0 ** (4.0 * jax.random.uniform(ks[2], (b, n), dtype=jnp.float32))
    grads = jax.random.normal(ks[3], (b, n), jnp.float32) * 0.1
    grads = grads - jnp.sum(grads * xs, axis=1, keepdims=True) * xs
    radii = jnp.full((b,), 1e18, jnp.float32)

    def call(g):
        eta, heta, iters, code = pallas_tcg_sphere_quadratic_batched(
            z, xs, ws, g, radii,
            maxinner=maxinner, mininner=maxinner, kappa=1e-30,
        )
        return eta, iters

    def make_chain(k_calls):
        def run():
            def body(g, _):
                eta, iters = call(g)
                # data-couple successive calls without changing the problem
                # class: re-project a scaled copy of eta as the next grad
                g2 = eta * 1e-6 + grads
                g2 = g2 - jnp.sum(g2 * xs, axis=1, keepdims=True) * xs
                return g2, iters

            gf, it = jax.lax.scan(body, grads, None, length=k_calls)
            return it  # [k_calls, B] actual per-call iteration counts

        f = jax.jit(run)
        return lambda: f()

    iters_per_s, calls_per_s, trips = _measure_chain(make_chain)
    # per-iteration FLOPs: hardware MXU passes (bf16x3 = 3 passes of the
    # logical [B, n] x [n, n] matmul) + VPU elementwise
    hw_flops_per_iter = 6.0 * b * n * n + 40.0 * b * n
    # empirical denominator: bare chain at the kernel's own block shape
    # (the sphere wrapper grids lane blocks of <= 64)
    bb = b if b <= 64 else min(max_batched_block(n), 64)
    grid = -(-b // bb)
    v0 = grads[:bb] + 0.1
    chain_iters_s = bare_chain_rate(jax, jnp, z, v0, "high", True)
    pct_chain = 100.0 * (iters_per_s * grid) / chain_iters_s
    return trips, calls_per_s, iters_per_s, hw_flops_per_iter, {
        "bare_chain_iters_per_s": round(chain_iters_s, 1),
        "block_lanes": bb,
        "grid_blocks": grid,
        "pct_of_bare_matvec_chain": round(pct_chain, 1),
    }


def stiefel_case(jax, jnp, n, b, p, maxinner, impl="lane_major"):
    from riptrm_tpu.ops.pallas_kernels import (
        _stiefel_bound_pieces,
        pallas_tcg_stiefel_bound_batched,
        pallas_tcg_stiefel_bound_batched_pmajor,
        stiefel_lane_block,
        stiefel_lane_block_pmajor,
    )

    batched_fn = (
        pallas_tcg_stiefel_bound_batched_pmajor
        if impl == "pmajor" else pallas_tcg_stiefel_bound_batched
    )

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    # Same steady-state construction as sphere_case: tiny Z (PD quadratic
    # dominated by the positive barrier weights), unbounded radius, no
    # convergence target (see sphere_case comment).
    z = jax.random.normal(ks[0], (n, n), jnp.float32)
    z = (z + z.T) * (1e-3 / (2 * np.sqrt(n)))
    d = 1.0 + jnp.arange(p - 1, -1, -1, dtype=jnp.float32) / p
    q, _ = jnp.linalg.qr(jax.random.normal(ks[1], (b, n, p), jnp.float32))
    xs = 0.7 * q  # strictly inside |x| <= 0.8
    bound = 0.8
    m = n * p
    # wide multiplier spread -> wide barrier-weight spectrum (see sphere
    # case: keeps the CG chain long before the model_inc exit).  The two
    # bound-side multipliers are set EQUAL: the Lagrangian curvature block
    # sym(X'E) carries y1 - y2, so unequal huge multipliers make hw
    # indefinite and the chain exits on negative curvature at iteration ~3.
    y_half = 10.0 ** (4.0 * jax.random.uniform(ks[2], (b, m))) * 1e-2
    ys = jnp.concatenate([y_half, y_half], axis=1).astype(jnp.float32)
    cs = jnp.concatenate(
        [(bound - xs).reshape(b, m), (bound + xs).reshape(b, m)], axis=1
    )
    grads = jax.random.normal(ks[3], (b, n, p), jnp.float32) * 0.1
    radii = jnp.full((b,), 1e18, jnp.float32)

    ws, ss = jax.vmap(lambda x, y, c: _stiefel_bound_pieces(z, d, x, y, c))(
        xs, ys, cs
    )

    def call(g):
        eta, heta, iters, code = batched_fn(
            z, d, xs, ws, ss, g, radii,
            maxinner=maxinner, mininner=maxinner, kappa=1e-30,
        )
        return eta, iters

    def make_chain(k_calls):
        def run():
            def body(g, _):
                eta, iters = call(g)
                return grads + eta * 1e-6, iters

            gf, it = jax.lax.scan(body, grads, None, length=k_calls)
            return it  # [k_calls, B]

        f = jax.jit(run)
        return lambda: f()

    iters_per_s, calls_per_s, trips = _measure_chain(make_chain)
    bp = b * p
    # HIGHEST matvec = bf16x6 passes of [n, n] x [n, Bp]; the masked
    # [Bpb, Bpb] per-block contractions are counted as overhead (so both
    # %columns are lower bounds on kernel quality)
    hw_flops_per_iter = 12.0 * bp * n * n
    bb = (
        stiefel_lane_block_pmajor(n, p, b)
        if impl == "pmajor" else stiefel_lane_block(n, p, b)
    )
    grid = -(-b // bb)
    bpb = bb * p
    v0 = jnp.transpose(grads[:bb], (1, 0, 2)).reshape(n, bpb) + 0.1
    chain_iters_s = bare_chain_rate(jax, jnp, z, v0, "highest", False)
    pct_chain = 100.0 * (iters_per_s * grid) / chain_iters_s
    return trips, calls_per_s, iters_per_s, hw_flops_per_iter, {
        "bare_chain_iters_per_s": round(chain_iters_s, 1),
        "block_lanes": bb,
        "grid_blocks": grid,
        "pct_of_bare_matvec_chain": round(pct_chain, 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=int, nargs="+", default=[1000])
    parser.add_argument("--batches", type=int, nargs="+", default=[16, 64, 128])
    parser.add_argument("--maxinner", type=int, default=64)
    parser.add_argument("--stiefel-n", type=int, default=128)
    parser.add_argument("--stiefel-p", type=int, default=8)
    parser.add_argument("--skip-sphere", action="store_true",
                        help="stiefel-only run (kernel A/B iterations)")
    parser.add_argument("--out", default="result/roofline.json")
    args = parser.parse_args(argv)

    from riptrm_tpu.config import setup

    jax = setup(x64=False)
    import jax.numpy as jnp

    def make_row(kernel, n, trips, calls_s, iters_s, hw_flops_iter, **extra):
        # achieved = HARDWARE MXU FLOPs (bf16 passes) from ACTUAL iteration
        # counts, stated raw against the chip peak; utilization vs the
        # measured bare-chain denominator arrives via **extra (see module
        # docstring for the model — no derived fill-cap columns).
        achieved = iters_s * hw_flops_iter
        row = {
            "kernel": kernel, "n": n,
            "mean_tcg_iters_per_call": round(trips, 1),
            "kernel_calls_per_s": round(calls_s, 1),
            "tcg_iters_per_s": round(iters_s, 1),
            "achieved_hw_tflops": round(achieved / 1e12, 2),
            "pct_bf16_peak": round(100 * achieved / PEAK_BF16, 2),
        }
        row.update(extra)
        return row

    rows = []
    for n in args.sizes if not args.skip_sphere else []:
        for b in args.batches:
            trips, calls_s, iters_s, hw_fpi, extra = sphere_case(
                jax, jnp, n, b, args.maxinner
            )
            rows.append(make_row(
                "tcg_sphere_batched", n, trips, calls_s, iters_s, hw_fpi,
                B=b, **extra,
            ))
            print(json.dumps(rows[-1]), flush=True)

    for b in args.batches:
        bp = b * args.stiefel_p
        for impl in ("pmajor", "lane_major"):
            trips, calls_s, iters_s, hw_fpi, extra = stiefel_case(
                jax, jnp, args.stiefel_n, b, args.stiefel_p, args.maxinner,
                impl=impl,
            )
            rows.append(make_row(
                f"tcg_stiefel_batched_{impl}", args.stiefel_n, trips,
                calls_s, iters_s, hw_fpi, B=b, p=args.stiefel_p,
                lanes_Bp=bp, **extra,
            ))
            print(json.dumps(rows[-1]), flush=True)
    if args.out:
        import jax as _jax

        with open(args.out, "w") as f:
            json.dump(
                {"device": str(_jax.devices()[0]), "rows": rows}, f, indent=1
            )
    return rows


if __name__ == "__main__":
    main()
