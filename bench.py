"""Benchmark: RIPTRM hot path on NonnegPCA n=1000 (BASELINE.json north star).

Measures on the default JAX device (the real TPU chip under the driver):
  1. tCG matvecs/s — chained barrier-Hessian matvecs inside one jit
     (the per-iteration hot op, ``RIPTRM.py:729``)
  2. compiled full-solve inner steps/s and outer iters/s
vs_baseline: the same chained matvec implemented in NumPy on the host CPU —
the reference's compute substrate (pure NumPy/autograd per SURVEY §2) —
measured in this same run, since the reference repo publishes no numbers
(BASELINE.md).

Timing methodology (axon tunnel): ``block_until_ready`` does NOT reliably
block on remote completion through the tunnel, and a device->host fetch
carries a large fixed latency (~30 ms measured).  Every timed region
therefore ends with a forced host fetch, and chain throughput is the
MARGINAL rate between two chain lengths — (t_long - t_short) /
(K_long - K_short) — which cancels the fixed per-call overhead and reports
true device throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

from riptrm_tpu.utils.retry import retry_transient

N = 1000
CHAIN_SHORT = 512
# Long-chain lengths sized so the device-time delta clearly exceeds the
# ~30 ms (+/- a few ms jitter) fixed tunnel-fetch overhead: the XLA chain
# runs ~10 us/matvec, the VMEM-resident Pallas chain ~0.6 us/matvec.
CHAIN_LONG_XLA = 4096
CHAIN_LONG_PALLAS = 65536
SOLVE_STEPS = 400
# Remote-TPU compile latency is highly variable (seconds to minutes per new
# program); skip the optional measurements when the deadline approaches so
# the headline JSON line always prints within the driver's budget.
DEADLINE_S = 480.0
_START = time.time()
# Retry sleeps (35 s worker-recovery windows) extend the deadline so a
# healed flake doesn't truncate the remaining sections; capped so the
# driver's external budget still bounds the run.
_MAX_DEADLINE_EXTENSION_S = 150.0
_deadline_extension_s = 0.0

# Results accumulate here as sections complete; the emit path (normal end,
# SIGTERM from an external timeout, or the SIGALRM backstop) prints whatever
# has been measured so far — a remote compile can block for minutes with no
# way to interrupt it, so the headline line must never depend on every
# section finishing.
RESULT = {
    "metric": "riptrm_tcg_matvecs_per_sec_nonnegpca_n1000",
    "value": 0,
    "unit": "matvec/s",
    "vs_baseline": 0,
    "extras": {},
}
_EMITTED = False


def _emit():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)


def _install_deadline_handlers():
    import os
    import signal

    def handler(signum, frame):
        RESULT["extras"]["truncated_by_signal"] = signum
        _emit()
        # Mirror the exception path: success only if a headline was measured.
        os._exit(0 if RESULT["value"] else 1)

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGALRM, handler)
    signal.alarm(int(DEADLINE_S + 30))


def _time_left(margin: float = 60.0) -> bool:
    return time.time() - _START < DEADLINE_S + _deadline_extension_s - margin


def _retry(fn, label):
    """Section-level transient-failure guard (VERDICT r3 item 1).

    The round-3 driver artifact recorded value=0 for a transient
    FAILED_PRECONDITION the worker healed from in ~30 s; every device
    section now absorbs up to two such windows before giving up.  Retry
    counts land in the emitted extras so a flaky run is visible.
    """

    def note(attempt, exc):
        global _deadline_extension_s
        import signal

        RESULT["extras"]["transient_retries"] = (
            RESULT["extras"].get("transient_retries", 0) + 1
        )
        _deadline_extension_s = min(
            _deadline_extension_s + 35.0, _MAX_DEADLINE_EXTENSION_S
        )
        remaining = DEADLINE_S + _deadline_extension_s + 30 - (time.time() - _START)
        signal.alarm(max(1, int(remaining)))
        print(
            f"[bench retry] {label}: transient device error "
            f"(attempt {attempt + 1}), sleeping 35s: {exc!r}"[:400],
            flush=True,
        )

    return retry_transient(fn, tries=3, sleep_s=35.0, label=label, on_retry=note)


def main():
    _install_deadline_handlers()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from riptrm_tpu.problems import nonneg_pca
    from riptrm_tpu.solvers.riptrm import RIPTRM, _barrier_ops, init_state

    dtype = jnp.float32

    def _setup():
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        data = nonneg_pca.generate_instance(k1, N)
        x0 = np.abs(np.asarray(jax.random.normal(k2, (N,))))
        x0 = x0 / np.linalg.norm(x0)
        return data, x0

    data, x0 = _retry(_setup, "setup")
    problem = nonneg_pca.make_problem(data["Z"], x0, dtype=dtype)

    # f32-aware forcing floors: the reference's 1e-14 floors assume f64.  At
    # f32 the complementarity norm carries ~eps*sqrt(m)*O(mu-scale) noise, so
    # once 1e-3*mu falls below that the inner loop can never converge and the
    # solve stalls on the central path at residual ~ mu_stall*sqrt(m).
    import jax.numpy as _jnp

    option = {
        "maxiter": 60,
        "tolresid": 3e-4,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "forcing_function_Lagrangian": lambda mu: _jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": lambda mu: _jnp.maximum(1e-3 * mu, 2e-4),
    }
    solver = RIPTRM(option)
    state0 = init_state(problem, solver.option)

    # ---- 1. chained tCG matvecs (barrier-Hessian applications) ----------
    x = state0.x
    y = state0.y
    mu = state0.mu

    def chain(v0, length):
        _, hw, _ = _barrier_ops(problem, x, y, mu)

        def body(v, _):
            w = hw(v)
            w = w / jnp.linalg.norm(w)
            return w, ()

        v, _ = jax.lax.scan(body, v0, None, length=length)
        return v

    def timed_fetch(fn, *args, tries=9):
        """Min-of-N wall time of fn(*args) ending in a forced host fetch.
        The tunnel's contention spikes are one-sided (calls only ever get
        slower), so the minimum is the least-contended estimate; the fixed
        fetch overhead cancels in the marginal difference below."""
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal_rate(fn_short, fn_long, v0, k_long):
        np.asarray(fn_short(v0)), np.asarray(fn_long(v0))  # compile both
        t_short = timed_fetch(fn_short, v0)
        t_long = timed_fetch(fn_long, v0)
        # Refuse to report a rate from a delta inside the jitter floor.
        dt = max(t_long - t_short, 2e-3)
        return (k_long - CHAIN_SHORT) / dt

    v0 = jnp.asarray(problem.manifold.random_tangent(jax.random.PRNGKey(2), x), dtype)
    xla_matvecs_per_s = _retry(
        lambda: marginal_rate(
            jax.jit(lambda v: chain(v, CHAIN_SHORT)),
            jax.jit(lambda v: chain(v, CHAIN_LONG_XLA)),
            v0,
            CHAIN_LONG_XLA,
        ),
        "headline_xla_chain",
    )

    # Pallas VMEM-resident chain (Z loaded from HBM once per chain)
    pallas_matvecs_per_s = None
    pallas_error = None
    try:
        from riptrm_tpu.ops.pallas_kernels import chained_barrier_matvec, fits_in_vmem

        if not fits_in_vmem(N):
            raise RuntimeError(f"n={N} exceeds the VMEM-resident budget")

        zs = jnp.asarray(0.5 * (data["Z"] + data["Z"].T), dtype)
        c_slack = problem.slack(x)
        w_bar = y / c_slack
        pallas_matvecs_per_s = _retry(
            lambda: marginal_rate(
                jax.jit(
                    lambda v: chained_barrier_matvec(zs, x, w_bar, v, CHAIN_SHORT)
                ),
                jax.jit(
                    lambda v: chained_barrier_matvec(
                        zs, x, w_bar, v, CHAIN_LONG_PALLAS
                    )
                ),
                v0,
                CHAIN_LONG_PALLAS,
            ),
            "headline_pallas_chain",
        )
    except Exception as e:  # non-TPU backend: report the XLA path only
        pallas_error = f"{type(e).__name__}: {e}"[:300]

    matvecs_per_s = max(xla_matvecs_per_s, pallas_matvecs_per_s or 0.0)

    # Fixed cost of a device->host round trip (reported for context only;
    # every timing below is a marginal rate, which cancels it exactly).
    tiny = jax.device_put(jnp.zeros((8,), dtype))
    fetch_ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny * 1.0)
        fetch_ts.append(time.perf_counter() - t0)
    fetch_overhead = min(fetch_ts)

    # ---- 2. NumPy host baseline for the same chained matvec -------------
    # Host-only and cheap; runs right after the headline chain so the
    # headline value/vs_baseline are finalized here, before the remaining
    # compile-heavy device sections (3, 4, 4a) — a truncated emit still
    # carries the headline.
    z_np = np.asarray(data["Z"], dtype=np.float64)
    x_np = np.asarray(x, dtype=np.float64)
    y_np = np.asarray(y, dtype=np.float64)
    c_np = x_np.copy()  # slack = x for NonnegPCA
    v = np.asarray(problem.manifold.random_tangent(jax.random.PRNGKey(3), x))

    zs_np = z_np + z_np.T  # hoisted so the baseline pays one matvec per call
    eg = -zs_np @ x_np

    def hw_np(dx):
        # ehess f = -2 Z dx; rhess = proj(ehess) - (x.egrad) dx; barrier term
        eh = -zs_np @ dx
        rh = eh - np.dot(x_np, eh) * x_np - np.dot(x_np, eg) * dx
        gxaj = -(-dx)  # d/dt slack = dx ... slack = x so Gxaj(dx) = dx
        w = y_np * gxaj / c_np
        bar = w - np.dot(x_np, w) * x_np  # proj of sum w_i * e_i
        return rh + bar

    # Min over repeated loops: host contention (other processes on these
    # 2 vCPUs) only ever slows the baseline down, which would inflate
    # vs_baseline; the minimum is the uncontended estimate.
    n_np = 64
    t_np = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_np):
            v = hw_np(v)
            v = v / np.linalg.norm(v)
        t_np = min(t_np, (time.perf_counter() - t0) / n_np)
    np_matvecs_per_s = 1.0 / t_np

    RESULT["value"] = round(matvecs_per_s, 1)
    RESULT["vs_baseline"] = round(matvecs_per_s / np_matvecs_per_s, 2)
    extras = RESULT["extras"]
    extras.update(
        xla_chain_matvecs_per_sec=round(xla_matvecs_per_s, 1),
        pallas_chain_matvecs_per_sec=(
            round(pallas_matvecs_per_s, 1) if pallas_matvecs_per_s else None
        ),
        pallas_error=pallas_error,
        fetch_overhead_ms=round(fetch_overhead * 1e3, 2),
        numpy_host_matvecs_per_sec=round(np_matvecs_per_s, 1),
        device=str(jax.devices()[0]),
    )

    # ---- 3. batched multi-start sweep throughput (dp axis on one chip) --
    # Runs BEFORE the single-solve stats: the batched sweep is the primary
    # TPU scaling axis (SURVEY §2.3) and must survive the deadline guard.
    from riptrm_tpu.parallel.sweep import batched_riptrm_solve

    zero = jnp.float32(0)
    batch_stats = extras  # stats land in the emitted extras as they finish
    B = 16
    kb = jax.random.PRNGKey(7)
    xs0 = jnp.abs(jax.random.normal(kb, (B, N), dtype=dtype))
    xs0 = xs0 / jnp.linalg.norm(xs0, axis=1, keepdims=True)
    ys0 = jnp.ones((B, N), dtype=dtype)
    # Batched lanes run their matvecs through the MXU, whose default
    # bf16-pass precision has a noise floor far above scalar f32 and stalls
    # the inner loop at tight tolerances (BENCH.md precision notes).
    # 'high' (3-pass bf16) reaches the same residual floor as 'highest'
    # (6-pass) at 1.39x the throughput.
    if _time_left(150.0):
        problem_hp = nonneg_pca.make_problem(
            data["Z"], x0, dtype=dtype, matmul_precision="high"
        )
        B_SHORT, B_LONG = 1, 9

        def make_repeat_batch(bsolve, xs, ys, reps):
            def run(eps):
                def body(carry, _):
                    coupler, total = carry
                    _, ks, res = bsolve(xs + eps * coupler, ys)
                    return (
                        jnp.sum(res).astype(jnp.float32),
                        total + jnp.max(ks),
                    ), res
                (_, total), ress = jax.lax.scan(
                    body, (jnp.float32(0), jnp.int32(0)), None, length=reps
                )
                return total, ress[-1]
            return jax.jit(run)

        def measure_batch(bsolve, xs, ys):
            fb_short = make_repeat_batch(bsolve, xs, ys, B_SHORT)
            fb_long = make_repeat_batch(bsolve, xs, ys, B_LONG)
            fb_short(zero)
            tot_l, res_b = fb_long(zero)  # compile both
            res_host = np.asarray(res_b)
            k_avg = float(tot_l) / B_LONG  # max inner steps, rep-averaged
            t_bs = timed_fetch(lambda e: fb_short(e)[0], zero, tries=7)
            t_bl = timed_fetch(lambda e: fb_long(e)[0], zero, tries=7)
            t_batch = max(t_bl - t_bs, 2e-3) / (B_LONG - B_SHORT)
            return t_batch, k_avg, res_host

        t_batch, k_batch, res_host = _retry(
            lambda: measure_batch(
                batched_riptrm_solve(problem_hp, option, max_steps=SOLVE_STEPS),
                xs0, ys0,
            ),
            "batch16_xla",
        )
        batch_stats.update(
            batch16_solves_per_sec=round(B / t_batch, 3),
            batch16_inner_steps_per_sec=round(B * k_batch / t_batch, 1),
            batch16_median_residual=float(np.median(res_host)),
            batch16_max_residual=float(np.max(res_host)),
        )
        # Batched fused Pallas tCG: custom_vmap routes each lane's tCG into
        # ONE shared-Z VMEM-resident kernel (measured ~2x the XLA-'high'
        # batched path at the same residual floor).
        if pallas_matvecs_per_s and _time_left(120.0):
            try:
                t_p, k_p, res_p = _retry(
                    lambda: measure_batch(
                        batched_riptrm_solve(
                            problem_hp,
                            option | {"use_pallas_tcg": True},
                            max_steps=SOLVE_STEPS,
                        ),
                        xs0, ys0,
                    ),
                    "batch16_pallas",
                )
                batch_stats.update(
                    batch16_pallas_solves_per_sec=round(B / t_p, 3),
                    batch16_pallas_median_residual=float(np.median(res_p)),
                )
            except Exception as e:
                batch_stats["batch16_pallas_error"] = f"{type(e).__name__}: {e}"[:200]
        # Large sweep through the GRIDDED batched kernel (B beyond the
        # single-call VMEM cap runs sequential lane-blocks over one shared
        # Z window — best single-chip sweep throughput, BENCH.md).
        if pallas_matvecs_per_s and _time_left(120.0):
            try:
                BL = 128
                xsL = jnp.abs(jax.random.normal(kb, (BL, N), dtype=dtype))
                xsL = xsL / jnp.linalg.norm(xsL, axis=1, keepdims=True)
                ysL = jnp.ones((BL, N), dtype=dtype)
                t_p, k_p, res_p = _retry(
                    lambda: measure_batch(
                        batched_riptrm_solve(
                            problem_hp,
                            option | {"use_pallas_tcg": True},
                            max_steps=SOLVE_STEPS,
                        ),
                        xsL, ysL,
                    ),
                    "batch128_pallas",
                )
                batch_stats.update(
                    batch128_pallas_solves_per_sec=round(BL / t_p, 1),
                    batch128_pallas_median_residual=float(np.median(res_p)),
                )
            except Exception as e:
                batch_stats["batch128_pallas_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- 4. compiled full solve (marginal over repeated solves) ---------
    # One jit program runs the SAME solve `reps` times inside a lax.scan,
    # each repetition data-dependent on the previous one (x0 is perturbed
    # by eps * <previous result> with eps = 0 at runtime, which XLA cannot
    # fold away), so repetitions serialize and none can be hoisted out of
    # the loop.  Solve time = marginal wall time between two rep counts —
    # the same fetch-canceling methodology as the chain metrics; a one-shot
    # timing of a ~3 ms solve inside the ~30-45 ms (+/- ms) tunnel fetch is
    # pure noise.
    REPS_SHORT, REPS_LONG = 2, 18

    def make_repeat_solve(solve_fn, reps):
        def run(eps):
            def body(carry, i):
                coupler, total = carry
                st0 = state0._replace(x=state0.x + eps * coupler)
                st, k = solve_fn(st0)
                # Residual only on the final repetition: both the short and
                # long chains pay exactly one, so it cancels in the marginal
                # and the throughput metric stays comparable with earlier
                # BENCH.md entries measured without it.
                res = jax.lax.cond(
                    i == reps - 1,
                    lambda: compute_residual_final(st).astype(jnp.float32),
                    lambda: jnp.float32(0),
                )
                return (st.mu.astype(jnp.float32), total + k), (
                    st.outer_iter,
                    k,
                    res,
                )
            (_, total), (outers, ks, resids) = jax.lax.scan(
                body, (jnp.float32(0), jnp.int32(0)), jnp.arange(reps)
            )
            return total, outers[-1], ks[-1], resids[-1]
        return jax.jit(run)

    from riptrm_tpu.ops.kkt import compute_residual

    def compute_residual_final(st):
        return compute_residual(problem, st.x, st.y, jnp.zeros((0,)))[0]

    def solve_marginal(solve_fn):
        """(inner_steps, outer_iters, sec_per_solve, final_residual)."""
        f_short = make_repeat_solve(solve_fn, REPS_SHORT)
        f_long = make_repeat_solve(solve_fn, REPS_LONG)
        f_short(zero)
        _, outer, k_last, res_last = f_long(zero)  # compile both
        t_short = timed_fetch(lambda e: f_short(e)[0], zero, tries=7)
        t_long = timed_fetch(lambda e: f_long(e)[0], zero, tries=7)
        dt = max(t_long - t_short, 2e-3)
        per_solve = dt / (REPS_LONG - REPS_SHORT)
        return int(k_last), int(outer), per_solve, float(res_last)

    if _time_left(90.0):
        solve = solver.solve_compiled(problem, max_steps=SOLVE_STEPS)
        inner_steps, outer_iters, t_solve, final_residual = _retry(
            lambda: solve_marginal(solve), "full_solve"
        )
        extras.update(
            inner_steps_per_sec=round(inner_steps / t_solve, 2),
            outer_iters_per_sec=round(outer_iters / t_solve, 2),
            inner_steps=inner_steps,
            outer_iters=outer_iters,
            final_kkt_residual=final_residual,
        )

    # ---- 4a. compiled solve with the fused Pallas tCG kernel -------------
    if pallas_matvecs_per_s and _time_left(90.0):
        solver_p = RIPTRM(option | {"use_pallas_tcg": True})
        solve_p = solver_p.solve_compiled(problem, max_steps=SOLVE_STEPS)
        steps_p, _, t_p, _ = _retry(
            lambda: solve_marginal(solve_p), "full_solve_pallas"
        )
        extras.update(
            pallas_solve_inner_steps_per_sec=round(steps_p / t_p, 1),
            pallas_solve_ms=round(t_p * 1e3, 2),
        )

    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the driver records stdout; always emit the line
        RESULT["error"] = f"{type(e).__name__}: {e}"
        _emit()
        raise SystemExit(0 if RESULT["value"] else 1)
