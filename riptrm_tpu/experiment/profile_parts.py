"""Component-level on-chip profiling of the exact-mode and RSQO hot steps.

Isolates the pieces of the two steps that currently miss their round-2
throughput targets (BENCH.md):

* exact+second-order RIPTRM at n=1000 (currently ~70 steps/s, target >100)
* batched RSQO at n=200 B=16 (currently ~168 solves/s, target >=400)

Each component is timed as the MARGINAL rate between two scan lengths whose
bodies carry a data dependency through the iteration (so XLA cannot hoist
the work out of the loop), ending in a forced host fetch (CLAUDE.md timing
methodology).

    python -m riptrm_tpu.experiment.profile_parts exact   # n=1000 pieces
    python -m riptrm_tpu.experiment.profile_parts rsqo    # B=16 pieces
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _marginal(fn_s, fn_l, k_s, k_l, arg, reps=5):
    """Marginal seconds/iteration between two chain lengths."""
    np.asarray(fn_s(arg))
    np.asarray(fn_l(arg))

    def timed(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(timed(fn_l) - timed(fn_s), 1e-5)
    return dt / (k_l - k_s)


def _chain(jax, body, k):
    """jit(scan(body)) with the carry threaded so work cannot be hoisted."""

    def run(carry):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=k)
        return out

    return jax.jit(run)


def profile_exact(n=1000):
    from riptrm_tpu.config import setup

    jax = setup(x64=False)
    import jax.numpy as jnp

    from riptrm_tpu.ops.basis import materialize_symmetrized
    from riptrm_tpu.ops.trs import solve_trs_ms
    from riptrm_tpu.problems import nonneg_pca
    from riptrm_tpu.solvers.riptrm import (
        _barrier_ops,
        default_option,
        init_state,
        make_step,
        merge_options,
    )

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    data = nonneg_pca.generate_instance(k1, n)
    x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
    x0 = x0 / np.linalg.norm(x0)
    problem = nonneg_pca.make_problem(data["Z"], x0, dtype=jnp.float32)
    man = problem.manifold
    dim = man.dim
    option = merge_options(
        default_option(),
        {
            "TRS_solver": "Exact_RepMat",
            "second_order_stationarity": True,
            "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
            "forcing_function_complementarity": lambda mu: jnp.maximum(
                1e-3 * mu, 2e-4
            ),
        },
    )
    state0 = init_state(problem, option)
    x, y, mu = state0.x, state0.y, state0.mu
    out = {}

    # ---- full step ------------------------------------------------------
    step = make_step(problem, option)
    K_S, K_L = 6, 30
    f_s = _chain(jax, lambda st: step(st)[0], K_S)
    f_l = _chain(jax, lambda st: step(st)[0], K_L)

    def fetch_wrap(f):
        def g(st):
            return f(st).mu

        return lambda st: jax.jit(g)(st)

    # fetch one scalar leaf
    fs = jax.jit(lambda st: f_s(st).mu)
    fl = jax.jit(lambda st: f_l(st).mu)
    out["full_step_ms"] = 1e3 * _marginal(fs, fl, K_S, K_L, state0)

    # ---- materialization (dim HVPs + coords) -----------------------------
    def mat_body(xc):
        basis = man.basis(xc)
        _, hw, cx = _barrier_ops(problem, xc, y, mu)
        h_mat = materialize_symmetrized(man, xc, basis, hw)
        c_vec = man.to_coords(xc, basis, cx)
        # re-perturb x through the result so scan can't hoist
        d = man.from_coords(xc, basis, c_vec * 1e-9 + h_mat[0] * 1e-12)
        return man.retract(xc, d)

    m_s = jax.jit(lambda xc: _chain(jax, mat_body, K_S)(xc)[0])
    m_l = jax.jit(lambda xc: _chain(jax, mat_body, K_L)(xc)[0])
    out["materialize_ms"] = 1e3 * _marginal(m_s, m_l, K_S, K_L, x)

    # ---- TRS (Moré-Sorensen) on a representative matrix ------------------
    basis = man.basis(x)
    _, hw, cx = _barrier_ops(problem, x, y, mu)
    h_mat = jax.jit(lambda: materialize_symmetrized(man, x, basis, hw))()
    c_vec = jax.jit(lambda: man.to_coords(x, basis, cx))()
    h_mat = jax.device_put(h_mat)

    def trs_body(c):
        coeff, lam1, code, mineig = solve_trs_ms(h_mat, c, 1.0)
        return c + coeff * 1e-9

    t_s = jax.jit(lambda c: _chain(jax, trs_body, K_S)(c)[0])
    t_l = jax.jit(lambda c: _chain(jax, trs_body, K_L)(c)[0])
    out["trs_ms_ms"] = 1e3 * _marginal(t_s, t_l, K_S, K_L, c_vec)

    # ---- dense Lanczos ritz (32 matvecs) ---------------------------------
    from riptrm_tpu.ops.spectrum import lanczos

    def ritz_body(v):
        v = v / jnp.linalg.norm(v)
        _, _, ritz = lanczos(lambda u: h_mat @ u, v, lambda a, b: a @ b, 32)
        return v + ritz[0] * 1e-9

    r_s = jax.jit(lambda v: _chain(jax, ritz_body, K_S)(v)[0])
    r_l = jax.jit(lambda v: _chain(jax, ritz_body, K_L)(v)[0])
    out["ritz32_ms"] = 1e3 * _marginal(r_s, r_l, K_S, K_L, c_vec)

    # ---- cholesky + 2 triangular solves (one MS Newton iteration) --------
    from jax.scipy.linalg import cho_factor, cho_solve

    spd = h_mat + (2.0 + jnp.abs(h_mat).sum() * 0) * jnp.eye(dim, dtype=h_mat.dtype)

    def chol_body(v):
        cf = cho_factor(spd + 1e-9 * jnp.outer(v, v))
        w = cho_solve(cf, v)
        return w / jnp.linalg.norm(w)

    c_s = jax.jit(lambda v: _chain(jax, chol_body, K_S)(v)[0])
    c_l = jax.jit(lambda v: _chain(jax, chol_body, K_L)(v)[0])
    out["chol_plus_solve_ms"] = 1e3 * _marginal(c_s, c_l, K_S, K_L, c_vec)

    out = {k: round(v, 3) for k, v in out.items()}
    out.update(n=n, dim=dim, device=str(jax.devices()[0]))
    print(json.dumps(out), flush=True)
    with open("result/profile_parts_exact.json", "w") as f:
        json.dump(out, f, indent=1)


def profile_rsqo(n=200, B=16):
    from riptrm_tpu.config import setup

    jax = setup(x64=False)
    import jax.numpy as jnp

    from riptrm_tpu.experiment.chip_sweep import build_sweep
    from riptrm_tpu.ops.basis import constraint_grad_rows, materialize_symmetrized
    from riptrm_tpu.ops.qp import solve_qp
    from riptrm_tpu.solvers import rsqo as rsqo_mod

    problem, xs0, ys0 = build_sweep("NonnegPCA", n, B)
    man = problem.manifold
    dim = man.dim
    option = rsqo_mod.merge_options(
        rsqo_mod.default_option(),
        {"quadoptim_type": "reghess_shift", "tolresid": 1e-4},
    )
    out = {}

    step = rsqo_mod.make_step(problem, option)
    state0 = jax.vmap(
        lambda x0, y0: rsqo_mod.RsqoState(
            x=x0, y=y0, z=jnp.zeros((0,), jnp.float32), rho=jnp.asarray(1.0, jnp.float32)
        )
    )(xs0, ys0)

    K_S, K_L = 4, 16
    vstep = jax.vmap(lambda st: step(st)[0])
    f_s = jax.jit(lambda st: _chain(jax, vstep, K_S)(st).rho[0])
    f_l = jax.jit(lambda st: _chain(jax, vstep, K_L)(st).rho[0])
    out["full_vstep_ms"] = 1e3 * _marginal(f_s, f_l, K_S, K_L, state0)

    # ---- Hessian materialize + shift regularize (B lanes) ----------------
    def hess_body(xb):
        def one(x):
            basis = man.basis(x)
            yv = jnp.ones((problem.num_ineq,), jnp.float32)
            hess = problem.lag_rhess_at(x, yv, jnp.zeros((0,), jnp.float32))
            q_raw = materialize_symmetrized(man, x, basis, hess)
            q = rsqo_mod._shift_regularize(q_raw, 1e-5, 1e-8)
            d = man.from_coords(x, basis, q[0] * 1e-9)
            return man.retract(x, d)

        return jax.vmap(one)(xb)

    h_s = jax.jit(lambda xb: _chain(jax, hess_body, K_S)(xb)[0, 0])
    h_l = jax.jit(lambda xb: _chain(jax, hess_body, K_L)(xb)[0, 0])
    out["hess_shift_ms"] = 1e3 * _marginal(h_s, h_l, K_S, K_L, xs0)

    # ---- QP alone (B lanes, representative data) -------------------------
    def build_qp_data(x):
        basis = man.basis(x)
        yv = jnp.ones((problem.num_ineq,), jnp.float32)
        hess = problem.lag_rhess_at(x, yv, jnp.zeros((0,), jnp.float32))
        q_raw = materialize_symmetrized(man, x, basis, hess)
        q = rsqo_mod._shift_regularize(q_raw, 1e-5, 1e-8)
        p = man.to_coords(x, basis, problem.rgrad(x))
        g = constraint_grad_rows(man, x, basis, problem.ineq, problem.num_ineq,
                                 dtype=jnp.float32)
        h = -problem.ineq(x)
        return q, p, g, h

    qs, ps, gs, hs = jax.jit(jax.vmap(build_qp_data))(xs0)

    def qp_body(carry):
        p_cur, warm = carry

        def one(q, p, g, h, wz):
            sol = solve_qp(q, p, g, h, abstol=1e-4, reltol=1e-4, feastol=1e-4,
                           maxiter=option["quadoptim_maxiter"], warm_z=wz)
            return sol.x, sol.z

        xsol, zsol = jax.vmap(one)(qs, p_cur, gs, hs, warm)
        return (p_cur + 1e-9 * xsol, zsol)

    warm0 = jnp.ones_like(hs)
    q_sf = jax.jit(lambda c: _chain(jax, qp_body, K_S)(c)[0][0, 0])
    q_lf = jax.jit(lambda c: _chain(jax, qp_body, K_L)(c)[0][0, 0])
    out["qp_ms"] = 1e3 * _marginal(q_sf, q_lf, K_S, K_L, (ps, warm0))

    # ---- batched cholesky + solves micro ---------------------------------
    from jax.scipy.linalg import cho_factor, cho_solve

    spd = qs + 3.0 * jnp.eye(dim, dtype=jnp.float32)[None]

    def chol_body(v):
        def one(m, vv):
            cf = cho_factor(m + 1e-9 * jnp.outer(vv, vv))
            w = cho_solve(cf, vv)
            return w / jnp.linalg.norm(w)

        return jax.vmap(one)(spd, v)

    v0 = jnp.ones((B, dim), jnp.float32)
    cb_s = jax.jit(lambda v: _chain(jax, chol_body, K_S)(v)[0, 0])
    cb_l = jax.jit(lambda v: _chain(jax, chol_body, K_L)(v)[0, 0])
    out["batched_chol_solve_ms"] = 1e3 * _marginal(cb_s, cb_l, K_S, K_L, v0)

    # ---- constraint rows + line-search-ish evals --------------------------
    def rows_body(xb):
        def one(x):
            basis = man.basis(x)
            g = constraint_grad_rows(man, x, basis, problem.ineq,
                                     problem.num_ineq, dtype=jnp.float32)
            d = man.from_coords(x, basis, g[0] * 1e-9)
            return man.retract(x, d)

        return jax.vmap(one)(xb)

    g_s = jax.jit(lambda xb: _chain(jax, rows_body, K_S)(xb)[0, 0])
    g_l = jax.jit(lambda xb: _chain(jax, rows_body, K_L)(xb)[0, 0])
    out["constraint_rows_ms"] = 1e3 * _marginal(g_s, g_l, K_S, K_L, xs0)

    out = {k: round(v, 3) for k, v in out.items()}
    out.update(n=n, B=B, dim=dim, device=str(jax.devices()[0]))
    print(json.dumps(out), flush=True)
    with open("result/profile_parts_rsqo.json", "w") as f:
        json.dump(out, f, indent=1)


def profile_lowrank(sizes=(64, 256, 512)):
    """Roofline placement of the LowRank embedded barrier-Hessian matvec.

    For each size (m = size, n = size/2, k = size/8 — chip_sweep's shapes)
    measures the marginal per-application time of the full hw operator
    (Vandereycken HVP + barrier term through the embedding) and states it
    against FLOP and HBM-byte models:

      flops ~ matmul chain of embed_tangent (3) + proj (4) + rhess
              corrections (~6) + barrier gx/gx_adj (4) = ~17 O(mnk)
              products -> ~34*m*n*k MACs = 68*m*n*k FLOPs, plus O(mn)
              elementwise;
      bytes ~ ~20 [m, n] f32 arrays streamed = 80*m*n bytes (upper bound;
              XLA fusion keeps most in registers/VMEM at these sizes).

    VERDICT round-2 task 6: either a fixed_rank fast path or a measured
    statement of what binds the generic XLA path.
    """
    from riptrm_tpu.config import setup

    jax = setup(x64=False)
    import jax.numpy as jnp

    from riptrm_tpu.problems import low_rank
    from riptrm_tpu.solvers.riptrm import _barrier_ops

    rows = []
    for size in sizes:
        m, n = size, max(2, size // 2)
        rank = min(max(2, size // 8), n - 1, m - 1)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2)
        data = low_rank.generate_instance(ks[0], m, n, rank)
        x0 = low_rank.generate_initialpoint(ks[1], m, n, rank)
        problem = low_rank.make_problem(data["A"], x0, dtype=jnp.float32)
        man = problem.manifold
        x = problem.x0
        y = jnp.ones((m * n,), jnp.float32)
        mu = jnp.asarray(0.3, jnp.float32)
        _, hw, cx = _barrier_ops(problem, x, y, mu)

        def body(v):
            w = hw(v)
            nrm = jnp.sqrt(man.inner(x, w, w))
            return jax.tree.map(lambda a: a / jnp.maximum(nrm, 1e-30), w)

        K_S, K_L = 32, 512
        f_s = jax.jit(lambda v: _chain(jax, body, K_S)(v)[0][0, 0])
        f_l = jax.jit(lambda v: _chain(jax, body, K_L)(v)[0][0, 0])
        v0 = man.proj_tangent(x, jax.tree.map(jnp.ones_like, cx))
        sec = _marginal(f_s, f_l, K_S, K_L, v0)
        flops = 68.0 * m * n * rank
        bytes_ = 80.0 * m * n
        rows.append({
            "m": m, "n": n, "k": rank,
            "hw_us": round(1e6 * sec, 2),
            "applications_per_s": round(1.0 / sec, 1),
            "eff_gflops": round(flops / sec / 1e9, 1),
            "pct_bf16_peak": round(100 * flops / sec / 197e12, 3),
            "eff_gb_per_s": round(bytes_ / sec / 1e9, 1),
            "pct_hbm_peak": round(100 * (bytes_ / sec) / 819e9, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    import jax as _jax

    with open("result/profile_lowrank.json", "w") as f:
        json.dump({"device": str(_jax.devices()[0]), "rows": rows}, f, indent=1)


if __name__ == "__main__":
    from riptrm_tpu.experiment.cfg import maybe_help

    maybe_help(sys.argv[1:], __doc__)
    which = sys.argv[1] if len(sys.argv) > 1 else "exact"
    if which == "exact":
        profile_exact(*[int(a) for a in sys.argv[2:]][:1] or [1000])
    elif which == "lowrank":
        sizes = [int(a) for a in sys.argv[2:]] or [64, 256, 512]
        profile_lowrank(sizes)
    else:
        profile_rsqo(*[int(a) for a in sys.argv[2:]][:2] or [200, 16])
