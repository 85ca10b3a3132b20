"""Jittable dense convex QP solver (primal-dual Mehrotra predictor-corrector).

Replaces CVXOPT's ``solvers.qp`` used by RSQO
(``/root/reference/src/solver/RSQO.py:196-208``):

    minimize    0.5 d^T Q d + p^T d
    subject to  G d <= h,   A d = b

with Q symmetric positive definite (RSQO regularizes it first — the clamp
at ``RSQO.py:126-131`` guarantees eigenvalues >= quadoptim_eigvalcorr > 0,
and this solver EXPLOITS that: the condensed Newton matrix
M = Q + G^T diag(z/s) G is then SPD, so each IPM iteration does ONE
Cholesky factorization shared by the predictor and corrector solves, with
equality constraints eliminated through an SPD Schur complement — instead
of two general LU solves of the full saddle-point block per iteration.
Returns the primal solution and both multiplier vectors, matching the
CVXOPT outputs the reference consumes (``sol['x']``, ``sol['z']``,
``sol['y']``).

TPU-first: fixed-shape dense linear algebra, ``lax.while_loop`` with
tolerance-based early exit — the whole solve stays inside the surrounding
jitted solver step and batches cleanly under ``vmap`` (batched Cholesky /
triangular solves hit the MXU; frozen lanes mask out via the while_loop
batching rule).  ``warm_z`` warm-starts the dual from the surrounding SQP
iteration's multipliers: near SQP convergence the start (x=0, s=max(h,eps),
z=y_prev) is already primal-feasible with a near-stationary dual, cutting
the IPM to a handful of iterations (the reference's CVXOPT cold-starts
every QP).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


class QpResult(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray  # inequality multipliers (>= 0)
    y: jnp.ndarray  # equality multipliers
    s: jnp.ndarray  # slacks (>= 0)
    iterations: jnp.ndarray
    gap: jnp.ndarray
    primal_infeasibility: jnp.ndarray
    dual_infeasibility: jnp.ndarray
    status: jnp.ndarray  # 0 = optimal, 1 = max-iter, 2 = NaN-frozen (f32)


def solve_qp(Q, p, G, h, A=None, b=None, *, abstol=1e-10, reltol=1e-10,
             feastol=1e-10, maxiter=50, warm_z=None, method="chol"):
    """Solve the QP; all shapes static.  ``A``/``b`` may be (0, n)/(0,).

    Q must be symmetric POSITIVE DEFINITE (the Newton systems are solved by
    Cholesky; an indefinite Q yields NaNs, not an error) and A full row
    rank.  ``warm_z`` (optional, shape (m,)) warm-starts the inequality
    multipliers, e.g. from the previous QP of an SQP sequence.

    ``method``: 'chol' (default) factors the condensed SPD Newton matrix
    M = Q + G' diag(z/s) G once per IPM iteration, shared by predictor and
    corrector — the fast batched path.  'lu' solves the same condensed
    system by partial-pivot LU (saddle block when A is nonempty): near the
    central path's end diag(z/s) spans ~16 decades and the Cholesky of the
    numerically-indefinite-by-rounding M loses the last digits, which at
    1e-15-deep SQP targets is enough to stall the outer iteration (measured
    on StableIdentification: the Cholesky path plateaus lanes at 1e-2/1e-13
    that the LU path drives to the 3.3e-15 reference floor).  Deep-parity
    f64 runs should use 'lu'; chip-sweep f32 runs never resolve those
    digits and keep the ~40%-faster 'chol'.
    """
    dtype = Q.dtype
    n = Q.shape[0]
    m = G.shape[0]
    if A is None:
        A = jnp.zeros((0, n), dtype=dtype)
        b = jnp.zeros((0,), dtype=dtype)
    l = A.shape[0]

    scale = jnp.maximum(1.0, jnp.linalg.norm(h) / max(m, 1))
    x0 = jnp.zeros((n,), dtype=dtype)
    y0 = jnp.zeros((l,), dtype=dtype)
    if warm_z is None:
        # cold start: s = z = scaled ones (infeasible-start IPM)
        s0 = jnp.full((m,), scale, dtype=dtype)
        z0 = jnp.full((m,), 1.0, dtype=dtype)
    else:
        # warm start at x = 0: s = h makes the primal residual exactly zero
        # whenever h >= 0 (the SQP iterate is feasible); z carries the
        # caller's multipliers.  Both are floored away from the boundary so
        # the first centering step is not blocked.
        s0 = jnp.maximum(h, 1e-2 * scale).astype(dtype)
        z0 = jnp.maximum(jnp.asarray(warm_z, dtype=dtype), 1e-4)

    def residuals(x, s, z, y):
        rd = Q @ x + p + G.T @ z + A.T @ y
        rp = G @ x + s - h
        re = A @ x - b
        return rd, rp, re

    use_lu = method == "lu"

    def kkt_factor(s, z):
        """Factor the condensed Newton system once per IPM iteration.

        chol: M = Q + G^T diag(z/s) G is SPD (Q PD, the barrier term PSD);
        with equality constraints, dy is eliminated through the SPD Schur
        complement S = A M^{-1} A^T.  lu: partial-pivot LU of M (or of the
        [M, A'; A, 0] saddle block) — last-digit robust at extreme barrier
        conditioning (see solve_qp docstring).  Either factorization is
        shared by the predictor and the corrector solve.
        """
        w = z / s
        M = Q + (G.T * w) @ G
        if use_lu:
            if l > 0:
                K = jnp.block([[M, A.T], [A, jnp.zeros((l, l), dtype=dtype)]])
            else:
                K = M
            return (jax.scipy.linalg.lu_factor(K), None, None)
        cf = cho_factor(M)
        if l > 0:
            minv_at = cho_solve(cf, A.T)  # n x l
            cs = cho_factor(A @ minv_at)
        else:
            minv_at = jnp.zeros((n, 0), dtype=dtype)
            cs = None
        return cf, minv_at, cs

    def kkt_solve(fact, s, z, rd, rp, re, rc):
        """Back-substitute one rhs through the shared factorization:

        [Q + G^T W G,  A^T] [dx]   [-rd - G^T ((z*rp - rc)/s)]
        [A,            0  ] [dy] = [-re]
        with W = diag(z/s); recover ds, dz elementwise.
        """
        cf, minv_at, cs = fact
        rhs_x = -rd - G.T @ ((z * rp - rc) / s)
        if use_lu:
            if l > 0:
                sol = jax.scipy.linalg.lu_solve(
                    cf, jnp.concatenate([rhs_x, -re])
                )
                dx, dy = sol[:n], sol[n:]
            else:
                dx = jax.scipy.linalg.lu_solve(cf, rhs_x)
                dy = jnp.zeros((0,), dtype=dtype)
        elif l > 0:
            minv_rhs = cho_solve(cf, rhs_x)
            dy = cho_solve(cs, A @ minv_rhs + re)
            dx = minv_rhs - minv_at @ dy
        else:
            dx = cho_solve(cf, rhs_x)
            dy = jnp.zeros((0,), dtype=dtype)
        ds = -(rp + G @ dx)
        dz = -(rc + z * ds) / s
        return dx, ds, dz, dy

    def max_step(v, dv):
        """Largest alpha in (0, 1] keeping v + alpha dv > 0."""
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, 0.99 * jnp.min(ratio, initial=jnp.inf))

    class State(NamedTuple):
        x: jnp.ndarray
        s: jnp.ndarray
        z: jnp.ndarray
        y: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray
        stalled: jnp.ndarray  # NaN-frozen at the last finite iterate

    def converged(x, s, z, y):
        rd, rp, re = residuals(x, s, z, y)
        gap = jnp.vdot(s, z)
        pcost = 0.5 * x @ Q @ x + p @ x
        pr_inf = jnp.linalg.norm(jnp.concatenate([rp, re])) / jnp.maximum(
            1.0, jnp.linalg.norm(jnp.concatenate([h, b]))
        )
        du_inf = jnp.linalg.norm(rd) / jnp.maximum(1.0, jnp.linalg.norm(p))
        rel_ok = gap <= reltol * jnp.maximum(jnp.abs(pcost), 1.0)
        return (pr_inf <= feastol) & (du_inf <= feastol) & (
            (gap <= abstol) | rel_ok
        )

    def body(st):
        x, s, z, y = st.x, st.s, st.z, st.y
        rd, rp, re = residuals(x, s, z, y)
        mu = jnp.vdot(s, z) / max(m, 1)  # m == 0: equality-only QP, mu := 0
        fact = kkt_factor(s, z)

        # affine (predictor) step
        rc_aff = z * s
        dx_a, ds_a, dz_a, dy_a = kkt_solve(fact, s, z, rd, rp, re, rc_aff)
        alpha_p = max_step(s, ds_a)
        alpha_d = max_step(z, dz_a)
        alpha_a = jnp.minimum(alpha_p, alpha_d)
        mu_aff = jnp.vdot(s + alpha_a * ds_a, z + alpha_a * dz_a) / max(m, 1)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # corrector step (same factorization, new rhs)
        rc = z * s + ds_a * dz_a - sigma * mu
        dx, ds, dz, dy = kkt_solve(fact, s, z, rd, rp, re, rc)
        alpha = jnp.minimum(max_step(s, ds), max_step(z, dz))

        x_n = x + alpha * dx
        s_n = s + alpha * ds
        z_n = z + alpha * dz
        y_n = y + alpha * dy
        # NaN-freeze: in f32 the factorization of a rounding-indefinite
        # Newton matrix yields NaN steps; without this guard a poisoned
        # lane never satisfies converged() and burns the FULL maxiter in
        # lockstep with healthy lanes (measured on a v5e RSQO sweep:
        # 400-iteration burns vs 4-8 for healthy lanes, every SQP step).
        # Freeze at the LAST FINITE iterate instead: status 2, the caller
        # gets a usable approximate solution.
        ok = (
            jnp.all(jnp.isfinite(x_n))
            & jnp.all(jnp.isfinite(s_n))
            & jnp.all(jnp.isfinite(z_n))
            & jnp.all(jnp.isfinite(y_n))
        )
        keep = lambda new, old: jnp.where(ok, new, old)
        x, s, z, y = keep(x_n, x), keep(s_n, s), keep(z_n, z), keep(y_n, y)
        stalled = st.stalled | ~ok
        return State(
            x, s, z, y, st.k + 1, converged(x, s, z, y) | ~ok, stalled
        )

    def cond(st):
        return (~st.done) & (st.k < maxiter)

    st = jax.lax.while_loop(
        cond, body,
        State(
            x0, s0, z0, y0, jnp.asarray(0),
            converged(x0, s0, z0, y0), jnp.asarray(False),
        ),
    )
    rd, rp, re = residuals(st.x, st.s, st.z, st.y)
    return QpResult(
        x=st.x,
        z=st.z,
        y=st.y,
        s=st.s,
        iterations=st.k,
        gap=jnp.vdot(st.s, st.z),
        primal_infeasibility=jnp.linalg.norm(jnp.concatenate([rp, re])),
        dual_infeasibility=jnp.linalg.norm(rd),
        status=jnp.where(st.stalled, 2, jnp.where(st.done, 0, 1)),
    )
