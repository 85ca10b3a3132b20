"""Jittable dense convex QP solver (primal-dual Mehrotra predictor-corrector).

Replaces CVXOPT's ``solvers.qp`` used by RSQO
(``/root/reference/src/solver/RSQO.py:196-208``):

    minimize    0.5 d^T Q d + p^T d
    subject to  G d <= h,   A d = b

with Q symmetric positive definite (RSQO regularizes it first).  Returns the
primal solution and both multiplier vectors, matching the CVXOPT outputs the
reference consumes (``sol['x']``, ``sol['z']``, ``sol['y']``).

TPU-first: fixed-shape dense linear algebra (one (n+l) x (n+l) factorization
per iteration), ``lax.while_loop`` with tolerance-based early exit — the
whole solve stays inside the surrounding jitted solver step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QpResult(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray  # inequality multipliers (>= 0)
    y: jnp.ndarray  # equality multipliers
    s: jnp.ndarray  # slacks (>= 0)
    iterations: jnp.ndarray
    gap: jnp.ndarray
    primal_infeasibility: jnp.ndarray
    dual_infeasibility: jnp.ndarray
    status: jnp.ndarray  # 0 = optimal, 1 = max-iter


def solve_qp(Q, p, G, h, A=None, b=None, *, abstol=1e-10, reltol=1e-10,
             feastol=1e-10, maxiter=50):
    """Solve the QP; all shapes static.  ``A``/``b`` may be (0, n)/(0,)."""
    dtype = Q.dtype
    n = Q.shape[0]
    m = G.shape[0]
    if A is None:
        A = jnp.zeros((0, n), dtype=dtype)
        b = jnp.zeros((0,), dtype=dtype)
    l = A.shape[0]

    # Starting point: x = 0, s = z = scaled ones (infeasible-start IPM)
    scale = jnp.maximum(1.0, jnp.linalg.norm(h) / max(m, 1))
    x0 = jnp.zeros((n,), dtype=dtype)
    s0 = jnp.full((m,), scale, dtype=dtype)
    z0 = jnp.full((m,), 1.0, dtype=dtype)
    y0 = jnp.zeros((l,), dtype=dtype)

    def residuals(x, s, z, y):
        rd = Q @ x + p + G.T @ z + A.T @ y
        rp = G @ x + s - h
        re = A @ x - b
        return rd, rp, re

    def kkt_solve(x, s, z, y, rd, rp, re, rc):
        """Solve the condensed Newton system for (dx, dy), recover ds, dz.

        [Q + G^T W G,  A^T] [dx]   [-rd - G^T ((z*rp - rc)/s)]
        [A,            0  ] [dy] = [-re]
        with W = diag(z/s).
        """
        w = z / s
        M = Q + (G.T * w) @ G
        rhs_x = -rd - G.T @ ((z * rp - rc) / s)
        if l > 0:
            K = jnp.block([[M, A.T], [A, jnp.zeros((l, l), dtype=dtype)]])
            rhs = jnp.concatenate([rhs_x, -re])
            sol = jnp.linalg.solve(K, rhs)
            dx, dy = sol[:n], sol[n:]
        else:
            dx = jnp.linalg.solve(M, rhs_x)
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

        # affine (predictor) step
        rc_aff = z * s
        dx_a, ds_a, dz_a, dy_a = kkt_solve(x, s, z, y, rd, rp, re, rc_aff)
        alpha_p = max_step(s, ds_a)
        alpha_d = max_step(z, dz_a)
        alpha_a = jnp.minimum(alpha_p, alpha_d)
        mu_aff = jnp.vdot(s + alpha_a * ds_a, z + alpha_a * dz_a) / max(m, 1)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # corrector step
        rc = z * s + ds_a * dz_a - sigma * mu
        dx, ds, dz, dy = kkt_solve(x, s, z, y, rd, rp, re, rc)
        alpha = jnp.minimum(max_step(s, ds), max_step(z, dz))

        x = x + alpha * dx
        s = s + alpha * ds
        z = z + alpha * dz
        y = y + alpha * dy
        return State(x, s, z, y, st.k + 1, converged(x, s, z, y))

    def cond(st):
        return (~st.done) & (st.k < maxiter)

    st = jax.lax.while_loop(
        cond, body, State(x0, s0, z0, y0, jnp.asarray(0), jnp.asarray(False))
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
        status=jnp.where(st.done, 0, 1),
    )
