"""Exact trust-region subproblem solver (Moré-Sorensen via eigendecomposition).

Parity target: ``TRSgep`` (``/root/reference/src/solver/RIPTRM.py:218-299``),
which solves min 0.5 x'Ax + a'x s.t. x'Bx <= Del^2 through a 2n x 2n
*generalized nonsymmetric* eigenproblem — an operation with no TPU kernel.

TPU-first re-design: the solver operates in metric-orthonormal coordinates
(B = I by construction), so one symmetric ``eigh`` of A plus a safeguarded
Newton iteration on the secular equation gives the global solution,
including the hard case, entirely inside jit with static shapes.

Returns (x, lam, code) with code 0 = interior, 1 = boundary, 2 = hard case,
and lam the Lagrange multiplier of the norm constraint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_trs(A, a, radius, *, newton_iters=60):
    """Global solution of min 0.5 x^T A x + a^T x  s.t. ||x|| <= radius."""
    lam, Q = jnp.linalg.eigh(A)  # ascending
    x, lam_out, code, _ = solve_trs_eig(lam, Q, a, radius, newton_iters=newton_iters)
    return x, lam_out, code


def solve_trs_eig(lam, Q, a, radius, *, newton_iters=60):
    """``solve_trs`` given a precomputed eigendecomposition A = Q diag(lam) Q^T
    (ascending).  Callers that already hold the spectrum — e.g. RIPTRM's
    exact mode, whose second-order criterion needs lam[0] of the same matrix
    — avoid a second dense ``eigh`` per step.  Additionally returns the
    solution's eigenbasis coordinates p_c (x = Q @ p_c), from which the
    model terms x'Ax = p_c'(lam*p_c) and A x = Q (lam*p_c) come for free."""
    dtype = Q.dtype
    n = Q.shape[0]
    b = Q.T @ a
    lam1 = lam[0]
    eps = jnp.finfo(dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(lam)), 1.0)

    # ---- interior candidate (A positive definite, unconstrained min inside)
    pos_def = lam1 > eps * scale
    p_int_c = -b / jnp.where(jnp.abs(lam) < eps * scale, 1.0, lam)
    interior_ok = jnp.logical_and(pos_def, jnp.vdot(p_int_c, p_int_c) <= radius**2)

    # ---- secular equation on the boundary: ||p(sig)|| = radius,
    #      p(sig) = -b / (lam + sig),  sig in (max(0, -lam1), inf)
    sig_lb = jnp.maximum(0.0, -lam1)

    def w2(sig):
        d = lam + sig
        d = jnp.where(jnp.abs(d) < eps * scale, eps * scale, d)
        return jnp.sum((b / d) ** 2)

    # Hard case detection: at the left end of the interval the step is still
    # shorter than the radius (the secular equation has no root).  When A is
    # positive definite but the interior step is infeasible, w2(sig_lb+) =
    # ||p_int||^2 > radius^2, so this single predicate also excludes that
    # branch.
    tiny = eps * scale * 16.0
    hard = jnp.logical_and(~interior_ok, w2(sig_lb + tiny) < radius**2)

    # ---- safeguarded Newton on phi(sig) = 1/||p(sig)|| - 1/radius
    sig0 = sig_lb + jnp.linalg.norm(b) / radius + tiny

    def newton_body(_, sig):
        d = lam + sig
        d = jnp.where(d < eps * scale, eps * scale, d)
        w = jnp.sqrt(jnp.sum((b / d) ** 2))
        w = jnp.maximum(w, jnp.finfo(dtype).tiny)
        phi = 1.0 / w - 1.0 / radius
        dphi = jnp.sum(b**2 / d**3) / w**3
        step = phi / jnp.where(dphi == 0, 1.0, dphi)
        sig_new = sig - step
        return jnp.maximum(sig_new, sig_lb + tiny)

    sig = jax.lax.fori_loop(0, newton_iters, newton_body, sig0)
    d = jnp.where(lam + sig < eps * scale, eps * scale, lam + sig)
    p_bnd = -b / d

    # ---- hard case: sig = -lam1; regular part plus eigenvector of lam1
    min_mask = jnp.abs(lam - lam1) <= 16.0 * eps * scale
    d_h = lam - lam1
    d_h = jnp.where(min_mask, 1.0, d_h)
    p_reg = jnp.where(min_mask, 0.0, -b / d_h)
    alpha2 = jnp.maximum(radius**2 - jnp.vdot(p_reg, p_reg), 0.0)
    e1 = jnp.zeros(n, dtype=dtype).at[0].set(1.0)  # coords of q1 in eigenbasis
    p_hard = p_reg + jnp.sqrt(alpha2) * e1

    p_c = jnp.where(interior_ok, p_int_c, jnp.where(hard, p_hard, p_bnd))
    lam_out = jnp.where(interior_ok, 0.0, jnp.where(hard, -lam1, sig))
    code = jnp.where(interior_ok, 0, jnp.where(hard, 2, 1))
    x = Q @ p_c
    return x, lam_out, code, p_c
