"""Matrix-free conjugate residual method on a (product) tangent space.

Parity target: ``TangentSpaceConjResMethod``
(``/root/reference/src/solver/utils.py:582-619`` and
``RIPM.py:304-340``) — Saad, Iterative Methods for Sparse Linear Systems,
Alg. 6.20.  One ``lax.while_loop``; the operator application is the only
per-iteration cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def conjugate_residual(inner, A, b, v0, *, tol, maxiter):
    """Solve A(v) = b for self-adjoint A w.r.t. ``inner(u, w)``.

    Returns (v, iterations, rel_res).
    """

    def _axpy(alpha, x, y):
        return jax.tree.map(lambda xi, yi: yi + alpha * xi, x, y)

    r0 = jax.tree.map(lambda bi, ai: bi - ai, b, A(v0))
    b_norm = jnp.sqrt(inner(b, b))
    b_norm = jnp.maximum(b_norm, jnp.finfo(b_norm.dtype).tiny)

    class State(NamedTuple):
        v: object
        r: object
        p: object
        Ar: object
        Ap: object
        rAr: jnp.ndarray
        rel_res: jnp.ndarray
        t: jnp.ndarray
        done: jnp.ndarray

    Ar0 = A(r0)
    st0 = State(
        v=v0,
        r=r0,
        p=r0,
        Ar=Ar0,
        Ap=Ar0,
        rAr=inner(r0, Ar0),
        rel_res=jnp.sqrt(inner(r0, r0)) / b_norm,
        t=jnp.asarray(0),
        done=jnp.asarray(False),
    )

    def cond(st):
        return jnp.logical_and(~st.done, st.t < maxiter)

    def body(st):
        ApAp = inner(st.Ap, st.Ap)
        a = st.rAr / jnp.where(ApAp == 0, 1.0, ApAp)
        v = _axpy(a, st.p, st.v)
        r = _axpy(-a, st.Ap, st.r)
        rel_res = jnp.sqrt(inner(r, r)) / b_norm
        done = rel_res < tol
        Ar = A(r)
        rAr_new = inner(r, Ar)
        beta = rAr_new / jnp.where(st.rAr == 0, 1.0, st.rAr)
        p = jax.tree.map(lambda ri, pi: ri + beta * pi, r, st.p)
        Ap = jax.tree.map(lambda ari, api: ari + beta * api, Ar, st.Ap)
        return State(
            v=v, r=r, p=p, Ar=Ar, Ap=Ap, rAr=rAr_new, rel_res=rel_res,
            t=st.t + 1, done=done,
        )

    st = jax.lax.while_loop(cond, body, st0)
    return st.v, st.t, st.rel_res
