"""Spectra of tangent-space operators.

Parity targets: ``hessianspectrum`` (``/root/reference/src/solver/utils.py:417-475``)
and ``operatorspectrum`` (``utils.py:477-530``), which route through SciPy's
ARPACK ``eigs`` on a LinearOperator — unavailable under jit/TPU.

TPU-first replacements:
* ``operator_spectrum``: materialize the (self-adjoint) operator in the
  deterministic metric-orthonormal basis with one batched vmap and run a
  symmetric ``eigh`` — exact, O(dim) operator applications, ideal for the
  reference's problem sizes (dim <= a few thousand).
* ``lanczos``: matrix-free Lanczos with full reorthogonalization for
  extreme eigenvalues of very large operators where materialization is too
  expensive; one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.flatten_util  # explicit: not loaded by `import jax` alone
import jax.numpy as jnp

from riptrm_tpu.ops.basis import materialize_symmetrized


def operator_spectrum(manifold, x, op, *, descending_abs=True):
    """Eigen-decomposition of a self-adjoint tangent-space operator.

    Returns (w, V) where V is the stacked eigen tangent-vectors
    [dim, ...point shape...] via the coords API.  Ordering matches the
    reference: by |eigenvalue| descending (``utils.py:522-527``) unless
    ``descending_abs=False`` (ascending).
    """
    basis = manifold.basis(x)
    a = materialize_symmetrized(manifold, x, basis, op)
    w, v = jnp.linalg.eigh(a)  # ascending
    if descending_abs:
        order = jnp.argsort(-jnp.abs(w))
        w = w[order]
        v = v[:, order]
    vecs = jax.vmap(lambda c: manifold.from_coords(x, basis, c))(v.T)
    return w, vecs


def hessian_spectrum(problem, x, *, descending_abs=True):
    """Spectrum of the Riemannian Hessian of the cost
    (reference ``hessianspectrum``)."""
    return operator_spectrum(
        problem.manifold, x, lambda v: problem.rhess(x, v), descending_abs=descending_abs
    )


def lanczos(matvec, v0, inner, num_iters: int):
    """Matrix-free Lanczos tridiagonalization with full reorthogonalization.

    ``matvec``: tangent -> tangent (self-adjoint w.r.t. ``inner``);
    ``v0``: start vector (pytree); ``inner(u, w)``: metric inner product.
    Returns (alphas [k], betas [k-1], ritz_values [k]) — extreme Ritz
    values approximate the operator's extreme eigenvalues.
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(v0)
    n = flat0.shape[0]
    q0 = flat0 / jnp.linalg.norm(flat0)

    def mv_flat(q):
        out = matvec(unravel(q))
        return jax.flatten_util.ravel_pytree(out)[0]

    def body(carry, i):
        Q, q_prev, q, beta_prev = carry
        w = mv_flat(q)
        alpha = jnp.vdot(q, w)
        w = w - alpha * q - beta_prev * q_prev
        # full reorthogonalization against the stored basis
        w = w - Q.T @ (Q @ w)
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.where(beta > 0, beta, 1.0)
        Q = Q.at[i].set(q)
        return (Q, q, q_next, beta), (alpha, beta)

    Q0 = jnp.zeros((num_iters, n), dtype=q0.dtype)
    (_, _, _, _), (alphas, betas) = jax.lax.scan(
        body, (Q0, jnp.zeros_like(q0), q0, jnp.asarray(0.0, q0.dtype)),
        jnp.arange(num_iters),
    )
    t = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    ritz = jnp.linalg.eigvalsh(t)
    return alphas, betas[:-1], ritz
