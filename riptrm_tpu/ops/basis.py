"""Tangent-space operator materialization via batched transforms.

Replaces the reference's sequential loops
(``selfadj_operator2matrix``/``operator2matrix``/``tangent2vec``,
``/root/reference/src/solver/utils.py:532-580``): a dim x dim representing
matrix is built with ONE ``vmap`` over coordinate directions (dim batched
HVPs) followed by one batched projection — two MXU-friendly batched ops
instead of O(dim^2) sequential inner products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def materialize(manifold, x, basis, op):
    """Dense matrix A with A[i, j] = <basis_i, op(basis_j)>_x.

    ``op`` maps tangent pytrees to tangent pytrees.  The result represents
    ``op`` in metric-orthonormal coordinates (Gram matrix = I).
    """
    dim = manifold.dim
    eye = jnp.eye(dim)

    def column(e):
        return manifold.to_coords(x, basis, op(manifold.from_coords(x, basis, e)))

    return jax.vmap(column)(eye).T  # columns j = op(basis_j) in coords


def materialize_symmetrized(manifold, x, basis, op):
    """As ``materialize`` but symmetrized, for self-adjoint operators whose
    numerical representation may be slightly asymmetric
    (reference ``selfadj_operator2matrix``, ``utils.py:565-573``)."""
    a = materialize(manifold, x, basis, op)
    return 0.5 * (a + a.T)


def materialize_sharded(manifold, x, basis, op, mesh, axis: str = "tp"):
    """``materialize`` with the batched HVP fan-out sharded over a mesh axis.

    For large single instances (SURVEY §2.3 "shard the HVP matvec"): each
    device computes dim/axis_size columns of the representing matrix; the
    result is all-gathered so every device holds the full dim x dim matrix
    for the downstream TRS/eigh.  dim must be divisible by the axis size
    (pad the basis otherwise).
    """
    dim = manifold.dim
    n_shards = mesh.shape[axis]
    assert dim % n_shards == 0, f"dim {dim} not divisible by {axis}={n_shards}"
    eye = jnp.eye(dim)

    def column(e):
        return manifold.to_coords(x, basis, op(manifold.from_coords(x, basis, e)))

    def shard_fn(eye_chunk):
        cols = jax.vmap(column)(eye_chunk)  # [dim/n_shards, dim]
        return jax.lax.all_gather(cols, axis, tiled=True)  # [dim, dim]

    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False
    )
    return fn(eye).T


def covector(manifold, x, basis, v):
    """Coordinates of a tangent vector v (reference ``tangent2vec``,
    ``utils.py:575-580``)."""
    return manifold.to_coords(x, basis, v)


def constraint_grad_rows(manifold, x, basis, fn, m, dtype=None):
    """Rows of Riemannian constraint gradients in basis coordinates.

    G[i, :] = coords of rgrad fn_i at x, for a stacked constraint function
    ``fn: M -> R^m``, via ONE vjp (linearized once, pulled back along the m
    coordinate covectors with a single vmap).  Shared by RSQO's linearized
    constraint matrices, RIPM's equality-gradient matrix, and the
    Rosenbrock second-order-residual callback (reference: per-constraint
    gradient loops, ``utils.py:93-203`` / ``RSQO.py:160-191``).
    """
    _, pullback = jax.vjp(fn, x)

    def row(e):
        (eg,) = pullback(e)
        return manifold.to_coords(x, basis, manifold.egrad2rgrad(x, eg))

    eye = jnp.eye(m) if dtype is None else jnp.eye(m, dtype=dtype)
    return jax.vmap(row)(eye)
