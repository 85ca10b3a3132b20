"""Pallas TPU kernels for the RIPTRM hot path.

``chained_barrier_matvec``: runs K iterations of the normalized
barrier-Hessian matvec for sphere-constrained quadratic problems
(NonnegPCA structure) with the Z matrix, point, duals and iterate all
resident in VMEM — the HBM read of Z happens ONCE for the whole chain
instead of once per matvec (XLA's scan re-reads Z from HBM every
iteration).  This is the speed-of-light form of the tCG inner loop
(``RIPTRM.py:729`` hot op; SURVEY.md §7 step 9).

Math (NonnegPCA on S^{n-1}, c = slack = x, P = I - x x^T):
    Hw(v) = -2 P(Zs v) + 2 (x' Zs x) v + P((y / c) * v)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(xzx_ref, z_ref, x_ref, w_ref, v_ref, out_ref, *, n_iters):
    """One kernel invocation runs the whole chain in VMEM.

    xzx_ref: [1, 1] scalar x'Zs x (SMEM); z_ref: [n, n] symmetrized Z;
    x_ref: [n, 1] point; w_ref: [n, 1] barrier weights y/c;
    v_ref: [n, 1] start vector.
    """
    x = x_ref[:]
    w = w_ref[:]
    xzx = xzx_ref[0, 0]

    def body(_, v):
        zv = jnp.dot(z_ref[:], v, preferred_element_type=jnp.float32)
        pzv = zv - x * jnp.sum(x * zv)
        bar = w * v
        pbar = bar - x * jnp.sum(x * bar)
        hv = -2.0 * pzv + 2.0 * xzx * v + pbar
        return hv / jnp.sqrt(jnp.sum(hv * hv))

    out_ref[:] = jax.lax.fori_loop(0, n_iters, body, v_ref[:])


@functools.partial(jax.jit, static_argnames=("n_iters",))
def chained_barrier_matvec(zs, x, y_over_c, v0, n_iters: int):
    """K normalized Hw matvecs with everything VMEM-resident."""
    n = zs.shape[0]
    xzx = (x @ (zs @ x)).reshape(1, 1).astype(jnp.float32)
    col = lambda a: a.reshape(n, 1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_iters=n_iters),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xzx, zs.astype(jnp.float32), col(x), col(y_over_c), col(v0))
    return out.reshape(n)
