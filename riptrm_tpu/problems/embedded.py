"""Problems on factored embedded manifolds (FixedRankEmbedded).

``Problem`` differentiates cost/constraints with respect to the manifold
point's pytree representation.  That is correct when the representation IS
the ambient embedding (sphere vectors, Grassmann/SPD matrices, products of
those), but wrong for factored representations: a fixed-rank point is the
triple ``(U, S, V)`` while Vandereycken-geometry conversions
(``egrad2rgrad``/``ehess2rhess``) expect Euclidean derivatives with respect
to the *embedded* m x n matrix ``X = (U * S) @ V.T``.

``EmbeddedProblem`` closes that gap: the user supplies ``a_cost``/``a_ineq``/
``a_eq`` as functions of the ambient matrix, and every solver-facing
differential operator chains through ``manifold.embed_point`` /
``manifold.embed_tangent``:

    egrad(x)        = d a_cost(X)            an ambient matrix
    rgrad(x)        = proj_x(egrad)
    lag_rhess(x)[v] = ehess2rhess(x, dL(X), d^2 L(X)[embed_tangent(x, v)], v)
    gx_adj(x)[dx]   = -d a_ineq(X)[embed_tangent(x, dx)]

Value-level accessors (``cost``/``ineq``/``eq`` fields) are stored
pre-composed with ``embed_point`` so solver code that evaluates them on the
manifold point (RSQO merit, RALM AL value, RIPTRM ared) needs no changes.

This completes the integration anticipated by the reference's own TODO
(``/root/reference/src/solver/utils.py:205-209`` "need to add ...
FixedRankEmbedded"): the matrix-free solver paths — RIPTRM(tCG),
RIPM(KrylovIterMethod), RALM — run unmodified on fixed-rank problems.
Dense-basis paths (RIPTRM Exact_RepMat / second-order certificates, RIPM
RepresentMatMethod, RSQO) additionally require ``manifold.basis`` which
FixedRankEmbedded intentionally does not provide (see manifolds/fixed_rank.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from riptrm_tpu.problems.problem import Problem, PyTree


@dataclasses.dataclass(frozen=True)
class EmbeddedProblem(Problem):
    """Constrained problem whose cost/constraints act on the ambient
    embedding of a factored manifold point.  Construct via
    :func:`ambient_problem`."""

    a_cost: Callable = None
    a_ineq: Optional[Callable] = None
    a_eq: Optional[Callable] = None

    # -- ambient Lagrangian ------------------------------------------------
    def _alag(self, x_amb, y, z):
        val = self.a_cost(x_amb)
        if self.has_ineq:
            val = val + jnp.vdot(y, self.a_ineq(x_amb))
        if self.has_eq:
            val = val + jnp.vdot(z, self.a_eq(x_amb))
        return val

    # -- first-order -------------------------------------------------------
    def egrad(self, x):
        return jax.grad(self.a_cost)(self.manifold.embed_point(x))

    def rgrad(self, x):
        return self.manifold.egrad2rgrad(x, self.egrad(x))

    def rhess(self, x, v):
        man = self.manifold
        x_amb = man.embed_point(x)
        v_amb = man.embed_tangent(x, v)
        eg, eh = jax.jvp(jax.grad(self.a_cost), (x_amb,), (v_amb,))
        return man.ehess2rhess(x, eg, eh, v)

    # -- Lagrangian operators ------------------------------------------------
    def lag_egrad(self, x, y, z=None):
        return jax.grad(self._alag)(self.manifold.embed_point(x), y, z)

    def lag_rgrad(self, x, y, z=None):
        return self.manifold.egrad2rgrad(x, self.lag_egrad(x, y, z))

    def lag_rhess(self, x, y, v, z=None):
        man = self.manifold
        x_amb = man.embed_point(x)
        v_amb = man.embed_tangent(x, v)
        eg, eh = jax.jvp(
            lambda xa: jax.grad(self._alag)(xa, y, z), (x_amb,), (v_amb,)
        )
        return man.ehess2rhess(x, eg, eh, v)

    # -- constraint Jacobians ------------------------------------------------
    def gx(self, x, v):
        man = self.manifold
        _, pullback = jax.vjp(self.a_ineq, man.embed_point(x))
        (eg,) = pullback(-v)
        return man.egrad2rgrad(x, eg)

    def gx_adj(self, x, dx):
        man = self.manifold
        _, dg = jax.jvp(
            self.a_ineq, (man.embed_point(x),), (man.embed_tangent(x, dx),)
        )
        return -dg

    def hx(self, x, v):
        man = self.manifold
        _, pullback = jax.vjp(self.a_eq, man.embed_point(x))
        (eg,) = pullback(v)
        return man.egrad2rgrad(x, eg)

    def hx_adj(self, x, dx):
        man = self.manifold
        _, dh = jax.jvp(
            self.a_eq, (man.embed_point(x),), (man.embed_tangent(x, dx),)
        )
        return dh

    # -- point-frozen factories (hot-loop form) ------------------------------
    def lag_rhess_at(self, x, y, z=None):
        man = self.manifold
        x_amb = man.embed_point(x)
        eg, lin = jax.linearize(
            lambda xa: jax.grad(self._alag)(xa, y, z), x_amb
        )

        def hvp(v):
            return man.ehess2rhess(x, eg, lin(man.embed_tangent(x, v)), v)

        return hvp

    def gx_adj_at(self, x):
        man = self.manifold
        _, lin = jax.linearize(self.a_ineq, man.embed_point(x))
        return lambda dx: -lin(man.embed_tangent(x, dx))

    def gx_at(self, x):
        man = self.manifold
        _, pullback = jax.vjp(self.a_ineq, man.embed_point(x))

        def gx(v):
            (eg,) = pullback(-v)
            return man.egrad2rgrad(x, eg)

        return gx


def ambient_problem(
    manifold,
    cost: Callable,
    ineq: Optional[Callable] = None,
    eq: Optional[Callable] = None,
    **kwargs,
) -> EmbeddedProblem:
    """Build an :class:`EmbeddedProblem` from ambient-space callables.

    ``cost``/``ineq``/``eq`` take the embedded ambient matrix
    ``manifold.embed_point(x)``; the returned problem exposes the standard
    point-level value accessors plus embedding-aware derivatives.
    """
    embed = manifold.embed_point
    return EmbeddedProblem(
        manifold=manifold,
        cost=lambda x: cost(embed(x)),
        ineq=(lambda x: ineq(embed(x))) if ineq is not None else None,
        eq=(lambda x: eq(embed(x))) if eq is not None else None,
        a_cost=cost,
        a_ineq=ineq,
        a_eq=eq,
        **kwargs,
    )
