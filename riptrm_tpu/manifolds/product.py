"""Product manifold: points/tangents are tuples of component points/tangents.

Parity target: ``pymanopt.manifolds.Product`` as used for
StableIdentification's Product(Skew(d), SPD(d), SPD(d))
(``/root/reference/src/StableIdentification/coordinator.py:42-44``).

Coordinates are the concatenation of per-component coordinates; the solvers
only go through ``to_coords``/``from_coords`` so no block-diagonal basis is
ever materialized.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from riptrm_tpu.manifolds.base import Manifold


@dataclasses.dataclass(frozen=True)
class Product(Manifold):
    manifolds: tuple

    def __init__(self, manifolds):
        object.__setattr__(self, "manifolds", tuple(manifolds))

    @property
    def dim(self) -> int:
        return sum(m.dim for m in self.manifolds)

    @property
    def typical_dist(self) -> float:
        return math.sqrt(sum(m.typical_dist**2 for m in self.manifolds))

    def _zip(self, *trees):
        # strict: a wrong-arity point/tangent must raise, not be silently
        # truncated into a partial (wrong) result
        return zip(self.manifolds, *trees, strict=True)

    def inner(self, x, u, v):
        return sum(m.inner(xi, ui, vi) for m, xi, ui, vi in self._zip(x, u, v))

    def proj(self, x, v):
        return tuple(m.proj(xi, vi) for m, xi, vi in self._zip(x, v))

    def proj_tangent(self, x, t):
        # Delegate per component: for FixedRankEmbedded components this
        # differs from proj (structured tangents; base.py:81-85).
        return tuple(m.proj_tangent(xi, ti) for m, xi, ti in self._zip(x, t))

    def transport(self, x, y, v):
        return tuple(
            m.transport(xi, yi, vi) for m, xi, yi, vi in self._zip(x, y, v)
        )

    def retract(self, x, v):
        return tuple(m.retract(xi, vi) for m, xi, vi in self._zip(x, v))

    def dist(self, x, y):
        return jnp.sqrt(sum(m.dist(xi, yi) ** 2 for m, xi, yi in self._zip(x, y)))

    def zero_vector(self, x):
        return tuple(m.zero_vector(xi) for m, xi in self._zip(x))

    def egrad2rgrad(self, x, egrad):
        return tuple(m.egrad2rgrad(xi, gi) for m, xi, gi in self._zip(x, egrad))

    def ehess2rhess(self, x, egrad, ehess, v):
        return tuple(
            m.ehess2rhess(xi, gi, hi, vi)
            for m, xi, gi, hi, vi in self._zip(x, egrad, ehess, v)
        )

    def random_point(self, key):
        keys = jax.random.split(key, len(self.manifolds))
        return tuple(m.random_point(k) for m, k in zip(self.manifolds, keys))

    def random_tangent(self, key, x):
        keys = jax.random.split(key, len(self.manifolds))
        vs = tuple(m.random_tangent(k, xi) for m, k, xi in zip(self.manifolds, keys, x))
        nrm = self.norm(x, vs)
        return jax.tree.map(lambda a: a / nrm, vs)

    # ---- coordinates: concatenation of per-component coordinates -----------
    def basis(self, x):
        return tuple(m.basis(xi) for m, xi in self._zip(x))

    def from_coords(self, x, basis, c):
        out = []
        off = 0
        for m, xi, bi in self._zip(x, basis):
            out.append(m.from_coords(xi, bi, jax.lax.dynamic_slice_in_dim(c, off, m.dim)))
            off += m.dim
        return tuple(out)

    def to_coords(self, x, basis, u):
        return jnp.concatenate(
            [m.to_coords(xi, bi, ui) for m, xi, bi, ui in self._zip(x, basis, u)]
        )
