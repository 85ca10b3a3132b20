"""Euclidean spaces and their matrix subspaces (symmetric / skew-symmetric).

Parity targets: ``pymanopt.manifolds.Euclidean`` (dual/slack spaces,
``/root/reference/src/solver/RIPM.py:421-423``) and
``pymanopt.manifolds.SkewSymmetric`` (StableIdentification J-block,
``/root/reference/src/StableIdentification/coordinator.py:38``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from riptrm_tpu.manifolds.base import Manifold, _skew_basis, _sym_basis, skew, sym


@dataclasses.dataclass(frozen=True)
class Euclidean(Manifold):
    shape: tuple  # e.g. (m,) or (d, d)

    def __init__(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], tuple):
            shape = shape[0]
        object.__setattr__(self, "shape", tuple(int(s) for s in shape))

    @property
    def dim(self) -> int:
        out = 1
        for s in self.shape:
            out *= s
        return out

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.dim)

    def inner(self, x, u, v):
        return jnp.vdot(u, v)

    def proj(self, x, v):
        return v

    def retract(self, x, v):
        return x + v

    def dist(self, x, y):
        return jnp.linalg.norm((x - y).reshape(-1))

    def egrad2rgrad(self, x, egrad):
        return egrad

    def ehess2rhess(self, x, egrad, ehess, v):
        return ehess

    def random_point(self, key):
        return jax.random.normal(key, self.shape)

    def random_tangent(self, key, x):
        v = jax.random.normal(key, self.shape, dtype=jnp.asarray(x).dtype)
        return v / jnp.linalg.norm(v.reshape(-1))

    def basis(self, x):
        x = jnp.asarray(x)
        return jnp.eye(self.dim, dtype=x.dtype).reshape((self.dim,) + self.shape)


@dataclasses.dataclass(frozen=True)
class SkewSymmetric(Manifold):
    """Skew-symmetric d x d matrices with the Frobenius metric."""

    d: int

    @property
    def dim(self) -> int:
        return self.d * (self.d - 1) // 2

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.dim)

    def inner(self, x, u, v):
        return jnp.vdot(u, v)

    def proj(self, x, v):
        return skew(v)

    def retract(self, x, v):
        return x + v

    def dist(self, x, y):
        return jnp.linalg.norm((x - y).reshape(-1))

    def egrad2rgrad(self, x, egrad):
        return skew(egrad)

    def ehess2rhess(self, x, egrad, ehess, v):
        return skew(ehess)

    def random_point(self, key):
        return skew(jax.random.normal(key, (self.d, self.d)))

    def random_tangent(self, key, x):
        v = skew(jax.random.normal(key, (self.d, self.d), dtype=jnp.asarray(x).dtype))
        return v / jnp.linalg.norm(v.reshape(-1))

    def basis(self, x):
        return _skew_basis(self.d, dtype=jnp.asarray(x).dtype)


@dataclasses.dataclass(frozen=True)
class Symmetric(Manifold):
    """Symmetric d x d matrices with the Frobenius metric."""

    d: int

    @property
    def dim(self) -> int:
        return self.d * (self.d + 1) // 2

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.dim)

    def inner(self, x, u, v):
        return jnp.vdot(u, v)

    def proj(self, x, v):
        return sym(v)

    def retract(self, x, v):
        return x + v

    def dist(self, x, y):
        return jnp.linalg.norm((x - y).reshape(-1))

    def egrad2rgrad(self, x, egrad):
        return sym(egrad)

    def ehess2rhess(self, x, egrad, ehess, v):
        return sym(ehess)

    def random_point(self, key):
        return sym(jax.random.normal(key, (self.d, self.d)))

    def random_tangent(self, key, x):
        v = sym(jax.random.normal(key, (self.d, self.d), dtype=jnp.asarray(x).dtype))
        return v / jnp.linalg.norm(v.reshape(-1))

    def basis(self, x):
        return _sym_basis(self.d, dtype=jnp.asarray(x).dtype)
