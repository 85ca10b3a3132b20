"""Euclidean spaces and their matrix subspaces (symmetric / skew-symmetric).

Parity targets: ``pymanopt.manifolds.Euclidean`` (dual/slack spaces,
``/root/reference/src/solver/RIPM.py:421-423``) and
``pymanopt.manifolds.SkewSymmetric`` (StableIdentification J-block,
``/root/reference/src/StableIdentification/coordinator.py:38``).

All three are flat subspaces of a Euclidean ambient space: the geometry is
identical (Frobenius metric, x + v retraction) and only the subspace
projection and the orthonormal basis differ, so they share ``_FlatSpace``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from riptrm_tpu.manifolds.base import Manifold, _skew_basis, _sym_basis, skew, sym


class _FlatSpace(Manifold):
    """Flat subspace of R^shape: subclasses define ``shape``, ``dim``,
    ``_sub`` (the linear projection onto the subspace) and ``basis``."""

    @staticmethod
    def _sub(v):
        raise NotImplementedError

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.dim)

    def inner(self, x, u, v):
        return jnp.vdot(u, v)

    def proj(self, x, v):
        return self._sub(v)

    def retract(self, x, v):
        return x + v

    def dist(self, x, y):
        return jnp.linalg.norm((x - y).reshape(-1))

    def egrad2rgrad(self, x, egrad):
        return self._sub(egrad)

    def ehess2rhess(self, x, egrad, ehess, v):
        return self._sub(ehess)

    def random_point(self, key):
        return self._sub(jax.random.normal(key, self.shape))

    def random_tangent(self, key, x):
        v = self._sub(
            jax.random.normal(key, self.shape, dtype=jnp.asarray(x).dtype)
        )
        return v / jnp.linalg.norm(v.reshape(-1))


@dataclasses.dataclass(frozen=True)
class Euclidean(_FlatSpace):
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

    @staticmethod
    def _sub(v):
        return v

    def basis(self, x):
        x = jnp.asarray(x)
        return jnp.eye(self.dim, dtype=x.dtype).reshape((self.dim,) + self.shape)


@dataclasses.dataclass(frozen=True)
class SkewSymmetric(_FlatSpace):
    """Skew-symmetric d x d matrices with the Frobenius metric."""

    d: int

    @property
    def shape(self) -> tuple:
        return (self.d, self.d)

    @property
    def dim(self) -> int:
        return self.d * (self.d - 1) // 2

    @staticmethod
    def _sub(v):
        return skew(v)

    def basis(self, x):
        return _skew_basis(self.d, dtype=jnp.asarray(x).dtype)


@dataclasses.dataclass(frozen=True)
class Symmetric(_FlatSpace):
    """Symmetric d x d matrices with the Frobenius metric."""

    d: int

    @property
    def shape(self) -> tuple:
        return (self.d, self.d)

    @property
    def dim(self) -> int:
        return self.d * (self.d + 1) // 2

    @staticmethod
    def _sub(v):
        return sym(v)

    def basis(self, x):
        return _sym_basis(self.d, dtype=jnp.asarray(x).dtype)
