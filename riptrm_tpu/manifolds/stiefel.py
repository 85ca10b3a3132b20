"""Stiefel manifold St(n, p): n x p matrices with orthonormal columns.

Named in the driver north star (BASELINE.json: "sphere/Stiefel/fixed-rank"
manifold primitives) alongside the manifolds the reference itself
instantiates.  Canonical embedded geometry: tangent space
{V : X'V + V'X = 0}, polar retraction, projection vector transport.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from riptrm_tpu.manifolds.base import Manifold, _skew_basis, skew, sym, orthonormal_completion


@dataclasses.dataclass(frozen=True)
class Stiefel(Manifold):
    n: int
    p: int

    @property
    def dim(self) -> int:
        return self.n * self.p - self.p * (self.p + 1) // 2

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.p)

    def inner(self, x, u, v):
        return jnp.vdot(u, v)

    def proj(self, x, v):
        return v - x @ sym(x.T @ v)

    def retract(self, x, v):
        # polar retraction (second order for the embedded metric)
        u, _, vt = jnp.linalg.svd(x + v, full_matrices=False)
        return u @ vt

    def dist(self, x, y):
        # geodesic distance has no closed form; use the embedded chordal
        # distance (common practical choice; consistent metric for logging)
        return jnp.linalg.norm(x - y)

    def egrad2rgrad(self, x, egrad):
        return self.proj(x, egrad)

    def ehess2rhess(self, x, egrad, ehess, v):
        # Standard embedded-Stiefel Weingarten form (Manopt/pymanopt):
        # the OUTER projection is part of the formula — without it the
        # result carries a spurious normal component x*sym(x'v*sym(x'g))
        # that tCG would accumulate in its residual.
        return self.proj(x, ehess - v @ sym(x.T @ egrad))

    def random_point(self, key):
        a = jax.random.normal(key, (self.n, self.p))
        q, _ = jnp.linalg.qr(a)
        return q

    def random_tangent(self, key, x):
        v = self.proj(x, jax.random.normal(key, (self.n, self.p), dtype=jnp.asarray(x).dtype))
        return v / self.norm(x, v)

    def basis(self, x):
        """Orthonormal tangent basis: X A (A skew, scaled basis) plus
        X_perp B (B arbitrary), both Frobenius-orthonormal."""
        x = jnp.asarray(x)
        n, p = self.n, self.p
        xp = orthonormal_completion(x)  # [n, n-p]
        sk = _skew_basis(p, dtype=x.dtype)  # [p(p-1)/2, p, p]
        part1 = jnp.einsum("ij,kjl->kil", x, sk)  # X A_k, orthonormal
        eye = jnp.eye(p, dtype=x.dtype)
        part2 = jnp.einsum("ik,jl->kjil", xp, eye).reshape(((n - p) * p, n, p))
        return jnp.concatenate([part1, part2], axis=0)
