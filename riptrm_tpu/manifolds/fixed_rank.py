"""Fixed-rank embedded manifold: m x n matrices of rank k, represented as
(U, S, V) with U in St(m,k), V in St(n,k), S diagonal (stored as a vector).

Named in the driver north star (BASELINE.json) and anticipated by the
reference's own TODO note (``utils.py:205-209`` "need to add ...
FixedRankEmbedded").  Geometry follows Vandereycken (2013): tangent
vectors are stored in the ambient form U M V' + Up V' + U Vp' as the triple
(M [k,k], Up [m,k], Vp [n,k]) with U'Up = 0, V'Vp = 0; the metric is the
Euclidean metric of the embedding.

Solver integration: constrained problems on this manifold are built with
``problems.embedded.ambient_problem`` (cost/constraints as functions of the
embedded matrix; all derivatives chain through ``embed_point`` /
``embed_tangent``) and run through the matrix-free solver paths —
RIPTRM(tCG), RIPM(KrylovIterMethod), RALM.  See ``problems/low_rank.py``
for a full problem family and ``tests/test_embedded.py`` for coverage.
Dense-basis paths (Exact_RepMat, RepresentMatMethod, RSQO) are
intentionally unsupported: there is no closed-form dense tangent basis.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from riptrm_tpu.manifolds.base import Manifold


@dataclasses.dataclass(frozen=True)
class FixedRankEmbedded(Manifold):
    m: int
    n: int
    k: int

    @property
    def dim(self) -> int:
        return (self.m + self.n - self.k) * self.k

    @property
    def typical_dist(self) -> float:
        return math.sqrt(self.dim)

    # point: (u [m,k], s [k], v [n,k]); tangent: (m_ [k,k], up [m,k], vp [n,k])
    def embed_point(self, x):
        u, s, v = x
        return (u * s) @ v.T

    def embed_tangent(self, x, t):
        u, _, v = x
        m_, up, vp = t
        return u @ m_ @ v.T + up @ v.T + u @ vp.T

    def inner(self, x, t1, t2):
        return sum(jnp.vdot(a, b) for a, b in zip(t1, t2))

    def norm(self, x, t):
        return jnp.sqrt(self.inner(x, t, t))

    def proj(self, x, z):
        """Project an ambient m x n matrix onto T_x M."""
        u, _, v = x
        zv = z @ v
        uz = z.T @ u
        m_ = u.T @ zv
        up = zv - u @ m_
        vp = uz - v @ m_.T
        return (m_, up, vp)

    def proj_tangent(self, x, t):
        """Re-impose the structural constraints U'Up = 0, V'Vp = 0 on a
        drifted structured tangent (tCG iterates accumulate roundoff)."""
        u, _, v = x
        m_, up, vp = t
        return (m_, up - u @ (u.T @ up), vp - v @ (v.T @ vp))

    def retract(self, x, t):
        """Metric projection retraction: rank-k truncated SVD of X + t."""
        u, s, v = x
        m_, up, vp = t
        # compact form: [U Up] [[S+M, I],[I, 0]] [V Vp]^T via QR of Up/Vp
        qu, ru = jnp.linalg.qr(up)
        qv, rv = jnp.linalg.qr(vp)
        k = self.k
        zero = jnp.zeros((k, k), dtype=s.dtype)
        core = jnp.block([[jnp.diag(s) + m_, rv.T], [ru, zero]])
        uu, ss, vvt = jnp.linalg.svd(core)
        u_new = jnp.concatenate([u, qu], axis=1) @ uu[:, :k]
        v_new = jnp.concatenate([v, qv], axis=1) @ vvt[:k, :].T
        # One-step symmetric re-orthonormalization, Q(3I - Q'Q)/2: long
        # solves take tens of thousands of retractions and the O(eps)
        # orthonormality drift of U/V compounds linearly (measured 1e-5
        # after ~3e4 steps), flooring the logged manifold-violation metric
        # and with it the KKT residual; this contracts the drift
        # quadratically per step at the cost of two k x k Grams.
        eye_k = 1.5 * jnp.eye(k, dtype=s.dtype)
        u_new = u_new @ (eye_k - 0.5 * (u_new.T @ u_new))
        v_new = v_new @ (eye_k - 0.5 * (v_new.T @ v_new))
        return (u_new, ss[:k], v_new)

    def dist(self, x, y):
        return jnp.linalg.norm(self.embed_point(x) - self.embed_point(y))

    def zero_vector(self, x):
        u, s, v = x
        return (
            jnp.zeros((self.k, self.k), dtype=s.dtype),
            jnp.zeros((self.m, self.k), dtype=s.dtype),
            jnp.zeros((self.n, self.k), dtype=s.dtype),
        )

    def egrad2rgrad(self, x, egrad):
        """egrad is the ambient m x n euclidean gradient."""
        return self.proj(x, egrad)

    def ehess2rhess(self, x, egrad, ehess, t):
        """Vandereycken (2013) curvature correction."""
        u, s, v = x
        m_, up, vp = t
        rhess = self.proj(x, ehess)
        s_inv = 1.0 / s
        t1 = egrad @ vp  # [m,k]
        t2 = egrad.T @ up  # [n,k]
        up_c = (t1 - u @ (u.T @ t1)) * s_inv[None, :]
        vp_c = (t2 - v @ (v.T @ t2)) * s_inv[None, :]
        return (rhess[0], rhess[1] + up_c, rhess[2] + vp_c)

    def transport(self, x, y, t):
        return self.proj(y, self.embed_tangent(x, t))

    def random_point(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        qu, _ = jnp.linalg.qr(jax.random.normal(k1, (self.m, self.k)))
        qv, _ = jnp.linalg.qr(jax.random.normal(k2, (self.n, self.k)))
        s = jnp.sort(jnp.abs(jax.random.normal(k3, (self.k,))))[::-1] + 0.5
        return (qu, s, qv)

    def random_tangent(self, key, x):
        dt = x[1].dtype
        t = self.proj(
            x,
            jax.random.normal(key, (self.m, self.n), dtype=dt),
        )
        nrm = self.norm(x, t)
        return jax.tree.map(lambda a: a / nrm, t)

    def basis(self, x):
        raise NotImplementedError(
            "FixedRankEmbedded has no closed-form dense basis here; use the "
            "matrix-free solver paths (tCG / conjugate residual / Lanczos)."
        )
