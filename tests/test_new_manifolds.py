"""Stiefel and fixed-rank embedded manifolds (north-star primitives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.manifolds import FixedRankEmbedded, Stiefel


class TestStiefel:
    man = Stiefel(7, 3)

    def test_retraction_feasible(self):
        x = self.man.random_point(jax.random.PRNGKey(0))
        v = self.man.random_tangent(jax.random.PRNGKey(1), x)
        y = self.man.retract(x, v)
        np.testing.assert_allclose(np.asarray(y.T @ y), np.eye(3), atol=1e-12)

    def test_proj_idempotent_and_tangent(self):
        x = self.man.random_point(jax.random.PRNGKey(2))
        a = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
        p = self.man.proj(x, a)
        np.testing.assert_allclose(np.asarray(self.man.proj(x, p)), np.asarray(p), atol=1e-12)
        # tangency: X'V + V'X = 0
        s = np.asarray(x.T @ p + p.T @ x)
        np.testing.assert_allclose(s, 0, atol=1e-12)

    def test_basis_orthonormal_and_complete(self):
        x = self.man.random_point(jax.random.PRNGKey(4))
        b = self.man.basis(x)
        assert b.shape[0] == self.man.dim == 7 * 3 - 6
        flat = np.asarray(b).reshape(self.man.dim, -1)
        np.testing.assert_allclose(flat @ flat.T, np.eye(self.man.dim), atol=1e-10)

    def test_egrad2rgrad_directional(self):
        x = self.man.random_point(jax.random.PRNGKey(5))
        m = jax.random.normal(jax.random.PRNGKey(6), (7, 7))
        f = lambda p: jnp.trace(p.T @ (m + m.T) @ p)
        rg = self.man.egrad2rgrad(x, jax.grad(f)(x))
        v = self.man.random_tangent(jax.random.PRNGKey(7), x)
        _, dd = jax.jvp(f, (x,), (v,))
        assert float(self.man.inner(x, rg, v)) == pytest.approx(float(dd), rel=1e-8)

    def test_rhess_symmetric(self):
        x = self.man.random_point(jax.random.PRNGKey(8))
        m = jax.random.normal(jax.random.PRNGKey(9), (7, 7))
        f = lambda p: jnp.trace(p.T @ (m + m.T) @ p)

        def rhess(v):
            eg, eh = jax.jvp(jax.grad(f), (x,), (v,))
            return self.man.ehess2rhess(x, eg, eh, v)

        u = self.man.random_tangent(jax.random.PRNGKey(10), x)
        w = self.man.random_tangent(jax.random.PRNGKey(11), x)
        assert float(self.man.inner(x, rhess(u), w)) == pytest.approx(
            float(self.man.inner(x, u, rhess(w))), rel=1e-8
        )

    def test_transport_lands_tangent(self):
        x = self.man.random_point(jax.random.PRNGKey(12))
        y = self.man.random_point(jax.random.PRNGKey(13))
        v = self.man.random_tangent(jax.random.PRNGKey(14), x)
        t = self.man.transport(x, y, v)
        s = np.asarray(y.T @ t + t.T @ y)
        np.testing.assert_allclose(s, 0, atol=1e-12)


class TestFixedRank:
    man = FixedRankEmbedded(8, 6, 2)

    def _pt(self, seed=0):
        return self.man.random_point(jax.random.PRNGKey(seed))

    def test_point_valid(self):
        u, s, v = self._pt()
        np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(v.T @ v), np.eye(2), atol=1e-12)
        assert np.linalg.matrix_rank(np.asarray(self.man.embed_point((u, s, v)))) == 2

    def test_retraction_keeps_rank(self):
        x = self._pt()
        t = self.man.random_tangent(jax.random.PRNGKey(1), x)
        y = self.man.retract(x, jax.tree.map(lambda a: 0.1 * a, t))
        u, s, v = y
        np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(2), atol=1e-10)
        assert np.all(np.asarray(s) > 0)
        assert np.linalg.matrix_rank(np.asarray(self.man.embed_point(y)), tol=1e-8) == 2

    def test_proj_structure(self):
        x = self._pt()
        z = jax.random.normal(jax.random.PRNGKey(2), (8, 6))
        m_, up, vp = self.man.proj(x, z)
        u, _, v = x
        np.testing.assert_allclose(np.asarray(u.T @ up), 0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(v.T @ vp), 0, atol=1e-12)

    def test_proj_is_orthogonal_projection(self):
        """<P(z), t> = <z, embed(t)> for tangent t (self-adjoint idempotent)."""
        x = self._pt()
        z = jax.random.normal(jax.random.PRNGKey(3), (8, 6))
        t = self.man.random_tangent(jax.random.PRNGKey(4), x)
        lhs = float(self.man.inner(x, self.man.proj(x, z), t))
        rhs = float(jnp.vdot(z, self.man.embed_tangent(x, t)))
        assert lhs == pytest.approx(rhs, rel=1e-8)

    def test_retraction_first_order(self):
        x = self._pt()
        t = self.man.random_tangent(jax.random.PRNGKey(5), x)
        eps = 1e-6
        y = self.man.retract(x, jax.tree.map(lambda a: eps * a, t))
        diff = np.asarray(self.man.embed_point(y) - self.man.embed_point(x))
        expected = eps * np.asarray(self.man.embed_tangent(x, t))
        np.testing.assert_allclose(diff, expected, atol=1e-9)

    def test_rhess_symmetric(self):
        x = self._pt()
        a = jax.random.normal(jax.random.PRNGKey(6), (8, 6))

        # f(Z) = 0.5 ||Z - A||^2 in the embedding: egrad = Z - A, ehess = dZ
        def ops(t):
            z = self.man.embed_point(x)
            egrad = z - a
            ehess = self.man.embed_tangent(x, t)
            return self.man.ehess2rhess(x, egrad, ehess, t)

        u_ = self.man.random_tangent(jax.random.PRNGKey(7), x)
        w_ = self.man.random_tangent(jax.random.PRNGKey(8), x)
        assert float(self.man.inner(x, ops(u_), w_)) == pytest.approx(
            float(self.man.inner(x, u_, ops(w_))), rel=1e-6
        )


def test_riptrm_solves_on_stiefel():
    """End-to-end: constrained solve on the Stiefel manifold."""
    from riptrm_tpu.problems.problem import Problem
    from riptrm_tpu.solvers.riptrm import RIPTRM

    man = Stiefel(5, 2)
    rng = np.random.default_rng(0)
    m = rng.normal(size=(5, 5))
    m = jnp.asarray(m + m.T)
    x0 = jnp.abs(jnp.eye(5)[:, :2])
    problem = Problem(
        manifold=man,
        cost=lambda x: -jnp.trace(x.T @ m @ x),
        ineq=lambda x: -x.reshape(-1) - 0.01,  # x_ij >= -0.01
        x0=x0,
        y0=jnp.ones((10,)),
        z0=jnp.zeros((0,)),
        num_ineq=10,
        num_eq=0,
    )
    out = RIPTRM(
        {"maxtime": 60, "maxiter": 30, "tolresid": 1e-6,
         "TRS_solver": "Exact_RepMat", "second_order_stationarity": True}
    ).run(problem)
    assert out.log["residual"][-1] < 1e-6
    x = np.asarray(out.x)
    np.testing.assert_allclose(x.T @ x, np.eye(2), atol=1e-10)
    assert x.min() > -0.0100001


def test_stiefel_rhess_is_tangent():
    """Regression: ehess2rhess must return a TANGENT vector (the outer
    projection is part of the Manopt/pymanopt Weingarten form; without it
    a spurious normal component x*sym(x'v*sym(x'g)) leaks into tCG's
    residual)."""
    import jax

    from riptrm_tpu.manifolds.stiefel import Stiefel

    man = Stiefel(6, 3)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = man.random_point(k[0])
    v = man.random_tangent(k[1], x)
    egrad = jax.random.normal(k[2], (6, 3))
    ehess = jax.random.normal(k[3], (6, 3))
    h = man.ehess2rhess(x, egrad, ehess, v)
    xh = np.asarray(x).T @ np.asarray(h)
    np.testing.assert_allclose(xh + xh.T, 0.0, atol=1e-12)


def test_product_delegates_proj_tangent_and_transport():
    """Product must route proj_tangent/transport to each component (a
    FixedRankEmbedded component's differ from proj), and reject
    wrong-arity tuples instead of silently truncating."""
    import jax
    import pytest

    from riptrm_tpu.manifolds.fixed_rank import FixedRankEmbedded
    from riptrm_tpu.manifolds.product import Product
    from riptrm_tpu.manifolds.sphere import Sphere

    man = Product([Sphere(5), FixedRankEmbedded(6, 4, 2)])
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    x = man.random_point(k[0])
    v = man.random_tangent(k[1], x)
    # proj_tangent on a structured tangent must not crash (FixedRank's
    # proj takes an ambient matrix, not an (M, Up, Vp) tuple)
    t = man.proj_tangent(x, v)
    assert len(t) == 2
    y = man.retract(x, jax.tree.map(lambda a: 0.1 * a, v))
    w = man.transport(x, y, v)
    # transported vector is tangent at y (re-projection is idempotent)
    w2 = man.proj_tangent(y, w)
    for a, b in zip(jax.tree.leaves(w), jax.tree.leaves(w2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    with pytest.raises(ValueError):
        man.inner(x, v, (v[0],))  # wrong arity must raise (strict zip)
