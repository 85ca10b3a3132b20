"""Property-based manifold unit tests (SURVEY.md §4: projection idempotence,
retraction feasibility, metric compatibility, conversion vs finite
differences, basis orthonormality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.manifolds import (
    Euclidean,
    Grassmann,
    Product,
    SkewSymmetric,
    Sphere,
    SymmetricPositiveDefinite,
)

MANIFOLDS = [
    ("sphere", Sphere(7)),
    ("grassmann", Grassmann(6, 2)),
    ("spd", SymmetricPositiveDefinite(4)),
    ("skew", SkewSymmetric(4)),
    ("euclidean", Euclidean(5)),
    (
        "product",
        Product([SkewSymmetric(3), SymmetricPositiveDefinite(3), SymmetricPositiveDefinite(3)]),
    ),
]


def _rand_ambient(key, x):
    leaves, treedef = jax.tree.flatten(x)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, leaf.shape, leaf.dtype) for k, leaf in zip(keys, leaves)],
    )


@pytest.mark.parametrize("name,man", MANIFOLDS, ids=[n for n, _ in MANIFOLDS])
class TestManifold:
    def test_projection_idempotent(self, name, man):
        key = jax.random.PRNGKey(0)
        x = man.random_point(key)
        v = _rand_ambient(jax.random.PRNGKey(1), x)
        pv = man.proj(x, v)
        ppv = man.proj(x, pv)
        np.testing.assert_allclose(
            np.concatenate([np.ravel(l) for l in jax.tree.leaves(pv)]),
            np.concatenate([np.ravel(l) for l in jax.tree.leaves(ppv)]),
            atol=1e-10,
        )

    def test_tangent_norm_positive(self, name, man):
        key = jax.random.PRNGKey(2)
        x = man.random_point(key)
        u = man.random_tangent(jax.random.PRNGKey(3), x)
        assert float(man.norm(x, u)) == pytest.approx(1.0, abs=1e-8)

    def test_retraction_zero_identity(self, name, man):
        x = man.random_point(jax.random.PRNGKey(4))
        y = man.retract(x, man.zero_vector(x))
        assert float(man.dist(x, y)) == pytest.approx(0.0, abs=1e-7)

    def test_basis_orthonormal(self, name, man):
        x = man.random_point(jax.random.PRNGKey(5))
        basis = man.basis(x)
        dim = man.dim
        eye = jnp.eye(dim)
        # Gram matrix through the coords API must be the identity.
        gram = jax.vmap(
            lambda e: man.to_coords(x, basis, man.from_coords(x, basis, e))
        )(eye)
        np.testing.assert_allclose(np.asarray(gram), np.eye(dim), atol=1e-8)

    def test_basis_is_tangent(self, name, man):
        x = man.random_point(jax.random.PRNGKey(6))
        basis = man.basis(x)
        c = jax.random.normal(jax.random.PRNGKey(7), (man.dim,))
        v = man.from_coords(x, basis, c)
        pv = man.proj(x, v)
        err = man.norm(x, jax.tree.map(lambda a, b: a - b, v, pv))
        assert float(err) < 1e-8

    def test_coords_roundtrip(self, name, man):
        x = man.random_point(jax.random.PRNGKey(8))
        basis = man.basis(x)
        u = man.random_tangent(jax.random.PRNGKey(9), x)
        c = man.to_coords(x, basis, u)
        u2 = man.from_coords(x, basis, c)
        err = man.norm(x, jax.tree.map(lambda a, b: a - b, u, u2))
        assert float(err) < 1e-8
        # and the coordinate norm matches the metric norm
        assert float(jnp.linalg.norm(c)) == pytest.approx(float(man.norm(x, u)), abs=1e-8)

    def test_egrad2rgrad_directional_derivative(self, name, man):
        """<rgrad, v>_x must equal the ambient directional derivative."""
        x = man.random_point(jax.random.PRNGKey(10))
        a = _rand_ambient(jax.random.PRNGKey(11), x)

        def f(p):
            return sum(
                jnp.vdot(ai, jnp.tanh(pi)) for ai, pi in zip(jax.tree.leaves(a), jax.tree.leaves(p))
            )

        eg = jax.grad(f)(x)
        rg = man.egrad2rgrad(x, eg)
        v = man.random_tangent(jax.random.PRNGKey(12), x)
        lhs = float(man.inner(x, rg, v))
        _, dd = jax.jvp(f, (x,), (v,))
        assert lhs == pytest.approx(float(dd), rel=1e-6, abs=1e-9)

    def test_retraction_first_order(self, name, man):
        """dist(retract(x, t v), x) ~ t for small t (first-order retraction)."""
        x = man.random_point(jax.random.PRNGKey(13))
        v = man.random_tangent(jax.random.PRNGKey(14), x)
        t = 1e-5
        y = man.retract(x, jax.tree.map(lambda a: t * a, v))
        assert float(man.dist(x, y)) == pytest.approx(t, rel=1e-3)

    def test_rhess_symmetric(self, name, man):
        """Riemannian Hessian (via ehess2rhess) is self-adjoint on T_x M.

        The cost must be well-defined on the manifold; for the Grassmann
        quotient that means invariance under right rotations of the
        representative, so use tr(p^T A p)-type quadratics.
        """
        x = man.random_point(jax.random.PRNGKey(15))
        a = _rand_ambient(jax.random.PRNGKey(16), x)

        def f(p):
            total = 0.0
            for ai, pi in zip(jax.tree.leaves(a), jax.tree.leaves(p)):
                if pi.ndim == 2:
                    m = ai @ ai.T if ai.shape[0] == ai.shape[1] else jnp.eye(pi.shape[0])
                    total = total + jnp.trace(pi.T @ m @ pi)
                else:
                    total = total + jnp.vdot(ai, pi) ** 2 + 0.5 * jnp.vdot(pi, pi)
            return total

        def rhess(v):
            eg, eh = jax.jvp(jax.grad(f), (x,), (v,))
            return man.ehess2rhess(x, eg, eh, v)

        u = man.random_tangent(jax.random.PRNGKey(17), x)
        w = man.random_tangent(jax.random.PRNGKey(18), x)
        lhs = float(man.inner(x, rhess(u), w))
        rhs = float(man.inner(x, u, rhess(w)))
        assert lhs == pytest.approx(rhs, rel=1e-6, abs=1e-8)


def test_sphere_feasibility():
    man = Sphere(10)
    x = man.random_point(jax.random.PRNGKey(0))
    v = man.random_tangent(jax.random.PRNGKey(1), x)
    y = man.retract(x, v)
    assert float(jnp.abs(jnp.linalg.norm(y) - 1.0)) < 1e-12


def test_grassmann_feasibility():
    man = Grassmann(8, 3)
    x = man.random_point(jax.random.PRNGKey(0))
    v = man.random_tangent(jax.random.PRNGKey(1), x)
    y = man.retract(x, v)
    np.testing.assert_allclose(np.asarray(y.T @ y), np.eye(3), atol=1e-12)


def test_spd_feasibility_and_metric():
    man = SymmetricPositiveDefinite(5)
    x = man.random_point(jax.random.PRNGKey(0))
    v = man.random_tangent(jax.random.PRNGKey(1), x)
    y = man.retract(x, jax.tree.map(lambda a: 0.5 * a, v))
    w = jnp.linalg.eigvalsh(y)
    assert float(jnp.min(w)) > 0
    # affine-invariant inner product tr(P^-1 U P^-1 V)
    u = man.random_tangent(jax.random.PRNGKey(2), x)
    xi = np.linalg.inv(np.asarray(x))
    expected = np.trace(xi @ np.asarray(u) @ xi @ np.asarray(v))
    assert float(man.inner(x, u, v)) == pytest.approx(float(expected), rel=1e-10)


def test_spd_dist_vs_logm():
    man = SymmetricPositiveDefinite(4)
    x = man.random_point(jax.random.PRNGKey(3))
    y = man.random_point(jax.random.PRNGKey(4))
    w = np.linalg.eigvals(np.linalg.solve(np.asarray(x), np.asarray(y)))
    expected = np.sqrt(np.sum(np.log(np.real(w)) ** 2))
    assert float(man.dist(x, y)) == pytest.approx(float(expected), rel=1e-8)


def test_typical_dists():
    assert Sphere(50).typical_dist == pytest.approx(np.pi)
    assert Grassmann(5, 3).typical_dist == pytest.approx(np.sqrt(3))
    prod = Product([SkewSymmetric(5), SymmetricPositiveDefinite(5), SymmetricPositiveDefinite(5)])
    assert prod.dim == 10 + 15 + 15
    assert prod.typical_dist == pytest.approx(np.sqrt(10 + 15 + 15))


def test_spd_to_coords_closed_form_matches_generic():
    """SPD's closed-form to_coords (round 5: two triangular solves) must
    equal the generic vmapped-metric-inner path to machine precision."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from riptrm_tpu.manifolds import SymmetricPositiveDefinite
    from riptrm_tpu.manifolds.base import Manifold

    d = 6
    man = SymmetricPositiveDefinite(d)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(d, d))
    x = jnp.asarray(a @ a.T + d * np.eye(d))
    u = jnp.asarray(rng.normal(size=(d, d)))
    u = 0.5 * (u + u.T)
    basis = man.basis(x)
    c_fast = man.to_coords(x, basis, u)
    c_ref = Manifold.to_coords(man, x, basis, u)  # generic vmapped inners
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ref),
                               rtol=1e-10, atol=1e-12)
    # roundtrip: from_coords(to_coords(u)) == u for tangent (symmetric) u
    u2 = man.from_coords(x, basis, c_fast)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u),
                               rtol=1e-9, atol=1e-11)
