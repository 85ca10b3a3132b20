"""Spectrum utilities: dense operator spectra and matrix-free Lanczos."""

import jax
import jax.flatten_util  # noqa: F401  (used by lanczos)
import jax.numpy as jnp
import numpy as np

from riptrm_tpu.manifolds import Sphere
from riptrm_tpu.ops.spectrum import hessian_spectrum, lanczos, operator_spectrum
from riptrm_tpu.problems import nonneg_pca


def test_operator_spectrum_matches_ambient():
    man = Sphere(10)
    x = man.random_point(jax.random.PRNGKey(0))
    a = np.random.default_rng(0).normal(size=(10, 10))
    a = jnp.asarray(a + a.T)

    def op(v):
        return man.proj(x, a @ v)

    w, vecs = operator_spectrum(man, x, op)
    assert w.shape == (9,)
    # eigen equation holds for every returned pair
    for i in range(9):
        v = jax.tree.map(lambda t: t[i], vecs)
        r = np.asarray(op(v)) - float(w[i]) * np.asarray(v)
        assert np.linalg.norm(r) < 1e-8


def test_hessian_spectrum_eigen_equation():
    p = nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")
    w, vecs = hessian_spectrum(p, p.x0)
    v0 = jax.tree.map(lambda a: a[0], vecs)
    hv = p.rhess(p.x0, v0)
    assert np.linalg.norm(np.asarray(hv) - float(w[0]) * np.asarray(v0)) < 1e-10
    # |w| descending (reference ordering)
    aw = np.abs(np.asarray(w))
    assert (np.diff(aw) <= 1e-9).all()


def test_lanczos_extreme_eigenvalues():
    p = nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")
    w, _ = hessian_spectrum(p, p.x0)
    dense = np.sort(np.asarray(w))
    mv = lambda v: p.rhess(p.x0, v)
    inner = lambda u, v: p.manifold.inner(p.x0, u, v)
    v0 = p.manifold.random_tangent(jax.random.PRNGKey(1), p.x0)
    _, _, ritz = lanczos(mv, v0, inner, 40)
    assert abs(float(ritz[0]) - dense[0]) < 1e-8
    assert abs(float(ritz[-1]) - dense[-1]) < 1e-8


def test_lanczos_nonflat_metric():
    """Lanczos must run in the manifold metric: on SPD (affine-invariant
    metric) the flat-Euclidean recurrence tridiagonalizes a non-symmetric
    operator and its Ritz extremes certify nothing (regression: `inner` was
    accepted but ignored)."""
    from riptrm_tpu.manifolds import SymmetricPositiveDefinite

    man = SymmetricPositiveDefinite(4)
    x = man.random_point(jax.random.PRNGKey(3))
    a = np.random.default_rng(5).normal(size=(10, 10))
    a = jnp.asarray(0.5 * (a + a.T))  # symmetric coefficient matrix in coords

    basis = man.basis(x)

    def op(v):
        # self-adjoint w.r.t. the affine-invariant metric by construction:
        # A applied in metric-orthonormal coordinates
        return man.from_coords(x, basis, a @ man.to_coords(x, basis, v))

    dense = np.sort(np.linalg.eigvalsh(np.asarray(a)))
    v0 = man.random_tangent(jax.random.PRNGKey(4), x)
    _, _, ritz = lanczos(op, v0, lambda u, t: man.inner(x, u, t), 10)
    assert abs(float(ritz[0]) - dense[0]) < 1e-7
    assert abs(float(ritz[-1]) - dense[-1]) < 1e-7


def test_lanczos_breakdown_no_spurious_zeros():
    """Krylov breakdown (v0 spans a 2-dim invariant subspace) must not pad
    the tridiagonal with zero rows: a positive-definite operator would then
    report lambda_min = 0 (regression)."""
    from riptrm_tpu.manifolds import Euclidean

    man = Euclidean(6)
    x = jnp.zeros((6,))
    d = jnp.asarray([3.0, 5.0, 7.0, 9.0, 11.0, 13.0])
    op = lambda v: d * v
    v0 = jnp.zeros((6,)).at[0].set(1.0).at[1].set(1.0)  # Krylov dim = 2
    _, _, ritz = lanczos(op, v0, lambda u, t: jnp.vdot(u, t), 6)
    # extreme Ritz values = exact eigenvalues on the invariant subspace
    assert abs(float(ritz[0]) - 3.0) < 1e-9
    assert abs(float(ritz[-1]) - 5.0) < 1e-9
    # no spurious zero (or otherwise out-of-range) eigenvalues
    assert float(ritz[0]) > 2.9
