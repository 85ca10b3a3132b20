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
