"""Unconstrained Riemannian subsolver tests (RALM's inner engines)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.manifolds import Sphere
from riptrm_tpu.solvers.subsolvers import conjugate_gradient, steepest_descent


@pytest.fixture(scope="module")
def rayleigh():
    """min -x'Ax on the sphere: optimum = dominant eigenvector of A."""
    n = 20
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, n))
    a = jnp.asarray(a + a.T)
    man = Sphere(n)
    cost = lambda x: -(x @ (a @ x))
    rgrad = lambda x: man.egrad2rgrad(x, jax.grad(cost)(x))
    w, v = np.linalg.eigh(np.asarray(a))
    x0 = man.random_point(jax.random.PRNGKey(0))
    return man, cost, rgrad, x0, v[:, -1], -w[-1]


@pytest.mark.parametrize("solver", [steepest_descent, conjugate_gradient])
def test_converges_to_dominant_eigenvector(rayleigh, solver):
    man, cost, rgrad, x0, v_top, f_opt = rayleigh
    res = solver(
        man, cost, rgrad, x0,
        max_iterations=500, min_gradient_norm=1e-9, min_step_size=1e-14,
    )
    # backtracking line searches floor out when cost differences reach
    # machine eps, around gradnorm ~1e-6 (cost converges quadratically)
    assert float(res.gradient_norm) < 1e-5
    assert float(res.cost) == pytest.approx(f_opt, rel=1e-10)
    # converged to +-v_top
    assert abs(abs(float(np.asarray(res.point) @ v_top)) - 1.0) < 1e-6


def test_cg_not_slower_than_sd_on_iterations(rayleigh):
    man, cost, rgrad, x0, _, _ = rayleigh
    sd = steepest_descent(man, cost, rgrad, x0, max_iterations=500, min_gradient_norm=1e-7)
    cg = conjugate_gradient(man, cost, rgrad, x0, max_iterations=500, min_gradient_norm=1e-7)
    assert int(cg.iterations) <= int(sd.iterations) * 2  # sanity, CG should not blow up


def test_ralm_with_cg_subsolver():
    from riptrm_tpu.problems import nonneg_pca
    from riptrm_tpu.solvers.ralm import RALM

    p = nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")
    out = RALM(
        {"maxtime": 60, "maxiter": 10, "tolresid": 1e-4,
         "innersubsolver": "ConjugateGradient"}
    ).run(p)
    assert out.name == "RALM_ConjugateGradient"
    assert min(out.log["residual"]) < 1e-2
