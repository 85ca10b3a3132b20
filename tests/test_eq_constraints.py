"""Equality-constraint coverage.

None of the reference's shipped problems use equality constraints, but its
solver/problem layer supports them (``utils.py:56-62``, ``RIPM.py:112-132``,
``RSQO.py:176-191``, ``RALM.py:149-162``); exercise those paths here on a
small sphere problem with one linear equality constraint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.manifolds import Sphere
from riptrm_tpu.ops.kkt import compute_residual
from riptrm_tpu.problems.problem import Problem
from riptrm_tpu.solvers.ralm import RALM
from riptrm_tpu.solvers.ripm import RIPM
from riptrm_tpu.solvers.rsqo import RSQO


@pytest.fixture(scope="module")
def eq_problem():
    """min -x'Zx on S^{n-1} s.t. x >= 0, a'x = t."""
    n = 12
    rng = np.random.default_rng(0)
    z = rng.normal(size=(n, n))
    z = jnp.asarray(z + z.T)
    a = jnp.asarray(np.abs(rng.normal(size=n)))
    t = 0.5
    man = Sphere(n)
    x0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n,)))
    x0 = x0 / jnp.linalg.norm(x0)

    return Problem(
        manifold=man,
        cost=lambda x: -(x @ (z @ x)),
        ineq=lambda x: -x,
        eq=lambda x: jnp.atleast_1d(a @ x - t),
        x0=x0,
        y0=jnp.ones((n,)),
        z0=jnp.zeros((1,)),
        num_ineq=n,
        num_eq=1,
        manvio=lambda x: jnp.linalg.norm(x) - 1.0,
    )


def test_rsqo_solves_eq_constrained(eq_problem):
    out = RSQO(
        {"maxtime": 60, "maxiter": 40, "tolresid": 1e-8, "quadoptim_eigvalcorr": 1e-2}
    ).run(eq_problem)
    assert out.log["residual"][-1] < 1e-7
    x = np.asarray(out.x)
    # equality satisfied, feasible, on manifold
    assert abs(float(eq_problem.eq(out.x)[0])) < 1e-7
    assert x.min() > -1e-8
    assert abs(np.linalg.norm(x) - 1) < 1e-10


def test_ralm_improves_eq_constrained(eq_problem):
    out = RALM({"maxtime": 60, "maxiter": 20, "tolresid": 1e-5}).run(eq_problem)
    assert min(out.log["residual"]) < 0.3 * out.log["residual"][0]
    assert abs(float(eq_problem.eq(out.x)[0])) < 1e-2


def test_ripm_handles_eq_constraints(eq_problem):
    """RIPM's merit line search stalls on this geometry (direction angle
    degenerates near the x_i -> 0 boundary), but the equality-constrained
    Newton system must be solved exactly — verified by the solver's own
    checkNTequation — and the merit must decrease."""
    out = RIPM(
        {"maxtime": 60, "maxiter": 10, "tolresid": 1e-7, "checkNTequation": True}
    ).run(eq_problem)
    errs = [v for v in out.log["NTdir_error1"] if v is not None]
    assert max(errs) < 1e-10  # condensed eq-saddle solve is exact
    assert out.log["residual"][-1] < 0.5 * out.log["residual"][0]


def test_kkt_residual_includes_eq(eq_problem):
    res0 = compute_residual(
        eq_problem, eq_problem.x0, eq_problem.y0, eq_problem.z0
    )[0]
    assert np.isfinite(float(res0)) and float(res0) > 0
