"""Property-based stress tests: random instances, KKT certification at the
returned point (the reference validates only via post-hoc notebook plots;
SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.ops.kkt import compute_residual
from riptrm_tpu.problems import nonneg_pca
from riptrm_tpu.solvers.riptrm import RIPTRM, init_state


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_riptrm_kkt_certificate_random_instances(seed):
    """On random spiked-covariance instances the compiled RIPTRM solve must
    return a point satisfying all KKT conditions to tolerance."""
    n = 24
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    data = nonneg_pca.generate_instance(k1, n)
    x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
    x0 = x0 / np.linalg.norm(x0)
    problem = nonneg_pca.make_problem(data["Z"], x0)
    solver = RIPTRM(
        {"maxiter": 40, "tolresid": 1e-8, "TRS_solver": "tCG", "second_order_stationarity": False}
    )
    solve = jax.jit(solver.solve_compiled(problem, max_steps=800))
    st, k = solve(init_state(problem, solver.option))
    x = np.asarray(st.x)
    y = np.asarray(st.y)
    res = float(compute_residual(problem, st.x, st.y, jnp.zeros((0,)))[0])
    # stationarity + feasibility + dual feasibility + complementarity
    assert res <= 1e-8
    assert abs(np.linalg.norm(x) - 1) < 1e-12
    assert x.min() > -1e-12
    assert y.min() > 0
    assert np.abs(y * (-x)).max() < 1e-7  # complementarity per constraint


@pytest.mark.parametrize("seed", [5, 6])
def test_second_order_certificate(seed):
    """Exact mode with second_order_stationarity must end with
    lambda_min(Hw) above the negative forcing tolerance."""
    n = 16
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    data = nonneg_pca.generate_instance(k1, n)
    x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
    x0 = x0 / np.linalg.norm(x0)
    problem = nonneg_pca.make_problem(data["Z"], x0)
    out = RIPTRM(
        {
            "maxtime": 60,
            "maxiter": 30,
            "tolresid": 1e-7,
            "TRS_solver": "Exact_RepMat",
            "second_order_stationarity": True,
        }
    ).run(problem)
    assert out.log["residual"][-1] <= 1e-7
    mineigs = [v for v in out.log["mineigvalHw"] if v is not None]
    assert mineigs[-1] > -1e-6


def test_solvers_consistent_multipliers():
    """RIPTRM and RSQO must agree on the active set and multipliers at the
    shared optimum (strict complementarity holds on this instance)."""
    from riptrm_tpu.solvers.rsqo import RSQO

    problem = nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")
    opts = {"maxtime": 60, "verbosity": 0}
    out_tr = RIPTRM(
        opts | {"maxiter": 40, "tolresid": 1e-9, "TRS_solver": "tCG", "second_order_stationarity": False}
    ).run(problem)
    out_sq = RSQO(opts | {"maxiter": 20, "tolresid": 1e-9, "quadoptim_eigvalcorr": 1e-2}).run(problem)
    y_tr = np.asarray(out_tr.ineqLagmult)
    y_sq = np.asarray(out_sq.ineqLagmult)
    active_tr = y_tr > 1e-5
    active_sq = y_sq > 1e-5
    np.testing.assert_array_equal(active_tr, active_sq)
    np.testing.assert_allclose(y_tr[active_tr], y_sq[active_sq], rtol=1e-3)
