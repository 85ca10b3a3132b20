"""Runner edge cases (the graceful-degradation semantics of the reference,
``base_solver.py:85-107`` + per-step ``do_exit_on_error``): zero budget,
infeasible starts, immediately-satisfied tolerances."""

import jax
import numpy as np
import pytest

from riptrm_tpu.problems import nonneg_pca
from riptrm_tpu.solvers.ralm import RALM
from riptrm_tpu.solvers.riptrm import RIPTRM
from riptrm_tpu.solvers.rsqo import RSQO


@pytest.fixture(scope="module")
def pca():
    return nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")


def test_zero_time_budget(pca):
    """maxtime=0: immediate graceful stop with the iteration-0 row logged."""
    out = RIPTRM(
        {"maxtime": 0, "maxiter": 100, "tolresid": 1e-15,
         "TRS_solver": "tCG", "second_order_stationarity": False, "verbosity": 0}
    ).run(pca)
    assert len(out.log["iteration"]) >= 1
    assert np.isfinite(out.log["residual"][0])


def test_zero_iteration_budget(pca):
    out = RSQO({"maxtime": 60, "maxiter": 0, "tolresid": 1e-15, "verbosity": 0}).run(pca)
    assert len(out.log["iteration"]) == 1  # iteration-0 row only


def test_loose_tolerance_stops_at_row_zero(pca):
    out = RIPTRM(
        {"maxtime": 60, "maxiter": 100, "tolresid": 1e3,
         "TRS_solver": "tCG", "second_order_stationarity": False, "verbosity": 0}
    ).run(pca)
    assert len(out.log["iteration"]) == 1


def test_infeasible_initial_point_no_crash(pca):
    """Negated x0 violates x >= 0: the solver must not crash and every
    logged residual must stay finite (infeasible trial points shrink the
    TR radius, reference RIPTRM.py:769-775)."""
    import jax.numpy as jnp

    from riptrm_tpu.utils.io import loadtxt

    x_bad = -jnp.abs(pca.x0)
    Z = loadtxt("dataset/NonnegPCA/1/Z.csv")
    prob = nonneg_pca.make_problem(Z, np.asarray(x_bad))
    out = RIPTRM(
        {"maxtime": 5, "maxiter": 30, "tolresid": 1e-12,
         "TRS_solver": "tCG", "second_order_stationarity": False, "verbosity": 0}
    ).run(prob)
    res = np.asarray(out.log["residual"], dtype=float)
    assert np.isfinite(res).all()


def test_ralm_zero_time_budget(pca):
    out = RALM({"maxtime": 0, "maxiter": 50, "tolresid": 1e-15, "verbosity": 0}).run(pca)
    assert len(out.log["iteration"]) >= 1
    assert np.isfinite(out.log["residual"][0])
