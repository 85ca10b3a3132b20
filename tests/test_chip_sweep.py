"""chip_sweep CLI: instance generation + batched sweep measurement (CPU)."""

import jax.numpy as jnp
import numpy as np

from riptrm_tpu.experiment.chip_sweep import build_sweep, measure_sweep


def test_build_sweep_stable_identification():
    problem, xs0, ys0 = build_sweep("StableIdentification", 3, 2, seed=1)
    # stacked product-manifold points: (J, R, Q) leaves with batch axis
    assert all(leaf.shape == (2, 3, 3) for leaf in xs0)
    assert ys0.shape == (2, problem.num_ineq)
    # every generated start must be strictly feasible interior
    for b in range(2):
        x = tuple(leaf[b] for leaf in xs0)
        assert np.all(np.asarray(problem.ineq_val(x)) < 0)
        assert np.isfinite(float(problem.manvio(x)))


def test_build_sweep_rosenbrock():
    problem, xs0, ys0 = build_sweep("Rosenbrock", 5, 3, seed=2)
    assert xs0.shape == (3, 5, 3)  # Grassmann(5, 3) matrix points
    assert ys0.shape == (3, problem.num_ineq)
    for b in range(3):
        x = np.asarray(xs0[b])
        # on-manifold (orthonormal columns) and feasible starts
        np.testing.assert_allclose(x.T @ x, np.eye(3), atol=1e-5)
        assert np.all(np.asarray(problem.ineq_val(xs0[b])) < 0)


def test_measure_sweep_nonneg_pca():
    problem, xs0, ys0 = build_sweep("NonnegPCA", 32, 2, seed=0)
    assert xs0.shape == (2, 32)
    option = {
        "maxiter": 60,
        "tolresid": 1e-3,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": lambda mu: jnp.maximum(1e-3 * mu, 2e-4),
    }
    per_sweep, res, _, k_avg = measure_sweep(
        problem, xs0, ys0, option, max_steps=150, reps=(1, 2), tries=1
    )
    assert per_sweep > 0
    assert res.shape == (2,)
    assert np.all(res < 1e-2)
