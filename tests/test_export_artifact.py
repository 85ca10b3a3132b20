"""Deployable solver artifacts: export -> reload -> trace-free execution."""

import jax
import jax.numpy as jnp
import numpy as np

from riptrm_tpu.experiment.export_artifact import export_sweep, load_sweep
from riptrm_tpu.problems import nonneg_pca

N, B = 16, 4


def _setup():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    data = nonneg_pca.generate_instance(k1, N)
    xs = np.abs(np.asarray(jax.random.normal(k2, (B, N))))
    xs = xs / np.linalg.norm(xs, axis=1, keepdims=True)
    problem = nonneg_pca.make_problem(data["Z"], xs[0])
    return problem, jnp.asarray(xs), jnp.ones((B, N), xs.dtype)


def test_export_roundtrip_matches_direct(tmp_path):
    from riptrm_tpu.parallel.sweep import batched_solver_sweep

    problem, xs, ys = _setup()
    option = {
        "maxiter": 20,
        "tolresid": 1e-6,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
    }
    path = str(tmp_path / "sweep.stablehlo")
    export_sweep(problem, "RIPTRM", option, path, batch=B, max_steps=200)

    run, manifest = load_sweep(path)
    assert manifest["solver"] == "RIPTRM" and manifest["batch"] == B
    x_a, y_a, ks_a, res_a = run(xs, ys)

    direct = batched_solver_sweep(problem, "RIPTRM", option, max_steps=200)
    x_d, y_d, ks_d, res_d = direct(xs, ys)
    # The serialized artifact and the fresh jit are separate compilations:
    # compare solutions at solver tolerance, not step-exact trajectories
    # (CLAUDE.md invariant; a jax/XLA upgrade may legitimately re-lower
    # the deserialized StableHLO differently).
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_d), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_a), np.asarray(res_d), rtol=1e-2, atol=1e-9
    )
    assert np.all(np.asarray(res_a) < 1e-3)


def test_export_baseline_solver(tmp_path):
    problem, xs, ys = _setup()
    path = str(tmp_path / "ripm.stablehlo")
    export_sweep(
        problem, "RIPM", {"maxiter": 100, "tolresid": 1e-6}, path, batch=B,
        max_steps=100,
    )
    run, _ = load_sweep(path)
    _, _, ks, res = run(xs, ys)
    assert np.all(np.asarray(res) < 1e-5)


def test_export_pytree_points(tmp_path):
    """Product-manifold (pytree) points export/reload correctly."""
    from riptrm_tpu.experiment.chip_sweep import build_sweep

    problem, xs0, ys0 = build_sweep("StableIdentification", 3, 2, seed=0)
    path = str(tmp_path / "si.stablehlo")
    export_sweep(
        problem, "RIPTRM",
        {"maxiter": 10, "tolresid": 1e-4, "TRS_solver": "tCG",
         "second_order_stationarity": False},
        path, batch=2, max_steps=60,
    )
    run, manifest = load_sweep(path)
    x, y, ks, res = run(xs0, ys0)
    assert np.all(np.isfinite(np.asarray(res)))
    assert len(manifest["x_shapes"]) == 3  # J, R, Q leaves


def test_manifest_validation(tmp_path):
    """Wrong batch size or dtype fails with a clear manifest message, not
    an opaque StableHLO error."""
    import pytest

    problem, xs, ys = _setup()
    path = str(tmp_path / "v.stablehlo")
    export_sweep(
        problem, "RIPTRM",
        {"maxiter": 5, "tolresid": 1e-3, "TRS_solver": "tCG",
         "second_order_stationarity": False},
        path, batch=B, max_steps=20,
    )
    run, _ = load_sweep(path)
    with pytest.raises(ValueError, match="shapes"):
        run(xs[:2], ys[:2])  # wrong batch
    with pytest.raises(ValueError, match="dtypes"):
        run(xs.astype(jnp.float32), ys.astype(jnp.float32))
