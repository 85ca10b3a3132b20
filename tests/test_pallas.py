"""Pallas kernel tests in interpreter mode (CPU), checking against the
generic XLA implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from riptrm_tpu.problems import nonneg_pca
from riptrm_tpu.solvers.riptrm import RIPTRM, _barrier_ops, init_state
from riptrm_tpu.ops.tcg import truncated_cg


@pytest.fixture(scope="module")
def setup():
    n = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    data = nonneg_pca.generate_instance(k1, n)
    x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
    x0 /= np.linalg.norm(x0)
    problem = nonneg_pca.make_problem(data["Z"], x0, dtype=jnp.float32)
    opt = RIPTRM({"TRS_solver": "tCG", "second_order_stationarity": False}).option
    st = init_state(problem, opt)
    return problem, st


def test_chained_matvec_interpret(setup):
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    x, y, mu = st.x, st.y, st.mu
    c, hw, _ = _barrier_ops(problem, x, y, mu)
    zs = problem.structure["Zs"]
    v0 = jnp.asarray(
        problem.manifold.random_tangent(jax.random.PRNGKey(1), x), jnp.float32
    )
    with pl.force_tpu_interpret_mode() if hasattr(pl, "force_tpu_interpret_mode") else _interp():
        out = pk.chained_barrier_matvec(zs, x, y / c, v0, 3)
    # XLA reference chain
    v = v0
    for _ in range(3):
        w = hw(v)
        v = w / jnp.linalg.norm(w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=2e-4)


def _interp():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_chained_matvec_hbm_interpret(setup):
    """HBM-streaming (double-buffered) chain matches the VMEM chain."""
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    x, y, mu = st.x, st.y, st.mu
    c, hw, _ = _barrier_ops(problem, x, y, mu)
    zs = problem.structure["Zs"]
    n = zs.shape[0]
    v0 = jnp.asarray(
        problem.manifold.random_tangent(jax.random.PRNGKey(1), x), jnp.float32
    )
    block = pk.pick_hbm_block(n)
    assert block % 128 == 0
    with _interp():
        out = pk.chained_barrier_matvec_hbm(zs, x, y / c, v0, 3, block=block)
    v = v0
    for _ in range(3):
        w = hw(v)
        v = w / jnp.linalg.norm(w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=2e-4)


def test_fused_tcg_interpret(setup):
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    x, y, mu, tr = st.x, st.y, st.mu, st.tr_radius
    c, hw, cx = _barrier_ops(problem, x, y, mu)
    zs = problem.structure["Zs"]
    dim = problem.manifold.dim
    eta_x, _, it_x, code_x = truncated_cg(problem.manifold, x, hw, cx, tr, maxinner=dim)
    with _interp():
        eta_p, _, it_p, code_p = pk.pallas_tcg_sphere_quadratic(
            zs, x, y / c, cx, tr, maxinner=dim
        )
    assert int(it_p) == int(it_x)
    assert int(code_p) == int(code_x)
    np.testing.assert_allclose(
        np.asarray(eta_p), np.asarray(eta_x), atol=1e-4, rtol=1e-3
    )
