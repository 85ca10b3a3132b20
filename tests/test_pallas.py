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


def test_batched_tcg_interpret(setup):
    """Batched kernel (B lanes, shared Z) matches per-lane XLA tCG."""
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    man = problem.manifold
    zs = problem.structure["Zs"]
    n = zs.shape[0]
    dim = man.dim
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    xs = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (B, n), dtype=jnp.float32))
    xs = xs / jnp.linalg.norm(xs, axis=1, keepdims=True)
    ys = 0.5 + jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (B, n), dtype=jnp.float32))
    radii = jnp.asarray([0.1, 0.3, 0.5, 0.2], jnp.float32)

    etas_ref, iters_ref, codes_ref = [], [], []
    grads = []
    for i in range(B):
        x, y = xs[i], ys[i]
        c, hw, cx = _barrier_ops(problem, x, y, jnp.float32(0.05))
        grads.append(cx)
        eta, _, it, code = truncated_cg(man, x, hw, cx, radii[i], maxinner=dim)
        etas_ref.append(eta)
        iters_ref.append(int(it))
        codes_ref.append(int(code))
    grads = jnp.stack(grads)
    cs = xs  # slack = x for NonnegPCA
    with _interp():
        etas, _, iters, codes = pk.pallas_tcg_sphere_quadratic_batched(
            zs, xs, ys / cs, grads, radii, maxinner=dim
        )
    assert [int(v) for v in iters] == iters_ref
    assert [int(v) for v in codes] == codes_ref
    np.testing.assert_allclose(
        np.asarray(etas), np.asarray(jnp.stack(etas_ref)), atol=2e-4, rtol=1e-3
    )


def test_batched_tcg_gridded_interpret(setup, monkeypatch):
    """When B exceeds the single-call VMEM budget the wrapper runs the
    lane-blocked grid path (shared Z window); results must match the
    ungridded kernel, including non-multiple-of-block batch padding."""
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    zs = problem.structure["Zs"]
    n = zs.shape[0]
    dim = problem.manifold.dim
    B = 12  # not a multiple of the forced block (8) -> exercises padding
    xs = jnp.abs(jax.random.normal(jax.random.PRNGKey(11), (B, n), dtype=jnp.float32))
    xs = xs / jnp.linalg.norm(xs, axis=1, keepdims=True)
    ws = 0.5 + jnp.abs(jax.random.normal(jax.random.PRNGKey(12), (B, n), dtype=jnp.float32))
    grads = jax.random.normal(jax.random.PRNGKey(13), (B, n), dtype=jnp.float32)
    grads = grads - xs * jnp.sum(xs * grads, axis=1, keepdims=True)
    radii = jnp.linspace(0.1, 0.5, B, dtype=jnp.float32)

    with _interp():
        ref = pk.pallas_tcg_sphere_quadratic_batched(
            zs, xs, ws, grads, radii, maxinner=dim
        )
    # Shrink the batched budget so fits_in_vmem_batched(n, 12) fails but an
    # 8-lane block still fits -> the wrapper must take the gridded path.
    # (68 = max_batched_block's per-lane row budget.)
    budget = n * n * 4 + 68 * 8 * n * 4 + 1
    monkeypatch.setattr(pk, "BATCHED_VMEM_BUDGET_BYTES", budget)
    assert not pk.fits_in_vmem_batched(n, B)
    assert pk.max_batched_block(n) == 8
    with _interp():
        out = pk.pallas_tcg_sphere_quadratic_batched(
            zs, xs, ws, grads, radii, maxinner=dim
        )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tcg_custom_vmap_routes_to_batched(setup):
    """vmap of the wrapped single-lane tCG must produce the same results as
    the explicit batched kernel (the custom_vmap rule)."""
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, st = setup
    zs = problem.structure["Zs"]
    n = zs.shape[0]
    dim = problem.manifold.dim
    B = 3
    xs = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (B, n), dtype=jnp.float32))
    xs = xs / jnp.linalg.norm(xs, axis=1, keepdims=True)
    ws = 0.5 + jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (B, n), dtype=jnp.float32))
    grads = jax.random.normal(jax.random.PRNGKey(10), (B, n), dtype=jnp.float32)
    grads = grads - xs * jnp.sum(xs * grads, axis=1, keepdims=True)
    radius = jnp.float32(0.25)  # shared (unbatched) radius

    tcg = pk.tcg_sphere_quadratic(maxinner=dim)
    with _interp():
        ev, hv, it_v, code_v = jax.vmap(
            lambda x, w, g: tcg(zs, x, w, g, radius)
        )(xs, ws, grads)
        eb, hb, it_b, code_b = pk.pallas_tcg_sphere_quadratic_batched(
            zs, xs, ws, grads, jnp.broadcast_to(radius, (B,)), maxinner=dim
        )
    np.testing.assert_allclose(np.asarray(ev), np.asarray(eb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(hb), atol=1e-5)
    assert (np.asarray(it_v) == np.asarray(it_b)).all()
    assert (np.asarray(code_v) == np.asarray(code_b)).all()


@pytest.fixture(scope="module")
def stiefel_setup():
    from riptrm_tpu.problems import bounded_pca

    n, p = 32, 4
    data = bounded_pca.generate_instance(jax.random.PRNGKey(20), n)
    x0 = bounded_pca.generate_initialpoint(jax.random.PRNGKey(21), n, p)
    problem = bounded_pca.make_problem(data["Z"], x0, dtype=jnp.float32)
    return problem, jnp.asarray(x0, jnp.float32)


def test_stiefel_tcg_interpret(stiefel_setup):
    """Single-lane stiefel_bound fused tCG matches the generic XLA tCG."""
    from riptrm_tpu.ops import pallas_kernels as pk

    problem, x = stiefel_setup
    man = problem.manifold
    m = problem.num_ineq
    y = 0.5 + jnp.abs(jax.random.normal(jax.random.PRNGKey(22), (m,), dtype=jnp.float32))
    mu = jnp.float32(0.05)
    c, hw, cx = _barrier_ops(problem, x, y, mu)
    tr = jnp.float32(0.4)
    eta_x, heta_x, it_x, code_x = truncated_cg(man, x, hw, cx, tr, maxinner=man.dim)
    tcg = pk.tcg_stiefel_bound(maxinner=man.dim)
    with _interp():
        eta_p, heta_p, it_p, code_p = tcg(
            problem.structure["Zs"], problem.structure["d"], x, y, c, cx, tr
        )
    assert int(it_p) == int(it_x)
    assert int(code_p) == int(code_x)
    np.testing.assert_allclose(np.asarray(eta_p), np.asarray(eta_x), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(heta_p), np.asarray(heta_x), atol=2e-3, rtol=1e-2)


def test_stiefel_tcg_batched_interpret(stiefel_setup):
    """Batched stiefel_bound kernel (shared Z, [n, B*p] layout) matches
    per-lane XLA tCG; exercised through the custom_vmap route."""
    from riptrm_tpu.ops import pallas_kernels as pk
    from riptrm_tpu.problems import bounded_pca

    problem, _ = stiefel_setup
    man = problem.manifold
    n, p = man.n, man.p
    m = problem.num_ineq
    B = 3
    xs = jnp.stack([
        jnp.asarray(
            bounded_pca.generate_initialpoint(jax.random.PRNGKey(30 + i), n, p),
            jnp.float32,
        )
        for i in range(B)
    ])
    ys = 0.5 + jnp.abs(jax.random.normal(jax.random.PRNGKey(23), (B, m), dtype=jnp.float32))
    radii = jnp.asarray([0.2, 0.4, 0.3], jnp.float32)
    mu = jnp.float32(0.05)

    etas_ref, iters_ref, codes_ref, grads, cs = [], [], [], [], []
    for i in range(B):
        c, hw, cx = _barrier_ops(problem, xs[i], ys[i], mu)
        grads.append(cx)
        cs.append(c)
        eta, _, it, code = truncated_cg(man, xs[i], hw, cx, radii[i], maxinner=man.dim)
        etas_ref.append(eta)
        iters_ref.append(int(it))
        codes_ref.append(int(code))
    tcg = pk.tcg_stiefel_bound(maxinner=man.dim)
    with _interp():
        etas, _, iters, codes = jax.vmap(
            lambda x, y, c, g, r: tcg(
                problem.structure["Zs"], problem.structure["d"], x, y, c, g, r
            )
        )(xs, ys, jnp.stack(cs), jnp.stack(grads), radii)
    assert [int(v) for v in iters] == iters_ref
    assert [int(v) for v in codes] == codes_ref
    np.testing.assert_allclose(
        np.asarray(etas), np.asarray(jnp.stack(etas_ref)), atol=2e-4, rtol=1e-3
    )


def test_bare_matvec_chain_interpret():
    """The roofline's empirical denominator kernel: K normalized matvec
    passes in both orientations/precisions must match the plain jnp
    power-iteration chain."""
    from riptrm_tpu.ops import pallas_kernels as pk

    z = jax.random.normal(jax.random.PRNGKey(0), (32, 32), jnp.float32)
    z = z + z.T
    for prec, left, shape, atol in [
        ("high", True, (4, 32), 1e-2),
        ("highest", False, (32, 8), 1e-4),
        ("default", True, (4, 32), 1e-1),
    ]:
        v0 = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
        with _interp():
            out = pk.bare_matvec_chain(z, v0, 6, prec, left)
        ref = v0
        axis = 1 if left else 0
        for _ in range(6):
            ref = ref @ z if left else z @ ref
            ref = ref / jnp.sqrt(
                jnp.sum(ref * ref, axis=axis, keepdims=True) + 1e-30
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=atol, rtol=1e-2
        )


def test_stiefel_tcg_gridded_multiblock_interpret(stiefel_setup):
    """The gridded stiefel wrapper with a multi-block grid (lane_block=2,
    B=5 -> 3 blocks with 1 padded lane) matches the B-at-once result —
    blocking + edge padding must not change any lane's trajectory."""
    from riptrm_tpu.ops import pallas_kernels as pk
    from riptrm_tpu.problems import bounded_pca

    problem, _ = stiefel_setup
    man = problem.manifold
    n, p = man.n, man.p
    m = problem.num_ineq
    B = 5
    xs = jnp.stack([
        jnp.asarray(
            bounded_pca.generate_initialpoint(jax.random.PRNGKey(40 + i), n, p),
            jnp.float32,
        )
        for i in range(B)
    ])
    ys = 0.5 + jnp.abs(
        jax.random.normal(jax.random.PRNGKey(41), (B, m), dtype=jnp.float32)
    )
    cs = jax.vmap(problem.slack)(xs)
    grads, ss = [], []
    mu = jnp.float32(0.05)
    for i in range(B):
        _, _, cx = _barrier_ops(problem, xs[i], ys[i], mu)
        grads.append(cx)
    grads = jnp.stack(grads)
    ws, ss = jax.vmap(
        lambda x, y, c: pk._stiefel_bound_pieces(
            problem.structure["Zs"], problem.structure["d"], x, y, c
        )
    )(xs, ys, cs)
    radii = jnp.linspace(0.2, 0.6, B).astype(jnp.float32)

    def run(lane_block):
        with _interp():
            return pk.pallas_tcg_stiefel_bound_batched(
                problem.structure["Zs"], problem.structure["d"], xs, ws, ss,
                grads, radii, maxinner=man.dim, lane_block=lane_block,
            )

    eta_whole, heta_whole, it_whole, code_whole = run(B)
    eta_grid, heta_grid, it_grid, code_grid = run(2)
    assert (np.asarray(it_grid) == np.asarray(it_whole)).all()
    assert (np.asarray(code_grid) == np.asarray(code_whole)).all()
    np.testing.assert_allclose(
        np.asarray(eta_grid), np.asarray(eta_whole), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(heta_grid), np.asarray(heta_whole), atol=1e-4, rtol=1e-3
    )


def test_stiefel_solve_pallas_matches_xla():
    """Full compiled RIPTRM solve with use_pallas_tcg on BoundedPCA reaches
    the XLA path's solution at solver tolerance (small instance: the
    interpreter runs the fused kernel per inner step)."""
    from riptrm_tpu.problems import bounded_pca

    n, p = 16, 2
    data = bounded_pca.generate_instance(jax.random.PRNGKey(24), n)
    x0 = bounded_pca.generate_initialpoint(jax.random.PRNGKey(25), n, p)
    problem = bounded_pca.make_problem(data["Z"], x0, dtype=jnp.float32)
    opt = {
        "maxiter": 25,
        "tolresid": 1e-3,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": lambda mu: jnp.maximum(1e-3 * mu, 2e-4),
    }
    from riptrm_tpu.ops.kkt import compute_residual
    from riptrm_tpu.solvers.riptrm import RIPTRM

    def run(use_pallas):
        solver = RIPTRM(opt | {"use_pallas_tcg": use_pallas})
        solve = solver.solve_compiled(problem, 600)
        st, k = solve(init_state(problem, solver.option))
        res = compute_residual(problem, st.x, st.y, jnp.zeros((0,)))[0]
        return st, float(res)

    st_x, res_x = run(False)
    with _interp():
        st_p, res_p = run(True)
    assert res_p < 2e-3 and res_x < 2e-3
    np.testing.assert_allclose(
        np.asarray(st_p.x), np.asarray(st_x.x), atol=5e-3
    )


def test_stiefel_tcg_pmajor_matches_lane_major(stiefel_setup):
    """The p-major interleaved kernel (round-5 restructure: per-lane
    contractions as contiguous [n, bb] VPU slices instead of masked
    [Bp, Bp] MXU matmuls) must reproduce the lane-major kernel lane for
    lane, including with a multi-block grid and edge padding."""
    from riptrm_tpu.ops import pallas_kernels as pk
    from riptrm_tpu.problems import bounded_pca

    problem, _ = stiefel_setup
    man = problem.manifold
    n, p = man.n, man.p
    m = problem.num_ineq
    B = 5
    xs = jnp.stack([
        jnp.asarray(
            bounded_pca.generate_initialpoint(jax.random.PRNGKey(50 + i), n, p),
            jnp.float32,
        )
        for i in range(B)
    ])
    ys = 0.5 + jnp.abs(
        jax.random.normal(jax.random.PRNGKey(51), (B, m), dtype=jnp.float32)
    )
    cs = jax.vmap(problem.slack)(xs)
    grads = []
    mu = jnp.float32(0.05)
    for i in range(B):
        _, _, cx = _barrier_ops(problem, xs[i], ys[i], mu)
        grads.append(cx)
    grads = jnp.stack(grads)
    ws, ss = jax.vmap(
        lambda x, y, c: pk._stiefel_bound_pieces(
            problem.structure["Zs"], problem.structure["d"], x, y, c
        )
    )(xs, ys, cs)
    radii = jnp.linspace(0.2, 0.6, B).astype(jnp.float32)

    with _interp():
        ref = pk.pallas_tcg_stiefel_bound_batched(
            problem.structure["Zs"], problem.structure["d"], xs, ws, ss,
            grads, radii, maxinner=man.dim,
        )
    for lane_block in (None, 2):  # whole batch + multi-block w/ padding
        with _interp():
            out = pk.pallas_tcg_stiefel_bound_batched_pmajor(
                problem.structure["Zs"], problem.structure["d"], xs, ws, ss,
                grads, radii, maxinner=man.dim, lane_block=lane_block,
            )
        assert (np.asarray(out[2]) == np.asarray(ref[2])).all(), lane_block
        assert (np.asarray(out[3]) == np.asarray(ref[3])).all(), lane_block
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(ref[1]), atol=1e-4, rtol=1e-3
        )
