"""Unit tests for tangent-space linear algebra ops (tCG, TRS, CR, basis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.manifolds import Euclidean, Sphere
from riptrm_tpu.ops.basis import materialize, materialize_symmetrized
from riptrm_tpu.ops.conjres import conjugate_residual
from riptrm_tpu.ops.tcg import truncated_cg
from riptrm_tpu.ops.trs import solve_trs


class TestTRS:
    def _check(self, A, a, radius):
        x, lam, code = solve_trs(jnp.asarray(A), jnp.asarray(a), radius)
        x = np.asarray(x)
        # Feasibility
        assert np.linalg.norm(x) <= radius * (1 + 1e-8)
        # Global optimality vs dense sampling of stationary candidates:
        # compare against brute-force solution on the eigen decomposition.
        obj = 0.5 * x @ A @ x + a @ x
        lamv, Q = np.linalg.eigh(A)
        b = Q.T @ a
        best = obj
        # candidates: interior (if PD) and boundary via fine sigma scan
        if lamv[0] > 0:
            p = -np.linalg.solve(A, a)
            if np.linalg.norm(p) <= radius:
                best = min(best, 0.5 * p @ A @ p + a @ p)
        sigs = np.linspace(max(0, -lamv[0]) + 1e-12, max(1.0, -lamv[0]) * 50 + 10, 400000)
        w = (b**2)[None, :] / (lamv[None, :] + sigs[:, None]) ** 2
        norms = np.sqrt(w.sum(axis=1))
        k = np.argmin(np.abs(norms - radius))
        p = -b / (lamv + sigs[k])
        cand = Q @ p
        if np.linalg.norm(cand) <= radius * 1.01:
            best = min(best, 0.5 * cand @ A @ cand + a @ cand)
        assert obj <= best + 1e-6 * max(1.0, abs(best))
        return x, lam, code

    def test_interior(self):
        rng = np.random.default_rng(0)
        Q = np.linalg.qr(rng.normal(size=(8, 8)))[0]
        A = Q @ np.diag(rng.uniform(1, 5, 8)) @ Q.T
        a = rng.normal(size=8) * 0.01
        x, lam, code = self._check(A, a, 10.0)
        assert int(code) == 0 and float(lam) == 0.0
        np.testing.assert_allclose(x, -np.linalg.solve(A, a), atol=1e-8)

    def test_boundary(self):
        rng = np.random.default_rng(1)
        Q = np.linalg.qr(rng.normal(size=(8, 8)))[0]
        A = Q @ np.diag(rng.uniform(1, 5, 8)) @ Q.T
        a = rng.normal(size=8) * 10
        x, lam, code = self._check(A, a, 0.5)
        assert int(code) == 1
        assert np.linalg.norm(np.asarray(x)) == pytest.approx(0.5, rel=1e-6)
        # KKT: (A + lam I) x = -a, lam >= 0
        resid = np.linalg.norm((A + float(lam) * np.eye(8)) @ np.asarray(x) + a)
        assert resid < 1e-6 * np.linalg.norm(a)

    def test_indefinite(self):
        rng = np.random.default_rng(2)
        Q = np.linalg.qr(rng.normal(size=(6, 6)))[0]
        A = Q @ np.diag([-2.0, -1.0, 0.5, 1.0, 2.0, 3.0]) @ Q.T
        a = rng.normal(size=6)
        x, lam, code = self._check(A, a, 1.0)
        assert float(lam) >= 2.0 - 1e-6  # lam >= -lambda_min
        assert np.linalg.norm(np.asarray(x)) == pytest.approx(1.0, rel=1e-6)

    def test_hard_case(self):
        # b has no component along the minimal eigenvector and the regular
        # part is shorter than the radius -> hard case.
        lamv = np.array([-2.0, 1.0, 2.0, 3.0])
        A = np.diag(lamv)
        a = np.array([0.0, 0.1, 0.1, 0.1])
        radius = 5.0
        x, lam, code = solve_trs(jnp.asarray(A), jnp.asarray(a), radius)
        x = np.asarray(x)
        assert int(code) == 2
        assert float(lam) == pytest.approx(2.0, abs=1e-8)
        assert np.linalg.norm(x) == pytest.approx(radius, rel=1e-8)
        # optimal objective: (A - lam_min) pseudo-solve plus eigen direction
        obj = 0.5 * x @ A @ x + a @ x
        p_reg = -a / (lamv - lamv[0] + (lamv == lamv[0]))
        p_reg[0] = 0.0
        alpha = np.sqrt(radius**2 - p_reg @ p_reg)
        p_best = p_reg + alpha * np.eye(4)[0]
        best = 0.5 * p_best @ A @ p_best + a @ p_best
        assert obj <= best + 1e-8


class TestTCG:
    def test_matches_dense_solution_pd(self):
        """On Euclidean space with PD Hessian and huge radius, tCG must reach
        the Newton point."""
        n = 20
        rng = np.random.default_rng(3)
        Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
        H = jnp.asarray(Q @ np.diag(rng.uniform(1, 3, n)) @ Q.T)
        g = jnp.asarray(rng.normal(size=n))
        man = Euclidean(n)
        x = jnp.zeros(n)
        eta, Heta, iters, code = truncated_cg(
            man, x, lambda v: H @ v, g, 1e6, kappa=1e-14, theta=1.0, maxinner=200
        )
        np.testing.assert_allclose(np.asarray(eta), -np.linalg.solve(H, g), atol=1e-6)

    def test_respects_radius(self):
        n = 10
        rng = np.random.default_rng(4)
        H = jnp.asarray(np.diag(rng.uniform(-1, 1, n)))
        g = jnp.asarray(rng.normal(size=n))
        man = Euclidean(n)
        x = jnp.zeros(n)
        radius = 0.3
        eta, _, _, code = truncated_cg(man, x, lambda v: H @ v, g, radius)
        assert np.linalg.norm(np.asarray(eta)) <= radius * (1 + 1e-8)
        assert int(code) in (1, 2)  # negative curvature or TR exceeded

    def test_decreases_model(self):
        n = 15
        rng = np.random.default_rng(5)
        A = rng.normal(size=(n, n))
        H = jnp.asarray(A + A.T)
        g = jnp.asarray(rng.normal(size=n))
        man = Euclidean(n)
        eta, Heta, _, _ = truncated_cg(man, jnp.zeros(n), lambda v: H @ v, g, 1.0)
        m = float(jnp.vdot(g, eta) + 0.5 * jnp.vdot(eta, Heta))
        assert m < 0.0

    def test_on_sphere_tangent(self):
        man = Sphere(12)
        x = man.random_point(jax.random.PRNGKey(0))
        g = man.random_tangent(jax.random.PRNGKey(1), x)

        def hess(v):  # simple SPD-ish operator on the tangent space
            return man.proj(x, 2.0 * v + 0.1 * jnp.sum(v) * jnp.ones_like(v))

        eta, _, _, _ = truncated_cg(man, x, hess, g, 10.0, kappa=1e-12)
        # result stays tangent
        assert abs(float(jnp.vdot(x, eta))) < 1e-10
        # gradient equation approx solved: H eta = -g
        r = hess(eta) + g
        assert float(man.norm(x, r)) < 1e-6


class TestConjRes:
    def test_solves_spd_system(self):
        n = 30
        rng = np.random.default_rng(6)
        Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
        H = jnp.asarray(Q @ np.diag(rng.uniform(0.5, 4, n)) @ Q.T)
        b = jnp.asarray(rng.normal(size=n))
        inner = lambda u, v: jnp.vdot(u, v)
        v, t, rel = conjugate_residual(
            inner, lambda u: H @ u, b, jnp.zeros(n), tol=1e-12, maxiter=200
        )
        np.testing.assert_allclose(np.asarray(v), np.linalg.solve(H, b), atol=1e-8)


class TestMaterialize:
    def test_matches_dense_operator_on_sphere(self):
        man = Sphere(9)
        x = man.random_point(jax.random.PRNGKey(2))
        B = man.basis(x)
        A = np.random.default_rng(7).normal(size=(9, 9))
        A = jnp.asarray(A + A.T)

        def op(v):
            return man.proj(x, A @ v)

        M = materialize_symmetrized(man, x, B, op)
        # must agree with explicit basis computation
        Bn = np.asarray(B)
        expected = np.einsum("ia,ab,jb->ij", Bn, np.asarray(A), Bn)
        expected = 0.5 * (expected + expected.T)
        np.testing.assert_allclose(np.asarray(M), expected, atol=1e-10)

    def test_eigenvalues_invariant_under_basis(self):
        """Spectrum of the materialized operator must not depend on basis
        details (replaces reference hessianspectrum checks, utils.py:417)."""
        man = Sphere(7)
        x = man.random_point(jax.random.PRNGKey(3))
        A = np.random.default_rng(8).normal(size=(7, 7))
        A = jnp.asarray(A + A.T)

        def op(v):
            return man.proj(x, A @ v)

        M = materialize(man, x, man.basis(x), op)
        w = np.sort(np.linalg.eigvalsh(np.asarray(0.5 * (M + M.T))))
        # compare to projector-based ambient computation: P A P restricted
        P = np.eye(7) - np.outer(np.asarray(x), np.asarray(x))
        wa = np.sort(np.linalg.eigvalsh(P @ np.asarray(A) @ P))
        # ambient version has an extra 0 eigenvalue along x
        wa = np.delete(wa, np.argmin(np.abs(wa)))
        np.testing.assert_allclose(w, wa, atol=1e-8)


class TestStructuredMaterialize:
    """Closed-form Householder congruence vs the batched-HVP path.

    The sphere_quadratic fast path (ops/basis.py::sphere_householder_*)
    must reproduce the generic ``materialize_symmetrized`` exactly — it is
    the O(n^2) replacement for dim HVPs in exact-mode RIPTRM and RSQO
    (reference ``selfadj_operator2matrix``, utils.py:565-573)."""

    def _problem(self, n=23):
        from riptrm_tpu.problems import nonneg_pca

        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        data = nonneg_pca.generate_instance(k1, n)
        x0 = np.abs(np.asarray(jax.random.normal(k2, (n,))))
        x0 = x0 / np.linalg.norm(x0)
        return nonneg_pca.make_problem(data["Z"], x0)

    def test_barrier_congruence_matches_hvp_path(self):
        from riptrm_tpu.ops.basis import (
            sphere_householder_congruence,
            sphere_householder_coords,
        )
        from riptrm_tpu.solvers.riptrm import _barrier_ops

        p = self._problem()
        man, x = p.manifold, p.x0
        n = man.n
        y = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n,))) + 0.1
        mu = jnp.asarray(0.3)
        basis = man.basis(x)
        c, hw, cx = _barrier_ops(p, x, y, mu)
        h_ref = materialize_symmetrized(man, x, basis, hw)
        c_ref = man.to_coords(x, basis, cx)

        zs = p.structure["Zs"]
        a = -2.0 * zs + jnp.diag(y / c)
        kappa = x @ (-2.0 * (zs @ x) - y)
        h_fast = sphere_householder_congruence(x, a, kappa)
        c_fast = sphere_householder_coords(x, -2.0 * (zs @ x) - mu / c)
        np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_ref), atol=1e-10)
        np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ref), atol=1e-10)

    def test_riptrm_exact_step_identical_with_and_without_structure(self):
        import dataclasses

        from riptrm_tpu.solvers import riptrm as rt

        p = self._problem()
        p_generic = dataclasses.replace(p, structure=None)
        option = rt.merge_options(
            rt.default_option(),
            {"TRS_solver": "Exact_RepMat", "second_order_stationarity": True},
        )
        st0 = rt.init_state(p, option)
        st_a, info_a = jax.jit(rt.make_step(p, option))(st0)
        st_b, info_b = jax.jit(rt.make_step(p_generic, option))(st0)
        np.testing.assert_allclose(
            np.asarray(st_a.x), np.asarray(st_b.x), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(st_a.y), np.asarray(st_b.y), rtol=1e-10, atol=1e-12
        )

    def test_rsqo_step_identical_with_and_without_structure(self):
        import dataclasses

        from riptrm_tpu.solvers import rsqo

        p = self._problem()
        p_generic = dataclasses.replace(p, structure=None)
        option = rsqo.merge_options(
            rsqo.default_option(), {"quadoptim_type": "reghess_shift"}
        )
        st0 = rsqo.init_state(p, option)
        st_a, _ = jax.jit(rsqo.make_step(p, option))(st0)
        st_b, _ = jax.jit(rsqo.make_step(p_generic, option))(st0)
        np.testing.assert_allclose(
            np.asarray(st_a.x), np.asarray(st_b.x), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(st_a.y), np.asarray(st_b.y), rtol=1e-8, atol=1e-10
        )


class TestTRSMoreSorensen:
    """solve_trs_ms (Cholesky More-Sorensen) vs the eigh-based solve_trs.

    Measured motivation (BENCH.md linalg probe): at n=999 f32 on a v5e,
    eigh costs 28.9 ms while cholesky costs 0.154 ms, so exact mode at
    large dim routes through this solver (`exact_trs_method='auto'`).
    """

    def _compare(self, A, a, radius, rel_tol):
        from riptrm_tpu.ops.trs import solve_trs, solve_trs_ms

        A = jnp.asarray(A)
        a = jnp.asarray(a)
        x1, l1, c1 = solve_trs(A, a, radius)
        x2, l2, c2, me = solve_trs_ms(A, a, radius)

        def model(x):
            return float(0.5 * x @ A @ x + a @ x)

        m1, m2 = model(x1), model(x2)
        assert m2 <= m1 + rel_tol * max(abs(m1), 1e-10)
        if int(c2) != 0:
            assert abs(float(jnp.linalg.norm(x2)) - radius) <= 1e-4 * radius
        else:
            assert float(jnp.linalg.norm(x2)) <= radius * (1 + 1e-6)
        return int(c1), int(c2), float(me)

    def test_random_cases(self):
        rng = np.random.default_rng(0)
        for trial in range(12):
            n = 50
            B = rng.normal(size=(n, n))
            A = (B + B.T) / 2
            if trial % 3 == 1:
                A = A @ A.T / n + np.eye(n)
            a = rng.normal(size=n) * (10.0 ** rng.integers(-2, 2))
            radius = float(10.0 ** rng.integers(-1, 2))
            self._compare(A, a, radius, 1e-5)

    def test_interior(self):
        rng = np.random.default_rng(1)
        B = rng.normal(size=(30, 30))
        A = B @ B.T / 30 + np.eye(30)
        a = rng.normal(size=30) * 1e-2
        c1, c2, _ = self._compare(A, a, 100.0, 1e-8)
        assert c1 == 0 and c2 == 0

    def test_hard_case_geometry(self):
        rng = np.random.default_rng(2)
        B = rng.normal(size=(40, 40))
        A = (B + B.T) / 2
        w, q = np.linalg.eigh(A)
        a = rng.normal(size=40)
        a = (a - q[:, 0] * (q[:, 0] @ a)) * 1e-3  # orthogonal to v_min
        # hard-case solutions are non-unique; compare MODEL value only,
        # at a looser tolerance (the completion eigenvector is iterative)
        self._compare(A, a, 1.0, 2e-4)

    def test_mineig_estimate(self):
        rng = np.random.default_rng(3)
        from riptrm_tpu.ops.trs import solve_trs_ms

        B = rng.normal(size=(60, 60))
        A = (B + B.T) / 2
        a = rng.normal(size=60)
        _, _, _, me = solve_trs_ms(jnp.asarray(A), jnp.asarray(a), 1.0)
        true_min = np.linalg.eigvalsh(A)[0]
        assert abs(float(me) - true_min) <= 1e-6 * max(1.0, abs(true_min))

    def test_f32(self):
        rng = np.random.default_rng(4)
        from riptrm_tpu.ops.trs import solve_trs, solve_trs_ms

        B = rng.normal(size=(80, 80)).astype(np.float32)
        A32 = jnp.asarray((B + B.T) / 2, jnp.float32)
        a32 = jnp.asarray(rng.normal(size=80), jnp.float32)
        x2, l2, c2, _ = solve_trs_ms(A32, a32, 1.0)
        A64 = jnp.asarray(np.asarray(A32), jnp.float64)
        a64 = jnp.asarray(np.asarray(a32), jnp.float64)
        x1, _, _ = solve_trs(A64, a64, 1.0)
        m1 = float(0.5 * x1 @ A64 @ x1 + a64 @ x1)
        x2_64 = jnp.asarray(np.asarray(x2), jnp.float64)
        m2 = float(0.5 * x2_64 @ A64 @ x2_64 + a64 @ x2_64)
        assert m2 <= m1 + 1e-5 * abs(m1)


def test_exact_mode_ms_matches_eigh_end_to_end():
    """RIPTRM Exact_RepMat with exact_trs_method='ms' reproduces the 'eigh'
    trajectory on the golden NonnegPCA instance (identical rows + final
    residual at x64; verified identical to all digits when added)."""
    from riptrm_tpu.problems import nonneg_pca
    from riptrm_tpu.solvers.riptrm import RIPTRM

    p = nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")
    base = {
        "maxtime": 120, "maxiter": 40, "TRS_solver": "Exact_RepMat",
        "second_order_stationarity": True, "tolresid": 1e-10,
    }
    out_e = RIPTRM(base | {"exact_trs_method": "eigh"}).run(p)
    out_m = RIPTRM(base | {"exact_trs_method": "ms"}).run(p)
    assert out_e.log["residual"][-1] <= 1e-10
    assert out_m.log["residual"][-1] <= 1e-10
    assert len(out_e.log["residual"]) == len(out_m.log["residual"])
    np.testing.assert_allclose(
        np.asarray(out_m.x), np.asarray(out_e.x), atol=1e-8
    )
