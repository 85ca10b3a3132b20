"""Embedded (ambient-cost) problems on the fixed-rank manifold: operator
correctness of EmbeddedProblem and end-to-end solves of the nonnegative
low-rank approximation family through the matrix-free solver paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.problems import low_rank
from riptrm_tpu.solvers.ralm import RALM
from riptrm_tpu.solvers.ripm import RIPM
from riptrm_tpu.solvers.riptrm import RIPTRM

M, N, K = 8, 6, 2


@pytest.fixture(scope="module")
def prob():
    key = jax.random.PRNGKey(7)
    inst = low_rank.generate_instance(key, M, N, rank=K, noise=0.05)
    x0 = low_rank.generate_initialpoint(jax.random.PRNGKey(3), M, N, K)
    return low_rank.make_problem(inst["A"], x0)


class TestEmbeddedOperators:
    def test_initial_point_strictly_feasible(self, prob):
        c = prob.slack(prob.x0)
        assert float(jnp.min(c)) > 0.05

    def test_rgrad_matches_directional_derivative(self, prob):
        man = prob.manifold
        x = prob.x0
        t = man.random_tangent(jax.random.PRNGKey(0), x)
        g = prob.rgrad(x)
        h = 1e-6
        plus = prob.cost(man.retract(x, jax.tree.map(lambda a: h * a, t)))
        minus = prob.cost(man.retract(x, jax.tree.map(lambda a: -h * a, t)))
        fd = (plus - minus) / (2 * h)
        assert float(jnp.abs(man.inner(x, g, t) - fd)) < 1e-6

    def test_lag_rgrad_matches_directional_derivative(self, prob):
        man = prob.manifold
        x = prob.x0
        y = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (prob.num_ineq,)))
        t = man.random_tangent(jax.random.PRNGKey(2), x)
        g = prob.lag_rgrad(x, y)

        def lag(xx):
            return prob.cost(xx) + jnp.vdot(y, prob.ineq(xx))

        h = 1e-6
        plus = lag(man.retract(x, jax.tree.map(lambda a: h * a, t)))
        minus = lag(man.retract(x, jax.tree.map(lambda a: -h * a, t)))
        fd = (plus - minus) / (2 * h)
        assert float(jnp.abs(man.inner(x, g, t) - fd)) < 1e-5

    def test_lag_rhess_self_adjoint(self, prob):
        man = prob.manifold
        x = prob.x0
        y = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (prob.num_ineq,)))
        u = man.random_tangent(jax.random.PRNGKey(5), x)
        v = man.random_tangent(jax.random.PRNGKey(6), x)
        hu = prob.lag_rhess(x, y, u)
        hv = prob.lag_rhess(x, y, v)
        a = float(man.inner(x, hu, v))
        b = float(man.inner(x, u, hv))
        assert abs(a - b) < 1e-10 * max(1.0, abs(a))

    def test_lag_rhess_at_matches_direct(self, prob):
        man = prob.manifold
        x = prob.x0
        y = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (prob.num_ineq,)))
        v = man.random_tangent(jax.random.PRNGKey(9), x)
        direct = prob.lag_rhess(x, y, v)
        frozen = prob.lag_rhess_at(x, y)(v)
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(frozen)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_gx_gxadj_adjoint_pair(self, prob):
        """<Gx(v), dx>_x == v . Gxaj(dx) — exact adjointness through the
        embedding (the identity the condensed barrier operator relies on)."""
        man = prob.manifold
        x = prob.x0
        v = jax.random.normal(jax.random.PRNGKey(10), (prob.num_ineq,))
        dx = man.random_tangent(jax.random.PRNGKey(11), x)
        lhs = float(man.inner(x, prob.gx(x, v), dx))
        rhs = float(jnp.vdot(v, prob.gx_adj(x, dx)))
        assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))

    def test_gx_at_matches_direct(self, prob):
        man = prob.manifold
        x = prob.x0
        v = jax.random.normal(jax.random.PRNGKey(12), (prob.num_ineq,))
        direct = prob.gx(x, v)
        frozen = prob.gx_at(x)(v)
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(frozen)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
        dx = man.random_tangent(jax.random.PRNGKey(13), x)
        np.testing.assert_allclose(
            np.asarray(prob.gx_adj(x, dx)),
            np.asarray(prob.gx_adj_at(x)(dx)),
            atol=1e-12,
        )


OPT = {"maxtime": 120, "maxiter": 40, "verbosity": 0}


class TestLowRankSolves:
    def test_riptrm_tcg(self, prob):
        out = RIPTRM(
            OPT | {"tolresid": 1e-10, "TRS_solver": "tCG", "second_order_stationarity": False}
        ).run(prob)
        assert out.log["residual"][-1] <= 1e-10
        # the retraction's re-orthonormalization keeps the factored
        # representation consistent over long solves (manvio would
        # otherwise floor the residual at ~1e-5)
        # solution stays rank-k factored, feasible, with consistent factors
        u, s, v = out.x
        X = np.asarray((u * s) @ v.T)
        assert X.min() > -1e-9
        assert float(out.log["manviolation"][-1]) < 1e-9

    def test_riptrm_tcg_second_order(self, prob):
        """Second-order certificates on a manifold with NO dense tangent
        basis: the Lanczos matrix-free criterion is the only option here."""
        out = RIPTRM(
            OPT | {"tolresid": 1e-6, "TRS_solver": "tCG", "second_order_stationarity": True}
        ).run(prob)
        assert out.log["residual"][-1] <= 1e-6
        mineigs = [
            v for v in out.log["mineigvalHw"]
            if v is not None and np.isfinite(v)
        ]
        assert mineigs and mineigs[-1] > -1e-6

    def test_ripm_krylov(self, prob):
        out = RIPM(OPT | {"tolresid": 1e-6, "KrylovIterMethod": True}).run(prob)
        assert out.log["residual"][-1] <= 1e-6

    def test_batched_multistart_sweep(self, prob):
        """vmapped multi-start solves with factored (U, S, V) pytree points."""
        from riptrm_tpu.parallel.sweep import batched_riptrm_solve

        B = 3
        starts = [
            low_rank.generate_initialpoint(jax.random.PRNGKey(30 + i), M, N, K)
            for i in range(B)
        ]
        xs0 = jax.tree.map(lambda *leaves: jnp.stack(leaves),
                           *[tuple(map(jnp.asarray, s)) for s in starts])
        ys0 = jnp.ones((B, M * N))
        opt = {"maxiter": 40, "tolresid": 1e-6, "TRS_solver": "tCG",
               "second_order_stationarity": False, "verbosity": 0}
        solve = batched_riptrm_solve(prob, opt, max_steps=1500)
        states, ks, res = solve(xs0, ys0)
        assert np.max(np.asarray(res)) <= 1e-6

    def test_instance_batched_sweep(self):
        """Instances x starts fused into one compiled solve for a custom
        problem family (builder hook on instance_batched_riptrm)."""
        from riptrm_tpu.parallel.sweep import instance_batched_riptrm

        B = 2
        keys = [jax.random.PRNGKey(40 + i) for i in range(B)]
        insts = [low_rank.generate_instance(k, M, N, rank=K, noise=0.05) for k in keys]
        data = jnp.stack([jnp.asarray(i["A"]) for i in insts])
        starts = [
            low_rank.generate_initialpoint(jax.random.PRNGKey(50 + i), M, N, K)
            for i in range(B)
        ]
        xs0 = jax.tree.map(lambda *l: jnp.stack(l),
                           *[tuple(map(jnp.asarray, s)) for s in starts])
        ys0 = jnp.ones((B, M * N))
        opt = {"maxiter": 40, "tolresid": 1e-6, "TRS_solver": "tCG",
               "second_order_stationarity": False, "verbosity": 0}
        solve = instance_batched_riptrm(
            opt, max_steps=1500,
            problem_builder=lambda a, x0: low_rank.make_problem(a, x0),
        )
        xf, yf, ks, res = solve(data, xs0, ys0)
        assert np.max(np.asarray(res)) <= 1e-6

    def test_ralm(self, prob):
        out = RALM(OPT | {"maxiter": 20, "tolresid": 1e-4}).run(prob)
        assert min(out.log["residual"]) < 1e-2
        # the AL minimization must actually reduce the cost
        assert out.log["cost"][-1] < out.log["cost"][0]
