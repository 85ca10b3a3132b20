"""Problem-construction and derived-operator tests vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riptrm_tpu.problems import nonneg_pca, rosenbrock
from riptrm_tpu.problems import stable_identification as si


@pytest.fixture(scope="module")
def pca():
    return nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")


@pytest.fixture(scope="module")
def rosen():
    return rosenbrock.make_problem(5, 3, alpha=1e7)


@pytest.fixture(scope="module")
def stable():
    return si.load_problem("dataset/StableIdentification/1", "a")


def test_pca_shapes(pca):
    assert pca.num_ineq == 50
    assert pca.manifold.dim == 49
    g = pca.ineq_val(pca.x0)
    assert g.shape == (50,)
    assert bool(jnp.all(g <= 0))  # shipped initial point is feasible


def test_pca_constraint_is_negation(pca):
    x = pca.x0
    np.testing.assert_allclose(np.asarray(pca.ineq_val(x)), -np.asarray(x))
    np.testing.assert_allclose(np.asarray(pca.slack(x)), np.asarray(x))


def test_gx_adj_is_differential(pca):
    """gx_adj must equal the directional derivative of the slack c = -g."""
    man = pca.manifold
    x = pca.x0
    v = man.random_tangent(jax.random.PRNGKey(0), x)
    lhs = np.asarray(pca.gx_adj(x, v))
    eps = 1e-7
    x_plus = x + eps * v  # ambient step fine for directional derivative
    fd = (np.asarray(pca.slack(x_plus)) - np.asarray(pca.slack(x))) / eps
    np.testing.assert_allclose(lhs, fd, atol=1e-5)


def test_gx_gx_adj_adjointness(pca):
    """<Gx(v), dx>_x == <v, Gxaj(dx)> — Gx and Gxaj are adjoint maps."""
    man = pca.manifold
    x = pca.x0
    dx = man.random_tangent(jax.random.PRNGKey(1), x)
    v = jax.random.normal(jax.random.PRNGKey(2), (pca.num_ineq,))
    lhs = float(man.inner(x, pca.gx(x, v), dx))
    rhs = float(jnp.vdot(v, pca.gx_adj(x, dx)))
    assert lhs == pytest.approx(rhs, rel=1e-10)


def test_lag_rhess_matches_fd(pca):
    """Lagrangian HVP vs finite differences of the Lagrangian gradient."""
    man = pca.manifold
    x = pca.x0
    y = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (pca.num_ineq,)))
    v = man.random_tangent(jax.random.PRNGKey(4), x)
    hv = pca.lag_rhess(x, y, v)
    # directional derivative of the *euclidean* gradient, then convert
    eps = 1e-6
    eg = lambda xx: jax.grad(lambda p: pca.cost(p) + y @ pca.ineq(p))(xx)
    eh_fd = (eg(x + eps * v) - eg(x - eps * v)) / (2 * eps)
    expected = man.ehess2rhess(x, eg(x), eh_fd, v)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(expected), atol=1e-5)


def test_rosenbrock_cost_matches_loop(rosen):
    x = rosen.x0
    v = np.asarray(x).flatten()
    alpha = 1e7
    expected = sum(
        alpha * (v[i + 1] - v[i]) ** 2 + (1 - v[i]) ** 2 for i in range(len(v) - 1)
    )
    assert float(rosen.cost(x)) == pytest.approx(expected, rel=1e-12)


def test_rosenbrock_second_order_residual_runs(rosen):
    mineig, cond = rosenbrock.second_order_residual(
        rosen, rosen.x0, rosen.y0, jnp.zeros((0,))
    )
    assert np.isfinite(float(mineig))


def test_stable_constset_ordering(stable):
    """Constraint count and ordering: 2 per onebox row (types 0/1), 1 per
    twobox row (type 2), in constset row order."""
    constset = np.loadtxt("dataset/StableIdentification/1/constset.csv")
    expected_m = sum(2 if int(r[0]) in (0, 1) else 1 for r in np.atleast_2d(constset))
    assert stable.num_ineq == expected_m == 16
    assert stable.manifold.dim == 40


def test_stable_constraints_match_manual(stable):
    constset = np.atleast_2d(np.loadtxt("dataset/StableIdentification/1/constset.csv"))
    J, R, Q = (np.asarray(a) for a in stable.x0)
    A = (J - R) @ Q
    expected = []
    for row in constset:
        t, r, c = int(row[0]), int(row[1]), int(row[2])
        if t in (0, 1):
            expected.append(-A[r, c] + row[3])
            expected.append(A[r, c] - row[4])
        else:
            expected.append(-((A[r, c] - row[3]) ** 2) + row[4] ** 2)
    np.testing.assert_allclose(
        np.asarray(stable.ineq_val(stable.x0)), np.asarray(expected), rtol=1e-12
    )


def test_stable_cost_matches_manual(stable):
    # one-step prediction error over concatenated noisy trajectories
    h = 0.02
    xs, xps = [], []
    for i in range(1, 6):
        xt = np.loadtxt(f"dataset/StableIdentification/1/noisyX_{i}.csv")
        xs.append(xt[:, :-1])
        xps.append(xt[:, 1:])
    X = np.hstack(xs)
    XP = np.hstack(xps)
    J, R, Q = (np.asarray(a) for a in stable.x0)
    A = (J - R) @ Q
    resid = XP - (np.eye(5) + h * A) @ X
    expected = np.trace(resid @ resid.T) / X.shape[1]
    assert float(stable.cost(stable.x0)) == pytest.approx(expected, rel=1e-12)


def test_stable_generator_pipeline():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    J, R, Q, A = si.generate_true_system(key, 3)
    np.testing.assert_allclose(J, -J.T, atol=1e-12)
    assert np.min(np.linalg.eigvalsh(R)) > 0
    constset = si.generate_constraints(rng, 3, A, 0.2, 0.1)
    assert constset.shape[1] == 6
    X, noisyX = si.generate_trajectory(rng, 3, A, 0.02, 10, 10.0)
    assert X.shape == (3, 10)
    assert np.isfinite(noisyX).all()
    # generated constraints hold at the true system (interior by design)
    p = si.make_problem(3, [X], constset, (J, R, Q))
    assert bool(jnp.all(p.ineq_val(p.x0) <= 1e-9))


def test_stable_interior_initialpoint_lsq():
    """Target-matching interior start search at a scale where the
    reference's random-start RALM search no longer succeeds (the twobox
    annuli are nonconvex)."""
    d = 8  # int(64 * 0.1) = 6 twobox pairs -> exercises the annulus holes
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    _, _, _, true_a = si.generate_true_system(key, d)
    constset = si.generate_constraints(rng, d, true_a, 0.2, 0.1)

    # every target must satisfy every constraint on its entry strictly
    t_rows, t_cols, t_vals = si.feasible_entry_targets(constset)
    tmap = {(int(r), int(c)): v for r, c, v in zip(t_rows, t_cols, t_vals)}
    kinds, rows, cols, p1s, p2s = si.parse_constset(constset, 1.0)
    a = np.array([tmap[(int(r), int(c))] for r, c in zip(rows, cols)])
    g = np.where(
        kinds == si.KIND_LS,
        -a + p1s,
        np.where(kinds == si.KIND_RS, a - p2s, -((a - p1s) ** 2) + p2s**2),
    )
    assert np.all(g < 0)

    J, R, Q, A = si.generate_interior_initialpoint_lsq(
        jax.random.PRNGKey(3), d, constset
    )
    prob = si.make_problem(d, [], constset, (J, R, Q), cost_zero=True)
    assert np.all(np.asarray(prob.ineq_val(prob.x0)) < 0)
    assert np.all(np.real(np.linalg.eigvals(A)) < 0)
    np.testing.assert_allclose(J, -J.T, atol=1e-9)
    assert np.min(np.linalg.eigvalsh(R)) > 0 and np.min(np.linalg.eigvalsh(Q)) > 0


def test_generate_constraints_min_segment_width():
    """The well-margined generator variant (round-5 d=32 finding): every
    constrained entry's widest feasible segment clears the floor."""
    import numpy as np
    from riptrm_tpu.problems import stable_identification as si

    rng = np.random.default_rng(0)
    key = __import__("jax").random.PRNGKey(0)
    _, _, _, true_a = si.generate_true_system(key, 8)
    floor = 0.05
    constset = si.generate_constraints(
        rng, 8, true_a, 0.2, 0.1, min_segment_width=floor
    )
    # recompute per-entry widest segments (same construction as
    # feasible_entry_targets)
    kinds, rows, cols, p1s, p2s = si.parse_constset(constset, 1.0)
    entries = {}
    for kind, r, c, p1, p2 in zip(kinds, rows, cols, p1s, p2s):
        e = entries.setdefault((int(r), int(c)),
                               {"lo": -np.inf, "hi": np.inf, "holes": []})
        if kind == si.KIND_LS:
            e["lo"] = max(e["lo"], float(p1))
        elif kind == si.KIND_RS:
            e["hi"] = min(e["hi"], float(p2))
        else:
            half = abs(float(p2))
            e["holes"].append((float(p1) - half, float(p1) + half))
    for (r, c), e in entries.items():
        segs = [(e["lo"], e["hi"])]
        for a, b in e["holes"]:
            segs = [s for seg in segs
                    for s in ((seg[0], min(seg[1], a)),
                              (max(seg[0], b), seg[1]))]
        w = max((s[1] - s[0] for s in segs if s[1] > s[0]), default=0.0)
        assert w >= floor, ((r, c), w)
    # reference-faithful default path unchanged (no filtering arg)
    cs_ref = si.generate_constraints(
        np.random.default_rng(0), 8, true_a, 0.2, 0.1
    )
    assert cs_ref.shape[1] == 6
