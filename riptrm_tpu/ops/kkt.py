"""KKT residual, constraint violations and per-iteration evaluation.

Parity targets: ``compute_residual`` (``/root/reference/src/solver/utils.py:269-340``),
``compute_maxmeanviolations`` (``utils.py:237-267``) and ``evaluation``
(``utils.py:342-368``).  All fully jittable so the evaluation fuses into the
solver step (the reference subtracts evaluation wall-time via
``excluded_time`` bookkeeping; here it is effectively free).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_residual(problem, x, y, z):
    """Returns (residual, gradnorm, complvio, nonnegvio, manvio).

    residual^2 = ||grad_x L||^2 + ||y * g||^2 + ||max(-y,0)||^2
                 + ||max(g,0)||^2 + ||h||^2 + manvio^2
    """
    man = problem.manifold
    grad_lag = problem.lag_rgrad(x, y, z)
    gradnorm = man.norm(x, grad_lag)
    sq = gradnorm**2

    g = problem.ineq_val(x)
    compl = jnp.linalg.norm(y * g) if problem.has_ineq else jnp.asarray(0.0)
    nonneg = (
        jnp.linalg.norm(jnp.maximum(-y, 0.0)) if problem.has_ineq else jnp.asarray(0.0)
    )
    ineqvio_sq = jnp.sum(jnp.maximum(g, 0.0) ** 2) if problem.has_ineq else 0.0
    eqvio_sq = jnp.sum(problem.eq_val(x) ** 2) if problem.has_eq else 0.0

    manvio = jnp.asarray(problem.manvio(x))
    residual = jnp.sqrt(sq + compl**2 + nonneg**2 + ineqvio_sq + eqvio_sq + manvio**2)
    return residual, gradnorm, compl, nonneg, manvio


def compute_maxmean_violations(problem, x):
    """Max / mean of per-constraint violations (``utils.py:237-267``)."""
    parts = []
    if problem.has_ineq:
        parts.append(jnp.maximum(problem.ineq_val(x), 0.0))
    if problem.has_eq:
        parts.append(jnp.abs(problem.eq_val(x)))
    if not parts:
        return jnp.asarray(0.0), jnp.asarray(0.0)
    v = jnp.concatenate(parts)
    return jnp.max(v), jnp.mean(v)


def evaluation(problem, x_prev, x, y, z):
    """Per-iteration metric dict (``utils.py:342-368``)."""
    residual, gradnorm, compl, nonneg, manvio = compute_residual(problem, x, y, z)
    maxvio, meanvio = compute_maxmean_violations(problem, x)
    ev = {
        "cost": problem.cost(x),
        "distance": problem.manifold.dist(x_prev, x),
        "residual": residual,
        "gradnorm": gradnorm,
        "complviolation": compl,
        "dualviolation": nonneg,
        "manviolation": manvio,
        "maxviolation": maxvio,
        "meanviolation": meanvio,
    }
    return problem.callback(problem, x, y, z, ev)
