"""On-chip batched multi-start sweep throughput for any problem family.

The reference parallelizes its experimental sweep (instances x initial
points) as independent Hydra-multirun OS processes (``README.md:72-107``);
here the sweep is a batch axis of ONE compiled solve (SURVEY §2.3).  This
CLI measures that sweep's throughput on the default device (the TPU chip)
for a freshly generated instance of any problem family at any size:

    python -m riptrm_tpu.experiment.chip_sweep --problem NonnegPCA \
        --size 1000 --batch 128
    python -m riptrm_tpu.experiment.chip_sweep --problem StableIdentification \
        --size 16 --batch 8

Methodology (BENCH.md): data generation and the RALM feasible-interior
start search run on the HOST CPU backend (many small programs — remote
compile latency and the ~1.7 ms tunnel dispatch make them pathological on
the chip); the batched solve runs on the default device; throughput is the
marginal rate between two repetition counts, each ending in a forced host
fetch, which cancels the ~30 ms fixed tunnel-fetch overhead.

f32 notes: forcing floors are lifted to the f32-appropriate values and the
default matmul precision is raised to 'high' (3-pass bf16) — batched lanes
run their matvecs on the MXU, whose single-pass bf16 noise floor stalls
the inner loop at reference-tight tolerances (BENCH.md precision notes).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from riptrm_tpu.utils.devices import local_cpu
from riptrm_tpu.utils.retry import retry_transient


def _cpu_device():
    import jax

    return local_cpu()


# ----------------------------------------------------------------------
# Generated-instance cache (VERDICT r4 item 7)
#
# Host-side generation dominates chip batches on the 2-vCPU host (a d=32
# StableIdentification batch spent gen_s=1029 s against a 2 s sweep —
# the lsq interior-start search runs 1000 CG iterations per lane).  The
# expensive part is pure numpy payload, so it caches as one npz per
# (problem, size, seed) keyed file; batch-stacked keys carry a ``b_``
# prefix and a cache written at batch B serves any request with
# batch' <= B by slicing.  The reference persists generated data the
# same way (``dataset_generator.py:39-50`` writes CSVs under dataset/).
# ----------------------------------------------------------------------
def _cache_dir():
    import os
    import pathlib

    env = os.environ.get("RIPTRM_CACHE_DIR")  # tests point this at a tmpdir
    if env:
        return pathlib.Path(env)
    return pathlib.Path(__file__).resolve().parents[2] / "dataset" / "_cache"


def _cache_load(problem_name: str, size: int, batch: int, seed: int):
    """Return a payload dict with batch axes sliced to ``batch``, or None."""
    d = _cache_dir()
    if not d.is_dir():
        return None
    best = None
    prefix = f"{problem_name}_s{size}_seed{seed}_b"
    for f in d.glob(f"{prefix}*.npz"):
        try:
            b = int(f.stem[len(prefix):])
        except ValueError:
            continue
        if b >= batch and (best is None or b < best[0]):
            best = (b, f)
    if best is None:
        return None
    with np.load(best[1]) as z:
        return {
            k: (z[k][:batch] if k.startswith("b_") else z[k]) for k in z.files
        }


def _cache_store(problem_name: str, size: int, batch: int, seed: int, payload):
    import os
    import tempfile

    d = _cache_dir()
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{problem_name}_s{size}_seed{seed}_b{batch}.npz"
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)  # atomic: concurrent readers never see a torn file
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def build_sweep(problem_name: str, size: int, batch: int, seed: int = 0,
                cache: bool = True):
    """Generate an instance + a stacked batch of initial points on the host.

    Returns (problem, xs0, ys0) where xs0/ys0 carry a leading batch axis
    (pytree leaves stacked), built OUTSIDE the CPU context so the problem's
    arrays live on the default device.  ``cache=True`` reuses (and
    persists) the host-generated numpy payload under ``dataset/_cache``.
    """
    payload = _cache_load(problem_name, size, batch, seed) if cache else None
    if payload is None:
        payload = _generate_payload(problem_name, size, batch, seed)
        if cache:
            _cache_store(problem_name, size, batch, seed, payload)
    return _build_from_payload(problem_name, size, batch, payload)


def _rosenbrock_k(n: int) -> int:
    """Grassmann frame width: the reference ships k=3 at its small n
    (``Rosenbrock/coordinator.py:33-71``); the scaled-up chip instances
    (n >= 256, VERDICT r4 item 6) use k=8 so the QR/polar retraction and
    the [n, k] tangent algebra carry MXU-relevant width."""
    return 8 if n >= 256 else min(3, n - 1)


def _generate_payload(problem_name: str, size: int, batch: int, seed: int):
    """Host-side generation -> flat dict of numpy arrays (the cacheable
    part).  Batch-stacked keys carry the ``b_`` prefix (axis 0 = lane)."""
    import jax
    import jax.numpy as jnp

    # Build the key on the HOST backend: PRNGKey on the default (TPU)
    # device is a remote one-shot program through the tunnel, and a wedged
    # axon service turns it into minutes of gen_s (CLAUDE.md).
    with jax.default_device(_cpu_device()):
        key = jax.random.PRNGKey(seed)

    if problem_name == "NonnegPCA":
        from riptrm_tpu.problems import nonneg_pca

        k1, k2 = jax.random.split(key)
        with jax.default_device(_cpu_device()):
            data = nonneg_pca.generate_instance(k1, size)
            z_np = np.asarray(data["Z"])
            # starts ON THE CPU BACKEND too: a default-device normal() is a
            # fresh remote TPU program per (batch, size) — measured 1,735 s
            # of "gen" at B=64 through a slow-compile tunnel tail
            xs0 = np.abs(
                np.asarray(jax.random.normal(jax.device_put(k2, _cpu_device()),
                                             (batch, size)))
            )
        xs0 = xs0 / np.linalg.norm(xs0, axis=1, keepdims=True)
        return {"Z": z_np, "b_xs0": xs0}

    if problem_name == "StableIdentification":
        from riptrm_tpu.problems import stable_identification as si

        d = size
        rng = np.random.default_rng(seed)
        with jax.default_device(_cpu_device()):
            _, _, _, true_a = si.generate_true_system(key, d)
            constset = si.generate_constraints(
                rng, d, true_a, oneboxratio=0.2, twoboxratio=0.1
            )
            trajs = [
                si.generate_trajectory(rng, d, true_a, h=0.02, n_steps=20, snr=10)[1]
                for _ in range(5)
            ]
            starts = []
            for i in range(batch):
                key, sub = jax.random.split(key)
                # the scalable target-matching search: the reference's
                # RALM feasibility loop stops finding the nonconvex
                # annulus-constrained interior beyond d~5
                j_m, r_m, q_m, _ = si.generate_interior_initialpoint_lsq(
                    sub, d, constset
                )
                starts.append((j_m, r_m, q_m))
        return {
            "trajs": np.stack(trajs),
            "constset": np.asarray(constset),
            "b_J": np.stack([s_[0] for s_ in starts]),
            "b_R": np.stack([s_[1] for s_ in starts]),
            "b_Q": np.stack([s_[2] for s_ in starts]),
        }

    if problem_name == "Rosenbrock":
        from riptrm_tpu.problems import rosenbrock

        n = size
        if n < 2:
            raise ValueError(
                "Rosenbrock needs --size >= 2 (Grassmann(n, k) with k < n "
                "has dimension k*(n-k) = 0 otherwise)"
            )
        k = _rosenbrock_k(n)
        problem = rosenbrock.make_problem(n, k, dtype=jnp.float32)
        # The reference's Rosenbrock start is the single deterministic
        # |I[:, :k]| (coordinator.py:78-84); the sweep batches small
        # tangent retractions of it — on-manifold, and with step 5e-3 the
        # entries stay above the -0.01 constraint bound (feasible).
        man = problem.manifold
        x0 = problem.x0
        starts = []
        with jax.default_device(_cpu_device()):  # per-start programs: CPU
            x0c = jax.device_put(x0, _cpu_device())
            for i in range(batch):
                key, sub = jax.random.split(jax.device_put(key, _cpu_device()))
                v = man.random_tangent(sub, x0c)
                starts.append(np.asarray(man.retract(x0c, 5e-3 * v)))
        return {"b_xs0": np.stack(starts)}

    if problem_name == "BoundedPCA":
        from riptrm_tpu.problems import bounded_pca

        if size < 3:
            raise ValueError(
                "BoundedPCA needs --size >= 3 (St(n, p) needs n > p >= 2)"
            )
        p = min(max(2, size // 16), size - 1)  # St(n, p) with a small frame
        with jax.default_device(_cpu_device()):
            # Distinct upfront subkeys: the instance key must not be reused
            # for starts, and the splits must run on the CPU backend.
            ks = jax.random.split(jax.device_put(key, _cpu_device()), batch + 1)
            data = bounded_pca.generate_instance(ks[0], size)
            z_np = np.asarray(data["Z"])
            starts = [
                bounded_pca.generate_initialpoint(ks[1 + i], size, p)
                for i in range(batch)
            ]
        return {"Z": z_np, "b_xs0": np.stack([np.asarray(s_) for s_ in starts])}

    if problem_name == "LowRank":
        from riptrm_tpu.problems import low_rank

        if size < 5:
            raise ValueError(
                "LowRank needs --size >= 5 (rank must be < min(m, n) for a "
                "genuine fixed-rank manifold)"
            )
        m, n, rank = size, max(2, size // 2), max(2, size // 8)
        rank = min(rank, n - 1, m - 1)
        with jax.default_device(_cpu_device()):
            ks = jax.random.split(jax.device_put(key, _cpu_device()), batch + 1)
            data = low_rank.generate_instance(ks[0], m, n, rank)
            a_np = np.asarray(data["A"])
            starts = [
                low_rank.generate_initialpoint(ks[1 + i], m, n, rank)
                for i in range(batch)
            ]
        return {
            "A": a_np,
            "b_U": np.stack([s_[0] for s_ in starts]),
            "b_S": np.stack([s_[1] for s_ in starts]),
            "b_V": np.stack([s_[2] for s_ in starts]),
        }

    raise ValueError(
        "chip_sweep supports NonnegPCA, StableIdentification, Rosenbrock, "
        f"BoundedPCA and LowRank; got {problem_name}"
    )


def _build_from_payload(problem_name: str, size: int, batch: int, payload):
    """Construct (problem, xs0, ys0) from a (possibly cached) payload."""
    import jax
    import jax.numpy as jnp

    if problem_name == "NonnegPCA":
        from riptrm_tpu.problems import nonneg_pca

        xs0 = payload["b_xs0"]
        problem = nonneg_pca.make_problem(
            payload["Z"], xs0[0], dtype=jnp.float32, matmul_precision="high"
        )
        return (
            problem,
            jnp.asarray(xs0, jnp.float32),
            jnp.ones((batch, size), jnp.float32),
        )

    if problem_name == "StableIdentification":
        from riptrm_tpu.problems import stable_identification as si

        d = size
        starts = (payload["b_J"], payload["b_R"], payload["b_Q"])
        problem = si.make_problem(
            d, list(payload["trajs"]), payload["constset"],
            tuple(a[0] for a in starts), dtype=jnp.float32,
        )
        xs0 = tuple(jnp.asarray(a, jnp.float32) for a in starts)
        ys0 = jnp.ones((batch, problem.num_ineq), jnp.float32)
        return problem, xs0, ys0

    if problem_name == "Rosenbrock":
        from riptrm_tpu.problems import rosenbrock

        n = size
        k = _rosenbrock_k(n)
        problem = rosenbrock.make_problem(n, k, dtype=jnp.float32)
        xs0 = jnp.asarray(payload["b_xs0"], jnp.float32)
        ys0 = jnp.ones((batch, problem.num_ineq), jnp.float32)
        return problem, xs0, ys0

    if problem_name == "BoundedPCA":
        from riptrm_tpu.problems import bounded_pca

        xs0 = payload["b_xs0"]
        problem = bounded_pca.make_problem(
            payload["Z"], xs0[0], dtype=jnp.float32
        )
        ys0 = jnp.ones((batch, problem.num_ineq), jnp.float32)
        return problem, jnp.asarray(xs0, jnp.float32), ys0

    if problem_name == "LowRank":
        from riptrm_tpu.problems import low_rank

        starts = (payload["b_U"], payload["b_S"], payload["b_V"])
        problem = low_rank.make_problem(
            payload["A"], tuple(a[0] for a in starts), dtype=jnp.float32
        )
        xs0 = tuple(jnp.asarray(a, jnp.float32) for a in starts)
        ys0 = jnp.ones((batch, problem.num_ineq), jnp.float32)
        return problem, xs0, ys0

    raise ValueError(f"unknown problem family {problem_name}")


def measure_sweep(problem, xs0, ys0, option, max_steps, reps=(1, 5), tries=7,
                  solver="RIPTRM", bsolve=None):
    """Marginal-rate throughput of the batched compiled solver sweep.

    Returns (sec_per_sweep, residuals, compile_s, k_avg) with k_avg the
    repetition-averaged max inner-step count per sweep.  Shared harness for
    the chip-sweep CLI and the sweep tests (bench.py carries its own copy
    tuned to its deadline/emit machinery).  ``bsolve`` overrides the solver
    construction with a prebuilt (xs, ys) -> (states, ks, res) callable
    (the staged-precision path builds its own two-phase program)."""
    import jax
    import jax.numpy as jnp

    from riptrm_tpu.parallel.sweep import batched_riptrm_solve, batched_solver_sweep

    if bsolve is not None:
        pass
    elif solver == "RIPTRM":
        bsolve = batched_riptrm_solve(problem, option, max_steps=max_steps)
    else:
        inner = batched_solver_sweep(problem, solver, option, max_steps=max_steps)

        def bsolve(xs, ys):
            _, _, ks, res = inner(xs, ys)
            return None, ks, res
    zero = jnp.float32(0)

    def make_repeat(n_reps):
        def run(eps):
            def body(carry, _):
                coupler, total = carry
                _, ks, res = bsolve(
                    jax.tree.map(lambda a: a + eps * coupler, xs0), ys0
                )
                return (
                    jnp.sum(res).astype(jnp.float32),
                    total + jnp.max(ks).astype(jnp.int32),
                ), res

            (_, total), ress = jax.lax.scan(
                body, (jnp.float32(0), jnp.int32(0)), None, length=n_reps
            )
            return total, ress[-1]

        return jax.jit(run)

    f_short, f_long = make_repeat(reps[0]), make_repeat(reps[1])
    t0 = time.time()
    f_short(zero)
    tot_l, res = f_long(zero)
    res_host = np.asarray(res)
    k_avg = float(tot_l) / reps[1]
    compile_s = time.time() - t0

    def timed(f):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(f(zero)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(timed(f_long) - timed(f_short), 2e-3)
    per_sweep = dt / (reps[1] - reps[0])
    return per_sweep, res_host, compile_s, k_avg


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--problem", default="NonnegPCA")
    parser.add_argument("--size", type=int, default=1000,
                        help="n for NonnegPCA, d for StableIdentification")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--max-steps", type=int, default=400)
    parser.add_argument("--maxiter", type=int, default=60,
                        help="outer-iteration cap per lane")
    parser.add_argument("--tolresid", type=float, default=3e-4)
    parser.add_argument("--compensated", action="store_true",
                        help="compensated (double-word f32) complementarity "
                             "norm + ared barrier sum (ops/compensated.py) "
                             "— floor-measurement mode")
    parser.add_argument("--pallas", action="store_true",
                        help="route tCG through the fused Pallas kernel "
                             "(sphere_quadratic and stiefel_bound "
                             "structures: NonnegPCA, BoundedPCA)")
    parser.add_argument("--solver", default="RIPTRM",
                        choices=["RIPTRM", "RIPM", "RSQO", "RALM"])
    parser.add_argument("--exact", action="store_true",
                        help="RIPTRM exact mode: per-lane Hw materialization "
                             "+ batched-eigh TRS with the in-loop "
                             "second-order stationarity criterion")
    parser.add_argument(
        "--rsqo-qp-mode", default="reghess_shift",
        choices=["reghess", "reghess_shift", "reghess_operator", "eye"],
        help="RSQO Hessian regularization: 'reghess_shift' (default here) "
             "replaces the reference's per-step eigenvalue-clamp eigh — "
             "measured 18.3 ms/step batched on a v5e, dominating the sweep "
             "— with a certified diagonal shift (identical whenever the "
             "Hessian is already sufficiently PD); 'reghess' is the "
             "reference-exact clamp")
    parser.add_argument(
        "--rsqo-linear-solver", default="schulz",
        choices=["chol", "lu", "schulz", "schulz_polish"],
        help="RSQO QP Newton-system solve.  'schulz' (default here — the "
             "measured round-4 batched winner: factorization-free "
             "Newton-Schulz inverse maintenance, pure batched matmuls; "
             "NonnegPCA n=200 74/81/81 solves/s at B=16/64/128 vs chol's "
             "65/68/69 factorization-bound ceiling, StableId d=5 "
             "119/144/135 vs 88, identical residual floors), 'chol' "
             "(batched Cholesky — column-sequential on TPU), 'lu' "
             "(deep-parity)")
    parser.add_argument("--precision", choices=["high", "highest"],
                        default=None,
                        help="default matmul precision (default: 'highest' "
                             "for BoundedPCA — measured, BENCH.md: its "
                             "inner loop cannot satisfy the complementarity "
                             "criterion at 'high'-class matvec noise — "
                             "'high' for everything else)")
    parser.add_argument("--staged-precision", action="store_true",
                        help="two-phase staged matvec precision (RIPTRM + "
                             "NonnegPCA): phase 1 runs the 'high' (bf16x3) "
                             "program to its f32 floor, phase 2 CONTINUES "
                             "all lanes under a 'highest' (bf16x6) program "
                             "with 10x tighter forcing floors and "
                             "--staged-tolresid; reports both phases' "
                             "residuals (floor-chasing mode, VERDICT r3 "
                             "item 5)")
    parser.add_argument("--staged-tolresid", type=float, default=3e-6,
                        help="phase-2 residual target for --staged-precision")
    parser.add_argument("--staged-compact", action="store_true",
                        help="with --staged-precision: run phase 2 as "
                             "host-driven segments with converged-lane "
                             "compaction (power-of-two buckets; VERDICT "
                             "r4 item 4) — wall-clock timed end-to-end "
                             "instead of the scan-marginal methodology")
    parser.add_argument("--staged-segment-steps", type=int, default=100,
                        help="phase-2 segment length for --staged-compact")
    parser.add_argument("--stall-window", type=int, default=None,
                        help="freeze a sweep lane whose best residual has "
                             "not improved 1%% in this many steps (lockstep "
                             "throughput guard: one floor-stalled lane "
                             "otherwise burns every lane's full budget); "
                             "baseline-solver sweeps only")
    parser.add_argument("--certify", action="store_true",
                        help="post-hoc batched second-order certificates at "
                             "the sweep's final points (one vmapped "
                             "matrix-free Lanczos, parallel/sweep.py::"
                             "certify_second_order) — valid for problems "
                             "with AFFINE constraints (NonnegPCA, "
                             "BoundedPCA, Rosenbrock), where Hess g = 0 "
                             "makes the ratio-capped certificate "
                             "conservative; RIPTRM only")
    parser.add_argument("--option", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="extra solver option override, repeatable "
                             "(bool/int/float parsed; e.g. --option "
                             "KrylovIterMethod=true for RIPM's matrix-free "
                             "CR condensed solve)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    option_overrides = {}
    for kv in args.option:
        k, _, v = kv.partition("=")
        lv = v.lower()
        if lv in ("true", "false"):
            option_overrides[k] = lv == "true"
        else:
            try:
                option_overrides[k] = int(v)
            except ValueError:
                try:
                    option_overrides[k] = float(v)
                except ValueError:
                    option_overrides[k] = v
    if args.certify and (
        args.solver != "RIPTRM" or args.problem == "StableIdentification"
    ):
        parser.error(
            "--certify needs RIPTRM final states and affine constraints "
            "(StableIdentification's annulus terminal duals make any "
            "terminal curvature bound vacuous — see protocol_speedrun)"
        )
    if args.precision is None:
        args.precision = "highest" if args.problem == "BoundedPCA" else "high"
    if args.exact and args.pallas:
        parser.error(
            "--pallas applies to the tCG subproblem only; the exact mode "
            "solves the TRS by eigendecomposition (no kernel to route to)"
        )
    if args.exact and args.solver != "RIPTRM":
        parser.error(
            "--exact selects RIPTRM's Exact_RepMat mode; the baseline "
            "solvers ignore those options, and reporting mode='exact' for "
            "them would fabricate benchmark rows"
        )
    if args.staged_precision and (
        args.solver != "RIPTRM" or args.exact or args.pallas
        or args.problem != "NonnegPCA"
    ):
        parser.error(
            "--staged-precision is the RIPTRM tCG NonnegPCA floor-chasing "
            "mode (phase 2 rebuilds the problem at matmul_precision="
            "'highest'; other problems take precision from the global flag "
            "and the Pallas kernels hard-code their schemes)"
        )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp

    t0 = time.time()
    cache_hit = (
        _cache_load(args.problem, args.size, args.batch, args.seed) is not None
    )
    problem, xs0, ys0 = build_sweep(args.problem, args.size, args.batch, args.seed)
    gen_s = time.time() - t0

    # f32 forcing floors (BENCH.md precision notes).  The complementarity
    # criterion is a 2-norm over all m constraints, so its reachable floor
    # grows like sqrt(m); 2e-4 was calibrated at m=200 (NonnegPCA n=200).
    compl_floor = 2e-4 * max(1.0, (problem.num_ineq / 200.0) ** 0.5)
    option = {
        "maxiter": args.maxiter,
        "tolresid": args.tolresid,
        "TRS_solver": "Exact_RepMat" if args.exact else "tCG",
        "second_order_stationarity": args.exact,
        "use_pallas_tcg": args.pallas,
        "compensated_reductions": args.compensated,
        "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-4),
        "forcing_function_complementarity": (
            lambda mu: jnp.maximum(1e-3 * mu, compl_floor)
        ),
    }
    if args.exact:
        option["forcing_function_second_order"] = (
            lambda mu: jnp.maximum(mu, 1e-4)
        )
    if args.solver == "RSQO":
        option["quadoptim_type"] = args.rsqo_qp_mode
        option["quadoptim_linear_solver"] = args.rsqo_linear_solver
    if args.stall_window is not None:
        option["sweep_stall_window"] = args.stall_window
    option.update(option_overrides)
    staged_extra = {}
    bsolve = None
    if args.staged_precision:
        from riptrm_tpu.problems import nonneg_pca
        from riptrm_tpu.parallel.sweep import staged_precision_riptrm_solve

        # Phase 2: same instance (structure carries the symmetrized Zs,
        # and cost/grad only ever use Zs) rebuilt with 6-pass matvecs,
        # floors dropped 10x, and a stall guard so floor-stalled lanes
        # don't burn the full budget in lockstep.
        problem_hi = nonneg_pca.make_problem(
            problem.structure["Zs"], np.asarray(xs0[0]),
            dtype=jnp.float32, matmul_precision="highest",
        )
        compl_floor_hi = compl_floor / 10.0
        option_hi = option | {
            "tolresid": args.staged_tolresid,
            "forcing_function_Lagrangian": lambda mu: jnp.maximum(mu, 1e-5),
            "forcing_function_complementarity": (
                lambda mu: jnp.maximum(1e-3 * mu, compl_floor_hi)
            ),
            "sweep_stall_window": option.get("sweep_stall_window", 25),
        }
        if args.staged_compact:
            from riptrm_tpu.parallel.sweep import (
                staged_precision_riptrm_compacted,
            )

            run_compact = staged_precision_riptrm_compacted(
                problem, problem_hi, option, option_hi, args.max_steps,
                segment_steps=args.staged_segment_steps,
            )
            # warm (compiles phase 1 + the phase-2 bucket programs this
            # instance actually visits), then wall-clock the host loop —
            # the scan-marginal methodology does not apply to a
            # host-segmented program, so the fixed ~30 ms fetch overhead
            # is simply part of each segment here (documented).
            best_w, res1_w, segs_w = retry_transient(
                lambda: run_compact(xs0, ys0),
                label="chip_sweep.staged_compact_warm",
            )
            ts = []
            for _ in range(3):
                t0 = time.time()
                best, res1, segs = run_compact(xs0, ys0)
                ts.append(time.time() - t0)
            t_run = min(ts)
            out = {
                "problem": args.problem,
                "size": args.size,
                "batch": args.batch,
                "solver": "RIPTRM",
                "mode": "staged_precision_compacted",
                "point": "best",
                "segment_steps": args.staged_segment_steps,
                "solves_per_sec": round(args.batch / t_run, 2),
                "sweep_ms": round(t_run * 1e3, 1),
                "median_residual": float(np.median(best)),
                "max_residual": float(np.max(best)),
                "phase1_median_residual": float(np.median(res1)),
                "floor_improvement_x": round(
                    float(np.median(res1) / max(np.median(best), 1e-30)), 1
                ),
                "segments_used": [int(s) for s in segs],
                "gen_s": round(gen_s, 1),
                "cache_hit": cache_hit,
                "device": str(jax.devices()[0]),
            }
            print(json.dumps(out))
            return

        staged = staged_precision_riptrm_solve(
            problem, problem_hi, option, option_hi, args.max_steps
        )

        def bsolve(xs, ys):
            st, ks, res2, res1 = staged(xs, ys)
            return st, ks, res2

        # one un-timed call for the phase-1 floor report
        _, _, res2_probe, res1_probe = jax.tree.map(
            np.asarray, retry_transient(
                lambda: staged(xs0, ys0), label="chip_sweep.staged_probe"
            )
        )
        staged_extra = {
            "phase1_median_residual": float(np.median(res1_probe)),
            "phase1_max_residual": float(np.max(res1_probe)),
            "floor_improvement_x": round(
                float(np.median(res1_probe) / max(np.median(res2_probe),
                                                 1e-30)), 1
            ),
        }

    # Transient-failure guard (VERDICT r3 item 1): the TPU worker crashes
    # and self-recovers in ~30 s; absorb up to two such windows instead of
    # recording an error row for a flake.
    per_sweep, res, compile_s, _ = retry_transient(
        lambda: measure_sweep(
            problem, xs0, ys0, option, max_steps=args.max_steps,
            solver=args.solver, bsolve=bsolve,
        ),
        label="chip_sweep.measure",
    )
    out = {
        "problem": args.problem,
        "size": args.size,
        "batch": args.batch,
        "solver": args.solver,
        "mode": (
            "staged_precision" if args.staged_precision
            else "exact" if args.exact else "tCG"
        ),
        # which iterate the residual columns score (ADVICE r4: surface
        # best-vs-final so round-over-round rows aren't conflated) —
        # RALM and the staged continuation default to best-iterate
        "point": (
            "best"
            if (
                args.staged_precision
                or option.get("keep_best_point", args.solver == "RALM")
            )
            else "final"
        ),
        **staged_extra,
        **(
            {"rsqo_linear_solver": args.rsqo_linear_solver}
            if args.solver == "RSQO"
            else {}
        ),
        "solves_per_sec": round(args.batch / per_sweep, 2),
        "sweep_ms": round(per_sweep * 1e3, 3),
        "median_residual": float(np.median(res)),
        "max_residual": float(np.max(res)),
        "gen_s": round(gen_s, 1),
        "cache_hit": cache_hit,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    if args.certify:
        from riptrm_tpu.parallel.sweep import (
            batched_riptrm_solve,
            certify_second_order,
        )

        bsolve = batched_riptrm_solve(problem, option, max_steps=args.max_steps)
        states, _, _ = retry_transient(
            lambda: jax.block_until_ready(bsolve(xs0, ys0)),
            label="chip_sweep.certify_solve",
        )
        t0 = time.time()
        mineigs = retry_transient(
            lambda: np.asarray(
                certify_second_order(problem, states.x, states.y, ratio_cap=1e8)
            ),  # np.asarray = the forced host fetch (tunnel timing rules)
            label="chip_sweep.certify",
        )
        out["certify_s"] = round(time.time() - t0, 3)
        out["certified_mineig_min"] = float(np.nanmin(mineigs))
        out["certified_mineig_median"] = float(np.nanmedian(mineigs))
        out["certified_lanes"] = int(np.isfinite(mineigs).sum())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
