"""Pallas TPU kernels for the RIPTRM hot path.

``chained_barrier_matvec``: runs K iterations of the normalized
barrier-Hessian matvec for sphere-constrained quadratic problems
(NonnegPCA structure) with the Z matrix, point, duals and iterate all
resident in VMEM — the HBM read of Z happens ONCE for the whole chain
instead of once per matvec (XLA's scan re-reads Z from HBM every
iteration).  This is the speed-of-light form of the tCG inner loop
(``RIPTRM.py:729`` hot op; SURVEY.md §7 step 9).

Math (NonnegPCA on S^{n-1}, c = slack = x, P = I - x x^T).  With
L = f + y.g, f = -x'Zs x, g = -x, the sphere curvature correction uses the
*Lagrangian* euclidean gradient (-2 Zs x - y), so

    Hw(v) = -2 P(Zs v) + (2 x'Zs x + x'y) v + P((y / c) * v)

— the x'y term comes from the constraint Hessians
(rhess g_i[v] = x_i v on the sphere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The compiler's DEFAULT scoped-VMEM limit is 16 MB; the whole-Z-resident
# single-lane kernels need Z plus a few n-vectors to fit under it.
VMEM_BUDGET_BYTES = 14 * 1024 * 1024

# The BATCHED kernels raise the Mosaic scoped-VMEM limit explicitly
# (CompilerParams(vmem_limit_bytes=...)): measured on the v5e, B=128
# n=1000 whole-batch (scoped need ~33 MB) compiles and runs correctly at
# a 100 MB limit, where the 16 MB default OOMs at B=64.  Budget 56 MB for
# gating (margin under the 64 MB limit we request).
BATCHED_VMEM_LIMIT_BYTES = 64 * 1024 * 1024
BATCHED_VMEM_BUDGET_BYTES = 56 * 1024 * 1024

_BATCHED_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=BATCHED_VMEM_LIMIT_BYTES
)


def fits_in_vmem(n: int, dtype_bytes: int = 4) -> bool:
    return n * n * dtype_bytes + 8 * n * dtype_bytes <= VMEM_BUDGET_BYTES


def fits_in_vmem_batched(n: int, b: int, dtype_bytes: int = 4) -> bool:
    """Z plus ~60 [b, n] arrays for the whole-batch tCG kernel, against the
    RAISED batched budget.  Measured: the Mosaic compile of B=64, n=1000
    allocates 18.53 MB scoped VMEM (= ~57 [b, n] rows/lane on top of Z —
    inputs + outputs + while carries + double-buffered temporaries); the
    old estimate of 32 rows against the 14 MB default under-gated and
    OOMed.  With vmem_limit_bytes raised to 64 MB, whole-batch holds up to
    B~200 at n=1000 (B=128 verified on-chip)."""
    return (
        n * n * dtype_bytes + 60 * b * n * dtype_bytes
        <= BATCHED_VMEM_BUDGET_BYTES
    )


def max_batched_block(n: int, dtype_bytes: int = 4) -> int:
    """Largest multiple-of-8 lane-block for the GRIDDED batched tCG kernel.

    Per grid step the kernel holds Z (whole-array, constant block index so
    the pipeline re-uses one window) plus double-buffered [bb, n] I/O blocks
    (7 inputs + 2 outputs), ~13 [bb, n] while-loop carries and Mosaic
    temporaries.  Measured on a v5e at n=1000: whole-batch is ~57 rows per
    lane and gridded adds block double-buffering, so budget 68 rows against
    the raised 56 MB batched budget (the gridded pallas_call requests a
    64 MB scoped limit)."""
    avail = BATCHED_VMEM_BUDGET_BYTES - n * n * dtype_bytes
    per_lane = 68 * n * dtype_bytes
    if avail <= 0:
        return 0
    return (avail // per_lane) // 8 * 8


def _chain_kernel(corr_ref, z_ref, x_ref, w_ref, v_ref, out_ref, *, n_iters):
    """One kernel invocation runs the whole chain in VMEM.

    corr_ref: [1, 1] scalar 2 x'Zs x + x'y (SMEM); z_ref: [n, n] symmetrized Z;
    x_ref: [1, n] point; w_ref: [1, n] barrier weights y/c;
    v_ref: [1, n] start vector.

    ROW layout throughout: an n-vector stored [n, 1] occupies one lane of
    ceil(n/8) sublane-tiles, so every elementwise op and reduction runs at
    1/128 VPU utilization; stored [1, n] it fills ceil(n/128) full vregs and
    reductions are cross-lane tree reduces.  Measured 4.4x end-to-end on a
    v5e at n=1000 (BENCH.md).  The matvec stays on the MXU via the
    symmetry of Zs: v_row @ Z == (Z v)'.
    """
    x = x_ref[:]
    w = w_ref[:]
    corr = corr_ref[0, 0]

    def body(_, v):
        zv = jnp.dot(v, z_ref[:], preferred_element_type=jnp.float32)
        pzv = zv - x * jnp.sum(x * zv)
        bar = w * v
        pbar = bar - x * jnp.sum(x * bar)
        hv = -2.0 * pzv + corr * v + pbar
        return hv / jnp.sqrt(jnp.sum(hv * hv))

    out_ref[:] = jax.lax.fori_loop(0, n_iters, body, v_ref[:])


def _tcg_kernel(
    scal_ref, z_ref, x_ref, w_ref, g_ref, eta_ref, heta_ref, stats_ref,
    *, maxinner, mininner,
):
    """Entire Steihaug-Toint tCG loop in one kernel, all state in VMEM.

    scal_ref (SMEM [4,1]): [corr, radius, target, linear_flag] — target and
    the linear/superlinear classification are precomputed on the host side
    of the graph because Mosaic has no float pow.
    Mirrors ops/tcg.py::truncated_cg (itself the reference's vendored
    pymanopt tCG, RIPTRM.py:41-216) for the sphere-quadratic structure.
    stats_ref (SMEM [2,1]): [iterations, stop_code] out.
    All vectors in ROW [1, n] layout (see ``_chain_kernel``); the matvec
    uses v_row @ Z == (Z v)' by the symmetry of Zs.
    """
    x = x_ref[:]
    w = w_ref[:]
    corr = scal_ref[0, 0]
    radius = scal_ref[1, 0]
    target = scal_ref[2, 0]
    linear_flag = scal_ref[3, 0]
    grad = g_ref[:]

    def hw(v):
        zv = jnp.dot(v, z_ref[:], preferred_element_type=jnp.float32)
        pzv = zv - x * jnp.sum(x * zv)
        bar = w * v
        pbar = bar - x * jnp.sum(x * bar)
        return -2.0 * pzv + corr * v + pbar

    def proj(v):
        return v - x * jnp.sum(x * v)

    def dot(a, b):
        return jnp.sum(a * b)

    r0 = grad
    z_r0 = dot(r0, r0)
    delta0 = -r0
    zero = jnp.float32(0.0)

    def safe_div(a, b):
        return a / jnp.where(b == 0, 1.0, b)

    # carry: eta, Heta, r, delta, e_Pe, d_Pd, e_Pd, z_r, model, j, code, done
    init = (
        jnp.zeros_like(grad), jnp.zeros_like(grad), r0, delta0,
        zero, z_r0, zero, z_r0, zero,
        jnp.int32(0), jnp.int32(0), jnp.bool_(False),
    )

    def cond(c):
        return jnp.logical_and(~c[11], c[9] < maxinner)

    def body(c):
        eta, heta, r, delta, e_pe, d_pd, e_pd, z_r, model, j, code, done = c
        hdelta = hw(delta)
        d_hd = dot(delta, hdelta)
        alpha = safe_div(z_r, d_hd)
        e_pe_new = e_pe + 2.0 * alpha * e_pd + alpha**2 * d_pd
        bail = jnp.logical_or(d_hd <= 0, e_pe_new >= radius**2)
        disc = jnp.maximum(e_pd**2 + d_pd * (radius**2 - e_pe), 0.0)
        tau = safe_div(-e_pd + jnp.sqrt(disc), d_pd)
        eta_b = eta + tau * delta
        heta_b = heta + tau * hdelta
        eta_c = eta + alpha * delta
        heta_c = heta + alpha * hdelta
        model_c = dot(eta_c, grad) + 0.5 * dot(eta_c, heta_c)
        model_inc = model_c >= model
        r_new = r + alpha * hdelta
        norm_r = jnp.sqrt(dot(r_new, r_new))
        hit = jnp.logical_and(j + 1 > mininner, norm_r <= target)
        beta = safe_div(dot(r_new, r_new), z_r)
        delta_new = proj(-r_new + beta * delta)
        done_now = bail | model_inc | hit
        code_new = jnp.where(
            bail,
            jnp.where(d_hd <= 0, 1, 2),
            jnp.where(
                model_inc, 3,
                jnp.where(hit, jnp.where(linear_flag > 0, 4, 5), 0),
            ),
        ).astype(jnp.int32)

        pick = lambda b_, k_, a_: jnp.where(bail, b_, jnp.where(model_inc, k_, a_))
        eta_out = pick(eta_b, eta, eta_c)
        heta_out = pick(heta_b, heta, heta_c)
        zr_new = dot(r_new, r_new)
        return (
            eta_out, heta_out, r_new, delta_new,
            jnp.where(done_now, e_pe, e_pe_new),
            jnp.where(done_now, d_pd, zr_new + beta**2 * d_pd),
            jnp.where(done_now, e_pd, beta * (e_pd + alpha * d_pd)),
            jnp.where(done_now, z_r, zr_new),
            jnp.where(done_now | model_inc, model, model_c),
            j + 1, code_new, done_now,
        )

    out = jax.lax.while_loop(cond, body, init)
    eta_ref[:] = out[0]
    heta_ref[:] = out[1]
    stats_ref[0, 0] = out[9]
    stats_ref[1, 0] = out[10]


@functools.partial(jax.jit, static_argnames=("maxinner", "mininner"))
def pallas_tcg_sphere_quadratic(zs, x, y_over_c, grad, radius, *, maxinner,
                                mininner=1, theta=1.0, kappa=0.1):
    """Fused tCG for sphere-quadratic barrier subproblems.

    Returns (eta, Heta, iterations, stop_code) with the same stop-code
    convention as ``ops.tcg.truncated_cg``.
    """
    n = zs.shape[0]
    # 2 x'Zs x (cost curvature) + x'y (constraint curvature); y_i = w_i * x_i
    corr = 2.0 * (x @ (zs @ x)) + jnp.sum(y_over_c * x * x)
    norm_r0 = jnp.linalg.norm(grad)
    target = norm_r0 * jnp.minimum(norm_r0**theta, kappa)
    linear_flag = (kappa < norm_r0**theta).astype(jnp.float32)
    scal = jnp.stack(
        [
            corr.astype(jnp.float32),
            jnp.asarray(radius, jnp.float32),
            target.astype(jnp.float32),
            linear_flag,
        ]
    ).reshape(4, 1)
    row = lambda a: a.reshape(1, n).astype(jnp.float32)
    eta, heta, stats = pl.pallas_call(
        functools.partial(_tcg_kernel, maxinner=maxinner, mininner=mininner),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((2, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((4, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1), memory_space=pltpu.SMEM),
        ),
    )(scal, zs.astype(jnp.float32), row(x), row(y_over_c), row(grad))
    return eta.reshape(n), heta.reshape(n), stats[0, 0], stats[1, 0]


def _tcg_kernel_batched(
    corr_ref, radius_ref, target_ref, flag_ref, z_ref, x_ref, w_ref, g_ref,
    eta_ref, heta_ref, stats_ref,
    *, maxinner, mininner,
):
    """Batched Steihaug-Toint tCG: B lanes in lockstep, one shared Z.

    All state — including per-lane scalars — is [B, n] (B sublanes x full
    lanes), the matvec is ONE [B, n] x [n, n] MXU matmul per iteration with
    Z loaded from HBM once per kernel call and shared across all lanes (the
    vmapped-XLA path re-reads Z from HBM every batched matvec).

    Per-lane scalars (corr/radius/target/linear_flag and all loop scalars)
    are carried as full [B, n] arrays with the value replicated along the
    lane axis: Mosaic's narrow [B, 1] vector layouts hit unimplemented
    relayouts both ways (tiled->replicated on while-carries, "Lane
    broadcast" on [B,1]x[B,n] products of loaded slices), whereas [B, n]
    elementwise ops plus keepdims-reductions broadcast straight back to
    [B, n] are the standard well-supported pattern.  The VMEM cost is
    ~12 extra [B, n] arrays (fits_in_vmem_batched budget).

    Lanes that hit a stop condition are frozen (same masked-lockstep
    semantics as ``RIPTRM.solve_compiled`` under vmap); the loop exits when
    every lane is done.  stats out: [B, 2] int32 (iterations, stop_code).
    """
    x = x_ref[:]  # [B, n]
    w = w_ref[:]
    grad = g_ref[:]
    corr = corr_ref[:]  # [B, n], lane-constant
    radius = radius_ref[:]
    target = target_ref[:]
    linear_flag = flag_ref[:]
    # Zero seed derived FROM DATA (not a jnp.zeros splat): splat-constant
    # while-carry inits are inferred fully-replicated, and the body's tiled
    # updates then hit the unimplemented tiled->replicated relayout.
    # f32 sub is not constant-folded (NaN semantics), so this stays an op.
    zeros_bn = grad - grad

    def dot(a, b):
        # [B, n] -> [B, n]: row inner product, broadcast back across lanes
        return jnp.sum(a * b, axis=1, keepdims=True) + zeros_bn

    # The [B, n] x [n, n] product hits the MXU, whose single-pass input
    # precision is bf16 — enough noise to stall the inner loop at
    # mu_stall*sqrt(m) (BENCH.md precision notes; the single-lane kernel's
    # [1, n] matvec runs full-f32 on the VPU and never sees this).  Mosaic
    # supports only DEFAULT and HIGHEST dot precision, and HIGHEST (6-pass)
    # made the kernel matmul-bound, so do bf16x3 ("high", 3 single-pass
    # matmuls) by hand: split operands into bf16 hi + bf16 residual and
    # drop the lo*lo term.  Z's split is hoisted out of the tCG loop.
    z32 = z_ref[:]
    z_hi = z32.astype(jnp.bfloat16)
    z_lo = (z32 - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def matvec3(v):
        v_hi = v.astype(jnp.bfloat16)
        v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # precision must be EXPLICIT: an ambient jax_default_matmul_precision
        # of 'high' (chip_sweep sets it) would leak in, and Mosaic lowers
        # only DEFAULT and HIGHEST dots.
        d = lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                                 preferred_element_type=jnp.float32)
        return d(v_hi, z_hi) + d(v_hi, z_lo) + d(v_lo, z_hi)

    def hw(v):
        zv = matvec3(v)
        pzv = zv - x * dot(x, zv)
        bar = w * v
        pbar = bar - x * dot(x, bar)
        return -2.0 * pzv + corr * v + pbar

    def proj(v):
        return v - x * dot(x, v)

    r0 = grad
    z_r0 = dot(r0, r0)
    delta0 = -r0
    zeros1 = zeros_bn

    def safe_div(a, d):
        return a / jnp.where(d == 0, 1.0, d)

    # carry: eta, Heta, r, delta, e_Pe, d_Pd, e_Pd, z_r, model,
    #        iters, code, done (all [B, n] lane-constant), global j.
    # Counters/codes/done are f32 — i1 vector carries fail scf.yield
    # legalization and int carries hit narrow-int relayouts; ints are cast
    # once at the final store.
    init = (
        zeros_bn, zeros_bn, r0, delta0,
        zeros1, z_r0, zeros1, z_r0, zeros1,
        zeros1,
        zeros1,
        zeros1,  # done mask: 0.0 alive / 1.0 finished
        jnp.int32(0),
    )

    def cond(c):
        any_alive = jnp.sum(1.0 - c[11]) > 0
        return jnp.logical_and(any_alive, c[12] < maxinner)

    def body(c):
        (eta, heta, r, delta, e_pe, d_pd, e_pd, z_r, model,
         iters, code, done_f, j) = c
        done = done_f > 0.5  # f32 carry -> bool for the selects
        hdelta = hw(delta)
        d_hd = dot(delta, hdelta)
        alpha = safe_div(z_r, d_hd)
        e_pe_new = e_pe + 2.0 * alpha * e_pd + alpha**2 * d_pd
        bail = jnp.logical_or(d_hd <= 0, e_pe_new >= radius**2)
        disc = jnp.maximum(e_pd**2 + d_pd * (radius**2 - e_pe), 0.0)
        tau = safe_div(-e_pd + jnp.sqrt(disc), d_pd)
        eta_b = eta + tau * delta
        heta_b = heta + tau * hdelta
        eta_c = eta + alpha * delta
        heta_c = heta + alpha * hdelta
        model_c = dot(eta_c, grad) + 0.5 * dot(eta_c, heta_c)
        model_inc = model_c >= model
        r_new = r + alpha * hdelta
        zr_new = dot(r_new, r_new)
        norm_r = jnp.sqrt(zr_new)
        hit = jnp.logical_and(j + 1 > mininner, norm_r <= target)
        beta = safe_div(zr_new, z_r)
        delta_new = proj(-r_new + beta * delta)
        done_now = bail | model_inc | hit
        code_new = jnp.where(
            bail,
            jnp.where(d_hd <= 0, 1.0, 2.0),
            jnp.where(
                model_inc, 3.0,
                jnp.where(hit, jnp.where(linear_flag > 0, 4.0, 5.0), 0.0),
            ),
        )

        pick = lambda b_, k_, a_: jnp.where(bail, b_, jnp.where(model_inc, k_, a_))
        eta_out = pick(eta_b, eta, eta_c)
        heta_out = pick(heta_b, heta, heta_c)

        frz = lambda new, old: jnp.where(done, old, new)  # freeze finished lanes
        return (
            frz(eta_out, eta), frz(heta_out, heta), frz(r_new, r),
            frz(delta_new, delta),
            frz(jnp.where(done_now, e_pe, e_pe_new), e_pe),
            frz(jnp.where(done_now, d_pd, zr_new + beta**2 * d_pd), d_pd),
            frz(jnp.where(done_now, e_pd, beta * (e_pd + alpha * d_pd)), e_pd),
            frz(jnp.where(done_now, z_r, zr_new), z_r),
            frz(jnp.where(done_now | model_inc, model, model_c), model),
            iters + (1.0 - done_f),
            jnp.where(done, code, code_new),
            jnp.maximum(done_f, jnp.where(done_now, 1.0, 0.0)),
            j + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    eta_ref[:] = out[0]
    heta_ref[:] = out[1]
    stats_ref[:] = jnp.concatenate(
        [out[9][:, 0:1], out[10][:, 0:1]], axis=1
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("maxinner", "mininner"))
def pallas_tcg_sphere_quadratic_batched(
    zs, xs, ws, grads, radii, *, maxinner, mininner=1, theta=1.0, kappa=0.1
):
    """Batched fused tCG: B lanes share one VMEM-resident Z.

    Returns (etas [B, n], Hetas [B, n], iterations [B], stop_codes [B]).
    """
    b, n = xs.shape
    xs32 = xs.astype(jnp.float32)
    ws32 = ws.astype(jnp.float32)
    gs32 = grads.astype(jnp.float32)
    zx = xs32 @ zs.astype(jnp.float32)  # [B, n]
    corr = 2.0 * jnp.sum(zx * xs32, axis=1) + jnp.sum(ws32 * xs32 * xs32, axis=1)
    norm_r0 = jnp.linalg.norm(gs32, axis=1)
    target = norm_r0 * jnp.minimum(norm_r0**theta, kappa)
    linear_flag = (kappa < norm_r0**theta).astype(jnp.float32)
    kern = functools.partial(_tcg_kernel_batched, maxinner=maxinner, mininner=mininner)
    # Per-lane scalars enter pre-broadcast to [B, n] (see kernel docstring)
    bn = lambda a: jnp.broadcast_to(a.astype(jnp.float32)[:, None], (b, n))
    args = (
        bn(corr),
        bn(jnp.broadcast_to(radii, (b,))),
        bn(target),
        bn(linear_flag),
        zs.astype(jnp.float32),
        xs32,
        ws32,
        gs32,
    )
    # Lane-block cap 64: measured best MXU efficiency (roofline
    # result/roofline.json: 59.5% of row-fill-adjusted peak at B=64 vs 32%
    # at B=128 — the [B, n] lane-constant VPU ops grow linearly with B and
    # swamp the matmul; sweeps confirm 2,548 solves/s whole-batch B=64 vs
    # 2,372 whole-batch B=128 vs 2,635 gridded-bb=64 B=128).  Whole-batch
    # only up to 64 lanes; wider batches grid over 64-lane blocks.
    if b <= 64 and fits_in_vmem_batched(n, b):
        etas, hetas, stats = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((b, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n), jnp.float32),
                jax.ShapeDtypeStruct((b, 2), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            compiler_params=_BATCHED_COMPILER_PARAMS,
        )(*args)
        return etas, hetas, stats[:, 0], stats[:, 1]

    # GRIDDED path: B exceeds the single-call VMEM budget.  Lane-blocks of
    # bb run sequentially over a 1-D grid; Z's block index is constant so
    # the pipeline loads it once and re-uses the window, while the [bb, n]
    # state blocks stream per grid step.  On a single-core chip this keeps
    # the fused kernel's per-lane rate for arbitrarily large sweeps (the
    # alternative — the vmapped XLA path — re-reads Z from HBM every
    # batched matvec and measured ~1.8x slower at n=1000, BENCH.md).
    bb = min(max_batched_block(n), 64)  # 64-lane efficiency cap (above)
    if bb < 8:
        raise ValueError(f"n={n} too large for the batched tCG kernel")
    bb = min(bb, -(-b // 8) * 8)
    pad = -b % bb
    grid = (b + pad) // bb
    pad_lane = lambda a: jnp.pad(a, ((0, pad), (0, 0)), mode="edge")
    blk = pl.BlockSpec((bb, n), lambda i: (i, 0))
    etas, hetas, stats = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((b + pad, n), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, n), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, 2), jnp.int32),
        ),
        in_specs=[blk] * 4
        + [pl.BlockSpec((n, n), lambda i: (0, 0))]
        + [blk] * 3,
        out_specs=(blk, blk, pl.BlockSpec((bb, 2), lambda i: (i, 0))),
        compiler_params=_BATCHED_COMPILER_PARAMS,
    )(*[a if i == 4 else pad_lane(a) for i, a in enumerate(args)])
    return etas[:b], hetas[:b], stats[:b, 0], stats[:b, 1]


def tcg_sphere_quadratic(maxinner, mininner=1, theta=1.0, kappa=0.1):
    """Fused tCG with a custom vmap rule.

    Returns ``tcg(zs, x, w, grad, radius)`` behaving like
    ``pallas_tcg_sphere_quadratic``; under ``jax.vmap`` (batched multi-start
    sweeps, ``parallel/sweep.py``) the rule routes to the batched kernel —
    Z stays unbatched and is loaded into VMEM once per call, shared across
    all lanes — instead of failing or falling back to per-lane calls.
    Batches beyond the single-call VMEM budget run the gridded kernel
    (sequential lane-blocks sharing one Z window).  Falls back to a
    sequential ``lax.map`` of single-lane kernels only when Z itself
    carries a batch axis (per-lane instances cannot share VMEM) or n is
    too large for even one 8-lane block.
    """
    from jax import custom_batching

    kw = dict(maxinner=maxinner, mininner=mininner, theta=theta, kappa=kappa)

    @custom_batching.custom_vmap
    def tcg(zs, x, w, grad, radius):
        return pallas_tcg_sphere_quadratic(zs, x, w, grad, radius, **kw)

    @tcg.def_vmap
    def _rule(axis_size, in_batched, zs, x, w, grad, radius):
        zb, xb, wb, gb, rb = in_batched
        n = zs.shape[-1]

        def bc(a, ab):
            return a if ab else jnp.broadcast_to(a, (axis_size,) + tuple(jnp.shape(a)))

        xs, ws, gs = bc(x, xb), bc(w, wb), bc(grad, gb)
        radii = bc(jnp.asarray(radius, jnp.float32), rb)
        if zb or max_batched_block(n) < 8:
            out = jax.lax.map(
                lambda args: pallas_tcg_sphere_quadratic(*args, **kw),
                (bc(zs, zb), xs, ws, gs, radii),
            )
        else:
            out = pallas_tcg_sphere_quadratic_batched(zs, xs, ws, gs, radii, **kw)
        return out, (True, True, True, True)

    return tcg


def _bare_chain_kernel(z_ref, v_ref, out_ref, *, n_iters, precision, left):
    """K normalized matvec passes and NOTHING else — the empirical
    speed-of-light denominator for the roofline's utilization column
    (``experiment/roofline.py``).  A derived B/128 row-fill "adjusted
    peak" model measured 117% at B=16 (round-3 roofline artifact): the
    linear fill cap is not a real upper bound for skinny MXU operands, so
    utilization is instead stated against THIS measured chain, which
    shares the tCG kernels' exact matvec shape, precision and VMEM
    residency.  ``left``: v [rows, n] @ Z (sphere layout) vs
    Z @ v [n, cols] (stiefel layout).  ``precision`` 'high' is hand-rolled
    bf16x3 exactly as the sphere tCG kernel does it (Mosaic lowers only
    DEFAULT and HIGHEST dots); 'highest'/'default' pass through."""
    z = z_ref[:]
    hand_rolled_high = precision == "high"
    if hand_rolled_high:
        z_hi = z.astype(jnp.bfloat16)
        z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[precision]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    def body(_, v):
        if hand_rolled_high:
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            if left:
                w = mm(v_hi, z_hi) + mm(v_hi, z_lo) + mm(v_lo, z_hi)
            else:
                w = mm(z_hi, v_hi) + mm(z_lo, v_hi) + mm(z_hi, v_lo)
        else:
            w = mm(v, z) if left else mm(z, v)
        axis = 1 if left else 0
        nrm = jnp.sqrt(jnp.sum(w * w, axis=axis, keepdims=True) + 1e-30)
        return w / nrm

    out_ref[:] = jax.lax.fori_loop(0, n_iters, body, v_ref[:])


@functools.partial(jax.jit, static_argnames=("n_iters", "precision", "left"))
def bare_matvec_chain(zs, v0, n_iters: int, precision: str = "high",
                      left: bool = True):
    """VMEM-resident chain of ``n_iters`` batched matvec passes.

    ``precision``: 'high' (bf16x3, the sphere tCG matvec scheme) or
    'highest' (bf16x6, the stiefel scheme).  ``left`` selects the
    orientation (see ``_bare_chain_kernel``).  Returns the final
    normalized iterate; throughput is measured by the caller's marginal
    timing between two chain lengths.
    """
    kern = functools.partial(
        _bare_chain_kernel, n_iters=n_iters, precision=precision, left=left
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(v0.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_BATCHED_COMPILER_PARAMS,
    )(zs.astype(jnp.float32), v0.astype(jnp.float32))


def _chain_hbm_kernel(
    corr_ref, z_hbm, x_ref, w_ref, v0_ref, out_ref, *, n_iters, block
):
    """Large-n chain with Z resident in HBM: stream row-blocks of Z through
    a two-slot VMEM pipeline (manual double buffering; DMA of block b+1
    overlaps the [1,block]x[block,n] partial product of block b).  The block
    schedule is identical every iteration, so the pipeline also spans the
    iteration boundary.  Row layout as in ``_chain_kernel``."""
    n = x_ref.shape[1]
    num_blocks = n // block
    x = x_ref[:]
    w = w_ref[:]
    corr = corr_ref[0, 0]

    def scoped(v_cur, zv_ref, scratch, sem):
        total = n_iters * num_blocks

        def dma(slot, chunk):
            b = jax.lax.rem(chunk, num_blocks)
            return pltpu.make_async_copy(
                z_hbm.at[pl.ds(b * block, block), :],
                scratch.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()
        v_cur[:] = v0_ref[:]
        zv_ref[:] = jnp.zeros_like(zv_ref[:])

        def body(chunk, _):
            slot = jax.lax.rem(chunk, 2)
            nslot = jax.lax.rem(chunk + 1, 2)

            @pl.when(chunk + 1 < total)
            def _():
                dma(nslot, chunk + 1).start()

            dma(slot, chunk).wait()
            b = jax.lax.rem(chunk, num_blocks)
            vb = v_cur[:, pl.ds(b * block, block)]  # [1, block]
            zv_ref[:] += jnp.dot(
                vb, scratch[slot], preferred_element_type=jnp.float32
            )

            @pl.when(b == num_blocks - 1)
            def _():
                zv = zv_ref[:]
                v = v_cur[:]
                pzv = zv - x * jnp.sum(x * zv)
                bar = w * v
                pbar = bar - x * jnp.sum(x * bar)
                hv = -2.0 * pzv + corr * v + pbar
                v_cur[:] = hv / jnp.sqrt(jnp.sum(hv * hv))
                zv_ref[:] = jnp.zeros_like(zv)

            return _

        jax.lax.fori_loop(0, total, body, None)
        out_ref[:] = v_cur[:]

    pl.run_scoped(
        scoped,
        v_cur=pltpu.VMEM((1, n), jnp.float32),
        zv_ref=pltpu.VMEM((1, n), jnp.float32),
        scratch=pltpu.VMEM((2, block, n), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def pick_hbm_block(n: int, budget_bytes: int = 10 * 1024 * 1024) -> int:
    """Largest lane-aligned (x128) row-block that divides the 128-padded n
    and keeps the two streaming buffers within ``budget_bytes``.  Mosaic
    requires dynamic lane offsets provably 128-aligned, hence the x128."""
    npad = -(-n // 128) * 128
    best = 0
    for b in range(128, npad + 1, 128):
        if npad % b == 0 and 2 * b * npad * 4 <= budget_bytes:
            best = b
    if best == 0:
        raise ValueError(f"no 128-aligned divisor block for n={n} fits VMEM")
    return best


@functools.partial(jax.jit, static_argnames=("n_iters", "block"))
def chained_barrier_matvec_hbm(zs, x, y_over_c, v0, n_iters: int, block: int):
    """K normalized Hw matvecs with Z streamed from HBM (n too large for
    the VMEM-resident ``chained_barrier_matvec``).

    Measured on a v5e (BENCH.md): this manual two-slot pipeline reaches
    703 GB/s at n=4000 but the plain XLA ``lax.scan`` chain reaches
    735 GB/s (~90% of HBM peak) — XLA's automatic pipelining already wins
    in the streaming regime, so the solver does NOT route through this
    kernel; it is kept as a verified reference for manual-DMA patterns.

    n is zero-padded to a multiple of 128: padded coordinates of x/w/v are
    zero, so the padded entries of every iterate stay exactly zero (the
    projection and barrier terms scale by x/w entries) and the chain is
    bitwise-equivalent on the live coordinates.
    """
    n = zs.shape[0]
    npad = -(-n // 128) * 128
    if npad % block:
        raise ValueError(f"block={block} must divide padded n={npad}")
    corr = (2.0 * (x @ (zs @ x)) + jnp.sum(y_over_c * x * x)).reshape(1, 1).astype(
        jnp.float32
    )
    pad = npad - n
    zp = jnp.pad(zs.astype(jnp.float32), ((0, pad), (0, pad)))
    row = lambda a: jnp.pad(a.reshape(1, n).astype(jnp.float32), ((0, 0), (0, pad)))
    out = pl.pallas_call(
        functools.partial(_chain_hbm_kernel, n_iters=n_iters, block=block),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # Z stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(corr, zp, row(x), row(y_over_c), row(v0))
    return out[0, :n]


@functools.partial(jax.jit, static_argnames=("n_iters",))
def chained_barrier_matvec(zs, x, y_over_c, v0, n_iters: int):
    """K normalized Hw matvecs with everything VMEM-resident."""
    n = zs.shape[0]
    corr = (2.0 * (x @ (zs @ x)) + jnp.sum(y_over_c * x * x)).reshape(1, 1).astype(
        jnp.float32
    )
    row = lambda a: a.reshape(1, n).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_iters=n_iters),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(corr, zs.astype(jnp.float32), row(x), row(y_over_c), row(v0))
    return out.reshape(n)


# ---------------------------------------------------------------------------
# Stiefel-bound structure (BoundedPCA): fused batched tCG
# ---------------------------------------------------------------------------
#
# Problem family (problems/bounded_pca.py): max tr(X'Zs X D) on St(n, p)
# with |X_ij| <= b and D = diag(d) the Brockett weights.  Closed forms
# (verified against the generic AD path,
# tests/test_pallas.py::test_stiefel_tcg*):
#
#   proj(U)  = U - X sym(X'U)
#   Hw(V)    = proj(-2 Zs V D - V S + W o V)
#     S      = sym(X' E),  E = -2 Zs X D + Y1 - Y2   (Lagrangian egrad)
#     W      = Y1/C1 + Y2/C2,  C1 = b - X, C2 = b + X
#
# (reference hot path being replaced: the per-constraint HVP loop at
# /root/reference/src/solver/RIPTRM.py:491-523 — m = 2 n p constraints.)
#
# Batched layout: the B lanes' [n, p] tangent frames sit side by side as
# [n, B*p] matrices, so the Zs matvec for ALL lanes is ONE
# [n, n] x [n, B*p] MXU matmul per tCG iteration with Zs resident in VMEM
# (loaded from HBM once per kernel call).  Per-lane contractions use a
# block mask: X'U is computed as the full [Bp, Bp] cross product and masked
# to its block diagonal — 16x more MACs than strictly needed, but ONE MXU
# matmul instead of B small ones, and at these sizes the kernel is
# overhead-bound, not FLOP-bound.  Per-lane scalars live as [1, Bp]
# lane-constant rows (full-lane row layout; each lane's value replicated
# over its p columns).


def fits_in_vmem_stiefel(n: int, b: int, p: int, dtype_bytes: int = 4) -> bool:
    """Zs + ~40 [n, B*p] arrays + 2 [Bp, Bp] block matrices, against the
    raised batched budget (the batched call requests a 64 MB scoped
    limit; 40 rows/lane mirrors the measured sphere-kernel overhead with
    margin for the extra [Bp, Bp] contractions)."""
    bp = b * p
    return (
        n * n * dtype_bytes + 40 * n * bp * dtype_bytes + 2 * bp * bp * dtype_bytes
        <= BATCHED_VMEM_BUDGET_BYTES
    )


def stiefel_lane_block(n: int, p: int, b: int) -> int:
    """Lanes per grid block for the GRIDDED stiefel tCG kernel.

    The per-block cross-lane contractions (masked [bpb, bpb] matmuls in
    ``proj``/``lane_sum``/``dot`` and the ``V S`` block-diagonal product)
    cost O(n * bpb^2) per tCG iteration vs the shared Z matvec's
    O(n^2 * bpb).  Unblocked, bpb = B*p grows with the sweep width and the
    quadratic term swamps the matvec once bpb > n — measured round 3 as
    aggregate ANTI-scaling, 4.67 -> 2.76 -> 1.52 TFLOP/s at B=16/64/128
    (n=128, p=8).  Capping the block at bpb ~ max(128, n) columns keeps
    contraction cost at most ~matvec cost while still filling the MXU's
    128 lanes; blocks run sequentially over a 1-D grid sharing one
    VMEM-resident Z window (same scheme as the sphere kernel's 64-lane
    blocks).  Shrinks by halves if a block would bust the VMEM budget.
    """
    bpb_cap = max(128, min(n, 512))
    bb = max(1, bpb_cap // p)
    while bb > 1 and not fits_in_vmem_stiefel(n, bb, p):
        bb //= 2
    return min(bb, b)


def _stiefel_tcg_loop(grad, radius, target, linear_flag, dot, proj, hw,
                      *, maxinner, mininner):
    """Shared Steihaug-Toint loop for the two stiefel_bound kernel layouts
    (lane-major masked-matmul and p-major sliced): identical math, the
    layouts differ only in how ``dot``/``proj``/``hw`` realize the
    per-lane reductions.  Returns the raw while_loop carry tuple."""
    r0 = grad
    z_r0 = dot(r0, r0)
    delta0 = -r0
    # data-derived zero seeds (see _tcg_kernel_batched layout notes)
    zeros_nbp = grad - grad
    zeros_row = target - target

    def safe_div(a, d):
        return a / jnp.where(d == 0, 1.0, d)

    # carry: eta, Heta, r, delta [n, Bp]; e_Pe, d_Pd, e_Pd, z_r, model,
    # iters, code, done [1, Bp] f32 rows; global j int32.
    init = (
        zeros_nbp, zeros_nbp, r0, delta0,
        zeros_row, z_r0, zeros_row, z_r0, zeros_row,
        zeros_row, zeros_row, zeros_row,
        jnp.int32(0),
    )

    def cond(c):
        any_alive = jnp.sum(1.0 - c[11]) > 0
        return jnp.logical_and(any_alive, c[12] < maxinner)

    def body(c):
        (eta, heta, r, delta, e_pe, d_pd, e_pd, z_r, model,
         iters, code, done_f, j) = c
        done = done_f > 0.5
        hdelta = hw(delta)
        d_hd = dot(delta, hdelta)
        alpha = safe_div(z_r, d_hd)
        e_pe_new = e_pe + 2.0 * alpha * e_pd + alpha**2 * d_pd
        bail = jnp.logical_or(d_hd <= 0, e_pe_new >= radius**2)
        disc = jnp.maximum(e_pd**2 + d_pd * (radius**2 - e_pe), 0.0)
        tau = safe_div(-e_pd + jnp.sqrt(disc), d_pd)
        eta_b = eta + tau * delta
        heta_b = heta + tau * hdelta
        eta_c = eta + alpha * delta
        heta_c = heta + alpha * hdelta
        model_c = dot(eta_c, grad) + 0.5 * dot(eta_c, heta_c)
        model_inc = model_c >= model
        r_new = r + alpha * hdelta
        zr_new = dot(r_new, r_new)
        norm_r = jnp.sqrt(zr_new)
        hit = jnp.logical_and(j + 1 > mininner, norm_r <= target)
        beta = safe_div(zr_new, z_r)
        delta_new = proj(-r_new + beta * delta)
        done_now = bail | model_inc | hit
        code_new = jnp.where(
            bail,
            jnp.where(d_hd <= 0, 1.0, 2.0),
            jnp.where(
                model_inc, 3.0,
                jnp.where(hit, jnp.where(linear_flag > 0, 4.0, 5.0), 0.0),
            ),
        )

        pick = lambda b_, k_, a_: jnp.where(bail, b_, jnp.where(model_inc, k_, a_))
        eta_out = pick(eta_b, eta, eta_c)
        heta_out = pick(heta_b, heta, heta_c)

        frz = lambda new, old: jnp.where(done, old, new)
        return (
            frz(eta_out, eta), frz(heta_out, heta), frz(r_new, r),
            frz(delta_new, delta),
            frz(jnp.where(done_now, e_pe, e_pe_new), e_pe),
            frz(jnp.where(done_now, d_pd, zr_new + beta**2 * d_pd), d_pd),
            frz(jnp.where(done_now, e_pd, beta * (e_pd + alpha * d_pd)), e_pd),
            frz(jnp.where(done_now, z_r, zr_new), z_r),
            frz(jnp.where(done_now | model_inc, model, model_c), model),
            iters + (1.0 - done_f),
            jnp.where(done, code, code_new),
            jnp.maximum(done_f, jnp.where(done_now, 1.0, 0.0)),
            j + 1,
        )

    return jax.lax.while_loop(cond, body, init)


def _tcg_kernel_stiefel(
    radius_ref, target_ref, flag_ref, d_ref, z_ref, x_ref, w_ref, s_ref,
    g_ref, eta_ref, heta_ref, stats_ref,
    *, maxinner, mininner, p,
):
    """Entire batched Steihaug-Toint tCG for the stiefel_bound structure.

    Shapes are PER GRID BLOCK (bb lanes, Bp = bb*p columns):
    radius/target/flag: [1, Bp] lane-constant rows; d: [1, Bp] Brockett
    weights tiled per lane; z: [n, n] (constant window across blocks);
    x/w/g: [n, Bp] flattened lane frames; s: [1, Bp, Bp] block-diagonal
    per-lane curvature sym(X'E).  Outputs eta/heta [n, Bp] and stats
    [2, Bp] int32 (iterations, stop code — same codes as ops/tcg.py).
    """
    x = x_ref[:]
    w = w_ref[:]
    grad = g_ref[:]
    sblk = s_ref[0]
    drow = d_ref[:]
    radius = radius_ref[:]
    target = target_ref[:]
    linear_flag = flag_ref[:]
    bp = x.shape[1]

    # lane-block mask (i // p == j // p), built in-kernel from 2-D iotas
    row_lane = jax.lax.broadcasted_iota(jnp.int32, (bp, bp), 0) // p
    col_lane = jax.lax.broadcasted_iota(jnp.int32, (bp, bp), 1) // p
    maskf = (row_lane == col_lane).astype(jnp.float32)

    hi = jax.lax.Precision.HIGHEST

    def xtu(a, bmat):
        # a' bmat contracting the n axis: [n, Bp]' x [n, Bp] -> [Bp, Bp]
        return jax.lax.dot_general(
            a, bmat, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )

    def lane_sum(row):
        # [1, Bp] -> [1, Bp]: per-lane totals, broadcast back within blocks
        return jnp.dot(row, maskf, precision=hi,
                       preferred_element_type=jnp.float32)

    def dot(a, bmat):
        return lane_sum(jnp.sum(a * bmat, axis=0, keepdims=True))

    def proj(u):
        m = maskf * 0.5 * (xtu(x, u) + xtu(u, x))  # blockdiag sym(X'U)
        return u - jnp.dot(x, m, precision=hi,
                           preferred_element_type=jnp.float32)

    # HIGHEST-precision Z matvec — NOT the sphere kernel's bf16x3 scheme:
    # measured on-chip (BENCH.md precision notes), the stiefel_bound inner
    # loop never satisfies its complementarity criterion at 'high'-class
    # matvec noise (the tCG direction error keeps the accept/reject cycle
    # churning at full TR radius; compl plateaus at ~8e-3 vs the 6.4e-4
    # threshold at St(128,8)), while 6-pass bf16 converges to the mu floor.
    # Compensated reductions were measured NOT to move this floor — the
    # noise enters through the direction, not the criterion's reduction.
    z32 = z_ref[:]

    def matvec3(v):
        return jnp.dot(z32, v, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    def hw(v):
        vs = jnp.dot(v, sblk, precision=hi,
                     preferred_element_type=jnp.float32)  # per-lane V S
        return proj(-2.0 * matvec3(v) * drow - vs + w * v)

    out = _stiefel_tcg_loop(
        grad, radius, target, linear_flag, dot, proj, hw,
        maxinner=maxinner, mininner=mininner,
    )
    eta_ref[:] = out[0]
    heta_ref[:] = out[1]
    stats_ref[:] = jnp.concatenate([out[9], out[10]], axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("maxinner", "mininner",
                                             "lane_block"))
def pallas_tcg_stiefel_bound_batched(
    zs, d, xs, ws, ss, grads, radii, *, maxinner, mininner=1, theta=1.0,
    kappa=0.1, lane_block=None
):
    """Batched fused tCG for the stiefel_bound structure, GRIDDED over
    lane blocks.

    d: [p] Brockett cost weights (shared across lanes); xs/ws/grads:
    [B, n, p]; ss: [B, p, p] per-lane sym(X'E); radii: [B].
    Returns (etas [B, n, p], Hetas [B, n, p], iterations [B], codes [B]).

    Lane blocks of ``lane_block`` lanes (default ``stiefel_lane_block`` —
    bpb ~ max(128, n) columns) run sequentially over a 1-D grid with Z's
    block index constant, so the pipeline loads Z once and re-uses the
    window; each block's [bpb, bpb] cross-lane contractions stay bounded,
    restoring linear aggregate scaling in B (round-3 whole-batch
    anti-scaled ~1/B past bpb > n — see ``stiefel_lane_block``).  Bonus:
    the while_loop runs to each BLOCK's slowest lane rather than the
    whole sweep's, so mixed-depth sweeps waste less lockstep work.
    """
    b, n, p = xs.shape
    bb = stiefel_lane_block(n, p, b) if lane_block is None else min(lane_block, b)
    pad = -b % bb
    grid = (b + pad) // bb
    bt = b + pad
    bp = bt * p
    bpb = bb * p

    pad_b = lambda a: jnp.pad(
        a.astype(jnp.float32), ((0, pad),) + ((0, 0),) * (a.ndim - 1),
        mode="edge",
    )
    xs32, ws32, gs32, ss32 = pad_b(xs), pad_b(ws), pad_b(grads), pad_b(ss)
    radii_p = pad_b(jnp.broadcast_to(radii, (b,)))
    flat = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(n, bp)
    x_f, w_f, g_f = flat(xs32), flat(ws32), flat(gs32)
    # Per-grid-step block diagonals [grid, bpb, bpb] built by eye-broadcast
    # (a python block_diag loop of B scatters compiled pathologically and
    # bound the wrapper to whole-batch shapes).
    eye_bb = jnp.eye(bb, dtype=jnp.float32)
    sblk = jax.vmap(
        lambda sg: (eye_bb[:, None, :, None] * sg[:, :, None, :]).reshape(
            bpb, bpb
        )
    )(ss32.reshape(grid, bb, p, p))
    norm_r0 = jnp.sqrt(jnp.sum(gs32[:b] ** 2, axis=(1, 2)))
    target = norm_r0 * jnp.minimum(norm_r0**theta, kappa)
    linear_flag = (kappa < norm_r0**theta).astype(jnp.float32)
    lane_row = lambda v: jnp.repeat(
        pad_b(v), p, total_repeat_length=bp
    ).reshape(1, bp)
    kern = functools.partial(
        _tcg_kernel_stiefel, maxinner=maxinner, mininner=mininner, p=p
    )
    row_blk = pl.BlockSpec((1, bpb), lambda i: (0, i))
    col_blk = pl.BlockSpec((n, bpb), lambda i: (0, i))
    etas, hetas, stats = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((n, bp), jnp.float32),
            jax.ShapeDtypeStruct((n, bp), jnp.float32),
            jax.ShapeDtypeStruct((2, bp), jnp.int32),
        ),
        in_specs=[
            row_blk,  # radius
            row_blk,  # target
            row_blk,  # linear flag
            row_blk,  # d (tiled per lane)
            pl.BlockSpec((n, n), lambda i: (0, 0)),  # Z: constant window
            col_blk,  # x
            col_blk,  # w
            pl.BlockSpec((1, bpb, bpb), lambda i: (i, 0, 0)),  # s block-diag
            col_blk,  # grad
        ],
        out_specs=(col_blk, col_blk, pl.BlockSpec((2, bpb), lambda i: (0, i))),
        compiler_params=_BATCHED_COMPILER_PARAMS,
    )(
        lane_row(radii_p),
        lane_row(target),
        lane_row(linear_flag),
        jnp.tile(d.astype(jnp.float32), bt).reshape(1, bp),
        zs.astype(jnp.float32),
        x_f, w_f, sblk, g_f,
    )
    unflat = lambda a: jnp.transpose(a.reshape(n, bt, p), (1, 0, 2))[:b]
    return (
        unflat(etas), unflat(hetas),
        stats[0].reshape(bt, p)[:b, 0], stats[1].reshape(bt, p)[:b, 0],
    )


def _fits_in_vmem_stiefel_pmajor(n: int, bb: int, p: int) -> bool:
    """VMEM check for the p-major kernel: ~10 live [n, p*bb] f32 arrays
    (x/w/g/eta/Heta/r/delta + temporaries) + the Z window + S rows."""
    return (
        10 * n * p * bb * 4 + n * n * 4 + p * p * bb * 4
        <= BATCHED_VMEM_BUDGET_BYTES
    )


def stiefel_lane_block_pmajor(n: int, p: int, b: int) -> int:
    """Lanes per grid block for the P-MAJOR stiefel kernel.

    The p-major layout has no cross-lane [Bp, Bp] contractions to bound —
    its per-lane reductions are contiguous [n, bb] VPU slices costing
    O(n*bb*p^2) per iteration vs the matvec's O(n^2*p*bb) — so the block
    is limited only by VMEM (and VPU lane fill prefers bb >= 128 when the
    budget allows)."""
    bb = b
    while bb > 1 and not _fits_in_vmem_stiefel_pmajor(n, bb, p):
        bb = (bb + 1) // 2
    return bb


def _tcg_kernel_stiefel_pmajor(
    radius_ref, target_ref, flag_ref, d_ref, z_ref, x_ref, w_ref, s_ref,
    g_ref, eta_ref, heta_ref, stats_ref,
    *, maxinner, mininner, p, bb,
):
    """Batched stiefel_bound tCG in the P-MAJOR interleaved layout.

    Column ``j*bb + l`` holds lane ``l``'s frame column ``j`` — so every
    per-lane block-diagonal contraction (sym(X'U) in ``proj``, the V S
    product, per-lane dots) becomes p^2 CONTIGUOUS [n, bb] elementwise
    multiply-reduce slices on the VPU instead of masked [Bp, Bp] MXU
    matmuls.  That removes the O(n * Bp^2) HIGHEST-precision cross-lane
    term that dominated the lane-major kernel (measured round 4: 13.7% of
    the bare-chain denominator at B=128 with ~86% of the time in the
    masked contractions); the Z matvec is the only MXU op left.

    Shapes per grid block: radius/target/flag/d [1, p*bb] (p-major rows);
    z [n, n]; x/w/g [n, p*bb]; s [p, p*bb] with s[i, j*bb+l] = S_l[i, j].
    """
    x = x_ref[:]
    w = w_ref[:]
    grad = g_ref[:]
    srows = s_ref[0]
    drow = d_ref[:]
    radius = radius_ref[:]
    target = target_ref[:]
    linear_flag = flag_ref[:]
    hi = jax.lax.Precision.HIGHEST
    z32 = z_ref[:]

    def sl(a, j):
        return a[:, j * bb:(j + 1) * bb]

    def tile_p(a):
        # [r, bb] -> [r, p*bb] (the same bb-lane block at every j slot)
        return jnp.concatenate([a] * p, axis=1)

    def lane_sum(row):
        tot = sl(row, 0)
        for j in range(1, p):
            tot = tot + sl(row, j)
        return tile_p(tot)

    def dot(a, bmat):
        return lane_sum(jnp.sum(a * bmat, axis=0, keepdims=True))

    def matvec(v):
        # HIGHEST like the lane-major kernel: the stiefel_bound inner loop
        # cannot satisfy its complementarity criterion at 'high'-class
        # matvec noise (measured, BENCH.md precision notes)
        return jnp.dot(z32, v, precision=hi,
                       preferred_element_type=jnp.float32)

    if bb >= 128:
        # Full-lane slices: at bb >= 128 every [n, bb] slice fills the
        # VPU's 128 lanes, and the slice form avoids the tile_p lane
        # broadcasts (measured B=128: slice form 182k iters/s vs the
        # full-width form's 145k).
        def proj(u):
            xs_ = [sl(x, i) for i in range(p)]
            us = [sl(u, j) for j in range(p)]
            c = [
                [jnp.sum(xs_[i] * us[j], axis=0, keepdims=True)
                 for j in range(p)]
                for i in range(p)
            ]
            outs = []
            for j in range(p):
                acc = us[j]
                for i in range(p):
                    acc = acc - xs_[i] * (0.5 * (c[i][j] + c[j][i]))
                outs.append(acc)
            return jnp.concatenate(outs, axis=1)

        def vsmul(v):
            vs_ = [sl(v, i) for i in range(p)]
            outs = []
            for j in range(p):
                acc = vs_[0] * srows[0:1, j * bb:(j + 1) * bb]
                for i in range(1, p):
                    acc = acc + vs_[i] * srows[i:i + 1, j * bb:(j + 1) * bb]
                outs.append(acc)
            return jnp.concatenate(outs, axis=1)
    else:
        # Narrow blocks: p^2 narrow slices starve the VPU (measured
        # B=16: 55k iters/s sliced vs 593k full-width); do ONE [n, Bp]
        # multiply-reduce per i instead, with x's tiles amortized over
        # the whole tCG (x is loop-invariant).
        xtiles = [tile_p(sl(x, i)) for i in range(p)]

        def proj(u):
            crows = [
                jnp.sum(xtiles[i] * u, axis=0, keepdims=True)
                for i in range(p)
            ]
            acc = u
            for i in range(p):
                m_row = jnp.concatenate(
                    [0.5 * (sl(crows[i], j) + sl(crows[j], i))
                     for j in range(p)],
                    axis=1,
                )
                acc = acc - xtiles[i] * m_row
            return acc

        def vsmul(v):
            acc = tile_p(sl(v, 0)) * srows[0:1]
            for i in range(1, p):
                acc = acc + tile_p(sl(v, i)) * srows[i:i + 1]
            return acc

    def hw(v):
        return proj(-2.0 * matvec(v) * drow - vsmul(v) + w * v)

    out = _stiefel_tcg_loop(
        grad, radius, target, linear_flag, dot, proj, hw,
        maxinner=maxinner, mininner=mininner,
    )
    eta_ref[:] = out[0]
    heta_ref[:] = out[1]
    stats_ref[:] = jnp.concatenate([out[9], out[10]], axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("maxinner", "mininner",
                                             "lane_block"))
def pallas_tcg_stiefel_bound_batched_pmajor(
    zs, d, xs, ws, ss, grads, radii, *, maxinner, mininner=1, theta=1.0,
    kappa=0.1, lane_block=None
):
    """P-major wrapper: packs [B, n, p] lane tensors into the interleaved
    [n, grid, p, bb] column order (see ``_tcg_kernel_stiefel_pmajor``) and
    returns the same (etas, Hetas, iterations, codes) as the lane-major
    wrapper."""
    b, n, p = xs.shape
    bb = (
        stiefel_lane_block_pmajor(n, p, b)
        if lane_block is None else min(lane_block, b)
    )
    pad = -b % bb
    grid = (b + pad) // bb
    bt = b + pad
    bpb = bb * p

    pad_b = lambda a: jnp.pad(
        a.astype(jnp.float32), ((0, pad),) + ((0, 0),) * (a.ndim - 1),
        mode="edge",
    )
    xs32, ws32, gs32, ss32 = pad_b(xs), pad_b(ws), pad_b(grads), pad_b(ss)
    radii_p = pad_b(jnp.broadcast_to(radii, (b,)))

    def pack(a):  # [bt, n, p] -> [n, grid*p*bb] p-major per block
        return jnp.transpose(
            a.reshape(grid, bb, n, p), (2, 0, 3, 1)
        ).reshape(n, grid * p * bb)

    x_f, w_f, g_f = pack(xs32), pack(ws32), pack(gs32)
    s_rows = jnp.transpose(
        ss32.reshape(grid, bb, p, p), (0, 2, 3, 1)
    ).reshape(grid, p, p * bb)

    def scalar_row(v):  # [bt] -> [1, grid*p*bb] (value per lane, tiled)
        return jnp.broadcast_to(
            v.reshape(grid, 1, bb), (grid, p, bb)
        ).reshape(1, grid * p * bb)

    norm_r0 = jnp.sqrt(jnp.sum(gs32[:b] ** 2, axis=(1, 2)))
    target = norm_r0 * jnp.minimum(norm_r0**theta, kappa)
    linear_flag = (kappa < norm_r0**theta).astype(jnp.float32)
    d_row = jnp.broadcast_to(
        d.astype(jnp.float32)[None, :, None], (grid, p, bb)
    ).reshape(1, grid * p * bb)

    kern = functools.partial(
        _tcg_kernel_stiefel_pmajor, maxinner=maxinner, mininner=mininner,
        p=p, bb=bb,
    )
    row_blk = pl.BlockSpec((1, bpb), lambda i: (0, i))
    col_blk = pl.BlockSpec((n, bpb), lambda i: (0, i))
    etas, hetas, stats = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((n, grid * bpb), jnp.float32),
            jax.ShapeDtypeStruct((n, grid * bpb), jnp.float32),
            jax.ShapeDtypeStruct((2, grid * bpb), jnp.int32),
        ),
        in_specs=[
            row_blk,  # radius
            row_blk,  # target
            row_blk,  # linear flag
            row_blk,  # d
            pl.BlockSpec((n, n), lambda i: (0, 0)),  # Z: constant window
            col_blk,  # x
            col_blk,  # w
            pl.BlockSpec((1, p, bpb), lambda i: (i, 0, 0)),  # s rows
            col_blk,  # grad
        ],
        out_specs=(col_blk, col_blk, pl.BlockSpec((2, bpb), lambda i: (0, i))),
        compiler_params=_BATCHED_COMPILER_PARAMS,
    )(
        scalar_row(radii_p),  # already padded to bt
        scalar_row(pad_b(target)),
        scalar_row(pad_b(linear_flag)),
        d_row,
        zs.astype(jnp.float32),
        x_f, w_f, s_rows, g_f,
    )

    def unpack(a):  # [n, grid*p*bb] -> [b, n, p]
        return jnp.transpose(
            a.reshape(n, grid, p, bb), (1, 3, 0, 2)
        ).reshape(bt, n, p)[:b]

    stats_l = stats.reshape(2, grid, p, bb)[:, :, 0, :].reshape(2, bt)
    return unpack(etas), unpack(hetas), stats_l[0][:b], stats_l[1][:b]


def _stiefel_bound_pieces(zs, d, x, y, c):
    """W (barrier weights) and S (Lagrangian curvature block) at (x, y)."""
    n, p = x.shape
    np_ = n * p
    f32 = lambda a: a.astype(jnp.float32)
    y1, y2 = f32(y[:np_]).reshape(n, p), f32(y[np_:]).reshape(n, p)
    c1, c2 = f32(c[:np_]).reshape(n, p), f32(c[np_:]).reshape(n, p)
    w = y1 / c1 + y2 / c2
    e = -2.0 * (f32(zs) @ f32(x)) * f32(d) + y1 - y2
    s = 0.5 * (f32(x).T @ e + e.T @ f32(x))
    return w, s


def tcg_stiefel_bound(maxinner, mininner=1, theta=1.0, kappa=0.1):
    """Fused stiefel_bound tCG with a custom vmap rule.

    Returns ``tcg(zs, d, x, y, c, grad, radius)`` -> (eta, Heta, iters,
    code), with ``d`` the [p] Brockett cost weights;
    under ``jax.vmap`` (batched multi-start sweeps) the rule routes to the
    batched GRIDDED kernel with Zs loaded into VMEM once and shared across
    lane blocks — the same custom_vmap shared-data routing as
    ``tcg_sphere_quadratic``.  Falls back to a sequential ``lax.map`` of
    B=1 kernel calls only when Z itself carries a batch axis or a single
    lane exceeds the VMEM budget.
    """
    from jax import custom_batching

    kw = dict(maxinner=maxinner, mininner=mininner, theta=theta, kappa=kappa)

    def one(zs, d, x, y, c, grad, radius):
        w, s = _stiefel_bound_pieces(zs, d, x, y, c)
        eta, heta, it, code = pallas_tcg_stiefel_bound_batched(
            zs, d, x[None], w[None], s[None], grad[None],
            jnp.asarray(radius, jnp.float32)[None], **kw,
        )
        return eta[0], heta[0], it[0], code[0]

    @custom_batching.custom_vmap
    def tcg(zs, d, x, y, c, grad, radius):
        return one(zs, d, x, y, c, grad, radius)

    @tcg.def_vmap
    def _rule(axis_size, in_batched, zs, d, x, y, c, grad, radius):
        zb, db, xb, yb, cb, gb, rb = in_batched
        n, p = x.shape[-2], x.shape[-1]

        def bc(a, ab):
            return a if ab else jnp.broadcast_to(a, (axis_size,) + tuple(jnp.shape(a)))

        xs, ys, cs, gs = bc(x, xb), bc(y, yb), bc(c, cb), bc(grad, gb)
        radii = bc(jnp.asarray(radius, jnp.float32), rb)
        # The gridded wrapper handles any B by lane-blocking; the map
        # fallback remains only for per-lane Z/d (cannot share the VMEM
        # window) or a single lane busting the budget.
        if zb or db or not fits_in_vmem_stiefel(n, 1, p):
            out = jax.lax.map(
                lambda args: one(*args),
                (bc(zs, zb), bc(d, db), xs, ys, cs, gs, radii),
            )
        else:
            ws, ss = jax.vmap(
                lambda xi, yi, ci: _stiefel_bound_pieces(zs, d, xi, yi, ci)
            )(xs, ys, cs)
            # p-major interleaved kernel for small frames (p^2 unrolled
            # slice ops in-kernel): removes the masked [Bp, Bp] MXU
            # contractions that dominated the lane-major kernel; falls
            # back to lane-major for wide frames.
            batched = (
                pallas_tcg_stiefel_bound_batched_pmajor
                if p <= 16 else pallas_tcg_stiefel_bound_batched
            )
            out = batched(zs, d, xs, ws, ss, gs, radii, **kw)
        return out, (True, True, True, True)

    return tcg
