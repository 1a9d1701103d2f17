"""Fused batched APGD constraint solve (Pallas, TPU).

The constraint solve is the serial tail of every physics substep
(SURVEY §3.2: the reference runs it row-sequentially inside libmujoco's
mj_fwdConstraint; our TPU redesign solves the dual QP with accelerated
projected gradient descent, physics/solver.py:solve_apgd). As an XLA
``lax.while_loop`` under ``vmap`` the iteration is correct but
bandwidth-bound: every APGD iteration re-reads the batched
preconditioned matrix ``Ad`` — (B, nr, nr) ≈ 10 MB at B=1024 walker
rows — from HBM, and the power-iteration warm start pays the same per
matvec. At ~60 surviving iterations × 10 substeps that is several GB of
redundant HBM traffic per control step.

This kernel runs the WHOLE iterate — power-iteration step-size
estimate, Nesterov APGD loop, friction-cone projection, per-env early
exit — in one launch, with each program holding its env block's ``Ad``
resident in VMEM. Layout: envs ride the lane (last) axis (E=128 per
program), constraint rows ride sublanes, so the per-env matvec is an
unrolled sum of (nr, E) FMAs on the VPU and every projection/reduction
is a lane-parallel (1, E) op. ``Ad`` is symmetric, so row slices double
as column slices and the matvec needs no transpose.

HBM traffic per solve collapses to one read of ``Ad`` + vectors and one
write of (f, v): ~60x less than the XLA loop at production batch sizes.

Semantics match physics/solver.py:solve_apgd exactly (same
preconditioning, same Rayleigh staleness guard, same adaptive-restart
momentum, same convergence test); tests/test_apgd_kernel.py checks the
kernel against the XLA iterate row-for-row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest row count the envs-on-lanes layout accepts: VMEM per program is
# nr*nr*128*4 B for Ad (56x56x128x4 = 1.6 MB at walker's nr) plus ~10
# vectors; past ~96 rows the block no longer leaves headroom for Mosaic's
# own scratch and big-humanoid models fall back to the XLA iterate.
MAX_NR = 96
ENVS_PER_PROGRAM = 128


def _shift_up(x, k):
    """Roll rows up by k (row i holds x[i+k]), static k, sublane axis."""
    return jnp.concatenate([x[k:], x[:k]], axis=0)


def _shift_down(x, k):
    """Roll rows down by k (row i holds x[i-k])."""
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _apgd_kernel(ad_ref, rhs_ref, f0_ref, v0_ref, act_ref, bnd_ref,
                 mnn_ref, mbox_ref, mn_ref, mu_ref,
                 f_out, v_out,
                 f_scr, y_scr, th_scr, dn_scr, *, nr: int,
                 iterations: int, cold: bool, has_nonneg: bool,
                 has_box: bool, has_cone: bool, tol2: float,
                 eq_rows: tuple = (), chunk: int = 8):
    """One env block: power-iteration L estimate + APGD to convergence.

    The APGD loop is a fori_loop over iteration CHUNKS with the iterate
    state in VMEM scratch; each chunk is statically unrolled and guarded
    by ``pl.when(any env unconverged)`` — block-level early exit without
    ``lax.while_loop``, which Mosaic does not reliably lower for vector
    carries (observed: device-side hang). Per-iteration freeze masks
    (converged OR past the ``iterations`` cap) keep results bit-matched
    to the XLA while-loop semantics.
    """
    f32 = jnp.float32
    rhs = rhs_ref[:]                      # (nr, E)
    active = act_ref[:]

    def matvec(y):
        # Ad symmetric: ad_ref[j] is row j == column j, an (nr, E) slab.
        acc = ad_ref[0] * y[0:1]
        for j in range(1, nr):            # static unroll, nr <= MAX_NR
            acc = acc + ad_ref[j] * y[j:j + 1]
        return acc

    # ---- step size from the preconditioned spectral radius ------------
    def pstep(_, v):
        w = matvec(v)
        n2 = jnp.sum(w * w, axis=0, keepdims=True)          # (1, E)
        return w * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))

    flat = jnp.full((nr, 1), 1.0 / (nr ** 0.5), f32)
    if cold:
        v = jax.lax.fori_loop(0, 24, pstep, flat * jnp.ones_like(rhs))
        r = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        L = 1.5 * jnp.maximum(r, 1.0)
    else:
        v0 = v0_ref[:]
        n2 = jnp.sum(v0 * v0, axis=0, keepdims=True)
        v = jnp.where(n2 > 1e-24,
                      v0 * jax.lax.rsqrt(jnp.maximum(n2, 1e-24)),
                      flat)
        v = jax.lax.fori_loop(0, 6, pstep, v)
        r6 = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        v = jax.lax.fori_loop(0, 2, pstep, v)
        r8 = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        # Rayleigh staleness guard (solver.py): quotient still rising
        # after 8 warm iterations => carried eigenvector is stale; use
        # the certain inf-norm bound instead.
        rs = jnp.abs(ad_ref[0])
        for j in range(1, nr):
            rs = rs + jnp.abs(ad_ref[j])
        safe_L = jnp.maximum(jnp.max(rs, axis=0, keepdims=True), 1.0)
        stale = (r8 - r6) > 0.02 * jnp.maximum(r8, 1e-12)
        L = jnp.where(stale, safe_L, 1.5 * jnp.maximum(r8, 1.0))

    # ---- projection (masked dense math, identical to solver.py) -------
    mnn = mnn_ref[:] if has_nonneg else None          # (nr, 1)
    mbox = mbox_ref[:] if has_box else None
    if has_cone:
        mn = mn_ref[:]                                # (nr, 1) normals
        mt1 = _shift_down(mn, 1)
        mt2 = _shift_down(mn, 2)
        mu = mu_ref[:]                                # (nr, 1), at normals
    bnd = bnd_ref[:] if has_box else None             # (nr, E)

    def proj(f):
        if has_nonneg:
            f = jnp.where(mnn > 0, jnp.maximum(f, 0.0), f)
        if has_box:
            f = jnp.where(mbox > 0, jnp.clip(f, -bnd, bnd), f)
        if has_cone:
            ft1 = _shift_up(f, 1)
            ft2 = _shift_up(f, 2)
            t = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
            inside = t <= mu * f
            apex = mu * t + f <= 0.0
            fn_s = jnp.where(inside, f,
                             jnp.where(apex, 0.0,
                                       (f + mu * t) / (1.0 + mu * mu)))
            tscale = jnp.where(inside, 1.0,
                               jnp.where(apex, 0.0,
                                         mu * fn_s / jnp.maximum(t, 1e-12)))
            tscale = jnp.where(mn > 0, tscale, 1.0)
            f = jnp.where(mn > 0, fn_s, f)
            f = f * jnp.where(mt1 > 0, _shift_down(tscale, 1), 1.0)
            f = f * jnp.where(mt2 > 0, _shift_down(tscale, 2), 1.0)
        return f * active

    f0 = proj(f0_ref[:])

    # ---- Nesterov APGD with per-env convergence, chunked early exit ---
    tol2c = jnp.asarray(tol2, f32)
    f_scr[:] = f0
    y_scr[:] = f0
    th_scr[:] = jnp.ones((1, rhs.shape[1]), f32)
    dn_scr[:] = jnp.zeros((1, rhs.shape[1]), f32)

    # Exact Gauss-Seidel polish on equality rows (solver.py: stiff
    # tendon couplings crawl under the 1/L step; their conditional
    # optimum is closed-form since there is no cone to project onto).
    # One (nr, E) FMA-reduce per equality row per iteration.
    eq_hots = [(jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
                == e).astype(f32) for e in eq_rows]

    def eq_polish(f):
        # masked by the row's `active` lane (solver.py parity): an
        # inactive/degenerate equality row must stay at zero force.
        for e, hot in zip(eq_rows, eq_hots):
            resid = (jnp.sum(ad_ref[e] * f, axis=0, keepdims=True)
                     - rhs[e:e + 1])
            f = f - hot * (active[e:e + 1] * resid)
        return f

    def one_iter(it):
        f = f_scr[:]
        y = y_scr[:]
        theta = th_scr[:]
        done = dn_scr[:]
        g = matvec(y) - rhs
        f_new = proj(y - g / L)
        if eq_rows:
            f_new = eq_polish(f_new)
        theta_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * theta * theta))
        beta = (theta - 1.0) / theta_new
        restart = (jnp.sum((y - f_new) * (f_new - f), axis=0,
                           keepdims=True) > 0.0)
        beta = jnp.where(restart, 0.0, beta)
        y_new = f_new + beta * (f_new - f)
        d2 = jnp.sum((f_new - f) ** 2, axis=0, keepdims=True)
        conv = d2 <= tol2c * (1e-12 + jnp.sum(f_new * f_new, axis=0,
                                              keepdims=True))
        # freeze converged/past-cap envs (matches the vmapped-while
        # masking semantics of the XLA path exactly)
        frozen = jnp.logical_or(done > 0, it >= iterations)
        f_scr[:] = jnp.where(frozen, f, f_new)
        y_scr[:] = jnp.where(frozen, y, y_new)
        th_scr[:] = jnp.where(frozen, theta,
                              jnp.where(restart, 1.0, theta_new))
        dn_scr[:] = jnp.maximum(
            done, jnp.where(frozen, 0.0, conv.astype(f32)))

    n_chunks = -(-iterations // chunk)

    def outer(ci, carry):
        @pl.when(jnp.min(dn_scr[:]) < 0.5)
        def _():
            for k in range(chunk):        # static unroll
                one_iter(ci * chunk + k)
        return carry

    jax.lax.fori_loop(0, n_chunks, outer, jnp.zeros((), jnp.int32))

    f_out[:] = f_scr[:]
    v_out[:] = v


def _factored_vmem_bytes(nr: int, nv: int,
                         envs: int = ENVS_PER_PROGRAM) -> int:
    """Estimated per-program VMEM footprint of the factored kernel."""
    nr8 = -(-nr // 8) * 8
    nv8 = -(-nv // 8) * 8
    slabs = nv * nr8 + nv * nv8     # J columns + Minv columns
    vecs = 14 * nr8                 # rhs/f0/v0/active/bnd/diag + scratch
    return (slabs + vecs) * envs * 4


def factored_fits(nr: int, nv: int) -> bool:
    """Row/dof counts the factored layout can hold resident (~10 MB of
    the ~16 MB VMEM, leaving headroom for Mosaic scratch)."""
    return _factored_vmem_bytes(nr, nv) <= 10 * 1024 * 1024


def _apgd_factored_kernel(j_hbm, minv_hbm, rsc_ref, dg_ref, rhs_ref,
                          f0_ref, v0_ref, act_ref, bnd_ref,
                          mnn_ref, mbox_ref, mn_ref, mu_ref,
                          f_out, v_out,
                          f_scr, y_scr, th_scr, dn_scr,
                          j_ref, minv_ref, dma_sems, *, nr: int,
                          nv: int, nv_pad: int, iterations: int,
                          cold: bool, has_nonneg: bool, has_box: bool,
                          has_cone: bool, tol2: float, chunk: int = 8):
    """Factored-matvec variant for models whose (nr, nr) dual matrix
    cannot live in VMEM (humanoid: nr=303) but whose FACTORS can:
    Ad = J~ M^-1 J~' + diag(Rs) with J~ (nr, nv) the scaled+active-
    masked constraint Jacobian and M^-1 (nv, nv) dense. Each matvec is
    three stages of lane-parallel FMAs — t = J~'y (nv reductions),
    u = M^-1 t (nv FMAs), z = J~u + Rs*y (nv FMAs) — costing
    2*nr*nv + nv^2 instead of nr^2 and holding nr*nv + nv^2 floats
    resident instead of nr^2 (humanoid: 8.2k vs 92k per env). The
    XLA fallback materializes (B, nr, nr) and re-reads it from HBM
    every iteration; this kernel reads the factors once.

    Differences from ``_apgd_kernel``: no equality-row polish (a polish
    needs an Ad row; no model in the factored regime has equality
    rows), and the Rayleigh staleness fallback bound is the trace
    bound sum(diag) — PSD guarantees lambda_max <= trace, and the
    scaled diagonal (dg_ref) is already resident, whereas the
    inf-norm row-sum bound would need the full matrix.

    J~ and M^-1 arrive as full HBM refs (memory_space=ANY) and are
    DMA'd ONCE into single-buffered VMEM scratch: as pipelined grid
    inputs Mosaic double-buffers them, and 2x the humanoid J slab
    alone blows the 16 MB scoped-VMEM budget (observed: 16.67 MB
    requested, limit 16 MB).
    """
    f32 = jnp.float32
    b = pl.program_id(0)
    E = rhs_ref.shape[1]
    dma_j = pltpu.make_async_copy(
        j_hbm.at[:, :, pl.ds(b * E, E)], j_ref, dma_sems.at[0])
    dma_m = pltpu.make_async_copy(
        minv_hbm.at[:, :, pl.ds(b * E, E)], minv_ref, dma_sems.at[1])
    dma_j.start()
    dma_m.start()
    dma_j.wait()
    dma_m.wait()
    rhs = rhs_ref[:]                      # (nr, E)
    active = act_ref[:]
    rsc = rsc_ref[:]

    def matvec(y):
        # stages 1+2 fused: u = M^-1 (J~' y) accumulated column-wise so
        # no (nv, E) intermediate needs assembling from (1, E) pieces
        u = minv_ref[0] * jnp.sum(j_ref[0] * y, axis=0, keepdims=True)
        for w in range(1, nv):
            u = u + minv_ref[w] * jnp.sum(j_ref[w] * y, axis=0,
                                          keepdims=True)   # (nv_pad, E)
        acc = j_ref[0] * u[0:1]
        for v in range(1, nv):
            acc = acc + j_ref[v] * u[v:v + 1]     # (nr, E)
        return acc + rsc * y

    # ---- step size from the preconditioned spectral radius ------------
    # Normalization uses exact sqrt + divide (matching the XLA impl's
    # norm+divide) rather than jax.lax.rsqrt so kernel and fallback
    # follow the same power-iteration trajectory bit-for-bit.
    def pstep(_, v):
        w = matvec(v)
        n2 = jnp.sum(w * w, axis=0, keepdims=True)          # (1, E)
        return w / jnp.sqrt(jnp.maximum(n2, 1e-24))

    flat = jnp.full((nr, 1), 1.0 / (nr ** 0.5), f32)
    if cold:
        v = jax.lax.fori_loop(0, 24, pstep, flat * jnp.ones_like(rhs))
        r = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        L = 1.5 * jnp.maximum(r, 1.0)
    else:
        v0 = v0_ref[:]
        n2 = jnp.sum(v0 * v0, axis=0, keepdims=True)
        v = jnp.where(n2 > 1e-24,
                      v0 / jnp.sqrt(jnp.maximum(n2, 1e-24)),
                      flat)
        v = jax.lax.fori_loop(0, 6, pstep, v)
        r6 = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        v = jax.lax.fori_loop(0, 2, pstep, v)
        r8 = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        # staleness guard: trace bound (lambda_max <= trace for PSD)
        safe_L = jnp.maximum(
            jnp.sum(dg_ref[:], axis=0, keepdims=True), 1.0)
        stale = (r8 - r6) > 0.02 * jnp.maximum(r8, 1e-12)
        L = jnp.where(stale, safe_L, 1.5 * jnp.maximum(r8, 1.0))

    # ---- projection (identical to _apgd_kernel) -----------------------
    mnn = mnn_ref[:] if has_nonneg else None          # (nr, 1)
    mbox = mbox_ref[:] if has_box else None
    if has_cone:
        mn = mn_ref[:]                                # (nr, 1) normals
        mt1 = _shift_down(mn, 1)
        mt2 = _shift_down(mn, 2)
        mu = mu_ref[:]                                # (nr, 1), at normals
    bnd = bnd_ref[:] if has_box else None             # (nr, E)

    def proj(f):
        if has_nonneg:
            f = jnp.where(mnn > 0, jnp.maximum(f, 0.0), f)
        if has_box:
            f = jnp.where(mbox > 0, jnp.clip(f, -bnd, bnd), f)
        if has_cone:
            ft1 = _shift_up(f, 1)
            ft2 = _shift_up(f, 2)
            t = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
            inside = t <= mu * f
            apex = mu * t + f <= 0.0
            fn_s = jnp.where(inside, f,
                             jnp.where(apex, 0.0,
                                       (f + mu * t) / (1.0 + mu * mu)))
            tscale = jnp.where(inside, 1.0,
                               jnp.where(apex, 0.0,
                                         mu * fn_s / jnp.maximum(t, 1e-12)))
            tscale = jnp.where(mn > 0, tscale, 1.0)
            f = jnp.where(mn > 0, fn_s, f)
            f = f * jnp.where(mt1 > 0, _shift_down(tscale, 1), 1.0)
            f = f * jnp.where(mt2 > 0, _shift_down(tscale, 2), 1.0)
        return f * active

    f0 = proj(f0_ref[:])

    tol2c = jnp.asarray(tol2, f32)
    f_scr[:] = f0
    y_scr[:] = f0
    th_scr[:] = jnp.ones((1, rhs.shape[1]), f32)
    dn_scr[:] = jnp.zeros((1, rhs.shape[1]), f32)

    def one_iter(it):
        f = f_scr[:]
        y = y_scr[:]
        theta = th_scr[:]
        done = dn_scr[:]
        g = matvec(y) - rhs
        f_new = proj(y - g / L)
        theta_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * theta * theta))
        beta = (theta - 1.0) / theta_new
        restart = (jnp.sum((y - f_new) * (f_new - f), axis=0,
                           keepdims=True) > 0.0)
        beta = jnp.where(restart, 0.0, beta)
        y_new = f_new + beta * (f_new - f)
        d2 = jnp.sum((f_new - f) ** 2, axis=0, keepdims=True)
        conv = d2 <= tol2c * (1e-12 + jnp.sum(f_new * f_new, axis=0,
                                              keepdims=True))
        frozen = jnp.logical_or(done > 0, it >= iterations)
        f_scr[:] = jnp.where(frozen, f, f_new)
        y_scr[:] = jnp.where(frozen, y, y_new)
        th_scr[:] = jnp.where(frozen, theta,
                              jnp.where(restart, 1.0, theta_new))
        dn_scr[:] = jnp.maximum(
            done, jnp.where(frozen, 0.0, conv.astype(f32)))

    n_chunks = -(-iterations // chunk)

    def outer(ci, carry):
        @pl.when(jnp.min(dn_scr[:]) < 0.5)
        def _():
            for k in range(chunk):        # static unroll
                one_iter(ci * chunk + k)
        return carry

    jax.lax.fori_loop(0, n_chunks, outer, jnp.zeros((), jnp.int32))

    f_out[:] = f_scr[:]
    v_out[:] = v


@functools.partial(
    jax.jit, static_argnames=('nonneg', 'box_rows', 'con0', 'iterations',
                              'cold', 'tol2', 'interpret'))
def apgd_iterate_factored(J_s, Minv, Rs, diag_s, rhs, f0, v0, active,
                          mu_full, bounds_full, *, nonneg, box_rows,
                          con0, iterations: int, cold: bool,
                          tol2: float = 1e-12, interpret: bool = False):
    """Batched factored APGD iterate: one launch over the env batch.

    Args (batched leading axis B): J_s (B, nr, nv) scaled+active-masked
    constraint Jacobian, Minv (B, nv, nv) dense inverse mass matrix,
    Rs (B, nr) scaled regularizer diagonal, diag_s (B, nr) scaled
    active diagonal of the dual matrix (trace bound input), rhs / f0 /
    v0 / active (B, nr). Unbatched: mu_full (nr,), bounds_full (nr,).
    Returns (f (B, nr) scaled row forces, v (B, nr) power vector).
    """
    B, nr_raw, nv = J_s.shape
    E = ENVS_PER_PROGRAM
    f32 = jnp.float32
    nb = -(-B // E)
    B_pad = nb * E
    nr = -(-nr_raw // 8) * 8
    nv_pad = -(-nv // 8) * 8

    def pad_vec(x):                                   # (B, nr) -> (nr, Bp)
        x = jnp.pad(x.astype(f32),
                    ((0, B_pad - B), (0, nr - nr_raw)))
        return jnp.transpose(x)

    Jt = jnp.transpose(
        jnp.pad(J_s.astype(f32),
                ((0, B_pad - B), (0, nr - nr_raw), (0, 0))),
        (2, 1, 0))                                    # (nv, nr, Bp)
    Minvt = jnp.transpose(
        jnp.pad(Minv.astype(f32),
                ((0, B_pad - B), (0, nv_pad - nv), (0, 0))),
        (2, 1, 0))                                    # (nv, nv_pad, Bp)
    vecs = [pad_vec(x) for x in (Rs, diag_s, rhs, f0, v0, active)]

    m_nn = np.isin(np.arange(nr), np.asarray(nonneg)).astype(np.float32)
    m_bx = np.isin(np.arange(nr), np.asarray(box_rows)).astype(np.float32)
    m_n = np.isin(np.arange(nr), np.asarray(con0)).astype(np.float32)
    masks = [jnp.asarray(m[:, None]) for m in (m_nn, m_bx, m_n)]
    pad_tail = jnp.zeros((nr - nr_raw,), f32)
    mu_col = (jnp.concatenate([mu_full.astype(f32), pad_tail])[:, None]
              * masks[2])
    bnd_full = jnp.transpose(jnp.broadcast_to(
        jnp.concatenate([bounds_full.astype(f32), pad_tail]),
        (B_pad, nr)))

    kern = functools.partial(
        _apgd_factored_kernel, nr=nr, nv=int(nv), nv_pad=int(nv_pad),
        iterations=int(iterations), cold=bool(cold),
        has_nonneg=bool(len(nonneg)), has_box=bool(len(box_rows)),
        has_cone=bool(len(con0)), tol2=float(tol2))

    vec_spec = pl.BlockSpec((nr, E), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((nr, 1), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    f, v = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),      # J~ in HBM
                  pl.BlockSpec(memory_space=pl.ANY),      # Minv in HBM
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  vec_spec, vec_spec,
                  col_spec, col_spec, col_spec, col_spec],
        out_specs=[vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct((nr, B_pad), f32),
                   jax.ShapeDtypeStruct((nr, B_pad), f32)],
        scratch_shapes=[pltpu.VMEM((nr, E), f32),
                        pltpu.VMEM((nr, E), f32),
                        pltpu.VMEM((1, E), f32),
                        pltpu.VMEM((1, E), f32),
                        pltpu.VMEM((int(nv), nr, E), f32),      # J~ slab
                        pltpu.VMEM((int(nv), nv_pad, E), f32),  # Minv
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(Jt, Minvt, *vecs, bnd_full, *masks, mu_col)
    f = jnp.transpose(f)[:B, :nr_raw]
    v = jnp.transpose(v)[:B, :nr_raw]
    return f, v


@functools.partial(
    jax.jit, static_argnames=('nonneg', 'box_rows', 'con0', 'iterations',
                              'cold', 'tol2', 'interpret', 'eq_rows'))
def apgd_iterate_batched(Ad, rhs, f0, v0, active, mu_full, bounds_full,
                         *, nonneg, box_rows, con0, iterations: int,
                         cold: bool, tol2: float = 1e-12,
                         interpret: bool = False, eq_rows: tuple = ()):
    """Batched APGD iterate: one kernel launch over the env batch.

    Args (batched leading axis B): Ad (B, nr, nr) symmetric PSD
    preconditioned matrix, rhs (B, nr), f0 (B, nr) scaled warm start
    (projected in-kernel), v0 (B, nr) power-iteration warm vector
    (ignored when ``cold``), active (B, nr). Unbatched: mu_full (nr,)
    friction coefficients placed at cone-normal rows, bounds_full (nr,)
    box bounds at friction rows. Static: ``nonneg``/``box_rows``/``con0``
    row-index tuples, iteration cap, cold flag.

    Returns (f (B, nr) scaled row forces, v (B, nr) power vector).
    """
    B, nr_raw = rhs.shape
    E = ENVS_PER_PROGRAM
    f32 = jnp.float32
    nb = -(-B // E)
    B_pad = nb * E
    # pad rows to a sublane multiple: zero rows are inert through the
    # whole iterate (zero Ad row/col, zero rhs, active=0 => f stays 0,
    # contributes nothing to matvecs, norms, or convergence tests), and
    # exact (nr, E) blocks keep every sublane Mosaic touches explicit.
    nr = -(-nr_raw // 8) * 8

    def pad_b(x):
        pads = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
        if x.ndim >= 2:
            pads[1] = (0, nr - nr_raw)
        if x.ndim == 3:
            pads[2] = (0, nr - nr_raw)
        return jnp.pad(x, pads) if any(p != (0, 0) for p in pads) else x

    # envs -> lanes. Ad is symmetric, so (1, 2, 0) gives row slabs that
    # serve as column slabs with no in-kernel transpose.
    Adt = jnp.transpose(pad_b(Ad.astype(f32)), (1, 2, 0))   # (nr, nr, Bp)
    vecs = [jnp.transpose(pad_b(x.astype(f32)))             # (nr, Bp)
            for x in (rhs, f0, v0, active)]

    m_nn = np.isin(np.arange(nr), np.asarray(nonneg)).astype(np.float32)
    m_bx = np.isin(np.arange(nr), np.asarray(box_rows)).astype(np.float32)
    m_n = np.isin(np.arange(nr), np.asarray(con0)).astype(np.float32)
    masks = [jnp.asarray(m[:, None]) for m in (m_nn, m_bx, m_n)]
    pad_tail = jnp.zeros((nr - nr_raw,), f32)
    mu_col = (jnp.concatenate([mu_full.astype(f32), pad_tail])[:, None]
              * masks[2])
    bnd_full = jnp.transpose(jnp.broadcast_to(
        jnp.concatenate([bounds_full.astype(f32), pad_tail]),
        (B_pad, nr)))

    kern = functools.partial(
        _apgd_kernel, nr=nr, iterations=int(iterations), cold=bool(cold),
        has_nonneg=bool(len(nonneg)), has_box=bool(len(box_rows)),
        has_cone=bool(len(con0)), tol2=float(tol2),
        eq_rows=tuple(int(e) for e in eq_rows))

    vec_spec = pl.BlockSpec((nr, E), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((nr, 1), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    f, v = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((nr, nr, E), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  col_spec, col_spec, col_spec, col_spec],
        out_specs=[vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct((nr, B_pad), f32),
                   jax.ShapeDtypeStruct((nr, B_pad), f32)],
        scratch_shapes=[pltpu.VMEM((nr, E), f32),
                        pltpu.VMEM((nr, E), f32),
                        pltpu.VMEM((1, E), f32),
                        pltpu.VMEM((1, E), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(Adt, *vecs[:2], vecs[2], vecs[3], bnd_full, *masks, mu_col)
    f = jnp.transpose(f)[:B, :nr_raw]
    v = jnp.transpose(v)[:B, :nr_raw]
    return f, v
