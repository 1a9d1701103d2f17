"""Parity tests for the fused batched APGD kernel (ops/apgd_solve.py).

The kernel must reproduce the XLA iterate in physics/solver.py
(_apgd_dispatch's unbatched impl) row-for-row: same preconditioned
matvec, same power-iteration step-size estimate (cold and warm, with
the Rayleigh staleness guard), same friction-cone projection, same
Nesterov/adaptive-restart loop, same per-env convergence freeze.

On CPU the kernel runs in Pallas interpret mode; the XLA reference is
the custom_vmap fallback path (vmap of the unbatched impl) — exactly
what production uses off-TPU. A TPU-only case checks the real Mosaic
lowering compiles and matches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_mbrl_tpu.ops import apgd_solve
from mujoco_mbrl_tpu.physics import solver


# Row structure used by most cases: 3 joint limits, 1 dof-friction box
# row, 1 tendon equality row, then 4 elliptic contact triples => nr=17.
NONNEG = (0, 1, 2)
BOX = (3,)
CON0 = (5, 8, 11, 14)
NR = 17


def _problem(key, B, nr=NR, dtype=jnp.float32):
    """Random preconditioned dual QP batch shaped like solve_apgd's.

    Built inside ONE jit: eager op-by-op dispatch over the TPU tunnel
    pays a remote compile per primitive and takes minutes.
    """
    @jax.jit
    def build(key):
        ks = jax.random.split(key, 6)
        G = jax.random.normal(ks[0], (B, nr + 4, nr), dtype)
        A = jnp.einsum('bij,bik->bjk', G, G) / (nr + 4)
        A = A + 0.05 * jnp.eye(nr, dtype=dtype)      # R-like ridge
        d = jnp.sqrt(jnp.diagonal(A, axis1=1, axis2=2))
        s = 1.0 / d
        Ad = A * s[:, :, None] * s[:, None, :]       # unit diagonal
        rhs = jax.random.normal(ks[1], (B, nr), dtype)
        f0 = jax.random.normal(ks[2], (B, nr), dtype) * 0.3
        v0 = jax.random.normal(ks[3], (B, nr), dtype)
        active = (jax.random.uniform(ks[4], (B, nr)) > 0.15).astype(dtype)
        mu = jnp.zeros((nr,), dtype).at[jnp.asarray(CON0)].set(
            jnp.asarray([0.6, 0.8, 1.0, 0.5], dtype))
        bounds = jnp.zeros((nr,), dtype).at[jnp.asarray(BOX)].set(0.7)
        return Ad, rhs, f0, v0, active, mu, bounds
    return build(key)


def _xla_reference(args, *, nonneg=NONNEG, box=BOX, con0=CON0,
                   iterations, cold, eq_rows=()):
    cv = solver._apgd_dispatch(nonneg, box, con0, iterations, cold,
                               eq_rows)
    # jit the whole vmapped call: eager dispatch over the TPU tunnel is
    # minutes-slow per op (broadcasting mu/bounds to batched also forces
    # the rule onto its XLA fallback, which is the point of the oracle)
    fn = jax.jit(lambda a: jax.vmap(cv)(*a[:5], *[
        jnp.broadcast_to(x, a[0].shape[:1] + x.shape) for x in a[5:]]))
    return fn(args)


_ON_TPU = jax.devices()[0].platform in ('tpu', 'axon')


@pytest.mark.skipif(_ON_TPU, reason='interpret-mode oracle is the CPU '
                    'tier; on TPU the compiled case below covers parity')
@pytest.mark.parametrize('cold', [True, False])
def test_kernel_matches_xla_iterate(cold):
    B = 37          # non-multiple of 128: exercises batch padding
    args = _problem(jax.random.PRNGKey(0), B)
    f_ref, v_ref = _xla_reference(args, iterations=40, cold=cold)
    f_k, v_k = apgd_solve.apgd_iterate_batched(
        *args, nonneg=NONNEG, box_rows=BOX, con0=CON0,
        iterations=40, cold=cold, interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(_ON_TPU, reason='interpret-mode oracle is the CPU '
                    'tier; on TPU the compiled case below covers parity')
def test_kernel_equality_polish_matches_xla():
    """Row 4 declared as a tendon-equality row: both paths must apply
    the same per-iteration exact Gauss-Seidel update (the manipulator
    finger-coupling fix) and land on the same forces."""
    B = 37
    eq = (4,)
    args = _problem(jax.random.PRNGKey(5), B)
    f_ref, v_ref = _xla_reference(args, iterations=40, cold=True,
                                  eq_rows=eq)
    f_k, v_k = apgd_solve.apgd_iterate_batched(
        *args, nonneg=NONNEG, box_rows=BOX, con0=CON0,
        iterations=40, cold=True, interpret=True, eq_rows=eq)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=2e-4, atol=2e-4)
    # the equality row must actually satisfy its residual equation
    Ad, rhs = args[0], args[1]
    resid = np.einsum('bj,bj->b', np.asarray(Ad)[:, 4, :],
                      np.asarray(f_k)) - np.asarray(rhs)[:, 4]
    assert np.abs(resid).max() < 2e-4, np.abs(resid).max()


@pytest.mark.skipif(_ON_TPU, reason='interpret-mode oracle is the CPU '
                    'tier; on TPU the compiled case below covers parity')
def test_kernel_no_contacts():
    """Limits-only structure (acrobot/pendulum class): cone code off."""
    nonneg, box, con0 = (0, 1, 2, 3), (), ()
    B, nr = 16, 4
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    G = jax.random.normal(ks[0], (B, nr + 2, nr))
    A = jnp.einsum('bij,bik->bjk', G, G) / nr + 0.1 * jnp.eye(nr)
    d = jnp.sqrt(jnp.diagonal(A, axis1=1, axis2=2))
    Ad = A / d[:, :, None] / d[:, None, :]
    rhs = jax.random.normal(ks[1], (B, nr))
    zeros = jnp.zeros((B, nr))
    active = jnp.ones((B, nr))
    mu = jnp.zeros((nr,))
    bounds = jnp.zeros((nr,))
    args = (Ad, rhs, zeros, zeros, active, mu, bounds)
    f_ref, v_ref = _xla_reference(args, nonneg=nonneg, box=box, con0=con0,
                                  iterations=30, cold=True)
    f_k, v_k = apgd_solve.apgd_iterate_batched(
        *args, nonneg=nonneg, box_rows=box, con0=con0,
        iterations=30, cold=True, interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not _ON_TPU, reason='Mosaic lowering needs a TPU')
@pytest.mark.parametrize('cold', [True, False])
def test_kernel_compiles_on_tpu(cold):
    B = 256
    args = _problem(jax.random.PRNGKey(2), B)
    f_ref, v_ref = _xla_reference(args, iterations=40, cold=cold)
    f_k, v_k = apgd_solve.apgd_iterate_batched(
        *args, nonneg=NONNEG, box_rows=BOX, con0=CON0,
        iterations=40, cold=cold)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=5e-4, atol=5e-4)


def test_dispatch_unbatched_unchanged():
    """Per-env (unbatched) solve path still goes through the XLA impl."""
    args = _problem(jax.random.PRNGKey(3), 1)
    single = [a[0] for a in args[:5]] + list(args[5:])
    cv = solver._apgd_dispatch(NONNEG, BOX, CON0, 40, True)
    f, v = cv(*single)
    assert f.shape == (NR,) and v.shape == (NR,)
    assert np.isfinite(np.asarray(f)).all()
