"""Fused CEM candidate-rollout kernel (Pallas, TPU).

The planner hot loop (SURVEY §3.3: K candidates x H horizon model forwards
per control step) is HBM-bandwidth-bound when written as `lax.scan` over
separate matmul kernels: every step round-trips (K, hidden) activations
through HBM — ~3 GB per CEM iteration at production sizes (K=1000, H=30,
B=128 envs). This kernel keeps the entire H-step rollout of a candidate
tile resident in VMEM: HBM traffic collapses to reading s0 + the action
sequences and writing one cost per candidate (~25x less), and the MLP
matmuls run back-to-back on the MXU.

Layout: everything is TRANSPOSED — candidates ride the lane (last) axis,
features ride sublanes. A (H, tile, action_dim) block would pad its
6-wide action axis to 128 lanes (21x VMEM waste, out-of-memory at
production tiles); as (H, action_dim, tile) the tile is lane-aligned and
the whole working set is ~1 MB. Matmuls run as W^T @ x with the feature
contraction on sublanes, which the MXU handles natively.

Cost model fused in: the GoalStateAgent planning cost
(reference src/mbrl/models.py:244-272) — smooth-abs state cost to a goal
plus cosh action cost. Dataset normalization (agents.py:218-230) is an
affine map, so it folds into the first/last layer weights ahead of the
kernel (`_fold_normalizers`) and costs nothing per step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_normalizers(params, normalizers):
    """Fold affine (un)normalization into the MLP weights.

    norm(x) = (x - mu) / sigma  =>  W1' = W1 / sigma[:, None],
                                    b1' = b1 - (mu / sigma) @ W1
    unnorm(y) = y * sigma + mu  =>  W3' = W3 * sigma[None, :],
                                    b3' = b3 * sigma + mu
    """
    w1, b1 = params['l1']['w'], params['l1']['b']
    w2, b2 = params['l2']['w'], params['l2']['b']
    w3, b3 = params['l3']['w'], params['l3']['b']
    if normalizers is not None and normalizers.state_mean is not None:
        sd = normalizers.state_mean.shape[-1]
        s_mu, s_sig = normalizers.state_mean, normalizers.state_std + 1e-6
        if normalizers.action_mean is not None:
            a_mu = normalizers.action_mean
            a_sig = normalizers.action_std + 1e-6
        else:
            # w1 may carry a leading ensemble-member axis: the input dim
            # is axis -2, not 0 (stacked params crash a shape[0]-based
            # size with state stats but no action stats).
            a_mu = jnp.zeros(w1.shape[-2] - sd, w1.dtype)
            a_sig = jnp.ones(w1.shape[-2] - sd, w1.dtype)
        mu = jnp.concatenate([s_mu, a_mu])
        sig = jnp.concatenate([s_sig, a_sig])
        b1 = b1 - (mu / sig) @ w1
        w1 = w1 / sig[:, None]
        b3 = b3 * s_sig + s_mu
        w3 = w3 * s_sig[None, :]
    return w1, b1, w2, b2, w3, b3


def _kernel(s0_ref, act_ref, w1sT_ref, w1aT_ref, b1_ref, w2T_ref, b2_ref,
            w3T_ref, b3_ref, goal_ref, wvec_ref, out_ref, *,
            horizon: int, alpha_state: float, alpha_action: float):
    """Transposed rollout: s (sd, tile), actions (H, ad, tile)."""
    s = s0_ref[:]                                     # (sd, tile)

    def body(t, carry):
        s, acc = carry
        a = act_ref[t]                                # (ad, tile)
        # h = relu(W1^T [s; a] + b1), first layer split to avoid concat.
        # MXU accumulators must be 32-bit; inputs may be bf16 (double
        # rate), so accumulate f32 and cast back between layers.
        dt = s.dtype
        h = (jnp.dot(w1sT_ref[:], s, preferred_element_type=jnp.float32)
             + jnp.dot(w1aT_ref[:], a, preferred_element_type=jnp.float32)
             + b1_ref[:])
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w2T_ref[:], h, preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0).astype(dt)
        s = (jnp.dot(w3T_ref[:], h, preferred_element_type=jnp.float32)
             + b3_ref[:]).astype(dt)
        # smooth-abs state cost + cosh action cost (models.py:244-272);
        # cost math and accumulation in f32 even when the network runs
        # bf16, so elite ranking stays sharp over long horizons
        d = ((s - goal_ref[:]) * wvec_ref[:]).astype(jnp.float32)
        c_state = jnp.sum(
            jnp.sqrt(d * d + alpha_state * alpha_state) - alpha_state,
            axis=0, keepdims=True)                    # (1, tile)
        # cosh has no Pallas TPU lowering; write it as exponentials
        u = (a / alpha_action).astype(jnp.float32)
        e_u = jnp.exp(u)
        cosh_u = 0.5 * (e_u + 1.0 / e_u)   # one exp + cheap reciprocal
        c_act = (alpha_action ** 2) * jnp.mean(
            cosh_u - 1.0, axis=0, keepdims=True)
        return s, acc + c_state + c_act

    acc0 = jnp.zeros((1, s.shape[1]), jnp.float32)
    s, acc = jax.lax.fori_loop(0, horizon, body, (s, acc0))
    out_ref[:] = acc


def mlp_rollout_costs_reference(params, s0, actions, goal, weights,
                                normalizers=None, alpha_state: float = 0.4,
                                alpha_action: float = 0.25) -> jnp.ndarray:
    """Pure-jnp reference: scan rollout + accumulated cost. Used on CPU
    and as the parity oracle for the Pallas kernel."""
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)

    def step(carry, a):
        s, acc = carry
        x = jnp.concatenate([s, a], axis=-1)
        h = jax.nn.relu(x @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        s = h @ w3 + b3
        d = (s - goal) * weights
        c = (jnp.sum(jnp.sqrt(d * d + alpha_state ** 2) - alpha_state,
                     axis=-1)
             + alpha_action ** 2 * jnp.mean(
                 jnp.cosh(a / alpha_action) - 1.0, axis=-1))
        return (s, acc + c), None

    zero = jnp.zeros(s0.shape[:-1], s0.dtype)
    (s, costs), _ = jax.lax.scan(step, (s0, zero), actions)
    return costs


def _supports_pallas() -> bool:
    platform = jax.devices()[0].platform
    return platform in ('tpu', 'axon')


@functools.partial(jax.jit, static_argnames=('alpha_state', 'alpha_action',
                                             'tile', 'interpret'))
def _pallas_costs(s0T, actionsT, w1sT, w1aT, b1, w2T, b2, w3T, b3, goal,
                  wvec, alpha_state: float, alpha_action: float, tile: int,
                  interpret: bool):
    sd, K = s0T.shape
    H, ad, _ = actionsT.shape
    Kp = ((K + tile - 1) // tile) * tile
    if Kp != K:
        s0T = jnp.pad(s0T, ((0, 0), (0, Kp - K)))
        actionsT = jnp.pad(actionsT, ((0, 0), (0, 0), (0, Kp - K)))

    kern = functools.partial(_kernel, horizon=H, alpha_state=alpha_state,
                             alpha_action=alpha_action)
    full2 = lambda i: (0, 0)
    costs = pl.pallas_call(
        kern,
        grid=(Kp // tile,),
        in_specs=[
            pl.BlockSpec((sd, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, ad, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1sT.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1aT.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w3T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(goal.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(wvec.shape, full2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        interpret=interpret,
    )(s0T, actionsT, w1sT, w1aT, b1, w2T, b2, w3T, b3, goal, wvec)
    return costs[0, :K]


def mlp_rollout_costs_t(params, s0T, actionsT, goal, weights,
                        normalizers=None, alpha_state: float = 0.4,
                        alpha_action: float = 0.25, tile: int = 1024,
                        compute_dtype=None,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Kernel-native-layout variant: s0T (sd, N), actionsT (H, ad, N).

    planners.cem_batched builds candidates directly in this layout so no
    transposed copy of the (H, ad, N) action tensor is ever materialized.
    `compute_dtype=jnp.bfloat16` runs the MLP matmuls at the MXU's double
    bf16 rate (costs still accumulate in f32); planner rollouts tolerate
    it — the dynamics model is learned and approximate to begin with.
    """
    if interpret is None:
        if not _supports_pallas():
            return mlp_rollout_costs_reference(
                params, s0T.T, actionsT.transpose(0, 2, 1), goal, weights,
                normalizers, alpha_state, alpha_action)
        interpret = False
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)
    sd = s0T.shape[0]
    if compute_dtype is not None:
        s0T = s0T.astype(compute_dtype)
        actionsT = actionsT.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (x.astype(compute_dtype)
                                  for x in (w1, b1, w2, b2, w3, b3))
        goal = goal.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    return _pallas_costs(s0T, actionsT,
                         w1[:sd].T, w1[sd:].T, b1[:, None], w2.T,
                         b2[:, None], w3.T, b3[:, None], goal[:, None],
                         weights[:, None], alpha_state, alpha_action,
                         tile, bool(interpret))


def mlp_rollout_costs(params, s0, actions, goal, weights,
                      normalizers=None, alpha_state: float = 0.4,
                      alpha_action: float = 0.25, tile: int = 1024,
                      compute_dtype=None,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Total planning cost per candidate, fused rollout (TPU Pallas).

    Args:
      params: MLPDynamics param pytree ({'l1','l2','l3'} dense layers).
      s0: (K, state_dim) initial states (one per candidate).
      actions: (H, K, action_dim) candidate action sequences.
      goal, weights: goal state and per-dim cost weights (state_dim,).
      normalizers: optional models.Normalizers, folded into the weights.
    Returns:
      (K,) total smooth-abs + cosh costs over the horizon.

    Falls back to the jnp reference off-TPU (or with interpret=True runs
    the kernel in interpreter mode for parity tests). For whole-env-batch
    planning fold the env axis into K first (planners.cem_batched does).
    """
    if interpret is None and not _supports_pallas():
        return mlp_rollout_costs_reference(
            params, s0, actions, goal, weights, normalizers,
            alpha_state, alpha_action)
    return mlp_rollout_costs_t(params, s0.T, actions.transpose(0, 2, 1),
                               goal, weights, normalizers, alpha_state,
                               alpha_action, tile, compute_dtype,
                               interpret)


# ---------------------------------------------------------------------------
# Fully-fused variant: action sampling + rollout + cost in one kernel.
# Grid = env batch; each program samples its env's K candidates from the
# CEM (mean, std) with the on-core PRNG (Box-Muller on prng_random_bits),
# rolls them through the MLP in VMEM, and writes costs AND the sampled
# actions (needed by the elite refit). Removes the eps-sample + clip +
# transpose HBM round-trips of the two-phase path (~2 ms per CEM
# iteration at production sizes).
# ---------------------------------------------------------------------------

def _sample_kernel(seed_ref, s0_ref, mean_ref, std_ref, w1sT_ref, w1aT_ref,
                   b1_ref, w2T_ref, b2_ref, w3T_ref, b3_ref, goal_ref,
                   wvec_ref, cost_ref, act_ref, *, horizon: int,
                   alpha_state: float, alpha_action: float,
                   action_low: float, action_high: float,
                   antithetic: bool = True, sampler: str = 'normal',
                   unroll: int = 1):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    s = s0_ref[0]                                     # (sd, K)
    K = s.shape[1]
    ad = mean_ref.shape[2]
    Kz = K // 2 if antithetic else K

    def _uniform(shape):
        # int32 view * 2^-32 + 0.5 maps bits uniformly onto [0, 1)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        return bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5

    def _triangular(shape_rows):
        # Irwin-Hall(2) scaled to unit variance: zero transcendentals
        # (Box-Muller's log/cos/sqrt dominate this kernel's VPU time).
        # CEM needs only a symmetric unimodal proposal with the
        # requested std; the refit statistics stay exact.
        u = _uniform((2 * shape_rows, Kz))
        return (u[:shape_rows] + u[shape_rows:] - 1.0) * 2.4494897

    if sampler == 'spline4':
        # iCEM-style temporally-correlated (low-frequency) noise: draw
        # triangular knots every 4 steps and lerp along the horizon
        # (renormalized to unit per-step variance). Smoother candidate
        # action sequences explore locomotion tasks better per sample
        # (Pinneri et al. 2020) and cost 4x fewer PRNG draws. All H
        # steps are materialized up front with STATIC indices (trace-
        # time unroll) and written to act_ref once; the rollout loop
        # reads them back per step (dynamic ref indexing, the same
        # pattern as the store in the per-step samplers below).
        n_knots = (horizon + 3) // 4 + 1
        knots = [_triangular(ad) for _ in range(n_knots)]
        rows = []
        for t in range(horizon):
            i, w = t // 4, (t % 4) * 0.25
            zt = knots[i] if w == 0.0 else (
                ((1.0 - w) * knots[i] + w * knots[i + 1])
                * (1.0 / float(np.sqrt((1.0 - w) ** 2 + w ** 2))))
            if antithetic:
                zt = jnp.concatenate([zt, -zt], axis=1)
            rows.append(zt)
        z_all = jnp.stack(rows)                       # (H, ad, K)
        a_all = jnp.clip(mean_ref[0][:, :, None]
                         + std_ref[0][:, :, None] * z_all,
                         action_low, action_high).astype(s.dtype)
        act_ref[0] = a_all

    def body(t, carry):
        s, acc = carry
        # Antithetic halves: z for the first K/2 lanes, -z mirrored for
        # the rest — half the sampling work (the VPU-bound part of this
        # kernel) and lower CEM estimator variance.
        if sampler == 'triangular':
            z = _triangular(ad)
        elif sampler == 'spline4':
            z = None                                  # pre-materialized
        else:
            u = _uniform((2 * ad, Kz))
            u1 = jnp.clip(u[:ad], 1e-7, 1.0)
            u2 = u[ad:]
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                (2.0 * np.pi) * u2)
        if antithetic and z is not None:
            z = jnp.concatenate([z, -z], axis=1)
        if z is None:            # spline4: read the pre-written actions
            a = act_ref[0, t]
        else:
            a = jnp.clip(mean_ref[0, t][:, None]
                         + std_ref[0, t][:, None] * z,
                         action_low, action_high).astype(s.dtype)
            act_ref[0, t] = a
        dt = s.dtype
        h = (jnp.dot(w1sT_ref[:], s, preferred_element_type=jnp.float32)
             + jnp.dot(w1aT_ref[:], a, preferred_element_type=jnp.float32)
             + b1_ref[:])
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w2T_ref[:], h, preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0).astype(dt)
        s = (jnp.dot(w3T_ref[:], h, preferred_element_type=jnp.float32)
             + b3_ref[:]).astype(dt)
        d = ((s - goal_ref[:]) * wvec_ref[:]).astype(jnp.float32)
        c_state = jnp.sum(
            jnp.sqrt(d * d + alpha_state * alpha_state) - alpha_state,
            axis=0, keepdims=True)
        u_act = (a / alpha_action).astype(jnp.float32)
        e_u = jnp.exp(u_act)
        cosh_u = 0.5 * (e_u + 1.0 / e_u)   # one exp + cheap reciprocal
        c_act = (alpha_action ** 2) * jnp.mean(
            cosh_u - 1.0, axis=0, keepdims=True)
        return s, acc + c_state + c_act

    acc0 = jnp.zeros((1, K), jnp.float32)
    # unroll: amortize the Mosaic loop-carry overhead over several
    # horizon steps (the body is small relative to the branch cost)
    s, acc = jax.lax.fori_loop(0, horizon, body, (s, acc0), unroll=unroll)
    cost_ref[0] = acc


def _sample_kernel_multi(seed_ref, s0_ref, mean_ref, std_ref, w1sT_ref,
                         w1aT_ref, b1_ref, w2T_ref, b2_ref, w3T_ref,
                         b3_ref, goal_ref, wvec_ref, cost_ref, act_ref, *,
                         horizon: int, alpha_state: float,
                         alpha_action: float, action_low: float,
                         action_high: float, antithetic: bool,
                         group: int, k_per_env: int,
                         sampler: str = 'normal'):
    """G-envs-per-program variant: candidates of `group` envs share each
    MLP matmul, so the MXU streams (hidden, G*K)-lane passes instead of G
    separate (hidden, K) ones.

    Measured (v5e, walker config): kernel-only 4.19 -> 3.66 ms/iter at
    G=2, but the (B, H, ad, K) action un-interleave transpose outside the
    kernel eats the gain end-to-end (bench 6089 -> 5939 steps/s), so the
    default stays G=1; the knob remains for configs where the planner
    consumes grouped-lane actions directly. G=8 exceeds the 16 MB VMEM
    scoped limit."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    s = s0_ref[0]                                     # (sd, G*K)
    N = s.shape[1]
    ad = mean_ref.shape[3]
    G, K = group, k_per_env

    def body(t, carry):
        s, acc = carry
        Nz = N // 2 if antithetic else N
        u_bits = pltpu.bitcast(pltpu.prng_random_bits((2 * ad, Nz)),
                               jnp.int32)
        u = u_bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        if sampler == 'triangular':
            z = (u[:ad] + u[ad:] - 1.0) * 2.4494897
        else:
            u1 = jnp.clip(u[:ad], 1e-7, 1.0)
            u2 = u[ad:]
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * np.pi) * u2)
        if antithetic:
            z = jnp.concatenate([z, -z], axis=1)
        mean_x = jnp.concatenate(
            [jnp.broadcast_to(mean_ref[0, g, t][:, None], (ad, K))
             for g in range(G)], axis=1)              # (ad, G*K)
        std_x = jnp.concatenate(
            [jnp.broadcast_to(std_ref[0, g, t][:, None], (ad, K))
             for g in range(G)], axis=1)
        a = jnp.clip(mean_x + std_x * z,
                     action_low, action_high).astype(s.dtype)
        act_ref[0, t] = a
        dt = s.dtype
        h = (jnp.dot(w1sT_ref[:], s, preferred_element_type=jnp.float32)
             + jnp.dot(w1aT_ref[:], a, preferred_element_type=jnp.float32)
             + b1_ref[:])
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w2T_ref[:], h, preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0).astype(dt)
        s = (jnp.dot(w3T_ref[:], h, preferred_element_type=jnp.float32)
             + b3_ref[:]).astype(dt)
        d = ((s - goal_ref[:]) * wvec_ref[:]).astype(jnp.float32)
        c_state = jnp.sum(
            jnp.sqrt(d * d + alpha_state * alpha_state) - alpha_state,
            axis=0, keepdims=True)
        u_act = (a / alpha_action).astype(jnp.float32)
        e_u = jnp.exp(u_act)
        cosh_u = 0.5 * (e_u + 1.0 / e_u)
        c_act = (alpha_action ** 2) * jnp.mean(
            cosh_u - 1.0, axis=0, keepdims=True)
        return s, acc + c_state + c_act

    acc0 = jnp.zeros((1, N), jnp.float32)
    s, acc = jax.lax.fori_loop(0, horizon, body, (s, acc0))
    cost_ref[0] = acc


@functools.partial(jax.jit, static_argnames=(
    'num_candidates', 'alpha_state', 'alpha_action', 'action_low',
    'action_high', 'interpret', 'compute_dtype', 'antithetic',
    'envs_per_program', 'sampler', 'unroll', 'return_padded'))
def mlp_sample_rollout_costs(params, seed, s0, mean, std, goal, weights,
                             num_candidates: int, normalizers=None,
                             alpha_state: float = 0.4,
                             alpha_action: float = 0.25,
                             action_low: float = -1.0,
                             action_high: float = 1.0,
                             interpret: bool = False,
                             compute_dtype=None,
                             antithetic: bool = True,
                             envs_per_program: int = 1,
                             sampler: str = 'normal',
                             unroll: int = 1,
                             return_padded: bool = False):
    """Sample + roll out + cost K candidates per env, fully in-kernel.

    Args:
      seed: int32 scalar; each env program folds in its grid index.
      s0: (B, sd) per-env initial states.
      mean, std: (B, H, ad) CEM proposal statistics.
      sampler: 'normal' (Box-Muller), 'triangular' (Irwin-Hall(2)
        scaled to unit variance — no transcendentals, for VPU-bound
        configs; CEM refit statistics are distribution-agnostic), or
        'spline4' (triangular knots every 4 steps, lerped along the
        horizon — iCEM-style low-frequency exploration noise).
      return_padded: skip the slice back to `num_candidates` lanes and
        return the kernel's tile-padded buffers directly — costs
        (B, Kp) and actions (B, H, ad, Kp) with Kp = K rounded up to
        128, or, with envs_per_program=G > 1, the grouped lane layout
        (B//G, H, ad, G*Kp) exactly as the kernel wrote it. The slice
        is a full HBM copy of the multi-hundred-MB action tensor (and
        the grouped path's un-interleave transpose is another); a
        consumer that masks lanes >= K itself (planners.cem_batched's
        elite refit does) avoids both.
    Returns:
      costs (B, K) float32 and actions (B, H, ad, K) — the kernel's own
      PRNG stream (distinct from jax.random but deterministic in `seed`).
    """
    B, sd = s0.shape
    _, H, ad = mean.shape
    Kp = ((num_candidates + 127) // 128) * 128
    G = envs_per_program
    if sampler == 'spline4':
        G = 1  # grouped-lane kernel implements normal/triangular only
    # VMEM-aware group clamp: big-state domains (humanoid sd=67/ad=21)
    # overflow the 16 MB scoped VMEM at the walker-tuned default G=4 —
    # halve the group until the program's lane working set fits.
    dtb = 2 if compute_dtype == jnp.bfloat16 else 4
    hid = params['l2']['w'].shape[-1]
    while G > 1 and (B % G
                     or G * Kp * _vmem_lane_bytes(sd, ad, H, hid, dtb)
                     > _VMEM_BUDGET):
        G //= 2
    if G > 1 and B % G == 0 and not interpret:
        return _sample_multi(params, seed, s0, mean, std, goal, weights,
                             num_candidates, normalizers, alpha_state,
                             alpha_action, action_low, action_high,
                             compute_dtype, antithetic, G, sampler,
                             return_padded)
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)
    if compute_dtype is not None:
        # bf16 MLP weights/activations: the matmuls run at the MXU's
        # double-rate; Box-Muller sampling and cost accumulation stay f32
        s0 = s0.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (x.astype(compute_dtype)
                                  for x in (w1, b1, w2, b2, w3, b3))
        goal = goal.astype(compute_dtype)
        weights = weights.astype(compute_dtype)

    kern = functools.partial(
        _sample_kernel, horizon=H, alpha_state=alpha_state,
        alpha_action=alpha_action, action_low=action_low,
        action_high=action_high, antithetic=antithetic, sampler=sampler,
        unroll=unroll)
    full2 = lambda i: (0, 0)
    costs, actions = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((1, sd, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # s0T
            pl.BlockSpec((1, H, ad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # mean
            pl.BlockSpec((1, H, ad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # std
            pl.BlockSpec(w1[:sd].T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1[sd:].T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w3.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sd, 1), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((sd, 1), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, ad, Kp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, ad, Kp), s0.dtype),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      jnp.broadcast_to(s0[:, :, None], (B, sd, Kp)),
      mean, std,
      w1[:sd].T, w1[sd:].T, b1[:, None], w2.T, b2[:, None], w3.T,
      b3[:, None], goal[:, None], weights[:, None])
    if return_padded:
        return costs[:, 0, :], actions
    return (costs[:, 0, :num_candidates],
            actions[:, :, :, :num_candidates])


def _sample_multi(params, seed, s0, mean, std, goal, weights,
                  num_candidates, normalizers, alpha_state, alpha_action,
                  action_low, action_high, compute_dtype, antithetic, G,
                  sampler='normal', return_padded=False):
    B, sd = s0.shape
    _, H, ad = mean.shape
    Kp = ((num_candidates + 127) // 128) * 128
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)
    if compute_dtype is not None:
        s0 = s0.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (x.astype(compute_dtype)
                                  for x in (w1, b1, w2, b2, w3, b3))
        goal = goal.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    BG = B // G
    N = G * Kp
    kern = functools.partial(
        _sample_kernel_multi, horizon=H, alpha_state=alpha_state,
        alpha_action=alpha_action, action_low=action_low,
        action_high=action_high, antithetic=antithetic, group=G,
        k_per_env=Kp, sampler=sampler)
    full2 = lambda i: (0, 0)
    # s0 expanded to the grouped-lane layout: env g's candidates occupy
    # lanes [g*Kp, (g+1)*Kp) of its group's program
    s0g = jnp.broadcast_to(
        s0.reshape(BG, G, sd, 1).transpose(0, 2, 1, 3),
        (BG, sd, G, Kp)).reshape(BG, sd, N)
    costs, actions = pl.pallas_call(
        kern,
        grid=(BG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sd, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, H, ad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, H, ad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1[:sd].T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1[sd:].T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.T.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((w3.shape[1], 1), full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sd, 1), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((sd, 1), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, ad, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BG, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((BG, H, ad, N), s0.dtype),
        ),
    )(jnp.asarray([seed], jnp.int32), s0g,
      mean.reshape(BG, G, H, ad), std.reshape(BG, G, H, ad),
      w1[:sd].T, w1[sd:].T, b1[:, None], w2.T, b2[:, None], w3.T,
      b3[:, None], goal[:, None], weights[:, None])
    costs = costs.reshape(BG, G, Kp).reshape(B, Kp)
    if return_padded:
        # grouped lane layout, untouched: (BG, H, ad, G*Kp). The
        # (B, Kp)-major un-interleave below is a full-tensor HBM
        # transpose that measured away the grouped kernel's win; padded
        # consumers reduce the lane axis in place instead.
        return costs, actions
    actions = actions.reshape(BG, H, ad, G, Kp).transpose(
        0, 3, 1, 2, 4).reshape(B, H, ad, Kp)
    return (costs[:, :num_candidates], actions[..., :num_candidates])


# Scoped VMEM the compiler lets a program allocate is 16 MB; leave
# headroom for Mosaic's own scratch. Programs whose lane working set
# would exceed this must shrink their env group (observed: humanoid
# sd=67/ad=21 at G=4 x Kp=1024 lanes OOMs at 24.8 MB).
_VMEM_BUDGET = 14 << 20


def _vmem_lane_bytes(sd: int, ad: int, H: int, hid: int,
                     dtype_bytes: int) -> int:
    """Rough per-lane VMEM bytes of one sampling-kernel program: the
    (H, ad, lanes) action block dominates; state/hidden activations and
    Mosaic double-buffering make up the rest (x2)."""
    return (H * ad + sd + 2 * hid + 8) * dtype_bytes * 2


def _pick_ens_group(B: int, Kn: int, max_lanes: int = 6144):
    """Smallest env group G (dividing B) that makes G*Kn lane-aligned.

    The member-sharded ensemble kernel packs G envs x Kn candidates on
    the lane axis with ZERO padding when G*Kn is a multiple of 128
    (Kn=200 -> G=16 -> 3200 lanes, vs 28% waste at Kp=256). Returns
    None when B doesn't tile or the lane count would blow VMEM — the
    caller falls back to the per-env member-blocked kernel."""
    if Kn % 128 == 0:
        g = 1
    else:
        g = 128 // int(np.gcd(Kn, 128))
    if B % g == 0 and g * Kn <= max_lanes:
        return g
    return None


def _sample_kernel_ens_grouped(seed_ref, s0T_ref, mean_ref, std_ref,
                               w1sT_ref, w1aT_ref, b1_ref, w2T_ref,
                               b2_ref, w3T_ref, b3_ref, goal_ref,
                               wvec_ref, cost_ref, act_ref, *,
                               horizon: int, group: int,
                               k_per_member: int, alpha_state: float,
                               alpha_action: float, action_low: float,
                               action_high: float, antithetic: bool,
                               sampler: str, unroll: int):
    """Member-sharded ensemble program: grid (n_members, B // G).

    Program (mi, g) loads exactly ONE member's folded weights and rolls
    member mi's Kn = K/n candidates for each of G envs: lanes pack
    G x Kn with lane = e_local * Kn + q, and G is chosen so G*Kn is
    128-aligned — zero padded lanes, and per-launch weight streams drop
    from B*n member-sets to (B/G)*n (VERDICT r3 #2: the per-env kernel
    paid 5x weight traffic + 25% lane padding = 1.83x the single-MLP
    plan cost). Per-env mean/std/s0 expand onto lanes in-kernel via a
    one-hot (G, N) selector matmul, so no (B, sd, N) broadcast of the
    initial state ever lands in HBM."""
    mi = pl.program_id(0)
    g = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + mi * pl.num_programs(1) + g)
    G, Kn = group, k_per_member
    ad = mean_ref.shape[2]
    N = G * Kn
    lane_env = jax.lax.broadcasted_iota(jnp.int32, (G, N), 1) // Kn
    row = jax.lax.broadcasted_iota(jnp.int32, (G, N), 0)
    sel = (lane_env == row).astype(jnp.float32)       # (G, N) one-hot
    dt = s0T_ref.dtype
    s = jnp.dot(s0T_ref[0].astype(jnp.float32), sel,
                preferred_element_type=jnp.float32).astype(dt)
    Kz = N // 2 if antithetic else N

    def body(t, carry):
        s, acc = carry
        bits = pltpu.bitcast(pltpu.prng_random_bits((2 * ad, Kz)),
                             jnp.int32)
        u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        if sampler == 'triangular':
            z = (u[:ad] + u[ad:] - 1.0) * 2.4494897
        else:
            u1 = jnp.clip(u[:ad], 1e-7, 1.0)
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                (2.0 * np.pi) * u[ad:])
        if antithetic:
            z = jnp.concatenate([z, -z], axis=1)
        mean_x = jnp.dot(mean_ref[0, t], sel,
                         preferred_element_type=jnp.float32)
        std_x = jnp.dot(std_ref[0, t], sel,
                        preferred_element_type=jnp.float32)
        a = jnp.clip(mean_x + std_x * z,
                     action_low, action_high).astype(dt)
        act_ref[0, 0, t] = a
        h = (jnp.dot(w1sT_ref[0], s, preferred_element_type=jnp.float32)
             + jnp.dot(w1aT_ref[0], a,
                       preferred_element_type=jnp.float32)
             + b1_ref[0])
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w2T_ref[0], h, preferred_element_type=jnp.float32)
            + b2_ref[0], 0.0).astype(dt)
        s = (jnp.dot(w3T_ref[0], h, preferred_element_type=jnp.float32)
             + b3_ref[0]).astype(dt)
        d = ((s - goal_ref[:]) * wvec_ref[:]).astype(jnp.float32)
        c_state = jnp.sum(
            jnp.sqrt(d * d + alpha_state * alpha_state) - alpha_state,
            axis=0, keepdims=True)
        u_act = (a / alpha_action).astype(jnp.float32)
        e_u = jnp.exp(u_act)
        cosh_u = 0.5 * (e_u + 1.0 / e_u)
        c_act = (alpha_action ** 2) * jnp.mean(
            cosh_u - 1.0, axis=0, keepdims=True)
        return s, acc + c_state + c_act

    acc0 = jnp.zeros((1, N), jnp.float32)
    s, acc = jax.lax.fori_loop(0, horizon, body, (s, acc0),
                               unroll=unroll)
    cost_ref[0, 0] = acc


def _sample_ens_grouped(params, seed, s0, mean, std, goal, weights,
                        num_candidates, n, G, normalizers, alpha_state,
                        alpha_action, action_low, action_high,
                        compute_dtype, antithetic, sampler, unroll,
                        return_padded):
    """pallas_call plumbing for _sample_kernel_ens_grouped."""
    B, sd = s0.shape
    _, H, ad = mean.shape
    Kn = num_candidates // n
    BG = B // G
    N = G * Kn
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)
    if compute_dtype is not None:
        s0 = s0.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (x.astype(compute_dtype)
                                  for x in (w1, b1, w2, b2, w3, b3))
        goal = goal.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    kern = functools.partial(
        _sample_kernel_ens_grouped, horizon=H, group=G, k_per_member=Kn,
        alpha_state=alpha_state, alpha_action=alpha_action,
        action_low=action_low, action_high=action_high,
        antithetic=antithetic, sampler=sampler, unroll=unroll)
    w1sT = w1[:, :sd].transpose(0, 2, 1)               # (n, hid, sd)
    w1aT = w1[:, sd:].transpose(0, 2, 1)               # (n, hid, ad)
    w2T = w2.transpose(0, 2, 1)
    w3T = w3.transpose(0, 2, 1)
    s0T = s0.reshape(BG, G, sd).transpose(0, 2, 1)     # (BG, sd, G)
    meanT = mean.reshape(BG, G, H, ad).transpose(0, 2, 3, 1)
    stdT = std.reshape(BG, G, H, ad).transpose(0, 2, 3, 1)
    env_blk = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda mi, g: (g,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    mem_blk = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda mi, g: (mi,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    shared2 = pl.BlockSpec((sd, 1), lambda mi, g: (0, 0),
                           memory_space=pltpu.VMEM)
    costs, actions = pl.pallas_call(
        kern,
        grid=(n, BG),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            env_blk(s0T.shape),
            env_blk(meanT.shape),
            env_blk(stdT.shape),
            mem_blk(w1sT.shape),
            mem_blk(w1aT.shape),
            mem_blk((n, w1.shape[2], 1)),
            mem_blk(w2T.shape),
            mem_blk((n, w2.shape[2], 1)),
            mem_blk(w3T.shape),
            mem_blk((n, w3.shape[2], 1)),
            shared2,                                          # goal
            shared2,                                          # weights
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, N), lambda mi, g: (mi, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, ad, N),
                         lambda mi, g: (mi, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, BG, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((n, BG, H, ad, N), s0.dtype),
        ),
    )(jnp.asarray([seed], jnp.int32), s0T, meanT, stdT,
      w1sT, w1aT, b1[:, :, None], w2T, b2[:, :, None], w3T,
      b3[:, :, None], goal[:, None], weights[:, None])
    # costs (n, BG, 1, N) -> (B, K) with candidate k = mi*Kn + q; env
    # b = g*G + e owns lane block [e*Kn, (e+1)*Kn) of program (mi, g)
    cost_blk = costs.reshape(n, BG, G, Kn).transpose(1, 2, 0, 3).reshape(
        B, num_candidates)
    if return_padded:
        # member-sharded grouped layout, untouched: (n, BG, H, ad, G*Kn)
        # — cem_batched's ndim==5 refit branch reduces it in place; the
        # costs are exact-K (zero padded lanes), so no masking either.
        return cost_blk, actions
    # decode to candidate k = q*n + mi so member = k % n (the forward_ts
    # TS-inf assignment the XLA path and parity tests use)
    c = cost_blk.reshape(B, n, Kn).transpose(0, 2, 1).reshape(
        B, num_candidates)
    a = actions.reshape(n, BG, H, ad, G, Kn).transpose(
        1, 4, 2, 3, 5, 0).reshape(B, H, ad, num_candidates)
    return c, a


def _sample_kernel_ens(seed_ref, s0_ref, mean_ref, std_ref, w1sT_ref,
                       w1aT_ref, b1_ref, w2T_ref, b2_ref, w3T_ref, b3_ref,
                       goal_ref, wvec_ref, cost_ref, act_ref, *,
                       horizon: int, n_members: int, k_per_member: int,
                       n_valid: int, alpha_state: float,
                       alpha_action: float, action_low: float,
                       action_high: float, antithetic: bool,
                       sampler: str, unroll: int):
    """Per-ENV ensemble program: all members' candidate lanes resident.

    Lanes are member-blocked — lane = mi*Kp + q, member mi's weights roll
    lanes [mi*Kp, (mi+1)*Kp) — so ONE program per env covers the whole
    TS-∞ population: program count and per-program overhead match the
    single-MLP kernel, the matmuls just split into n narrower lane
    slices. All n members' weights fit VMEM together (~1 MB at n=5).

    Padded lanes (q >= n_valid) get float32-max cost IN-kernel, so
    consumers never need a contiguous lane mask."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    s = s0_ref[0]                                     # (sd, N)
    N = s.shape[1]
    ad = mean_ref.shape[2]
    n, Kp = n_members, k_per_member
    Kz = N // 2 if antithetic else N

    def _uniform(shape):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        return bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5

    def body(t, carry):
        s, acc = carry
        u = _uniform((2 * ad, Kz))
        if sampler == 'triangular':
            z = (u[:ad] + u[ad:] - 1.0) * 2.4494897
        else:
            u1 = jnp.clip(u[:ad], 1e-7, 1.0)
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                (2.0 * np.pi) * u[ad:])
        if antithetic:
            z = jnp.concatenate([z, -z], axis=1)
        a = jnp.clip(mean_ref[0, t][:, None] + std_ref[0, t][:, None] * z,
                     action_low, action_high).astype(s.dtype)
        act_ref[0, t] = a
        dt = s.dtype
        outs = []
        for mi in range(n):              # static unroll over members
            sl = slice(mi * Kp, (mi + 1) * Kp)
            h = (jnp.dot(w1sT_ref[mi], s[:, sl],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(w1aT_ref[mi], a[:, sl],
                           preferred_element_type=jnp.float32)
                 + b1_ref[mi])
            h = jnp.maximum(h, 0.0).astype(dt)
            h = jnp.maximum(
                jnp.dot(w2T_ref[mi], h,
                        preferred_element_type=jnp.float32)
                + b2_ref[mi], 0.0).astype(dt)
            outs.append((jnp.dot(w3T_ref[mi], h,
                                 preferred_element_type=jnp.float32)
                         + b3_ref[mi]).astype(dt))
        s = jnp.concatenate(outs, axis=1)
        d = ((s - goal_ref[:]) * wvec_ref[:]).astype(jnp.float32)
        c_state = jnp.sum(
            jnp.sqrt(d * d + alpha_state * alpha_state) - alpha_state,
            axis=0, keepdims=True)
        u_act = (a / alpha_action).astype(jnp.float32)
        e_u = jnp.exp(u_act)
        cosh_u = 0.5 * (e_u + 1.0 / e_u)
        c_act = (alpha_action ** 2) * jnp.mean(
            cosh_u - 1.0, axis=0, keepdims=True)
        return s, acc + c_state + c_act

    acc0 = jnp.zeros((1, N), jnp.float32)
    s, acc = jax.lax.fori_loop(0, horizon, body, (s, acc0),
                               unroll=unroll)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    valid = (lane % Kp) < n_valid
    cost_ref[0] = jnp.where(valid, acc, jnp.finfo(jnp.float32).max)


@functools.partial(jax.jit, static_argnames=(
    'num_candidates', 'n_members', 'alpha_state', 'alpha_action',
    'action_low', 'action_high', 'compute_dtype', 'antithetic', 'sampler',
    'unroll', 'return_padded'))
def mlp_sample_rollout_costs_ensemble(params, seed, s0, mean, std, goal,
                                      weights, num_candidates: int,
                                      n_members: int, normalizers=None,
                                      alpha_state: float = 0.4,
                                      alpha_action: float = 0.25,
                                      action_low: float = -1.0,
                                      action_high: float = 1.0,
                                      compute_dtype=None,
                                      antithetic: bool = True,
                                      sampler: str = 'normal',
                                      unroll: int = 1,
                                      return_padded: bool = False):
    """Ensemble TS-∞ sampling kernel: ONE launch covering all members.

    ``params`` leaves carry a leading (n_members,) axis (EnsembleDynamics
    layout). Decoded candidate k belongs to member k % n — the same TS-∞
    assignment as the XLA `forward_ts` path.

    Two kernel layouts, selected automatically:

    * **member-sharded grouped** (production, whenever the env batch
      tiles): grid (n, B/G); program (mi, g) loads ONE member's folded
      weights and rolls its Kn = K/n candidates for G envs packed on
      G*Kn lanes, with G the smallest group making G*Kn 128-aligned —
      zero padded lanes, and (B/G)*n weight streams instead of B*n
      (VERDICT r3 #2: the per-env layout cost 1.83x the single-MLP plan
      at equal K from 5x weight traffic + 25% lane padding).
    * **per-env member-blocked** (small-B fallback): grid (B,); one
      program per env holds all members' lanes (lane = mi*Kp + q, Kp =
      Kn padded to 128), padded-lane costs set to float32-max in-kernel.
      (A naive ungrouped (member, env) grid measured 2.5x slower: n*B
      quarter-width programs pay n times the launch/PRNG overhead.)

    Returns costs (B, K) float32 and actions (B, H, ad, K).

    ``return_padded`` skips the K-major un-interleave — a full-HBM
    transpose of the multi-hundred-MB action tensor — and hands back the
    kernel's buffers untouched: grouped, ``(costs (B, K) exact,
    actions (n, B/G, H, ad, G*Kn))`` for cem_batched's ndim==5 refit
    branch; per-env, ``(costs (B, n*Kp) pad-masked, actions
    (B, H, ad, n*Kp))``. Callers feeding planners.cem_batched append a
    static True third element (outside the jit) so the planner skips
    its contiguous lane<K mask and refits the buffers as written.
    """
    B, sd = s0.shape
    _, H, ad = mean.shape
    n = n_members
    if num_candidates % n:
        raise ValueError(f'num_candidates {num_candidates} must divide '
                         f'evenly over {n} ensemble members')
    Kn = num_candidates // n
    dtb = 2 if compute_dtype == jnp.bfloat16 else 4
    hid = params['l2']['w'].shape[-1]
    lane_b = _vmem_lane_bytes(sd, ad, H, hid, dtb)
    G = _pick_ens_group(B, Kn,
                        max_lanes=max(_VMEM_BUDGET // lane_b, 128))
    if G is not None and sampler in ('normal', 'triangular'):
        # member-sharded grouped kernel: one member's weights per
        # program, zero lane padding (the production path; the per-env
        # member-blocked kernel below is the small-B fallback)
        return _sample_ens_grouped(
            params, seed, s0, mean, std, goal, weights, num_candidates,
            n, G, normalizers, alpha_state, alpha_action, action_low,
            action_high, compute_dtype, antithetic, sampler, unroll,
            return_padded)
    Kp = ((Kn + 127) // 128) * 128
    N = n * Kp
    w1, b1, w2, b2, w3, b3 = _fold_normalizers(params, normalizers)
    if compute_dtype is not None:
        s0 = s0.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (x.astype(compute_dtype)
                                  for x in (w1, b1, w2, b2, w3, b3))
        goal = goal.astype(compute_dtype)
        weights = weights.astype(compute_dtype)

    kern = functools.partial(
        _sample_kernel_ens, horizon=H, n_members=n, k_per_member=Kp,
        n_valid=Kn, alpha_state=alpha_state, alpha_action=alpha_action,
        action_low=action_low, action_high=action_high,
        antithetic=antithetic, sampler=sampler, unroll=unroll)
    w1sT = w1[:, :sd].transpose(0, 2, 1)               # (n, hid, sd)
    w1aT = w1[:, sd:].transpose(0, 2, 1)               # (n, hid, ad)
    w2T = w2.transpose(0, 2, 1)
    w3T = w3.transpose(0, 2, 1)
    full3 = lambda i: (0, 0, 0)
    w_spec = lambda shape: pl.BlockSpec(shape, full3,
                                        memory_space=pltpu.VMEM)
    shared2 = pl.BlockSpec((sd, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    costs, actions = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((1, sd, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # s0T
            pl.BlockSpec((1, H, ad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # mean
            pl.BlockSpec((1, H, ad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # std
            w_spec(w1sT.shape),
            w_spec(w1aT.shape),
            w_spec((n, w1.shape[2], 1)),
            w_spec(w2T.shape),
            w_spec((n, w2.shape[2], 1)),
            w_spec(w3T.shape),
            w_spec((n, w3.shape[2], 1)),
            shared2,                                          # goal
            shared2,                                          # weights
        ],
        out_specs=(
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, ad, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, H, ad, N), s0.dtype),
        ),
    )(jnp.asarray([seed], jnp.int32),
      jnp.broadcast_to(s0[:, :, None], (B, sd, N)),
      mean, std,
      w1sT, w1aT, b1[:, :, None], w2T, b2[:, :, None], w3T,
      b3[:, :, None], goal[:, None], weights[:, None])
    costs = costs[:, 0, :]                     # (B, N), pads pre-masked
    if return_padded:
        # NOTE: callers handing this to planners.cem_batched must append
        # a static True ("pre-masked") third element OUTSIDE the jitted
        # kernel — a traced boolean cannot drive the planner's Python
        # branch.
        return costs, actions
    # interleave members along candidates: k = q*n + mi
    costs = costs.reshape(B, n, Kp)[:, :, :Kn].transpose(
        0, 2, 1).reshape(B, num_candidates)
    actions = actions.reshape(B, H, ad, n, Kp)[..., :Kn].transpose(
        0, 1, 2, 4, 3).reshape(B, H, ad, num_candidates)
    return costs, actions


