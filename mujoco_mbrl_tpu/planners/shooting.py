"""Sampling-based planners: random shooting and CEM.

TPU shape discipline: candidates are a leading batch axis of size K (large,
MXU-friendly), the horizon is a `lax.scan`. Model forwards see (K, dim)
arrays so the 2-layer MLP matmuls tile onto the systolic array; elite
selection is `lax.top_k`. No data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    states: jnp.ndarray    # (H+1, state_dim) — states[0] = initial state
    actions: jnp.ndarray   # (H, action_dim)


def rollout_actions(model: Callable, initial_state: jnp.ndarray,
                    actions: jnp.ndarray) -> jnp.ndarray:
    """Unroll model over a (H, ..., dim) action sequence -> (H, ..., sdim).

    Batch axes broadcast: if actions is (H, K, ad) and initial_state is
    (K, sd) the model is evaluated K-wide per scan step.
    """
    def step(s, a):
        s_next = model(s, a)
        return s_next, s_next

    _, states = jax.lax.scan(step, initial_state, actions)
    return states


def _total_costs(cost: Callable, states: jnp.ndarray,
                 actions: jnp.ndarray) -> jnp.ndarray:
    """Sum per-step costs over the horizon. states/actions: (H, K, dim)."""
    c = cost(states, actions)          # (H, K)
    return c.sum(axis=0)


def _rollout_costs(model: Callable, cost: Callable,
                   initial_state: jnp.ndarray,
                   actions: jnp.ndarray) -> jnp.ndarray:
    """Total per-candidate cost WITHOUT materializing the state trajectory.

    Equivalent to ``_total_costs(cost, rollout_actions(...), actions)`` but
    the cost accumulates inside the scan, so the (H, K, state_dim) tensor —
    gigabytes of HBM traffic at production candidate counts — never exists.
    `cost` broadcasts over leading axes (all suite cost modules do), so the
    same callable evaluates one (K, dim) step at a time.
    """
    def step(carry, a):
        s, acc = carry
        s_next = model(s, a)
        acc = acc + cost(s_next, a)
        return (s_next, acc), None

    zero = jnp.zeros(initial_state.shape[:-1], initial_state.dtype)
    (_, costs), _ = jax.lax.scan(step, (initial_state, zero), actions)
    return costs


def random_shooting(key: jax.Array, initial_state: jnp.ndarray,
                    model: Callable, cost: Callable,
                    sample_action: Callable, horizon: int,
                    num_trajectories: int = 1000,
                    initial_trajectory: Optional[Trajectory] = None
                    ) -> Trajectory:
    """K uniform candidate sequences -> batched rollout -> argmin.

    Matches RandomShootingPlanner semantics (planners.py:166-216); the
    warm-start trajectory, when given, replaces one candidate so the
    previous plan is always in the pool (a strict improvement on the
    reference, which discards it for random shooting).
    """
    akey, _ = jax.random.split(key)
    actions = sample_action(akey, (horizon, num_trajectories))
    if initial_trajectory is not None:
        actions = actions.at[:, 0].set(initial_trajectory.actions)

    states0 = jnp.broadcast_to(
        initial_state, (num_trajectories,) + initial_state.shape)
    costs = _rollout_costs(cost=cost, model=model, initial_state=states0,
                           actions=actions)             # (K,)
    best = jnp.argmin(costs)
    best_actions = actions[:, best]
    best_states = rollout_actions(model, initial_state, best_actions)
    traj_states = jnp.concatenate(
        [initial_state[None], best_states], axis=0)
    return Trajectory(states=traj_states, actions=best_actions)


def cem(key: jax.Array, initial_state: jnp.ndarray, model: Callable,
        cost: Callable, horizon: int,
        action_dim: int,
        num_candidates: int = 1000, num_elites: int = 100,
        num_iterations: int = 5,
        init_mean: Optional[jnp.ndarray] = None,
        init_std: float = 1.0,
        action_low: float = -1.0, action_high: float = 1.0,
        min_std: float = 1e-2, alpha: float = 0.1) -> Trajectory:
    """Cross-entropy method over action sequences.

    Gaussian proposal over the (H, ad) sequence, refit on top-k elites each
    iteration with smoothing `alpha` (mean <- a*old + (1-a)*elite_mean).
    Returns the final elite-mean trajectory re-rolled through the model.
    """
    H, ad, K = horizon, action_dim, num_candidates
    mean = (init_mean if init_mean is not None
            else jnp.zeros((H, ad), initial_state.dtype))
    std = jnp.full((H, ad), init_std, initial_state.dtype)
    states0 = jnp.broadcast_to(initial_state, (K,) + initial_state.shape)

    def iteration(carry, ikey):
        mean, std = carry
        eps = jax.random.normal(ikey, (H, K, ad), initial_state.dtype)
        actions = jnp.clip(mean[:, None] + std[:, None] * eps,
                           action_low, action_high)
        costs = _rollout_costs(cost=cost, model=model,
                               initial_state=states0,
                               actions=actions)              # (K,)
        _, elite_idx = jax.lax.top_k(-costs, num_elites)
        elite_actions = actions[:, elite_idx]                # (H, E, ad)
        new_mean = elite_actions.mean(axis=1)
        new_std = elite_actions.std(axis=1)
        mean = alpha * mean + (1 - alpha) * new_mean
        std = jnp.maximum(alpha * std + (1 - alpha) * new_std, min_std)
        return (mean, std), None

    (mean, std), _ = jax.lax.scan(
        iteration, (mean, std), jax.random.split(key, num_iterations))

    final_actions = jnp.clip(mean, action_low, action_high)
    final_states = rollout_actions(model, initial_state, final_actions)
    traj_states = jnp.concatenate([initial_state[None], final_states],
                                  axis=0)
    return Trajectory(states=traj_states, actions=final_actions)


def cem_batched(key: jax.Array, initial_states: jnp.ndarray,
                model: Callable, cost: Callable, horizon: int,
                action_dim: int,
                num_candidates: int = 1000, num_elites: int = 100,
                num_iterations: int = 5,
                init_mean: Optional[jnp.ndarray] = None,
                init_std: float = 1.0,
                action_low: float = -1.0, action_high: float = 1.0,
                min_std: float = 1e-2, alpha: float = 0.1,
                rollout_costs_fn: Optional[Callable] = None,
                sample_costs_fn: Optional[Callable] = None,
                return_states: bool = True) -> Trajectory:
    """CEM for a whole env batch in ONE call (the lockstep-MPC hot path).

    Identical per-env semantics to `vmap(cem)`, but the env axis folds into
    the candidate axis for the rollout-cost evaluation, so a fused kernel
    (ops.mlp_rollout_costs_t, passed as `rollout_costs_fn(s0T (sd, N),
    actionsT (H, ad, N)) -> (N,)`) sees one (B*K)-row problem — a shape
    Pallas grids over directly, where vmap-of-pallas_call would blow the
    VMEM budget. Candidates are generated directly in the kernel's
    transposed layout (candidates on the trailing/lane axis) so no
    multi-hundred-MB transposed copy is ever materialized. Elite
    selection/refit stay per env.

    Args:
      initial_states: (B, state_dim).
      init_mean: optional (B, H, action_dim) warm-start means.
      return_states: when False, skip re-rolling the final mean through
        the model (a latency-bound H-step scan) and return states=None —
        MPC warm starts only consume `actions`.
    Returns:
      Trajectory with states (H+1, B, sd) (or None) and actions
      (H, B, ad).
    """
    H, ad, K = horizon, action_dim, num_candidates
    B, sd = initial_states.shape
    dtype = initial_states.dtype
    mean = (init_mean if init_mean is not None
            else jnp.zeros((B, H, ad), dtype))
    std = jnp.full((B, H, ad), init_std, dtype)
    # kernel-layout initial states: (sd, B*K), candidates on lanes
    s0T = jnp.broadcast_to(initial_states.T[:, :, None],
                           (sd, B, K)).reshape(sd, B * K)

    def total_costs(actions):
        """actions: (H, ad, B, K) -> (B, K) total costs."""
        flat = actions.reshape(H, ad, B * K)
        if rollout_costs_fn is not None:
            return rollout_costs_fn(s0T, flat).reshape(B, K)
        return _rollout_costs(cost=cost, model=model,
                              initial_state=s0T.T,
                              actions=flat.transpose(0, 2, 1)
                              ).reshape(B, K)

    def iteration(carry, ikey):
        mean, std = carry                               # (B, H, ad)
        if sample_costs_fn is not None:
            # fully-fused path: sampling happens inside the kernel
            # (ops.mlp_sample_rollout_costs); actions come back
            # (B, H, ad, K) for the elite refit. With return_padded the
            # kernel hands over its tile-padded buffers untouched —
            # costs (B, Kp) and actions (B, H, ad, Kp), or the grouped
            # lane layout (B//G, H, ad, G*Kp) — and the refit masks and
            # reduces them in place instead of paying a full-HBM slice
            # copy (and, grouped, an un-interleave transpose) per
            # iteration.
            seed = jax.random.randint(ikey, (), 0, jnp.iinfo(jnp.int32).max)
            out = sample_costs_fn(seed, mean, std)
            # 3-tuple contract: a trailing truthy flag says the kernel
            # already wrote +max into its padded-lane costs (ensemble
            # member-blocked layout: valid lanes are scattered per
            # member block, so the contiguous lane<K mask below would
            # wrongly kill valid lanes) — refit the buffer as written.
            premasked = False
            if len(out) == 3:
                costs, actions, premasked = out
            else:
                costs, actions = out
            Kc = costs.shape[1]
            if not premasked and Kc != K:   # padded lanes: never elite
                lane = jnp.arange(Kc)[None, :]
                costs = jnp.where(lane < K, costs,
                                  jnp.finfo(costs.dtype).max)
            if actions.ndim == 5:
                # ensemble member-sharded grouped layout
                # (n, BG, H, ad, G*Kn): candidate k = mi*Kn + q of env
                # b = g*G + e lives at actions[mi, g, :, :, e*Kn + q];
                # costs are exact-K (no padded lanes). Same
                # masked-reduction refit as the grouped branch, with the
                # member axis folded into the lane sum.
                n_m, BG = actions.shape[0], actions.shape[1]
                G = B // BG
                Kn = actions.shape[-1] // G
                _, eidx = jax.lax.top_k(-costs, num_elites)
                mem = jnp.zeros((B, Kc), dtype).at[
                    jnp.arange(B)[:, None], eidx].set(1.0)
                mg = mem.reshape(BG, G, n_m, Kn).transpose(
                    2, 0, 1, 3)[:, :, None, None]   # (n, BG, 1, 1, G, Kn)
                a_g = actions.reshape(n_m, BG, H, ad, G, Kn)
                s1 = jnp.sum(a_g * mg, axis=(0, -1))       # (BG, H, ad, G)
                s2 = jnp.sum(a_g * a_g * mg, axis=(0, -1))
                sum1 = s1.transpose(0, 3, 1, 2).reshape(B, H, ad)
                sum2 = s2.transpose(0, 3, 1, 2).reshape(B, H, ad)
            elif actions.shape[0] != B:   # grouped lane layout
                BG = actions.shape[0]
                G = B // BG
                Kp = actions.shape[-1] // G
                _, eidx = jax.lax.top_k(-costs, num_elites)
                mem = jnp.zeros((B, Kc), dtype).at[
                    jnp.arange(B)[:, None], eidx].set(1.0)
                mg = mem.reshape(BG, G, Kp)[:, None, None]  # (BG,1,1,G,Kp)
                a_g = actions.reshape(BG, H, ad, G, Kp)     # free reshape
                # one streaming pass (XLA fuses both masked reductions
                # over the shared a_g read); outputs are tiny (B*H*ad)
                s1 = jnp.sum(a_g * mg, axis=-1)             # (BG,H,ad,G)
                s2 = jnp.sum(a_g * a_g * mg, axis=-1)
                sum1 = s1.transpose(0, 3, 1, 2).reshape(B, H, ad)
                sum2 = s2.transpose(0, 3, 1, 2).reshape(B, H, ad)
            else:
                a_spec = 'bhdk'
                sum1 = sum2 = None
        else:
            mean_t = mean.transpose(1, 2, 0)            # (H, ad, B)
            std_t = std.transpose(1, 2, 0)
            eps = jax.random.normal(ikey, (H, ad, B, K), dtype)
            actions = jnp.clip(mean_t[..., None] + std_t[..., None] * eps,
                               action_low, action_high)  # (H, ad, B, K)
            costs = total_costs(actions)                # (B, K)
            a_spec = 'hdbk'
            sum1 = sum2 = None
        if sum1 is None:
            _, elite_idx = jax.lax.top_k(-costs, num_elites)  # (B, E)
            # Elite mean/std via a masked reduction over K instead of a
            # take_along_axis gather: gathering (H, ad, B, E) from the
            # hundreds-of-MB action tensor costs ~4 ms/iteration on TPU,
            # while two fused masked reductions are one streaming pass.
            member = jnp.zeros((B, costs.shape[1]), dtype).at[
                jnp.arange(B)[:, None], elite_idx].set(1.0)
            sum1 = jnp.einsum(f'{a_spec},bk->bhd', actions, member)
            sum2 = jnp.einsum(f'{a_spec},{a_spec},bk->bhd', actions,
                              actions, member)
        new_mean = sum1 / num_elites
        var = jnp.maximum(sum2 / num_elites - new_mean * new_mean, 0.0)
        new_std = jnp.sqrt(var)
        mean = alpha * mean + (1 - alpha) * new_mean
        std = jnp.maximum(alpha * std + (1 - alpha) * new_std, min_std)
        return (mean, std), None

    (mean, std), _ = jax.lax.scan(
        iteration, (mean, std), jax.random.split(key, num_iterations))

    final_actions = jnp.clip(mean, action_low, action_high)  # (B, H, ad)
    acts_t = final_actions.transpose(1, 0, 2)                # (H, B, ad)
    if not return_states:
        return Trajectory(states=None, actions=acts_t)
    final_states = rollout_actions(model, initial_states, acts_t)
    traj_states = jnp.concatenate([initial_states[None], final_states],
                                  axis=0)
    return Trajectory(states=traj_states, actions=acts_t)
