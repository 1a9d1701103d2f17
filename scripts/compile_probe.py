"""Probe where the walker bench's cold-compile time goes.

Times jit compilation (lower+compile, no execution) of each building
block of the bench program separately on the real chip:
  - one walker physics substep (vmapped)
  - one full control step (n_substeps scan + observation forward)
  - one fused-kernel CEM plan call
  - the whole bench scan body

    python scripts/compile_probe.py [--envs 1024]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def probe(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f'{name}: trace+lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s',
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=1024)
    p.add_argument('--task', default='walker_walk')
    args = p.parse_args()

    from mujoco_mbrl_tpu import models, planners, suite
    from mujoco_mbrl_tpu.ops import mlp_sample_rollout_costs

    domain, task_name = args.task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    B = args.envs
    t0 = time.perf_counter()
    state0, ts0 = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    print(f'reset compile+run: {time.perf_counter() - t0:.1f}s', flush=True)
    obs_dim = suite.flatten_observation(
        jax.tree_util.tree_map(lambda x: x[0], ts0.observation)).shape[0]
    act_dim = env.model.nu
    acts = jnp.zeros((B, act_dim))

    # one vmapped control step (substeps + obs forward)
    probe('env.step (vmapped control step)',
          lambda s, a: jax.vmap(env.step)(s, a), state0, acts)

    # the CEM plan via the fused kernel
    model = models.MLPDynamics(obs_dim, act_dim, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(obs_dim).at[1].set(1.0)
    weights = jnp.ones(obs_dim)
    obs = jnp.zeros((B, obs_dim))

    def plan(key):
        model_fn = lambda s, a: model.forward(params, s, a)
        cost = lambda states, actions: (
            models.smooth_abs_loss(states, goal, weights)
            + models.cosh_loss(actions))
        scf = lambda seed, mean, std: mlp_sample_rollout_costs(
            params, seed, obs, mean, std, goal, weights,
            num_candidates=1000, sampler='triangular')
        return planners.cem_batched(
            key, obs, model_fn, cost, horizon=30, action_dim=act_dim,
            num_candidates=1000, num_elites=100, num_iterations=3,
            sample_costs_fn=scf, return_states=False).actions[0]

    probe('CEM plan (fused kernel x3 + refit)', plan, jax.random.PRNGKey(2))


if __name__ == '__main__':
    main()
