"""Plan-phase component timing at the bench config (walker, 1024 envs).

Times, each as its own jitted scan-chained program:
  * kernel-only: one mlp_sample_rollout_costs launch (sampling+rollout)
  * refit-only: the masked-reduction elite refit over a padded buffer
  * cem_batched: the full 3-iteration planner call
Prints one JSON line.
"""
import argparse, json, os, sys, time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CHAIN = 10


def timed(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=1024)
    p.add_argument('--candidates', type=int, default=1000)
    p.add_argument('--horizon', type=int, default=30)
    p.add_argument('--cem_iters', type=int, default=3)
    p.add_argument('--sampler', default='triangular')
    p.add_argument('--task', default='walker_walk')
    args = p.parse_args()
    B, K, H = args.envs, args.candidates, args.horizon

    from mujoco_mbrl_tpu import models, planners, suite
    from mujoco_mbrl_tpu.ops import mlp_sample_rollout_costs

    domain, task_name = args.task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    _, ts0 = env.reset(jax.random.PRNGKey(0))
    obs_dim = suite.flatten_observation(ts0.observation).shape[0]
    ad = env.model.nu
    model = models.MLPDynamics(obs_dim, ad, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(obs_dim).at[1].set(1.0)
    w = jnp.ones(obs_dim)
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, obs_dim))
    mean = jnp.zeros((B, H, ad))
    std = jnp.full((B, H, ad), 0.5)

    scf = lambda seed, mn, sd: mlp_sample_rollout_costs(
        params, seed, obs, mn, sd, goal, w, num_candidates=K,
        sampler=args.sampler, return_padded=True)

    # kernel-only (costs consumed, actions reduced to a scalar WITHOUT a
    # second HBM pass is impossible -- sum forces a read; report both)
    kern_cost_only = jax.jit(lambda seed: jax.lax.scan(
        lambda c, s: (c + scf(s, mean, std)[0].sum(), None),
        jnp.zeros(()), jnp.arange(CHAIN))[0])
    t_kernel = timed(kern_cost_only, jnp.int32(7))
    print('kernel_ms', round(t_kernel*1e3,3), file=sys.stderr, flush=True)

    # refit-only: masked reductions over a fixed padded action buffer
    Kp = ((K + 127) // 128) * 128
    costs_fix = jax.random.normal(jax.random.PRNGKey(3), (B, Kp))
    acts_fix = jax.random.normal(jax.random.PRNGKey(4), (B, H, ad, Kp))
    E = max(K // 10, 1)

    def refit(costs, actions):
        lane = jnp.arange(Kp)[None, :]
        costs = jnp.where(lane < K, costs, jnp.finfo(costs.dtype).max)
        _, eidx = jax.lax.top_k(-costs, E)
        mem = jnp.zeros((B, Kp)).at[jnp.arange(B)[:, None], eidx].set(1.0)
        s1 = jnp.einsum('bhdk,bk->bhd', actions, mem)
        s2 = jnp.einsum('bhdk,bhdk,bk->bhd', actions, actions, mem)
        return s1 / E, jnp.maximum(s2 / E - (s1 / E) ** 2, 0.0)

    refit_j = jax.jit(lambda c0: jax.lax.scan(
        lambda c, i: (c + refit(costs_fix + i, acts_fix)[0].sum(), None),
        c0, jnp.arange(CHAIN, dtype=jnp.float32))[0])
    t_refit = timed(refit_j, jnp.zeros(()))
    print('refit_ms', round(t_refit*1e3,3), file=sys.stderr, flush=True)

    # full planner call
    model_fn = lambda s, a: model.forward(params, s, a)
    cost = lambda s, a: (models.smooth_abs_loss(s, goal, w)
                         + models.cosh_loss(a))
    plan = jax.jit(lambda key: jax.lax.scan(
        lambda c, k: (c + planners.cem_batched(
            k, obs, model_fn, cost, horizon=H, action_dim=ad,
            num_candidates=K, num_elites=E, num_iterations=args.cem_iters,
            sample_costs_fn=scf, return_states=False).actions[0].sum(),
            None),
        jnp.zeros(()), jax.random.split(key, CHAIN))[0])
    t_plan = timed(plan, jax.random.PRNGKey(5))

    print(json.dumps({
        'metric': f'plan component timing ({args.task}, {B} envs, '
                  f'K={K}, H={H}, ms per call)',
        'kernel_ms': round(t_kernel * 1e3, 3),
        'refit_ms': round(t_refit * 1e3, 3),
        'cem_batched_ms': round(t_plan * 1e3, 3),
        'cem_ms_per_iter': round(t_plan * 1e3 / args.cem_iters, 3),
    }))


if __name__ == '__main__':
    main()
