"""Microbenchmark the fused planning kernels in isolation (no physics).

Times one full plan's worth of kernel work (cem_iters x sampling kernel,
or one fused-CEM launch) at the production walker shapes, for each
sampler / dtype / kernel variant. Prints one JSON line per config.

    python scripts/kernel_bench.py [--B 128] [--K 1000] [--H 30]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mujoco_mbrl_tpu import models  # noqa: E402
from mujoco_mbrl_tpu.ops import (  # noqa: E402
                                 mlp_sample_rollout_costs)


CHAIN = 10   # plans chained inside one jit: amortizes the per-dispatch
             # tunnel latency exactly like the production scan does


def timed(fn, *args, repeats=10):
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
    p.add_argument('--B', type=int, default=128)
    p.add_argument('--K', type=int, default=1000)
    p.add_argument('--H', type=int, default=30)
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--sd', type=int, default=24)
    p.add_argument('--ad', type=int, default=6)
    args = p.parse_args()
    B, K, H, sd, ad = args.B, args.K, args.H, args.sd, args.ad

    model = models.MLPDynamics(sd, ad, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(sd)
    weights = jnp.ones(sd)
    s0 = jax.random.normal(jax.random.PRNGKey(2), (B, sd))
    mean = jnp.zeros((B, H, ad))
    std = jnp.full((B, H, ad), 0.5)

    for sampler in ('normal', 'triangular'):
        for dt in (None, jnp.bfloat16):
            def plan(seed, sampler=sampler, dt=dt):
                acc = jnp.zeros(())
                for i in range(args.iters):
                    c, _ = mlp_sample_rollout_costs(
                        params, seed + i, s0, mean, std, goal, weights,
                        num_candidates=K, sampler=sampler,
                        compute_dtype=dt)
                    acc = acc + c.sum()
                return acc

            f = jax.jit(lambda seed: jax.lax.scan(
                lambda c, s: (c + plan(s), None), jnp.zeros(()),
                seed + jnp.arange(CHAIN))[0])
            t = timed(f, 7)
            print(json.dumps({'kernel': 'sample', 'sampler': sampler,
                              'dtype': 'bf16' if dt else 'f32',
                              'B': B, 'ms_per_plan': round(t * 1e3, 2),
                              'ms_per_iter': round(t * 1e3 / args.iters,
                                                   2)}), flush=True)
    # horizon-loop unroll sweep on the fastest config
    for unroll in (1, H):   # Mosaic fori_loop supports 1 or full unroll
        if H % unroll:
            continue

        def plan_u(seed, unroll=unroll):
            acc = jnp.zeros(())
            for i in range(args.iters):
                c, _ = mlp_sample_rollout_costs(
                    params, seed + i, s0, mean, std, goal, weights,
                    num_candidates=K, sampler='triangular',
                    unroll=unroll)
                acc = acc + c.sum()
            return acc

        f = jax.jit(lambda seed: jax.lax.scan(
            lambda c, s: (c + plan_u(s), None), jnp.zeros(()),
            seed + jnp.arange(CHAIN))[0])
        t = timed(f, 7)
        print(json.dumps({'kernel': 'sample', 'sampler': 'triangular',
                          'dtype': 'f32', 'unroll': unroll, 'B': B,
                          'ms_per_plan': round(t * 1e3, 2),
                          'ms_per_iter': round(t * 1e3 / args.iters, 2)}),
              flush=True)


if __name__ == '__main__':
    main()
