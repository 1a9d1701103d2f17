"""Time the XLA glue around the fused sampling kernel, piece by piece.

The plan phase = kernel + [slice] + top_k + member scatter + refit
einsums, per CEM iteration. This times each piece as its own jitted
scan-chained program at bench shapes to find where the per-iteration
glue time goes, plus a bisection-threshold alternative to top_k.

    python scripts/prof_glue.py [--B 1024] [--K 1000]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

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


def chain(fn):
    """scan fn over CHAIN perturbed copies of the input tensors."""
    def run(*args):
        def body(c, i):
            outs = fn(*[a + (1e-12 * i if a.dtype.kind == 'f' else 0)
                        for a in c])
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in
                    jax.tree_util.tree_leaves(outs))
            return c, s
        _, outs = jax.lax.scan(body, args,
                               jnp.arange(CHAIN, dtype=jnp.float32))
        return outs
    return jax.jit(run)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--B', type=int, default=1024)
    p.add_argument('--K', type=int, default=1000)
    p.add_argument('--H', type=int, default=30)
    p.add_argument('--ad', type=int, default=6)
    p.add_argument('--E', type=int, default=100)
    args = p.parse_args()
    B, K, H, ad, E = args.B, args.K, args.H, args.ad, args.E
    Kp = ((K + 127) // 128) * 128

    key = jax.random.PRNGKey(0)
    costs = jax.random.uniform(key, (B, Kp))
    acts = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, ad, Kp))

    res = {}

    # slice back to K lanes (the copy return_padded removes)
    res['slice_ms'] = round(timed(
        chain(lambda a: (a[..., :K],)), acts) * 1e3, 3)

    # top_k + member scatter
    def topk_member(c):
        _, idx = jax.lax.top_k(-c, E)
        mem = jnp.zeros_like(c).at[jnp.arange(B)[:, None], idx].set(1.0)
        return (mem,)
    res['topk_member_ms'] = round(timed(chain(topk_member), costs) * 1e3, 3)

    # bisection threshold + mask (top_k alternative)
    def bisect_member(c):
        lo = jnp.min(c, axis=1)
        hi = jnp.max(c, axis=1)

        def bis(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(jnp.where(c <= mid[:, None], 1.0, 0.0), axis=1)
            take = cnt >= E
            return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 48, bis, (lo, hi))
        mem = jnp.where(c <= hi[:, None], 1.0, 0.0)
        return (mem,)
    res['bisect_member_ms'] = round(
        timed(chain(bisect_member), costs) * 1e3, 3)

    # the two refit einsums over the big action tensor
    mem = jnp.where(costs < 0.1, 1.0, 0.0)

    def refit(a, mem):
        s1 = jnp.einsum('bhdk,bk->bhd', a, mem)
        s2 = jnp.einsum('bhdk,bhdk,bk->bhd', a, a, mem)
        return (s1, s2)
    res['refit_einsum_ms'] = round(
        timed(chain(refit), acts, mem) * 1e3, 3)

    # masked-reduce refit (grouped-layout formulation, G=1 shapes)
    def refit_reduce(a, mem):
        m4 = mem[:, None, None, :]
        s1 = jnp.sum(a * m4, axis=-1)
        s2 = jnp.sum(a * a * m4, axis=-1)
        return (s1, s2)
    res['refit_reduce_ms'] = round(
        timed(chain(refit_reduce), acts, mem) * 1e3, 3)

    print(json.dumps({'metric': f'plan glue timing (B={B}, Kp={Kp})',
                      **res}))


if __name__ == '__main__':
    main()
