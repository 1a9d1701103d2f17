"""Per-part physics timing for the walker bench config, on the real chip.

Times each stage of the vmapped substep at the bench batch size as its
own jitted program (scan-chained x CHAIN to amortize dispatch):
smooth dynamics (FK..CRBA/RNEA), collision+assemble, constraint solve,
full substep, and the observation forward. Prints one JSON line per part.

    python scripts/prof_walker_tpu.py [--envs 1024]
"""

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=1024)
    p.add_argument('--task', default='walker_walk')
    args = p.parse_args()
    B = args.envs

    from mujoco_mbrl_tpu import suite
    from mujoco_mbrl_tpu.physics import collision, engine, smooth, solver

    domain, task_name = args.task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    m = env.model
    meta = smooth.tree_meta(m)
    pairs = collision.candidate_pairs(
        m, include_geom_geom=m.opt.enable_geom_geom_contacts)
    state0, _ = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    phys0 = state0.physics
    acts = jnp.zeros((B, m.nu))

    def chain_scan(one):
        """fold a per-state fn into a CHAIN-long scan over perturbations"""
        def run(s):
            def body(c, i):
                out = one(c)
                # fold a tiny perturbation so XLA can't hoist the body
                return jax.tree_util.tree_map(
                    lambda x: x + 1e-12 * i, c), out
            _, outs = jax.lax.scan(body, s, jnp.arange(CHAIN, dtype=m.opt.timestep.dtype))
            return outs
        return jax.jit(run)

    def smooth_only(s):
        (xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos,
         xanchor, xaxis) = smooth.kinematics(m, s.qpos, meta)
        xipos = smooth.com_positions(m, xpos, xquat)
        cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
        cinert = smooth.body_spatial_inertia(m, xquat, xipos)
        qM = smooth.crba(m, cdof, cinert, meta)
        cvel, cdof_dot = smooth.velocities(m, s.qvel, cdof, meta)
        qfrc_bias = smooth.rnea_bias(m, s.qvel, cdof, cdof_dot, cvel,
                                     cinert, meta, True)
        return qM.sum() + qfrc_bias.sum() + geom_xpos.sum()

    t_smooth = timed(chain_scan(jax.vmap(lambda s: smooth_only(s))), phys0)

    def col_assemble(s):
        (xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos,
         xanchor, xaxis) = smooth.kinematics(m, s.qpos, meta)
        cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
        contact = collision.detect(m, geom_xpos, geom_xmat, pairs)
        cs = solver.assemble(m, meta, s.qpos, s.qvel, cdof, contact,
                             site_xpos=site_xpos)
        return sum(jnp.sum(x) for x in
                   (cs.J.sum(), cs.aref.sum(), cs.R.sum()))

    t_col = timed(chain_scan(jax.vmap(col_assemble)), phys0)

    def full_fwd(s):
        d = engine._forward(m, s, jnp.zeros(m.nu), need_qacc=False)
        return d.qfrc_constraint.sum() + d.qM.sum()

    t_fwd = timed(chain_scan(jax.vmap(full_fwd)), phys0)

    t_step = timed(jax.jit(jax.vmap(
        lambda s: jax.lax.scan(
            lambda c, _: (engine.step(m, c, jnp.zeros(m.nu)), None),
            s, None, length=CHAIN)[0])), phys0)

    def obs_run(phys):
        def body(c, i):
            o = jax.vmap(lambda ph, pr: suite.flatten_observation(
                env._observe(env._model_with(pr), ph, pr)))(
                    c, state0.params)
            return jax.tree_util.tree_map(lambda x: x + 1e-12 * i, c), o.sum()
        _, outs = jax.lax.scan(body, phys,
                               jnp.arange(CHAIN, dtype=jnp.float32))
        return outs

    t_obs = timed(jax.jit(obs_run), phys0)

    print(json.dumps({
        'metric': f'physics part timing ({args.task}, {B} envs, '
                  'ms per vmapped call)',
        'smooth_ms': round(t_smooth * 1e3, 3),
        'collision_assemble_ms': round(t_col * 1e3, 3),
        'forward_with_solve_ms': round(t_fwd * 1e3, 3),
        'full_step_ms': round(t_step * 1e3, 3),
        'obs_forward_ms': round(t_obs * 1e3, 3),
    }))


if __name__ == '__main__':
    main()
