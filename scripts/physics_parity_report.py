"""Physics-trajectory parity report: our engine vs recorded real-MuJoCo.

For each task fixture, re-simulates the oracle's physics rollout (same
start state, same ctrl sequence, same substep count) with our engine and
reports how many physics steps stay within tolerance bands, plus the
deviation profile. Used to calibrate the per-task thresholds asserted by
``tests/test_parity_physics.py``.

Run:  python scripts/physics_parity_report.py [--tasks walker:walk ...]
      [--x64] [--steps N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           'tests', 'fixtures', 'parity')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tasks', nargs='*', default=None)
    ap.add_argument('--skip', nargs='*', default=None,
                    help='domain names to skip')
    ap.add_argument('--tpu', action='store_true',
                    help='run on the default (TPU) backend instead of '
                         'CPU — compiles are much faster there for the '
                         'deep humanoid_cmu model')
    ap.add_argument('--steps', type=int, default=None)
    ap.add_argument('--x64', action='store_true',
                    help='run our engine in float64')
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
    if args.x64:
        jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    import mujoco_mbrl_tpu.suite as suite
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    'tests'))
    from parity_utils import load_our_env, our_physics_rollout, steps_within

    tasks = suite.all_tasks()
    if args.tasks:
        sel = {tuple(t.split(':')) for t in args.tasks}
        tasks = [t for t in tasks if t in sel]
    if args.skip:
        tasks = [t for t in tasks if t[0] not in set(args.skip)]

    dtype = jnp.float64 if args.x64 else jnp.float32
    for domain, task in tasks:
        path = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
        if not os.path.exists(path):
            print(f'== {domain}:{task}: NO FIXTURE')
            continue
        fix = np.load(path, allow_pickle=False)
        t0 = time.time()
        try:
            env = load_our_env(domain, task)
            qpos, qvel = our_physics_rollout(env, fix, n_steps=args.steps,
                                             dtype=dtype)
        except Exception as e:  # noqa: BLE001
            print(f'== {domain}:{task}: ROLLOUT FAILED {e!r}', flush=True)
            continue
        n = qpos.shape[0]
        oracle = np.asarray(fix['p_qpos'])[:n]
        line = [f'== {domain}:{task}: {n - 1} steps,'
                f' compile+run {time.time() - t0:.1f}s']
        for tol in (1e-4, 1e-3, 1e-2):
            k, dev = steps_within(qpos, oracle, tol)
            line.append(f'  within {tol:g}: {k}/{n}')
        _, dev = steps_within(qpos, oracle, np.inf)
        line.append(f'  final max|Δqpos|={dev[-1]:.3e}  '
                    f'max over traj={dev.max():.3e}')
        print('\n'.join(line), flush=True)


if __name__ == '__main__':
    main()
