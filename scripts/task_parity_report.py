"""Task-layer parity report: our obs/reward on the oracle's states.

Drift-free comparison (see parity_utils.task_parity_errors): for every
recorded control step our State is pinned to the oracle's, so any
deviation is an observation-extraction / reward-formula / sensor bug, not
integrator divergence. Calibrates tests/test_parity_task.py thresholds.

Run:  python scripts/task_parity_report.py [--tasks walker:walk ...]
"""

import argparse
import os
import sys

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
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
    import mujoco_mbrl_tpu.suite as suite
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    'tests'))
    from parity_utils import load_our_env, task_parity_errors

    tasks = suite.all_tasks()
    if args.tasks:
        sel = {tuple(t.split(':')) for t in args.tasks}
        tasks = [t for t in tasks if t in sel]
    if args.skip:
        tasks = [t for t in tasks if t[0] not in set(args.skip)]

    for domain, task in tasks:
        path = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
        if not os.path.exists(path):
            print(f'== {domain}:{task}: NO FIXTURE')
            continue
        fix = np.load(path, allow_pickle=False)
        try:
            env = load_our_env(domain, task)
            errors = task_parity_errors(env, fix)
        except Exception as e:  # noqa: BLE001
            print(f'== {domain}:{task}: FAILED {e!r}', flush=True)
            continue
        worst = max((v for v in errors.values()
                     if isinstance(v, float)), default=0.0)
        print(f'== {domain}:{task}: worst {worst:.3e}', flush=True)
        for k, v in sorted(errors.items()):
            if isinstance(v, float):
                flag = '  <-- ' if v > 1e-4 else ''
                print(f'   {k}: {v:.3e}{flag}')
            else:
                print(f'   {k}: {v[0]}')


if __name__ == '__main__':
    main()
