"""Model-constants parity report: our compiled models vs recorded mjModel.

Prints every field mismatch per task so deltas can be triaged into
(a) transcription bugs in our suite XMLs -> fix, or (b) upstream
dm_control-1.0.43-vs-reference-snapshot changes -> documented exceptions
in tests/test_parity_model.py.

Run:  python scripts/parity_report.py [--tasks walker:walk ...]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           'tests', 'fixtures', 'parity')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tasks', nargs='*', default=None)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import mujoco_mbrl_tpu.suite as suite
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    'tests'))
    from parity_utils import compare_models, load_our_env

    tasks = suite.all_tasks()
    if args.tasks:
        sel = {tuple(t.split(':')) for t in args.tasks}
        tasks = [t for t in tasks if t in sel]

    total_fields = 0
    for domain, task in tasks:
        path = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
        if not os.path.exists(path):
            print(f'== {domain}:{task}: NO FIXTURE')
            continue
        fix = np.load(path, allow_pickle=False)
        try:
            env = load_our_env(domain, task)
        except Exception as e:  # noqa: BLE001
            print(f'== {domain}:{task}: LOAD FAILED {e!r}')
            continue
        mismatches = compare_models(env.model, fix)
        total_fields += len(mismatches)
        status = 'OK' if not mismatches else f'{len(mismatches)} mismatches'
        print(f'== {domain}:{task}: {status}')
        for mm in mismatches:
            print(f'   {mm}')
    print(f'\ntotal mismatching fields: {total_fields}')


if __name__ == '__main__':
    main()
