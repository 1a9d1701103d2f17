"""Distributional parity fixtures for the contact-rich domains.

The short-horizon trajectory fixtures (gen_parity_fixtures.py) constrain
the hardest physics only weakly — humanoid agrees for 10 physics steps,
quadruped:fetch for 4 — because contact-rich trajectories are chaotic.
The reference-grade complement (VERDICT r2 item #5) is STATISTICAL: an
ensemble of seeded episodes under a fixed random policy, summarized by
per-seed statistics whose distributions a correct engine must reproduce
even though individual trajectories diverge.

Per task, for N_SEEDS seeds, real MuJoCo (mujoco 3.x via dm_control)
records over N_STEPS control steps:

* ``returns``      — sum of task rewards (reward formulas + contact
                     dynamics end-to-end)
* ``speed``        — mean ||qvel||_2 (energy scale of the motion)
* ``disp``         — mean ||qpos - qpos_reset||_2 (configuration drift)
* ``contact_frac`` — fraction of control steps with >= 1 active contact
                     (how often the constraint solver is loaded)

tests/test_parity_stat.py runs the SAME protocol on our engine (its own
PRNG — the comparison is distribution-to-distribution, not seed-to-seed)
and asserts the means agree within combined standard errors.

Run:  python scripts/gen_parity_stat_fixtures.py [--tasks humanoid:walk ...]
"""

import argparse
import os
import sys

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           'tests', 'fixtures', 'parity_stat')

N_SEEDS = 20
N_STEPS = 50

# the six weakest short-horizon agreements (test_parity_physics.py
# THRESHOLDS/HEAVY_THRESHOLDS <= 14 physics steps)
TASKS = [
    ('humanoid', 'walk'),
    ('quadruped', 'fetch'),
    ('stacker', 'stack_2'),
    ('manipulator', 'bring_ball'),
    ('manipulator', 'insert_ball'),
    ('point_mass', 'hard'),
]


def run_task(domain, task):
    from dm_control import suite as dm_suite

    returns = np.zeros(N_SEEDS)
    speed = np.zeros(N_SEEDS)
    disp = np.zeros(N_SEEDS)
    contact_frac = np.zeros(N_SEEDS)
    for seed in range(N_SEEDS):
        env = dm_suite.load(domain, task, task_kwargs={'random': seed})
        spec = env.action_spec()
        lo = np.clip(np.where(np.isfinite(spec.minimum), spec.minimum,
                              -1.0), -1.0, 1.0)
        hi = np.clip(np.where(np.isfinite(spec.maximum), spec.maximum,
                              1.0), -1.0, 1.0)
        rng = np.random.RandomState(1000 + seed)
        ts = env.reset()
        qpos0 = np.array(env.physics.data.qpos, copy=True)
        ret = sp = dp = cf = 0.0
        for _ in range(N_STEPS):
            a = rng.uniform(lo, hi, size=spec.shape)
            ts = env.step(a)
            ret += float(ts.reward or 0.0)
            qv = np.asarray(env.physics.data.qvel)
            qp = np.asarray(env.physics.data.qpos)
            sp += float(np.linalg.norm(qv))
            dp += float(np.linalg.norm(qp - qpos0))
            cf += float(env.physics.data.ncon > 0)
        returns[seed] = ret
        speed[seed] = sp / N_STEPS
        disp[seed] = dp / N_STEPS
        contact_frac[seed] = cf / N_STEPS
    return dict(returns=returns, speed=speed, disp=disp,
                contact_frac=contact_frac)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tasks', nargs='*', default=None,
                    help='domain:task overrides, e.g. humanoid:walk')
    args = ap.parse_args()
    tasks = ([tuple(t.split(':')) for t in args.tasks]
             if args.tasks else TASKS)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for domain, task in tasks:
        print(f'generating {domain}:{task} ...', flush=True)
        stats = run_task(domain, task)
        out = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
        np.savez_compressed(out, n_seeds=N_SEEDS, n_steps=N_STEPS, **stats)
        print('  ', {k: f'{v.mean():.3f}+-{v.std():.3f}'
                     for k, v in stats.items()})
    return 0


if __name__ == '__main__':
    sys.exit(main())
