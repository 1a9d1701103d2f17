"""Task-layer parity vs real MuJoCo: obs + reward on the oracle's states.

Drift-free (parity_utils.task_parity_errors): our State is pinned to the
oracle's recorded (qpos, qvel, act) at every control step, so deviations
isolate observation extraction / reward formulas / sensors from
integrator differences.

Measured 2026-08: every observation key and every reward across all 45
tasks agrees to float32 precision (<= ~2e-6), with one documented class
of exceptions — CONTACT-FORCE-DERIVED sensors (touch, quadruped
force_torque / imu-accelerometer, rangefinder on terrain). Those read the
constraint solver's forces, which are discontinuous in grazing contacts:
a boundary contact active in one engine and not the other flips a large
force on or off at a handful of steps. The per-key tolerances below
bound that noise; kinematic/velocity observations stay exact.
(quadruped force_torque additionally approximates mjSENS_FORCE by net
contact force — suite/sensors.py:force_site docstring.)
"""

import os

import numpy as np
import pytest

from parity_utils import load_our_env, task_parity_errors

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), 'fixtures', 'parity')

DEFAULT_TOL = 1e-4
# per-(domain, key) tolerance overrides: contact-force-derived sensors
FORCE_SENSOR_TOL = {
    ('finger', 'touch'): 4.0,
    ('hopper', 'touch'): 0.3,
    ('manipulator', 'touch'): 4.0,
    ('stacker', 'touch'): 4.0,
    ('ball_in_cup', 'touch'): 0.5,
    ('quadruped', 'force_torque'): 20.0,
    ('quadruped', 'imu'): 20.0,
    ('quadruped', 'rangefinder'): 1.5,
}

_HEAVY_DOMAINS = {'humanoid_cmu', 'manipulator', 'stacker', 'quadruped',
                  'swimmer', 'humanoid'}
_RUN_HEAVY = os.environ.get('RUN_HEAVY', '') == '1'


def _cases():
    import mujoco_mbrl_tpu.suite as suite
    out = []
    for domain, task in suite.all_tasks():
        if domain in _HEAVY_DOMAINS and not _RUN_HEAVY:
            continue
        out.append((domain, task))
    return out


@pytest.mark.parametrize('domain,task', _cases())
def test_obs_and_reward_match_oracle(domain, task):
    path = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
    if not os.path.exists(path):
        pytest.skip('parity fixture not generated')
    fix = np.load(path, allow_pickle=False)
    env = load_our_env(domain, task)
    errors = task_parity_errors(env, fix)
    failures = []
    for key, err in errors.items():
        if not isinstance(err, float):
            failures.append(f'{key}: {err[0]}')
            continue
        tol = FORCE_SENSOR_TOL.get((domain, key), DEFAULT_TOL)
        if err > tol:
            failures.append(f'{key}: max err {err:.3e} > tol {tol:g}')
    assert not failures, (
        f'{domain}:{task} task-layer deviates from dm_control oracle:\n  '
        + '\n  '.join(failures))
