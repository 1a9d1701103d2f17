"""Cross-engine physics-trajectory parity vs real MuJoCo.

From the oracle's recorded post-reset state, our engine re-simulates the
recorded ctrl sequence at substep granularity and the qpos trajectory
must stay within a per-task tolerance band for a per-task number of
physics steps (fixtures: scripts/gen_parity_fixtures.py; calibration:
scripts/physics_parity_report.py — thresholds here are ~half the
measured agreement horizon, so genuine regressions fail while chaotic
divergence noise does not).

Observed behavior (2026-08, mujoco 3.10 oracle, f32 engine):

* contact-free tasks track to ~4e-7 over the whole 50-step horizon;
* contact-rich locomotion (walker/hopper/cheetah/fish/finger) stays
  within 1e-3 for 40-100 physics steps — the constraint model
  (pyramidal facets, invweight0 regularizers) matches, and residual
  drift is f32 + fixed-iteration-solver noise amplified by contact
  chaos;
* humanoid (falling, many simultaneous contacts) agrees tightly for the
  first ~10 steps then Lyapunov-amplifies; the short-horizon bound is
  the meaningful check there.
"""

import os

import numpy as np
import pytest

from parity_utils import load_our_env, our_physics_rollout, steps_within

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), 'fixtures', 'parity')

# (domain, task) -> (min physics steps within tol, tol)
THRESHOLDS = {
    ('acrobot', 'swingup'): (50, 1e-4),
    ('acrobot', 'swingup_sparse'): (50, 1e-4),
    ('ball_in_cup', 'catch'): (100, 1e-4),
    ('cartpole', 'balance'): (50, 1e-4),
    ('cartpole', 'balance_sparse'): (50, 1e-4),
    ('cartpole', 'swingup'): (50, 1e-4),
    ('cartpole', 'swingup_sparse'): (50, 1e-4),
    ('cartpole', 'two_poles'): (50, 1e-4),
    ('cartpole', 'three_poles'): (50, 1e-4),
    ('cheetah', 'run'): (40, 1e-3),
    ('finger', 'spin'): (35, 1e-3),
    ('finger', 'turn_easy'): (40, 1e-3),
    ('finger', 'turn_hard'): (40, 1e-3),
    ('fish', 'upright'): (100, 1e-3),
    ('fish', 'swim'): (100, 1e-3),
    ('hopper', 'stand'): (60, 1e-3),
    ('hopper', 'hop'): (60, 1e-3),
    ('humanoid', 'stand'): (10, 1e-3),
    ('humanoid', 'walk'): (10, 1e-3),
    ('humanoid', 'run'): (10, 1e-3),
    ('humanoid', 'run_pure_state'): (10, 1e-3),
    ('pendulum', 'swingup'): (50, 1e-4),
    ('point_mass', 'easy'): (50, 1e-4),
    # point_mass:hard randomizes the actuator-mixing tendon gains per
    # episode (wrap_prm); the physics fixtures don't capture that model
    # override, so the ctrl-driven rollout legitimately differs. The
    # task layer (obs/reward) is covered by test_parity_task.
    ('point_mass', 'hard'): (3, 1e-3),
    ('reacher', 'easy'): (50, 1e-4),
    ('reacher', 'hard'): (50, 1e-4),
    ('walker', 'stand'): (100, 1e-3),
    ('walker', 'walk'): (100, 1e-3),
    ('walker', 'run'): (100, 1e-3),
}

# calibrated separately (heavy CPU compiles); run with RUN_HEAVY=1 or on
# the TPU backend where compilation is fast
HEAVY_THRESHOLDS = {
    # tracks ~1e-6 for 20+ steps once the weld-aware contact filter and
    # the solver's active-set masking landed (round 5); 50 leaves head-
    # room for f32 toe-limit chaos after step ~60
    ('humanoid_cmu', 'stand'): (50, 1e-3),
    ('humanoid_cmu', 'run'): (50, 1e-3),
    ('lqr', 'lqr_2_1'): (50, 1e-4),
    ('lqr', 'lqr_6_2'): (50, 1e-4),
    ('manipulator', 'bring_ball'): (8, 1e-3),
    ('manipulator', 'bring_peg'): (55, 1e-3),
    ('manipulator', 'insert_ball'): (8, 1e-3),
    ('manipulator', 'insert_peg'): (55, 1e-3),
    ('quadruped', 'walk'): (14, 1e-3),
    ('quadruped', 'run'): (14, 1e-3),
    ('quadruped', 'escape'): (12, 1e-3),
    ('quadruped', 'fetch'): (4, 1e-2),
    ('stacker', 'stack_2'): (9, 1e-3),
    ('stacker', 'stack_4'): (9, 1e-3),
    ('swimmer', 'swimmer6'): (90, 1e-3),
    ('swimmer', 'swimmer15'): (90, 1e-3),
}

_RUN_HEAVY = os.environ.get('RUN_HEAVY', '') == '1'

# TPU-backend calibration (r05): cases whose f32 rounding drift on the
# MXU exceeds the CPU-calibrated band while remaining bounded. Measured
# full profiles (scripts: /tmp/r05_drift.py pattern, 2026-08-21):
#   manipulator peg tasks — deviation OSCILLATES in a ~1.5e-3 band
#     (peak 1.19e-3 @ step 17, dip 2.8e-5 @ 32, 1.47e-3 @ 55): bounded
#     phase lag, not divergence; CPU passes the same 55 steps at 1e-3.
#   swimmer15 — the 15-link chain is chaotic; drift grows smoothly to
#     1e-3 by step 48, then a contact event at step 55 kicks it to
#     8e-3. CPU holds 1e-3 for the full 90; on TPU require the
#     pre-event horizon.
_TPU_OVERRIDES = {
    ('manipulator', 'bring_peg'): (55, 2e-3),
    ('manipulator', 'insert_peg'): (55, 2e-3),
    ('swimmer', 'swimmer15'): (45, 1e-3),
}


def _on_tpu():
    import jax
    return jax.default_backend() not in ('cpu',)


def _cases():
    heavy = dict(HEAVY_THRESHOLDS)
    if _on_tpu():
        heavy.update(_TPU_OVERRIDES)
    cases = [(d, t, n, tol) for (d, t), (n, tol) in THRESHOLDS.items()]
    if _RUN_HEAVY:
        cases += [(d, t, n, tol) for (d, t), (n, tol) in heavy.items()]
    return cases


@pytest.mark.parametrize('domain,task,min_steps,tol', _cases())
def test_trajectory_tracks_oracle(domain, task, min_steps, tol):
    path = os.path.join(FIXTURE_DIR, f'{domain}_{task}.npz')
    if not os.path.exists(path):
        pytest.skip('parity fixture not generated')
    fix = np.load(path, allow_pickle=False)
    env = load_our_env(domain, task)
    qpos, _ = our_physics_rollout(env, fix, n_steps=min_steps)
    k, dev = steps_within(qpos, np.asarray(fix['p_qpos']), tol)
    assert k >= min(min_steps, qpos.shape[0] - 1), (
        f'{domain}:{task} diverged from real-MuJoCo trajectory after '
        f'{k} physics steps (require {min_steps} within {tol}); '
        f'deviation profile tail: {dev[max(k - 2, 0):k + 3]}')
