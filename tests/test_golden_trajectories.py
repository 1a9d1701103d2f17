"""Golden seeded-trajectory regression fixtures.

The reference pins rendering behavior with golden frame sequences
(``dm_control/dm_control/mujoco/testing/image_utils.py:162-186``); here the
physics itself is pinned: fixed-seed rollouts are stored as .npz fixtures
and future engine changes must reproduce them within float tolerance.
Regenerate intentionally with:  python tests/test_golden_trajectories.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), 'fixtures')

# light, contact-free + contact-bearing coverage
TASKS = [('pendulum', 'swingup'), ('cartpole', 'swingup'),
         ('reacher', 'easy'), ('point_mass', 'easy'),
         ('walker', 'stand'), ('hopper', 'stand')]
N_STEPS = 15
SEED = 1234


def _rollout(domain, task):
    from mujoco_mbrl_tpu import suite
    env = suite.load(domain, task)
    key = jax.random.PRNGKey(SEED)
    state, ts = jax.jit(env.reset)(key)
    spec = env.action_spec()
    lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
    hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
    actions = jax.random.uniform(jax.random.fold_in(key, 1),
                                 (N_STEPS,) + spec.shape,
                                 minval=lo, maxval=hi)

    def body(s, a):
        s, ts = env.step(s, a)
        return s, (s.physics.qpos, ts.reward)

    _, (qpos, rewards) = jax.jit(
        lambda s, a: jax.lax.scan(body, s, a))(state, actions)
    return np.asarray(qpos), np.asarray(rewards)


def _fixture_path(domain, task, backend=None):
    """Per-backend golden files, like the reference pins per-renderer
    golden frames (dm_control/mujoco/testing/image_utils.py:64-90,
    separate hashes per rendering backend). Contact-bearing rollouts
    (walker/hopper) amplify TPU-vs-CPU rounding past any tolerance tight
    enough to be a useful regression pin, so each backend pins its own
    trajectory: golden_<d>_<t>.npz for cpu, golden_<d>_<t>.tpu.npz etc.
    """
    backend = backend or jax.default_backend()
    if backend != 'cpu':
        backend = 'tpu'  # the axon tunnel plugin reports its own name
    suffix = '' if backend == 'cpu' else f'.{backend}'
    return os.path.join(FIXTURE_DIR, f'golden_{domain}_{task}{suffix}.npz')


@pytest.mark.parametrize('domain,task', TASKS)
def test_matches_golden(domain, task):
    path = _fixture_path(domain, task)
    if not os.path.exists(path):
        # contact-free tasks reproduce the CPU golden on every backend
        # within tolerance; fall back so only contact-bearing tasks need
        # a backend-specific pin.
        path = _fixture_path(domain, task, backend='cpu')
    if not os.path.exists(path):
        pytest.skip('fixture not generated yet')
    golden = np.load(path)
    qpos, rewards = _rollout(domain, task)
    np.testing.assert_allclose(qpos, golden['qpos'], rtol=2e-4, atol=2e-5,
                               err_msg=f'{domain}/{task} qpos drifted '
                                       'from golden fixture')
    np.testing.assert_allclose(rewards, golden['rewards'], rtol=2e-4,
                               atol=2e-5)


def generate():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for domain, task in TASKS:
        qpos, rewards = _rollout(domain, task)
        np.savez(_fixture_path(domain, task), qpos=qpos, rewards=rewards)
        print(f'wrote {_fixture_path(domain, task)}')


if __name__ == '__main__':
    generate()
