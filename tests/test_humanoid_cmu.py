"""humanoid_CMU domain tests.

The 62-dof CMU skeleton compiles in ~20 s on the TPU backend but
XLA:CPU's scheduler takes tens of minutes on its deep kinematic chain, so
only trace-free model/structure checks run on CPU CI; the dynamics
rollout (verified on TPU hardware) runs with RUN_HEAVY=1.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import mjcf
from mujoco_mbrl_tpu.suite import humanoid_cmu

_RUN_HEAVY = os.environ.get('RUN_HEAVY', '') == '1'


def test_model_layout_matches_reference():
    """Sizes must match dm_control humanoid_CMU: 63 qpos (free root + 56
    hinges), 62 dofs, 56 motors."""
    m = mjcf.parse(humanoid_cmu._make_xml())
    assert m.nq == 63 and m.nv == 62 and m.nu == 56
    assert m.nbody == 32                    # world + 31 skeleton bodies
    # every motor drives the identically-named joint
    for (name, gear), u in zip(humanoid_cmu._MOTORS, range(m.nu)):
        j = m.actuator_trnid[u]
        assert m.names['joint'][name] == j
        assert float(m.actuator_gear[u]) == gear


def test_contact_excludes_respected():
    from mujoco_mbrl_tpu.physics import collision
    m = mjcf.parse(humanoid_cmu._make_xml())
    pairs = collision.candidate_pairs(m, include_geom_geom=True)
    lclav = m.name2id('body', 'lclavicle')
    rclav = m.name2id('body', 'rclavicle')
    for g1, g2 in pairs:
        bodies = {m.geom_body[g1], m.geom_body[g2]}
        assert bodies != {lclav, rclav}, 'excluded pair leaked through'


def test_tasks_registered():
    tasks = dict(suite.all_tasks())
    assert ('humanoid_cmu', 'stand') in suite.all_tasks()
    assert ('humanoid_cmu', 'run') in suite.all_tasks()
    env = suite.load('humanoid_cmu', 'stand')
    assert env.action_spec().shape == (56,)


@pytest.mark.skipif(not _RUN_HEAVY, reason='XLA:CPU compile of the '
                    '62-dof chain takes tens of minutes; run on TPU or '
                    'with RUN_HEAVY=1')
def test_rollout_finite():
    env = suite.load('humanoid_cmu', 'stand')
    m = env.model
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert ts.observation['joint_angles'].shape == (56,)
    assert ts.observation['extremities'].shape == (12,)

    @jax.jit
    def roll(s):
        def body(st, _):
            st, ts = env.step(st, jnp.zeros(m.nu))
            return st, ts.reward
        return jax.lax.scan(body, s, None, length=100)

    out, rews = roll(state)
    assert np.isfinite(np.asarray(rews)).all()
    assert np.isfinite(np.asarray(out.physics.qpos)).all()
