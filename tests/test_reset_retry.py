"""Bad-init retry in Environment.reset (composer/environment.py:308-318).

Under lockstep vmap a failed episode init cannot raise, so reset() with
max_reset_attempts=N draws up to N candidate inits and keeps the first
finite one (where-masked). The default N=1 preserves single-attempt
suite semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu.physics import mjcf, make_state
from mujoco_mbrl_tpu.suite import base, control

_XML = """
<mujoco model='m'>
  <option timestep='0.01'/>
  <worldbody>
    <body name='b' pos='0 0 1'>
      <joint name='j' type='hinge' axis='0 1 0' limited='false'/>
      <geom name='g' type='sphere' size='.1'/>
    </body>
  </worldbody>
</mujoco>"""


class _FlakyInit(base.Task):
    """Produces a NaN qpos unless the drawn uniform clears a threshold
    (mimics composer tasks whose randomized inits sometimes fail)."""

    OBSERVES_ACC = False

    def __init__(self, fail_prob):
        self._fail_prob = fail_prob

    def initialize_episode(self, model, key):
        u = jax.random.uniform(key)
        st = make_state(model)
        qpos = jnp.where(u < self._fail_prob,
                         jnp.full_like(st.qpos, jnp.nan), st.qpos)
        return st.replace(qpos=qpos), ()

    def get_observation(self, model, phys, data):
        return {'pos': phys.qpos}

    def get_reward(self, model, phys, data, ctrl):
        return jnp.zeros(())


def _count_bad(env, n=64):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, _ = jax.jit(jax.vmap(env.reset))(keys)
    return int((~np.isfinite(np.asarray(states.physics.qpos))).any(axis=-1)
               .sum())


def test_default_single_attempt_keeps_failures():
    m = mjcf.parse(_XML)
    env = control.Environment(m, _FlakyInit(0.5))
    assert _count_bad(env) > 10          # ~half fail with no retries


def test_retries_rescue_bad_inits():
    m = mjcf.parse(_XML)
    env = control.Environment(m, _FlakyInit(0.5), max_reset_attempts=6)
    # P(all 6 draws bad) = 0.5^6; with 64 envs expect ~1 residual failure
    assert _count_bad(env) <= 3


def test_good_inits_unchanged_by_retry_config():
    m = mjcf.parse(_XML)
    env1 = control.Environment(m, _FlakyInit(0.0))
    env6 = control.Environment(m, _FlakyInit(0.0), max_reset_attempts=6)
    k = jax.random.PRNGKey(7)
    s1, _ = env1.reset(k)
    s6, _ = env6.reset(k)
    np.testing.assert_array_equal(np.asarray(s1.physics.qpos),
                                  np.asarray(s6.physics.qpos))
