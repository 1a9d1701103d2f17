"""Regression tests for the round-5 review findings: wrapper
step_with_data forwarding, buffered-pipeline step_with_data, schema
type-checking of misplaced elements, and per-instance observable
enabling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import composer, locomotion, suite
from mujoco_mbrl_tpu.physics import builder
from mujoco_mbrl_tpu.suite.wrappers import ActionNoiseWrapper, PixelWrapper


def test_action_noise_applies_on_step_with_data():
    """step_with_data must go through the wrapper's noise injection,
    not __getattr__-forward to the raw env (silent no-noise bug)."""
    env = suite.load('pendulum', 'swingup')
    noisy = ActionNoiseWrapper(env, scale=0.5)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    a = jnp.zeros(env.action_spec().shape)
    key = jax.random.PRNGKey(3)

    raw_state, _, _ = jax.jit(env.step_with_data)(state, a)
    noz_state, _, _ = jax.jit(
        lambda s, act: noisy.step_with_data(s, act, key=key))(state, a)
    # with scale=0.5 noise the physics must differ from the zero-action
    # step; and must match stepping the noisy action through the raw env
    assert not np.allclose(np.asarray(raw_state.physics.qvel),
                           np.asarray(noz_state.physics.qvel))
    lo, hi = noisy._minimum, noisy._maximum
    expl = jnp.clip(a + noisy._std * jax.random.normal(key, a.shape),
                    lo, hi)
    ref_state, _, _ = jax.jit(env.step_with_data)(state, expl)
    np.testing.assert_allclose(np.asarray(ref_state.physics.qvel),
                               np.asarray(noz_state.physics.qvel))


def test_pixel_wrapper_step_with_data_adds_pixels():
    env = suite.load('pendulum', 'swingup')
    wrapped = PixelWrapper(env, pixels_only=False, height=16, width=16)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    a = jnp.zeros(env.action_spec().shape)
    _, ts, data = jax.jit(wrapped.step_with_data)(state, a)
    assert 'pixels' in ts.observation
    assert ts.observation['pixels'].shape == (16, 16, 3)
    assert data.xpos.shape[0] == env.model.nbody


def test_buffered_env_step_with_data():
    """BufferedEnvironment.step_with_data must run the buffer pipeline
    with the dict state (no __getattr__ leak of the raw env)."""
    from mujoco_mbrl_tpu.observation import (BufferedEnvironment,
                                             ObservableSpec)
    env = suite.load('pendulum', 'swingup')
    specs = {'orientation': ObservableSpec(delay=2)}
    buf = BufferedEnvironment(env, specs)
    state, ts0 = buf.reset(jax.random.PRNGKey(0))
    a = jnp.ones(env.action_spec().shape)
    state2, ts, data = buf.step_with_data(state, a)
    assert set(state2) == {'inner', 'buffers', 'key'}
    # delay=2: after one step the delayed observable still reads the
    # reset-time sample
    np.testing.assert_allclose(np.asarray(ts.observation['orientation']),
                               np.asarray(ts0.observation['orientation']))
    assert data.xpos.shape[0] == env.model.nbody


def test_schema_typechecks_misplaced_known_tag():
    """A known tag in the wrong place still gets its attribute values
    type-checked in document mode."""
    xml = ("<mujoco><worldbody>"
           "<joint name='j' pos='not a number'/>"
           "</worldbody></mujoco>")
    from mujoco_mbrl_tpu.physics.schema import SchemaError
    with pytest.raises(SchemaError):
        builder.RootElement.from_xml_string(xml)


def test_enable_observable_per_instance():
    from mujoco_mbrl_tpu.locomotion import walkers
    w_on = walkers.PlanarWalker()
    w_off = walkers.PlanarWalker()
    w_on.enable_observable('sensors_accelerometer')
    specs_on = composer._collect_observable_specs(w_on)
    specs_off = composer._collect_observable_specs(w_off)
    assert specs_on['sensors_accelerometer'].enabled is True
    # the sibling instance (and the class default) stay disabled
    assert specs_off['sensors_accelerometer'].enabled is False
    with pytest.raises(KeyError):
        w_on.enable_observable('not_an_observable')


def test_enable_observable_flows_into_task_obs():
    task = locomotion.RunThroughCorridor(target_velocity=2.0)
    task.walker.enable_observable('sensors_accelerometer')
    env = locomotion.tasks.composer.make_env(task, time_limit=5.0)
    _, ts = env.reset(jax.random.PRNGKey(0))
    assert any('sensors_accelerometer' in k for k in ts.observation)
