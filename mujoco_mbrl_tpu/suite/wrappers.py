"""Observation/action wrappers for suite environments.

Parity with the reference's suite wrappers
(``dm_control/dm_control/suite/wrappers/pixels.py:30-119`` and
``action_noise.py:30-73``), re-designed functional: each wrapper is an
Environment subclass whose reset/step remain pure, so they still vmap/jit.
The pixels wrapper renders with the on-device SDF rasterizer, so pixel
observations are generated for whole env batches inside jit — impossible
with the reference's GL pipeline.
"""

from __future__ import annotations

import collections
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils import render as render_mod
from . import control


class PixelWrapper:
    """Adds (or replaces observations with) rendered pixels."""

    def __init__(self, env: control.Environment, pixels_only: bool = True,
                 height: int = 64, width: int = 64,
                 observation_key: str = 'pixels',
                 plane: str = 'xz', extent: float = 2.0,
                 camera_id=None):
        self._env = env
        self._pixels_only = pixels_only
        self._key = observation_key
        self._height = height
        self._width = width
        self._plane = plane
        self._extent = extent
        # camera-posed perspective rendering (utils.raycast) when the
        # model defines cameras — matching the reference pixels wrapper's
        # camera_id kwarg (suite/wrappers/pixels.py render_kwargs);
        # None falls back to a named camera if any exist, else the
        # orthographic debug rasterizer.
        self._camera = None
        model = env.model
        if camera_id is None and model.ncam:
            camera_id = 0
        if camera_id is not None:
            from ..utils.raycast import Camera
            self._camera = Camera(model, height, width, camera_id)

    def __getattr__(self, name):
        return getattr(self._env, name)

    def _add_pixels(self, env_state, ts):
        from ..physics import engine
        m = self._env._model_with(env_state.params)
        data = engine.forward(
            m, env_state.physics,
            jnp.zeros((m.nu,), env_state.physics.qpos.dtype),
            acc_stage=False)   # rendering reads kinematics only
        if self._camera is not None:
            pixels = self._camera.render(data)
        else:
            pixels = render_mod.render(m, data, self._height, self._width,
                                       plane=self._plane,
                                       extent=self._extent)
        if self._pixels_only:
            obs = collections.OrderedDict([(self._key, pixels)])
        else:
            obs = collections.OrderedDict(ts.observation)
            obs[self._key] = pixels
        return ts.replace(observation=obs)

    def reset(self, key):
        env_state, ts = self._env.reset(key)
        return env_state, self._add_pixels(env_state, ts)

    def step(self, env_state, action):
        env_state, ts = self._env.step(env_state, action)
        return env_state, self._add_pixels(env_state, ts)

    def step_with_data(self, env_state, action):
        # keep the wrapper on the data-reusing collection path
        # (control.Environment.step_with_data): __getattr__ forwarding
        # would silently skip the pixel injection
        env_state, ts, data = self._env.step_with_data(env_state, action)
        return env_state, self._add_pixels(env_state, ts), data


class ActionNoiseWrapper:
    """Adds iid Gaussian noise to actions, scaled to the ctrlrange
    (action_noise.py:30-73). Step takes an explicit noise key."""

    def __init__(self, env: control.Environment, scale: float = 0.01):
        self._env = env
        self._scale = scale
        spec = env.action_spec()
        import numpy as np
        lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
        hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
        self._minimum = jnp.asarray(lo)
        self._maximum = jnp.asarray(hi)
        self._std = self._scale * (self._maximum - self._minimum)

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, key):
        return self._env.reset(key)

    def step(self, env_state, action, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(0),
                                     env_state.step_count)
        noisy = action + self._std * jax.random.normal(
            key, jnp.shape(action))
        noisy = jnp.clip(noisy, self._minimum, self._maximum)
        return self._env.step(env_state, noisy)

    def step_with_data(self, env_state, action,
                       key: Optional[jax.Array] = None):
        # mirror step(): __getattr__ forwarding would bypass the noise
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(0),
                                     env_state.step_count)
        noisy = action + self._std * jax.random.normal(
            key, jnp.shape(action))
        noisy = jnp.clip(noisy, self._minimum, self._maximum)
        return self._env.step_with_data(env_state, noisy)


# dm_control-compatible aliases
Wrapper = PixelWrapper
