"""Offline viewer tests (dm_control/viewer surface substitute)."""

import os

import numpy as np

from mujoco_mbrl_tpu import suite, viewer


def test_launch_renders_and_writes_gif(tmp_path):
    env = suite.load('cartpole', 'balance')
    out = viewer.launch(env, policy=viewer.zero_policy(env), steps=12,
                        path=str(tmp_path / 'roll'), height=32, width=40,
                        frame_stride=4, verbose=False)
    assert out['rewards'].shape == (12,)
    assert np.isfinite(out['rewards']).all()
    assert out['frames'].shape == (3, 32, 40, 3)
    assert out['frames'].dtype == np.uint8
    assert out['frames'].max() > 0           # something got shaded
    assert os.path.exists(out['gif'])


def test_launch_random_policy_no_path():
    env = suite.load('pendulum', 'swingup')
    out = viewer.launch(env, steps=8, height=24, width=32,
                        frame_stride=8, verbose=False)
    assert out['rewards'].shape == (8,)
    assert out['gif'] == ''
