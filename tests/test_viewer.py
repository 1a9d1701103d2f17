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


def test_launch_writes_interactive_html(tmp_path):
    """html=True emits the self-contained scrub/player document — the
    headless redesign of the reference's interactive GLFW viewer
    (dm_control/viewer/application.py:183)."""
    env = suite.load('cartpole', 'balance')
    out = viewer.launch(env, policy=viewer.zero_policy(env), steps=12,
                        path=str(tmp_path / 'roll'), height=24, width=32,
                        frame_stride=4, verbose=False, html=True)
    assert out['html'].endswith('.html') and os.path.exists(out['html'])
    doc = open(out['html']).read()
    assert doc.count('data:image/png;base64,') == 3   # embedded frames
    for control_id in ('play', 'scrub', 'speed', 'stepf', 'stepb'):
        assert f"'{control_id}'" in doc               # interactive controls
    assert '__FRAMES__' not in doc                    # substitution done
