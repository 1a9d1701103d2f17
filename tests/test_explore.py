"""visualize_reward render tint + the suite explorer CLI.

Covers the reference contracts: `Task.visualize_reward` property
validation and reward-keyed colors (suite/base.py:85-112), and
explore.py's task listing/flag surface (suite/explore.py:30-84).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from mujoco_mbrl_tpu import suite


def test_visualize_reward_property_validation():
    env = suite.load('cartpole', 'balance')
    assert env.task.visualize_reward is False
    env.task.visualize_reward = True
    assert env.task.visualize_reward is True
    with pytest.raises(ValueError):
        env.task.visualize_reward = 1  # non-bool, reference base.py:95


def test_visualize_reward_tints_body_geoms():
    env = suite.load('cartpole', 'balance')
    state, ts = env.reset(jax.random.PRNGKey(0))
    plain = np.asarray(env.render(state, height=48, width=64))
    env.task.visualize_reward = True
    tinted = np.asarray(env.render(state, height=48, width=64))
    assert plain.shape == tinted.shape == (48, 64, 3)
    # balance starts near max reward -> blend is strong; images differ
    # where body geoms are visible but the background stays put
    seg = np.asarray(env.render(state, height=48, width=64,
                                segmentation=True))
    body_px = seg >= 0
    assert np.abs(plain - tinted)[body_px].max() > 0.05
    assert np.allclose(plain[~body_px], tinted[~body_px])


def test_explore_lists_and_runs(tmp_path, capsys):
    from mujoco_mbrl_tpu.suite import explore
    # unknown name errors with the listing hint
    with pytest.raises(SystemExit):
        explore.main(['nope.nope'])
    out = explore.main(['pendulum.swingup', '--steps', '5',
                        '--action_noise', '0.2', '--visualize_reward',
                        '--out', str(tmp_path / 'ep')])
    assert out['rewards'].shape == (5,)


def test_explore_name_surface_matches_registry():
    names = ['.'.join(dt) for dt in suite.all_tasks()]
    assert 'cartpole.swingup' in names and 'walker.walk' in names
    assert len(names) >= 40
