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


def test_live_session_policy_loop():
    """LiveSession: the policy-in-the-loop core of the live viewer
    (reference viewer/application.py runtime: step/pause/reset +
    perturbation), driven directly (transport-free)."""
    env = suite.load('cartpole', 'balance')
    s = viewer.LiveSession(env, height=24, width=32)
    snap = s.reset()
    assert snap['t'] == 0 and 'frame' in snap
    r1 = s.step()                       # default: the session's policy
    r2 = s.step('zero')                 # runtime policy switch
    assert r2['t'] == 2
    assert np.isfinite(r2['reward']) and np.isfinite(r2['ret'])
    qv_before = float(np.asarray(s.state.physics.qvel)[0])
    s.perturb(dof=0, dv=3.0)            # body perturbation analogue
    qv_after = float(np.asarray(s.state.physics.qvel)[0])
    assert abs(qv_after - qv_before - 3.0) < 1e-5
    snap = s.reset()
    assert snap['t'] == 0 and snap['ret'] == 0.0


def test_live_viewer_http_round_trip():
    """serve() over a real socket: page + step/reset/perturb endpoints."""
    import json
    import threading
    import urllib.request

    env = suite.load('pendulum', 'swingup')
    # pendulum has a camera; tiny frames keep the test fast
    import http.client
    import socket

    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    t = threading.Thread(target=viewer.serve,
                         args=(env,), kwargs=dict(port=port, height=24,
                                                  width=32), daemon=True)
    t.start()
    deadline = 50
    for _ in range(deadline):
        try:
            page = urllib.request.urlopen(
                f'http://127.0.0.1:{port}/', timeout=5).read().decode()
            break
        except OSError:
            import time
            time.sleep(0.2)
    assert 'live viewer' in page and "'kick'" in page

    def post(path, body=None):
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}{path}',
            data=json.dumps(body or {}).encode(),
            headers={'Content-Type': 'application/json'})
        return json.loads(urllib.request.urlopen(req, timeout=30).read())

    snap = post('/reset')
    assert snap['t'] == 0
    snap = post('/step', {'policy': 'random'})
    assert snap['t'] == 1 and 'frame' in snap
    snap = post('/perturb', {'dof': 0, 'dv': 1.0})
    assert snap['t'] == 1
