"""AMC mocap conversion tests (reference suite/utils/parse_amc.py)."""

import os

import numpy as np
import pytest

from mujoco_mbrl_tpu.physics import mjcf
from mujoco_mbrl_tpu.suite import humanoid_cmu, parse_amc


@pytest.fixture(scope='module')
def model():
    return mjcf.parse(humanoid_cmu._make_xml())


def _write_amc(path, n_frames=24):
    """Synthesize a small .amc file: root translating +x and the right
    knee flexing, everything else zero."""
    chans = {
        'root': 6, 'lowerback': 3, 'upperback': 3, 'thorax': 3,
        'lowerneck': 3, 'upperneck': 3, 'head': 3, 'rclavicle': 2,
        'rhumerus': 3, 'rradius': 1, 'rwrist': 1, 'rhand': 2,
        'rfingers': 1, 'rthumb': 2, 'lclavicle': 2, 'lhumerus': 3,
        'lradius': 1, 'lwrist': 1, 'lhand': 2, 'lfingers': 1,
        'lthumb': 2, 'rfemur': 3, 'rtibia': 1, 'rfoot': 2, 'rtoes': 1,
        'lfemur': 3, 'ltibia': 1, 'lfoot': 2, 'ltoes': 1,
    }
    with open(path, 'w') as f:
        f.write('#!OML:ASF\n:FULLY-SPECIFIED\n:DEGREES\n')
        for t in range(1, n_frames + 1):
            f.write(f'{t}\n')
            for name, n in chans.items():
                vals = [0.0] * n
                if name == 'root':
                    vals[0] = float(t)          # +x drift, CMU units
                if name == 'rtibia':
                    vals[0] = 5.0 * t           # knee flexion, degrees
                f.write(name + ' ' + ' '.join(str(v) for v in vals) + '\n')


def test_parse_frame_structure(tmp_path, model):
    path = os.path.join(tmp_path, 'clip.amc')
    _write_amc(path)
    frames = parse_amc.parse(path)
    assert len(frames) == 24
    assert all(f.shape == (62,) for f in frames)


def test_convert_shapes_and_root_transform(tmp_path, model):
    path = os.path.join(tmp_path, 'clip.amc')
    _write_amc(path)
    out = parse_amc.convert(path, model, timestep=0.02)
    nq, T = out.qpos.shape
    assert nq == model.nq == 63
    assert out.qvel.shape == (model.nv, T - 1) or \
        out.qvel.shape[0] == model.nv
    assert out.time.shape == (T,)
    # root x grows at CONVERSION_LENGTH meters per CMU unit
    dx = out.qpos[0, -1] - out.qpos[0, 0]
    frames_spanned = out.time[-1] / parse_amc.MOCAP_DT
    np.testing.assert_allclose(
        dx, parse_amc.CONVERSION_LENGTH * frames_spanned, rtol=0.05)
    # root quaternion stays unit-norm
    norms = np.linalg.norm(out.qpos[3:7], axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=0.02)
    # right knee channel mapped to the right qpos slot, in radians
    j = model.names['joint']['rtibiarx']
    adr = model.jnt_qposadr[j]
    assert out.qpos[adr, -1] > np.deg2rad(60)   # ~5 deg * 23 frames


def test_qvel_consistency(tmp_path, model):
    path = os.path.join(tmp_path, 'clip.amc')
    _write_amc(path)
    out = parse_amc.convert(path, model, timestep=0.02)
    # finite-difference consistency on the scalar joints
    fd = (out.qpos[7:, 1:] - out.qpos[7:, :-1]) / 0.02
    np.testing.assert_allclose(out.qvel[6:, :], fd, atol=1e-6)
