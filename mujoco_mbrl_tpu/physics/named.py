"""Named indexing: string-addressed views over model/state/data arrays.

Functional equivalent of the reference's named-indexing layer
(``dm_control/dm_control/mujoco/index.py:269,442,590``): instead of
runtime FieldIndexer objects wrapping ctypes buffers, names resolve to
static python slices at trace time, so `named.qpos(state, 'shoulder')`
inside jit costs exactly a static slice.

    view = named.NamedView(model)
    view.qpos(state, 'hinge_1')        # scalar or (width,) slice
    view.qvel(state, 'slider')
    view.xpos(data, 'torso')           # (3,)
    view.xmat(data, 'torso')           # (3, 3)
    view.geom_xpos(data, 'target')
    view.site_xpos(data, 'tip')
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from . import model as M


class NamedView:
    """String-name accessors for a fixed compiled model."""

    def __init__(self, model: M.Model):
        self._m = model

    # -- state -----------------------------------------------------------
    def qpos(self, state_or_qpos, joint_name: str):
        qpos = getattr(state_or_qpos, 'qpos', state_or_qpos)
        sl = self._m.jnt_qpos_slice(joint_name)
        out = qpos[sl]
        return out[0] if out.shape == (1,) else out

    def qvel(self, state_or_qvel, joint_name: str):
        qvel = getattr(state_or_qvel, 'qvel', state_or_qvel)
        sl = self._m.jnt_dof_slice(joint_name)
        out = qvel[sl]
        return out[0] if out.shape == (1,) else out

    def set_qpos(self, state, joint_name: str, value):
        sl = self._m.jnt_qpos_slice(joint_name)
        return state.replace(qpos=state.qpos.at[sl].set(value))

    def set_qvel(self, state, joint_name: str, value):
        sl = self._m.jnt_dof_slice(joint_name)
        return state.replace(qvel=state.qvel.at[sl].set(value))

    # -- data ---------------------------------------------------------------
    def xpos(self, data: M.Data, body_name: str):
        return data.xpos[self._m.name2id('body', body_name)]

    def xquat(self, data: M.Data, body_name: str):
        return data.xquat[self._m.name2id('body', body_name)]

    def xmat(self, data: M.Data, body_name: str):
        return data.ximat[self._m.name2id('body', body_name)]

    def xipos(self, data: M.Data, body_name: str):
        return data.xipos[self._m.name2id('body', body_name)]

    def geom_xpos(self, data: M.Data, geom_name: str):
        return data.geom_xpos[self._m.name2id('geom', geom_name)]

    def geom_xmat(self, data: M.Data, geom_name: str):
        return data.geom_xmat[self._m.name2id('geom', geom_name)]

    def site_xpos(self, data: M.Data, site_name: str):
        return data.site_xpos[self._m.name2id('site', site_name)]

    # -- model -----------------------------------------------------------
    def jnt_range(self, joint_name: str):
        return self._m.jnt_range[self._m.name2id('joint', joint_name)]

    def geom_size(self, geom_name: str):
        return self._m.geom_size[self._m.name2id('geom', geom_name)]

    def actuator_id(self, name: str) -> int:
        return self._m.name2id('actuator', name)


def named(model: M.Model) -> NamedView:
    return NamedView(model)
