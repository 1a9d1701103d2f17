"""Walker entities (locomotion/walkers analogue, composer-built).

:class:`PlanarWalker` is a torque-controlled biped in the sagittal plane
(the suite walker's morphology rebuilt as a reusable entity) exposing the
egocentric observables the reference walker base class defines
(locomotion/walkers/base.py: joints_pos/joints_vel, torso height,
orientation, velocity).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import composer
from ..physics import builder

_LEG = """ per-leg spec: (thigh len .225, leg len .25, foot len .1) """


class PlanarWalker(composer.Entity):
    def _build(self, torso_length=0.3, initial_z=1.3):
        self.initial_z = initial_z
        root = builder.RootElement(model='planar_walker')
        wb = root.worldbody
        torso = wb.add('body', name='torso', pos=[0, 0, initial_z])
        torso.add('joint', name='rootx', type='slide', axis=[1, 0, 0],
                  limited=False)
        torso.add('joint', name='rootz', type='slide', axis=[0, 0, 1],
                  limited=False)
        torso.add('joint', name='rooty', type='hinge', axis=[0, 1, 0],
                  limited=False)
        torso.add('geom', name='torso', type='capsule', size=[0.07],
                  fromto=[0, 0, -torso_length, 0, 0, torso_length])
        for side, off in (('right', -0.05), ('left', 0.05)):
            thigh = torso.add('body', name=f'{side}_thigh',
                              pos=[0, off, -torso_length])
            thigh.add('joint', name=f'{side}_hip', type='hinge',
                      axis=[0, 1, 0], range=[-20, 100], limited=True,
                      damping=0.1)
            thigh.add('geom', name=f'{side}_thigh', type='capsule',
                      size=[0.05], fromto=[0, 0, 0, 0, 0, -0.225])
            leg = thigh.add('body', name=f'{side}_leg', pos=[0, 0, -0.25])
            leg.add('joint', name=f'{side}_knee', type='hinge',
                    axis=[0, 1, 0], range=[-150, 0], limited=True,
                    damping=0.1)
            leg.add('geom', name=f'{side}_leg', type='capsule',
                    size=[0.04], fromto=[0, 0, 0, 0, 0, -0.25])
            foot = leg.add('body', name=f'{side}_foot', pos=[0, 0, -0.25])
            foot.add('joint', name=f'{side}_ankle', type='hinge',
                     axis=[0, 1, 0], range=[-45, 45], limited=True,
                     damping=0.1)
            foot.add('geom', name=f'{side}_foot', type='capsule',
                     size=[0.05], fromto=[-0.05, 0, 0, 0.15, 0, 0],
                     friction=[1.5])
        for j, gear in (('right_hip', 100), ('right_knee', 50),
                        ('right_ankle', 20), ('left_hip', 100),
                        ('left_knee', 50), ('left_ankle', 20)):
            root.actuator.add('motor', name=j, joint=j, gear=gear,
                              ctrllimited=True, ctrlrange=[-1, 1])
        return root

    # -- egocentric observables (walkers/base.py observable set) --------
    def _root_dofs(self, model):
        jx = model.names['joint'][self.name('rootx')]
        jz = model.names['joint'][self.name('rootz')]
        jy = model.names['joint'][self.name('rooty')]
        return (model.jnt_dofadr[jx], model.jnt_dofadr[jz],
                model.jnt_dofadr[jy])

    @composer.observable
    def joints_pos(self, model, phys, data):
        qadr = [model.jnt_qposadr[model.names['joint'][self.name(n)]]
                for n in ('right_hip', 'right_knee', 'right_ankle',
                          'left_hip', 'left_knee', 'left_ankle')]
        return phys.qpos[jnp.array(qadr)]

    @composer.observable
    def joints_vel(self, model, phys, data):
        dadr = [model.jnt_dofadr[model.names['joint'][self.name(n)]]
                for n in ('right_hip', 'right_knee', 'right_ankle',
                          'left_hip', 'left_knee', 'left_ankle')]
        return phys.qvel[jnp.array(dadr)]

    @composer.observable
    def torso_height(self, model, phys, data):
        b = model.names['body'][self.name('torso')]
        return data.xpos[b, 2]

    @composer.observable
    def torso_upright(self, model, phys, data):
        b = model.names['body'][self.name('torso')]
        return data.ximat[b, 2, 2]

    @composer.observable
    def velocity(self, model, phys, data):
        dx, dz, dy = self._root_dofs(model)
        return phys.qvel[jnp.array([dx, dz, dy])]

    def forward_velocity(self, model, phys, data):
        dx, _, _ = self._root_dofs(model)
        return phys.qvel[dx]

    def root_xy(self, model, phys, data):
        b = model.names['body'][self.name('torso')]
        return data.xpos[b, :2]


class CMUHumanoid(composer.Entity):
    """CMU-mocap humanoid (56 actuated dofs) as a reusable walker entity.

    The locomotion/walkers/cmu_humanoid.py analogue: instead of
    re-declaring the 62-dof model programmatically, the suite's
    humanoid_cmu MJCF (suite/humanoid_cmu.py) is parsed into an editable
    element tree (builder.RootElement.from_xml_string — the PyMJCF
    from_xml_string workflow) and stripped of its floor: arenas own the
    ground plane. Exposes the same egocentric observable set as
    :class:`PlanarWalker`.
    """

    def _build(self):
        from ..suite.humanoid_cmu import _make_xml
        root = builder.RootElement.from_xml_string(_make_xml())
        wb = root.worldbody
        wb.children = [c for c in wb.children
                       if not (c.tag == 'geom'
                               and c.attrs.get('name') == 'floor')]
        return root

    # -- egocentric observables ------------------------------------------
    def _joint_ids(self, model):
        """All of this entity's joints except the free root joint."""
        prefix = self.name('')
        return [j for name, j in model.names['joint'].items()
                if name.startswith(prefix) and name != self.name('root')]

    @composer.observable
    def joints_pos(self, model, phys, data):
        qadr = [int(model.jnt_qposadr[j]) for j in self._joint_ids(model)]
        return phys.qpos[jnp.array(sorted(qadr))]

    @composer.observable
    def joints_vel(self, model, phys, data):
        dadr = [int(model.jnt_dofadr[j]) for j in self._joint_ids(model)]
        return phys.qvel[jnp.array(sorted(dadr))]

    @composer.observable
    def torso_height(self, model, phys, data):
        b = model.names['body'][self.name('root')]
        return data.xpos[b, 2]

    @composer.observable
    def torso_upright(self, model, phys, data):
        b = model.names['body'][self.name('root')]
        return data.ximat[b, 2, 2]

    @composer.observable
    def velocity(self, model, phys, data):
        j = model.names['joint'][self.name('root')]
        d = int(model.jnt_dofadr[j])
        return phys.qvel[d:d + 6]

    def forward_velocity(self, model, phys, data):
        j = model.names['joint'][self.name('root')]
        return phys.qvel[int(model.jnt_dofadr[j])]

    def root_xy(self, model, phys, data):
        b = model.names['body'][self.name('root')]
        return data.xpos[b, :2]
