"""Model / State / Data pytrees for the TPU-native physics engine.

The reference reaches physics through ctypes structs ``mjModel``/``mjData``
(reference ``dm_control/dm_control/mujoco/wrapper/core.py:420,605``). Here the
equivalents are immutable JAX pytrees:

* :class:`Model` — static description of the articulated system, produced
  ahead-of-time by the MJCF compiler (:mod:`mujoco_mbrl_tpu.physics.mjcf`).
  Array fields are pytree leaves so tasks can functionally override them
  per-episode (e.g. move a target geom), and whole models can be vmapped
  when a task randomizes physical parameters per environment instance.
* :class:`State` — the minimal dynamic state ``{qpos, qvel, act, time}``,
  matching the reference's ``physics.get_state()`` layout
  (reference ``dm_control/dm_control/mujoco/engine.py:466-475``).
* :class:`Data` — forward-kinematics products (body/geom/site poses,
  velocities, mass matrix, forces) needed by tasks and by the integrator.

Enum values follow the MuJoCo public ABI so that MJCF semantics carry over
unambiguously (mjtJoint / mjtGeom / mjtTrn orders).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# Joint types (mjtJoint order).
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3

# Geom types (mjtGeom order).
PLANE, HFIELD, SPHERE, CAPSULE, ELLIPSOID, CYLINDER, BOX = 0, 1, 2, 3, 4, 5, 6

# Integrators.
EULER, RK4 = 0, 1

# Actuator transmission.
TRN_JOINT, TRN_TENDON = 0, 3

# Actuator gain/bias types.
GAIN_FIXED, BIAS_NONE, BIAS_AFFINE = 0, 0, 1

# Actuator activation dynamics (mjtDyn order).
DYN_NONE, DYN_INTEGRATOR, DYN_FILTER = 0, 1, 2

# Disable flags (bitmask).
DSBL_CONTACT = 1 << 0
DSBL_GRAVITY = 1 << 1
DSBL_LIMIT = 1 << 2
DSBL_ACTUATION = 1 << 3


@struct.dataclass
class Option:
    """Simulation options (subset of mjOption)."""
    timestep: jnp.ndarray
    gravity: jnp.ndarray            # (3,)
    viscosity: jnp.ndarray          # scalar, medium viscosity
    density: jnp.ndarray            # scalar, medium density
    wind: jnp.ndarray               # (3,)
    integrator: int = struct.field(pytree_node=False, default=EULER)
    disableflags: int = struct.field(pytree_node=False, default=0)
    # Constraint solver controls (fixed-iteration, XLA-friendly).
    solver_iterations: int = struct.field(pytree_node=False, default=30)
    # 'apgd' = accelerated projected gradient (default: every iteration is
    # one dense batched matvec -> MXU-friendly, ~3x faster than a
    # row-sequential sweep on TPU); 'pgs' = projected Gauss-Seidel
    # (reference-faithful row ordering, kept for cross-validation).
    solver: str = struct.field(pytree_node=False, default='apgd')
    # Friction-cone type (mjOption.cone). 'pyramidal' is MuJoCo's default
    # and what the whole suite (except finger, cone='elliptic') uses: each
    # contact expands into 2*(condim-1) non-negative facet rows
    # J_n ± mu_i * J_ti — on TPU this is the cheaper formulation too, the
    # projection being a plain relu instead of a second-order-cone map.
    cone: str = struct.field(pytree_node=False, default='pyramidal')
    impratio: float = struct.field(pytree_node=False, default=1.0)
    # Geom-geom (non-plane) contact pairs: ON by default, mirroring
    # MuJoCo's pair filtering (contype/conaffinity + same-body +
    # parent-child only). Disabling was round-1's compile-time shortcut,
    # but it silently drops self-collisions the oracle engine resolves
    # (hopper nose-thigh, walker leg-leg) and breaks trajectory parity.
    enable_geom_geom_contacts: bool = struct.field(pytree_node=False,
                                                   default=True)
    # Warm-start the constraint solver from the previous substep's row
    # forces (mjModel.opt: warmstart is MuJoCo's default). Constraint row
    # layout is static per compiled model, so the force vector threads
    # through the substep scan carry; stale rows are masked by the new
    # step's active set. Cuts the iterations ill-conditioned scenes need
    # to converge (quadruped/stacker geom-geom stacks).
    solver_warmstart: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class Model:
    """Static physics model. Array fields are leaves; sizes/names are static."""

    opt: Option

    # --- sizes (static; define compiled shapes) ---
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    njnt: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    nsite: int = struct.field(pytree_node=False)
    ntendon: int = struct.field(pytree_node=False)

    # --- tree structure (static numpy; drives trace-time loop unrolling) ---
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_body: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
    dof_jnt: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)
    site_body: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_trntype: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_trnid: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_ctrllimited: Tuple[bool, ...] = struct.field(pytree_node=False)

    # --- name tables (static) ---
    names: Dict[str, Dict[str, int]] = struct.field(pytree_node=False)

    # --- bodies ---
    body_pos: jnp.ndarray           # (nbody, 3) frame offset in parent
    body_quat: jnp.ndarray          # (nbody, 4)
    body_mass: jnp.ndarray          # (nbody,)
    body_ipos: jnp.ndarray          # (nbody, 3) CoM in body frame
    body_inertia: jnp.ndarray       # (nbody, 3, 3) about CoM, body frame

    # --- joints ---
    jnt_pos: jnp.ndarray            # (njnt, 3) anchor in body frame
    jnt_axis: jnp.ndarray           # (njnt, 3) axis in body frame
    jnt_range: jnp.ndarray          # (njnt, 2)
    jnt_solref: jnp.ndarray         # (njnt, 2) limit solref
    jnt_solimp: jnp.ndarray         # (njnt, 5) limit solimp
    jnt_stiffness: jnp.ndarray      # (njnt,)
    jnt_margin: jnp.ndarray         # (njnt,)

    # --- dofs ---
    dof_damping: jnp.ndarray        # (nv,)
    dof_armature: jnp.ndarray       # (nv,)
    dof_frictionloss: jnp.ndarray   # (nv,)

    # --- geoms ---
    geom_pos: jnp.ndarray           # (ngeom, 3)
    geom_quat: jnp.ndarray          # (ngeom, 4)
    geom_size: jnp.ndarray          # (ngeom, 3)
    geom_friction: jnp.ndarray      # (ngeom, 3) slide, torsion, roll
    geom_solref: jnp.ndarray        # (ngeom, 2)
    geom_solimp: jnp.ndarray        # (ngeom, 5)
    geom_margin: jnp.ndarray        # (ngeom,)
    geom_contype: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_conaffinity: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_condim: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_priority: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_solmix: jnp.ndarray        # (ngeom,)

    # --- sites ---
    site_pos: jnp.ndarray           # (nsite, 3)
    site_quat: jnp.ndarray          # (nsite, 4)

    # --- tendons ---
    # fixed tendons: linear couplings over scalar joints
    tendon_moment: jnp.ndarray      # (ntendon, nv) d length / d qvel
    tendon_stiffness: jnp.ndarray   # (ntendon,)
    tendon_damping: jnp.ndarray     # (ntendon,)
    # static (joint, coef) pairs per fixed tendon, for length computation
    tendon_jnt: Tuple[Tuple[Tuple[int, float], ...], ...] = struct.field(
        pytree_node=False)
    # spatial tendons (site-to-site strings): (site1, site2, limited,
    # range_lo, range_hi, invweight0) — used for length-limit constraints;
    # invweight0 (appended by the compiler at qpos0) feeds the limit row's
    # regularizer like mjModel.tendon_invweight0 does
    spatial_tendons: Tuple[Tuple, ...] = struct.field(pytree_node=False)
    # soft tendon-equality constraints: (tendon_id, solref, solimp)
    eq_tendon: Tuple[Tuple[int, Tuple[float, ...], Tuple[float, ...]], ...] \
        = struct.field(pytree_node=False)

    # --- actuators ---
    actuator_gear: jnp.ndarray      # (nu,)
    actuator_ctrlrange: jnp.ndarray  # (nu, 2)
    actuator_gainprm: jnp.ndarray   # (nu, 3)
    actuator_biasprm: jnp.ndarray   # (nu, 3)
    actuator_forcerange: jnp.ndarray  # (nu, 2)
    actuator_forcelimited: Tuple[bool, ...] = struct.field(pytree_node=False)
    actuator_biastype: Tuple[int, ...] = struct.field(pytree_node=False)

    # --- fluid model (equivalent inertia boxes, principal frames) ---
    body_fluid_box: jnp.ndarray     # (nbody, 3) half-sizes
    body_principal_mat: jnp.ndarray  # (nbody, 3, 3) body->principal rotation

    # --- reference configuration ---
    qpos0: jnp.ndarray              # (nq,)
    qpos_spring: jnp.ndarray        # (nq,)

    # --- actuator activation dynamics (optional; quadruped's filtered
    # actuators). na = number of activation states; actuator_actadr[u] =
    # index into State.act, or -1 for direct (stateless) actuators.
    na: int = struct.field(pytree_node=False, default=0)
    actuator_dyntype: Tuple[int, ...] = struct.field(pytree_node=False,
                                                     default=())
    actuator_actadr: Tuple[int, ...] = struct.field(pytree_node=False,
                                                    default=())
    actuator_dynprm: Optional[jnp.ndarray] = None   # (nu, 3)

    # explicit <contact><exclude> body pairs (humanoid_CMU clavicles)
    contact_excludes: Tuple[Tuple[int, int], ...] = struct.field(
        pytree_node=False, default=())

    # --- site shape (touch-sensor zone volumes; geom type codes) ---------
    site_type: Tuple[int, ...] = struct.field(pytree_node=False,
                                              default=())
    site_size: Optional[jnp.ndarray] = None   # (nsite, 3)

    # --- cameras (visual only; consumed by utils.render ray casting) -----
    ncam: int = struct.field(pytree_node=False, default=0)
    cam_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    cam_mode: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    cam_fovy: Tuple[float, ...] = struct.field(pytree_node=False,
                                               default=())
    cam_pos: Optional[jnp.ndarray] = None    # (ncam, 3) in body frame
    cam_quat: Optional[jnp.ndarray] = None   # (ncam, 4)

    # --- constraint-regularization reference weights (mj_setConst) -------
    # Inverse-weight constants computed once at qpos0; MuJoCo bases every
    # constraint row's regularizer R = (1-d)/d * diagApprox on these
    # rather than on the true diag(J M^-1 J'), and matching that is what
    # makes contact forces agree with the oracle engine.
    dof_invweight0: Optional[jnp.ndarray] = None    # (nv,) diag(M^-1)|qpos0
    body_invweight0: Optional[jnp.ndarray] = None   # (nbody, 2) trans/rot
    tendon_invweight0: Optional[jnp.ndarray] = None  # (ntendon,)

    # heightfield terrain (one hfield asset max; quadruped escape).
    # hfield_data is a pytree LEAF so tasks can regenerate terrain per
    # episode (reference quadruped.py Escape writes model.hfield_data).
    hfield_nrow: int = struct.field(pytree_node=False, default=0)
    hfield_ncol: int = struct.field(pytree_node=False, default=0)
    hfield_data: Optional[jnp.ndarray] = None    # (nrow, ncol) in [0, 1]
    hfield_size: Optional[jnp.ndarray] = None    # (4,) rx, ry, z_top, z_base
    hfield_pos: Optional[jnp.ndarray] = None     # (3,) geom position

    # ----------------------------------------------------------------------
    def name2id(self, kind: str, name: str) -> int:
        """Map an MJCF name to its index. kind in {body,joint,geom,site,actuator,tendon}."""
        return self.names[kind][name]

    def jnt_qpos_slice(self, name: str) -> slice:
        j = self.names['joint'][name]
        widths = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
        adr = self.jnt_qposadr[j]
        return slice(adr, adr + widths[self.jnt_type[j]])

    def jnt_dof_slice(self, name: str) -> slice:
        j = self.names['joint'][name]
        widths = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}
        adr = self.jnt_dofadr[j]
        return slice(adr, adr + widths[self.jnt_type[j]])


@struct.dataclass
class State:
    """Dynamic physics state: the exact pytree the replay/agents serialize.

    Field order matches the reference's flat state vector
    ``np.concatenate([qpos, qvel, act])`` (engine.py:466-475).
    """
    qpos: jnp.ndarray   # (nq,)
    qvel: jnp.ndarray   # (nv,)
    time: jnp.ndarray   # scalar
    act: Optional[jnp.ndarray] = None   # (na,) actuator activations

    def flatten(self) -> jnp.ndarray:
        parts = [self.qpos, self.qvel]
        if self.act is not None:
            parts.append(self.act)
        return jnp.concatenate(parts)


@struct.dataclass
class Data:
    """Forward-dynamics products for one configuration (cf. mjData)."""
    # Kinematics.
    xpos: jnp.ndarray        # (nbody, 3) body frame origin, world
    xquat: jnp.ndarray       # (nbody, 4)
    xipos: jnp.ndarray       # (nbody, 3) body CoM, world
    ximat: jnp.ndarray       # (nbody, 3, 3) CoM inertia frame = body frame, world
    geom_xpos: jnp.ndarray   # (ngeom, 3)
    geom_xmat: jnp.ndarray   # (ngeom, 3, 3)
    site_xpos: jnp.ndarray   # (nsite, 3)
    # Joint geometry in world frame.
    xanchor: jnp.ndarray     # (njnt, 3)
    xaxis: jnp.ndarray       # (njnt, 3)
    # Motion subspace + velocities (world frame, about origin).
    cdof: jnp.ndarray        # (nv, 6)
    cvel: jnp.ndarray        # (nbody, 6)
    # Mass matrix and bias.
    qM: jnp.ndarray          # (nv, nv) joint-space inertia
    qfrc_bias: jnp.ndarray   # (nv,) Coriolis + centrifugal + gravity
    qfrc_passive: jnp.ndarray  # (nv,) springs + viscous medium (NOT damping)
    qfrc_actuator: jnp.ndarray  # (nv,)
    qfrc_constraint: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray        # (nv,)
    actuator_force: jnp.ndarray  # (nu,)
    # Contacts (fixed candidate count C per compiled model; see
    # physics.collision.candidate_pairs for the geom pair ids).
    contact_dist: jnp.ndarray   # (C,) signed distances
    contact_pos: jnp.ndarray    # (C, 3)
    contact_force: jnp.ndarray  # (C, 3) in contact frame (normal, t1, t2)
    act_dot: Optional[jnp.ndarray] = None  # (na,) activation derivatives
    cdof_dot: Optional[jnp.ndarray] = None  # (nv, 6) for IMU-style sensors
    contact_frame: Optional[jnp.ndarray] = None  # (C, 3, 3) rows n, t1, t2
    efc_force: Optional[jnp.ndarray] = None  # (nr,) constraint row forces
    #   (mjData.efc_force); feeds the next substep's solver warm start
    efc_power_v: Optional[jnp.ndarray] = None  # (nr,) APGD step-size
    #   power-iteration vector; warm-starts the next substep's spectral
    #   estimate (saves ~20 (nr, nr) matvecs per warm solve)


def xmat_of(data: Data, model: Model) -> jnp.ndarray:
    """Body rotation matrices (nbody, 3, 3) from quaternions."""
    return data.ximat


def make_state(model: Model, qpos: Optional[jnp.ndarray] = None,
               qvel: Optional[jnp.ndarray] = None,
               time: float = 0.0, dtype=jnp.float32,
               act: Optional[jnp.ndarray] = None) -> State:
    """Construct a State, defaulting to the reference configuration qpos0."""
    if qpos is None:
        qpos = jnp.asarray(model.qpos0, dtype=dtype)
    if qvel is None:
        qvel = jnp.zeros((model.nv,), dtype=dtype)
    if act is None and model.na:
        act = jnp.zeros((model.na,), dtype=dtype)
    return State(qpos=jnp.asarray(qpos, dtype=dtype),
                 qvel=jnp.asarray(qvel, dtype=dtype),
                 time=jnp.asarray(time, dtype=dtype),
                 act=(jnp.asarray(act, dtype=dtype)
                      if act is not None else None))
