"""Cross-engine comparison helpers: our compiled Model vs recorded mjModel.

Fixtures come from ``scripts/gen_parity_fixtures.py`` (real MuJoCo via the
installed dm_control — see that file's docstring). Entities are aligned by
*name* wherever the XML names them, falling back to document order for
unnamed entities (both compilers walk the same XML tree depth-first, so
order is the same whenever the counts agree).
"""

import json

import numpy as np

SEED = 99  # must match scripts/gen_parity_fixtures.py


def load_our_env(domain, task):
    """Load our env configured to match the fixture's oracle episode.

    lqr is the one domain whose *model* is procedurally random: pass the
    fixture seed so the np.random.RandomState draws match the reference's
    (lqr.py:103-107 semantics).
    """
    import mujoco_mbrl_tpu.suite as suite
    kwargs = {'seed': SEED} if domain == 'lqr' else None
    return suite.load(domain, task, task_kwargs=kwargs)


def _names(fix):
    return json.loads(str(fix['m_names_json']))


def our_physics_rollout(env, fix, n_steps=None, dtype=None):
    """Re-simulate the fixture's physics-level rollout with OUR engine.

    Starts from the oracle's recorded post-reset state and applies the
    recorded per-control-step ctrl held over n_sub_steps, exactly as the
    oracle did (gen_parity_fixtures.py physics rollout). Returns
    (qpos_traj, qvel_traj) with the same leading length as fix['p_qpos'].
    """
    import jax
    import jax.numpy as jnp
    from mujoco_mbrl_tpu.physics import engine
    from mujoco_mbrl_tpu.physics import model as M

    if dtype is None:
        dtype = jnp.float32
    m = env.model
    if 'ep_hfield_data' in fix and m.hfield_data is not None:
        hf = np.asarray(fix['ep_hfield_data']).reshape(
            m.hfield_nrow, m.hfield_ncol)
        m = m.replace(hfield_data=jnp.asarray(hf, dtype))
    nsub = int(fix['n_sub_steps'])
    total = fix['p_qpos'].shape[0] - 1
    if n_steps is not None:
        total = min(total, n_steps)
    ctrl = np.repeat(np.asarray(fix['ctrl']), nsub, axis=0)[:total]

    act = fix['init_act'] if fix['init_act'].size else None
    state = M.make_state(m, qpos=jnp.asarray(fix['init_qpos'], dtype),
                         qvel=jnp.asarray(fix['init_qvel'], dtype),
                         act=(jnp.asarray(act, dtype)
                              if act is not None else None), dtype=dtype)
    contact_fn = getattr(env, '_contact_fn', None)

    def body(s, u):
        s2 = engine.step(m, s, u, contact_fn)
        return s2, (s2.qpos, s2.qvel)

    _, (qpos, qvel) = jax.jit(
        lambda s, u: jax.lax.scan(body, s, u))(
            state, jnp.asarray(ctrl, dtype))
    qpos = np.concatenate([np.asarray(fix['init_qpos'])[None], qpos])
    qvel = np.concatenate([np.asarray(fix['init_qvel'])[None], qvel])
    return qpos, qvel


def _perm(our_names_kind, oracle_names, count):
    """our index -> oracle index map; -1 where no confident match."""
    inv = {n: i for i, n in enumerate(oracle_names) if n}
    perm = np.full(count, -1, dtype=int)
    by_name = 0
    for name, i in our_names_kind.items():
        if name in inv:
            perm[i] = inv[name]
            by_name += 1
    if by_name == 0 and count == len(oracle_names):
        perm = np.arange(count)   # all unnamed: align by order
    return perm


def quat_to_mat(q):
    q = np.asarray(q, dtype=np.float64)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def oracle_full_inertia(fix):
    """(nbody, 3, 3) inertia about CoM in body frame from diag + iquat."""
    diag = np.asarray(fix['m_body_inertia'], dtype=np.float64)
    iquat = np.asarray(fix['m_body_iquat'], dtype=np.float64)
    out = np.zeros((diag.shape[0], 3, 3))
    for b in range(diag.shape[0]):
        R = quat_to_mat(iquat[b])
        out[b] = R @ np.diag(diag[b]) @ R.T
    return out


def _canon_quat(q):
    """Canonicalize quaternion sign: first non-zero component positive."""
    q = np.asarray(q, dtype=np.float64)
    flat = q.reshape(-1, 4)
    out = flat.copy()
    for i in range(flat.shape[0]):
        for c in flat[i]:
            if abs(c) > 1e-12:
                if c < 0:
                    out[i] = -flat[i]
                break
    return out.reshape(q.shape)


def episode_model(env, fix):
    """Our compiled model with the oracle's post-reset model arrays.

    Copies the recorded ep_* fields (geom_pos, site_pos, body_pos/quat,
    geom_size, dof_damping, hfield_data) onto name-matched entities,
    reproducing whatever episode-init model randomization the oracle task
    performed (targets, terrain) without task-specific glue.
    """
    import jax.numpy as jnp
    m = env.model
    names = _names(fix)
    dtype = m.qpos0.dtype

    def mapped(field, kind, ep_key):
        if ep_key not in fix:
            return None
        perm = _perm(m.names[kind], names[kind],
                     getattr(m, {'geom': 'ngeom', 'site': 'nsite',
                                 'body': 'nbody'}[kind]))
        ours = np.array(np.asarray(getattr(m, field)), np.float64)
        theirs = np.asarray(fix[ep_key], np.float64)
        for i, oi in enumerate(perm):
            if oi >= 0:
                ours[i] = theirs[oi]
        return jnp.asarray(ours, dtype)

    updates = {}
    for field, kind in (('geom_pos', 'geom'), ('geom_size', 'geom'),
                        ('site_pos', 'site'), ('body_pos', 'body'),
                        ('body_quat', 'body')):
        v = mapped(field, kind, 'ep_' + field)
        if v is not None:
            updates[field] = v
    if 'ep_dof_damping' in fix and int(fix['m_nv']) == m.nv:
        updates['dof_damping'] = jnp.asarray(fix['ep_dof_damping'], dtype)
    if 'ep_hfield_data' in fix and m.hfield_data is not None:
        updates['hfield_data'] = jnp.asarray(
            np.asarray(fix['ep_hfield_data']).reshape(
                m.hfield_nrow, m.hfield_ncol), dtype)
    return m.replace(**updates)


def task_parity_errors(env, fix, steps=None):
    """Drive our task layer over the oracle's recorded states.

    For each recorded control step t, sets our physics State to the
    oracle's (qpos, qvel, act), runs our forward pass + task observation +
    reward, and returns {key: max abs error} vs the recorded obs dict and
    reward sequence. Engine drift plays no role — this isolates the task
    layer (observation extraction + reward formulas + sensors).
    """
    import jax
    import jax.numpy as jnp
    from mujoco_mbrl_tpu.physics import engine
    from mujoco_mbrl_tpu.physics import model as M

    m = episode_model(env, fix)
    n = fix['qpos'].shape[0]
    idx = np.arange(n) if steps is None else np.asarray(steps)
    dtype = m.qpos0.dtype
    qpos = jnp.asarray(fix['qpos'][idx], dtype)
    qvel = jnp.asarray(fix['qvel'][idx], dtype)
    act = (jnp.asarray(fix['act'][idx], dtype)
           if fix['act'].size else None)
    ctrl = jnp.asarray(fix['ctrl'][idx], dtype)
    contact_fn = getattr(env, '_contact_fn', None)

    def one(qp, qv, ac, u):
        phys = M.State(qpos=qp, qvel=qv,
                       time=jnp.zeros((), dtype), act=ac)
        data = engine.forward(m, phys, u, contact_fn)
        # same precision pin as control.Environment._observe: the task
        # layer's small rotation matmuls must not run at the TPU bf16
        # default or kinematic obs pick up ~1e-3 error vs the 1e-4 band
        with jax.default_matmul_precision('highest'):
            obs = env.task.get_observation(m, phys, data)
            reward = env.task.get_reward(m, phys, data, u)
        return obs, reward

    if act is None:
        obs, reward = jax.jit(jax.vmap(lambda a, b, d: one(a, b, None, d))
                              )(qpos, qvel, ctrl)
    else:
        obs, reward = jax.jit(jax.vmap(one))(qpos, qvel, act, ctrl)

    errors = {}
    for k, v in obs.items():
        # prefer the same-state snapshot (obs_fwd_*, recorded after an
        # explicit mj_forward) over dm_control's raw stream, whose
        # acceleration-stage sensors lag one substep behind the state
        key = 'obs_fwd_' + k if ('obs_fwd_' + k) in fix else 'obs_' + k
        if key not in fix:
            errors[k] = ('MISSING_IN_ORACLE', None)
            continue
        oracle = np.asarray(fix[key])[idx + 1]   # obs after step t
        ours = np.asarray(v, np.float64).reshape(oracle.shape)
        errors[k] = float(np.max(np.abs(ours - oracle)))
    oracle_keys = {k[4:] for k in fix.files
                   if k.startswith('obs_') and not k.startswith('obs_fwd_')}
    for k in oracle_keys - set(obs.keys()):
        errors[k] = ('MISSING_IN_OURS', None)
    errors['__reward__'] = float(np.max(np.abs(
        np.asarray(reward, np.float64) - np.asarray(fix['reward'])[idx])))
    return errors


def steps_within(ours, oracle, tol):
    """Number of leading steps whose max-abs qpos deviation stays <= tol."""
    n = min(ours.shape[0], oracle.shape[0])
    dev = np.max(np.abs(ours[:n] - oracle[:n]), axis=tuple(
        range(1, ours.ndim)))
    bad = np.nonzero(dev > tol)[0]
    return int(bad[0]) if bad.size else n, dev


class Mismatch:
    def __init__(self, field, detail, max_diff=None, severity='error'):
        self.field = field
        self.detail = detail
        self.max_diff = max_diff
        self.severity = severity

    def __repr__(self):
        d = f' max|Δ|={self.max_diff:.3e}' if self.max_diff is not None \
            else ''
        return f'[{self.severity}:{self.field}]{d} {self.detail}'


def _compare_geom_quats(m, fix, gperm, our_name, add, tol=1e-6):
    """Geom orientations up to each shape's rotational symmetry.

    Spheres: any rotation. Capsules/cylinders: the z-axis up to sign
    (MuJoCo's fromto compilation can flip the axis). Planes: the z normal
    (sign matters). Boxes/ellipsoids/hfields: full rotation matrix.
    """
    if 'm_geom_quat' not in fix:
        return
    theirs = np.asarray(fix['m_geom_quat'], dtype=np.float64)
    ours = np.asarray(m.geom_quat, dtype=np.float64)
    for g in range(m.ngeom):
        og = gperm[g]
        if og < 0:
            continue
        gtype = int(np.asarray(m.geom_type)[g]) if not isinstance(
            m.geom_type, tuple) else m.geom_type[g]
        Ro, Rt = quat_to_mat(ours[g]), quat_to_mat(theirs[og])
        if gtype == 2:          # sphere
            continue
        elif gtype in (3, 5):   # capsule / cylinder: z-axis up to sign
            bad = min(np.abs(Ro[:, 2] - Rt[:, 2]).max(),
                      np.abs(Ro[:, 2] + Rt[:, 2]).max()) > tol
        elif gtype == 0:        # plane: z normal, sign matters
            bad = np.abs(Ro[:, 2] - Rt[:, 2]).max() > tol
        else:                   # box / ellipsoid / hfield: full rotation
            bad = np.abs(Ro - Rt).max() > tol
        if bad:
            name = our_name['geom'][g] if g < len(our_name['geom']) else ''
            add('geom_quat', f'geom {g} ({name!r}, type {gtype}): '
                             f'ours {ours[g]} vs oracle {theirs[og]}',
                float(np.abs(Ro - Rt).max()))


def compare_models(m, fix, atol=1e-9, rtol=1e-6):
    """Compare our compiled Model `m` against fixture mjModel arrays.

    Returns a list of Mismatch. Tolerances are tight: model constants are
    copied numbers, not simulation output.
    """
    out = []

    def add(field, detail, max_diff=None, severity='error'):
        out.append(Mismatch(field, detail, max_diff, severity))

    def arr_close(field, ours, theirs, quat=False, tol_scale=1.0):
        ours = np.asarray(ours, dtype=np.float64)
        theirs = np.asarray(theirs, dtype=np.float64)
        if ours.shape != theirs.shape:
            add(field, f'shape ours {ours.shape} vs oracle {theirs.shape}')
            return
        if quat:
            ours, theirs = _canon_quat(ours), _canon_quat(theirs)
        diff = np.abs(ours - theirs)
        lim = atol * tol_scale + rtol * np.abs(theirs)
        if (diff > lim).any():
            idx = np.unravel_index(np.argmax(diff - lim), diff.shape)
            add(field, f'ours[{idx}]={ours[idx]:.8g} vs '
                       f'oracle={theirs[idx]:.8g}', float(diff.max()))

    # ---- sizes ----
    # nq/nv/nu/na/nbody/njnt must match exactly: they define the dynamics.
    for f, ours in (('nq', m.nq), ('nv', m.nv), ('nu', m.nu), ('na', m.na),
                    ('nbody', m.nbody), ('njnt', m.njnt)):
        theirs = int(fix['m_' + f])
        if int(ours) != theirs:
            add(f, f'ours {ours} vs oracle {theirs}')
    # ngeom/nsite/ntendon may differ by design: purely-decorative geoms and
    # sensor-only sites are pruned at compile, and the ball_in_cup string /
    # lqr couplings are represented structurally (spatial_tendons /
    # tendon_moment rows) rather than as counted tendons. A pruned geom is
    # only acceptable if it cannot interact: non-colliding (contype =
    # conaffinity = 0) or attached to the static world body as decoration —
    # anything else is an error, checked below in the geom section.
    for f, ours in (('ngeom', m.ngeom), ('nsite', m.nsite),
                    ('ntendon', m.ntendon)):
        theirs = int(fix['m_' + f])
        if int(ours) != theirs:
            add(f, f'ours {ours} vs oracle {theirs} (pruned entities '
                   'audited by name below)', severity='info')

    # ---- options ----
    arr_close('opt.timestep', m.opt.timestep, fix['m_opt_timestep'])
    arr_close('opt.gravity', m.opt.gravity, fix['m_opt_gravity'])
    arr_close('opt.density', m.opt.density, fix['m_opt_density'])
    arr_close('opt.viscosity', m.opt.viscosity, fix['m_opt_viscosity'])
    arr_close('opt.wind', m.opt.wind, fix['m_opt_wind'])
    integ = {0: 0, 1: 1}.get(int(m.opt.integrator))  # ours EULER/RK4 = 0/1
    if integ != int(fix['m_opt_integrator']):
        add('opt.integrator',
            f'ours {int(m.opt.integrator)} vs oracle '
            f'{int(fix["m_opt_integrator"])}')

    names = _names(fix)
    our_name = {}
    for kind in ('body', 'joint', 'geom', 'site', 'actuator', 'tendon'):
        lst = [''] * len(m.names.get(kind, {}))
        inv = [''] * (max(m.names.get(kind, {}).values(), default=-1) + 1)
        for n, i in m.names.get(kind, {}).items():
            if i < len(inv):
                inv[i] = n
        our_name[kind] = inv
    bperm = _perm(m.names['body'], names['body'], m.nbody)
    jperm = _perm(m.names['joint'], names['joint'], m.njnt)
    gperm = _perm(m.names['geom'], names['geom'], m.ngeom)
    sperm = _perm(m.names['site'], names['site'], m.nsite)
    aperm = _perm(m.names['actuator'], names['actuator'], m.nu)
    tperm = _perm(m.names['tendon'], names['tendon'], m.ntendon)

    def aligned(field, ours, oracle_key, perm, quat=False, cols=None,
                tol_scale=1.0, kind=None):
        if oracle_key not in fix:
            return
        theirs = np.asarray(fix[oracle_key], dtype=np.float64)
        if cols is not None:
            theirs = theirs[..., cols]
        ok = perm >= 0
        if not ok.any():
            return
        if kind is None:
            kind = {'body': 'body', 'jnt': 'joint', 'geom': 'geom',
                    'site': 'site', 'actuator': 'actuator',
                    'tendon': 'tendon'}.get(field.split('_')[0])
        our_idx = np.nonzero(ok)[0]
        ours = np.asarray(ours, dtype=np.float64)[ok]
        theirs_sel = theirs[perm[ok]]
        if ours.shape != theirs_sel.shape:
            add(field, f'shape ours {ours.shape} vs oracle '
                       f'{theirs_sel.shape}')
            return

        def bad(t_sel):
            o, t = ((_canon_quat(ours), _canon_quat(t_sel)) if quat
                    else (ours, t_sel))
            diff = np.abs(o - t)
            lim = atol * tol_scale + rtol * np.abs(t)
            return (diff > lim).any(), o, t, diff, lim

        is_bad, o, t, diff, lim = bad(theirs_sel)
        # Some tasks write model fields at episode init (reacher target
        # size, finger Spin hinge damping) that our compiler bakes in:
        # accept a match against the post-reset (ep_*) oracle values too.
        ep_key = 'ep_' + oracle_key[2:]
        if is_bad and ep_key in fix:
            ep = np.asarray(fix[ep_key], dtype=np.float64)
            if cols is not None:
                ep = ep[..., cols]
            ep_bad, *_ = bad(ep[perm[ok]])
            if not ep_bad:
                return
        if is_bad:
            idx = np.unravel_index(np.argmax(diff - lim), diff.shape)
            i = int(our_idx[idx[0]]) if diff.ndim else int(our_idx[0])
            label = ''
            if kind and i < len(our_name.get(kind, [])) and \
                    our_name[kind][i]:
                label = f' ({kind} {our_name[kind][i]!r})'
            add(field, f'ours[{idx}]{label}={o[idx]:.8g} vs '
                       f'oracle={t[idx]:.8g}', float(diff.max()))

    # ---- bodies ----
    aligned('body_pos', m.body_pos, 'm_body_pos', bperm)
    aligned('body_quat', m.body_quat, 'm_body_quat', bperm, quat=True)
    aligned('body_mass', m.body_mass, 'm_body_mass', bperm)
    aligned('body_ipos', m.body_ipos, 'm_body_ipos', bperm)
    full_inertia = oracle_full_inertia(fix)
    ok = bperm >= 0
    if ok.any():
        arr_close('body_inertia',
                  np.asarray(m.body_inertia, dtype=np.float64)[ok],
                  full_inertia[bperm[ok]], tol_scale=1e3)
    # parent links (through the body permutation)
    ours_parent = np.asarray(m.body_parent)
    theirs_parent = np.asarray(fix['m_body_parentid'])
    for b in range(m.nbody):
        if bperm[b] < 0:
            continue
        p, op = ours_parent[b], theirs_parent[bperm[b]]
        if bperm[p] != op:
            add('body_parent', f'body {b}: our parent {p} maps to '
                               f'{bperm[p]} vs oracle {op}')
            break

    # ---- joints ----
    aligned('jnt_type', m.jnt_type, 'm_jnt_type', jperm)
    aligned('jnt_pos', m.jnt_pos, 'm_jnt_pos', jperm)
    aligned('jnt_axis', m.jnt_axis, 'm_jnt_axis', jperm)
    aligned('jnt_range', m.jnt_range, 'm_jnt_range', jperm)
    aligned('jnt_limited', np.asarray(m.jnt_limited, dtype=np.float64),
            'm_jnt_limited', jperm)
    aligned('jnt_stiffness', m.jnt_stiffness, 'm_jnt_stiffness', jperm)
    aligned('jnt_solref', m.jnt_solref, 'm_jnt_solref', jperm)
    aligned('jnt_solimp', m.jnt_solimp, 'm_jnt_solimp', jperm)
    aligned('jnt_margin', m.jnt_margin, 'm_jnt_margin', jperm)
    aligned('jnt_qposadr', np.asarray(m.jnt_qposadr, dtype=np.float64),
            'm_jnt_qposadr', jperm)
    aligned('jnt_dofadr', np.asarray(m.jnt_dofadr, dtype=np.float64),
            'm_jnt_dofadr', jperm)

    # ---- dofs (dof order follows joint order; compare directly when all
    # joints matched in order) ----
    if (jperm == np.arange(m.njnt)).all():
        aligned('dof_damping', m.dof_damping, 'm_dof_damping',
                np.arange(m.nv))
        aligned('dof_armature', m.dof_armature, 'm_dof_armature',
                np.arange(m.nv))
        aligned('dof_frictionloss', m.dof_frictionloss,
                'm_dof_frictionloss', np.arange(m.nv))

    # ---- geoms ----
    aligned('geom_type', np.asarray(m.geom_type, dtype=np.float64),
            'm_geom_type', gperm)
    aligned('geom_pos', m.geom_pos, 'm_geom_pos', gperm)
    _compare_geom_quats(m, fix, gperm, our_name, add)
    # hfield geoms: MuJoCo mirrors the hfield asset size into geom_size;
    # we keep it in Model.hfield_size — skip those rows here.
    gperm_sz = gperm.copy()
    for g in range(m.ngeom):
        if m.geom_type[g] == 1:  # HFIELD
            gperm_sz[g] = -1
    aligned('geom_size', m.geom_size, 'm_geom_size', gperm_sz)
    aligned('geom_friction', m.geom_friction, 'm_geom_friction', gperm)
    aligned('geom_solref', m.geom_solref, 'm_geom_solref', gperm)
    aligned('geom_solimp', m.geom_solimp, 'm_geom_solimp', gperm)
    aligned('geom_margin', m.geom_margin, 'm_geom_margin', gperm)
    aligned('geom_contype', np.asarray(m.geom_contype, dtype=np.float64),
            'm_geom_contype', gperm)
    aligned('geom_conaffinity',
            np.asarray(m.geom_conaffinity, dtype=np.float64),
            'm_geom_conaffinity', gperm)
    aligned('geom_condim', np.asarray(m.geom_condim, dtype=np.float64),
            'm_geom_condim', gperm)
    aligned('geom_priority', np.asarray(m.geom_priority, dtype=np.float64),
            'm_geom_priority', gperm)
    aligned('geom_solmix', m.geom_solmix, 'm_geom_solmix', gperm)

    # Audit pruned oracle geoms: every oracle geom absent from our model
    # must be non-interacting — either flagged non-colliding
    # (contype == conaffinity == 0) or *observed* to never participate in a
    # contact during the oracle's recorded random-driving rollouts
    # (contact_pairs_json, recorded by scripts/gen_parity_fixtures.py).
    # A pruned geom that the oracle shows touching something is an error.
    matched_oracle_geoms = set(int(i) for i in gperm if i >= 0)
    o_contype = np.asarray(fix['m_geom_contype'])
    o_conaff = np.asarray(fix['m_geom_conaffinity'])
    contacting = set()
    if 'contact_pairs_json' in fix:
        for n1, n2 in json.loads(str(fix['contact_pairs_json'])):
            contacting.add(n1)
            contacting.add(n2)
    our_geom_names = set(m.names['geom'])
    for og, oname in enumerate(names['geom']):
        if og in matched_oracle_geoms or oname in our_geom_names:
            continue
        collidable = int(o_contype[og]) != 0 or int(o_conaff[og]) != 0
        if collidable and oname in contacting:
            add('pruned_geom',
                f'oracle geom {og} ({oname!r}) participates in oracle '
                'contacts but is absent from our model')
        elif collidable:
            add('pruned_geom',
                f'oracle geom {og} ({oname!r}) is collidable but inert in '
                'the oracle rollout; pruned as decoration',
                severity='info')

    # ---- sites ----
    aligned('site_pos', m.site_pos, 'm_site_pos', sperm)
    aligned('site_quat', m.site_quat, 'm_site_quat', sperm, quat=True)

    # ---- actuators ----
    aligned('actuator_gear', m.actuator_gear, 'm_actuator_gear', aperm,
            cols=0)
    aligned('actuator_ctrlrange', m.actuator_ctrlrange,
            'm_actuator_ctrlrange', aperm)
    aligned('actuator_ctrllimited',
            np.asarray(m.actuator_ctrllimited, dtype=np.float64),
            'm_actuator_ctrllimited', aperm)
    aligned('actuator_forcerange', m.actuator_forcerange,
            'm_actuator_forcerange', aperm)
    aligned('actuator_gainprm', m.actuator_gainprm, 'm_actuator_gainprm',
            aperm, cols=slice(0, 3))
    aligned('actuator_biasprm', m.actuator_biasprm, 'm_actuator_biasprm',
            aperm, cols=slice(0, 3))
    aligned('actuator_biastype',
            np.asarray(m.actuator_biastype, dtype=np.float64),
            'm_actuator_biastype', aperm)
    aligned('actuator_trntype',
            np.asarray(m.actuator_trntype, dtype=np.float64),
            'm_actuator_trntype', aperm)
    aligned('actuator_dyntype',
            np.asarray(m.actuator_dyntype or [0] * m.nu, dtype=np.float64),
            'm_actuator_dyntype', aperm)
    if m.actuator_dynprm is not None:
        aligned('actuator_dynprm', m.actuator_dynprm, 'm_actuator_dynprm',
                aperm, cols=slice(0, 3))

    # ---- tendons ----
    aligned('tendon_stiffness', m.tendon_stiffness, 'm_tendon_stiffness',
            tperm)
    aligned('tendon_damping', m.tendon_damping, 'm_tendon_damping', tperm)

    # ---- reference configuration ----
    arr_close('qpos0', m.qpos0, fix['m_qpos0'])
    arr_close('qpos_spring', m.qpos_spring, fix['m_qpos_spring'])

    # ---- name-match coverage: a kind where nothing matched by name was
    # never actually compared above — surface that blind spot.
    for kind, perm, count in (('body', bperm, m.nbody),
                              ('joint', jperm, m.njnt),
                              ('geom', gperm, m.ngeom),
                              ('site', sperm, m.nsite),
                              ('actuator', aperm, m.nu),
                              ('tendon', tperm, m.ntendon)):
        if count and not (perm >= 0).any():
            add('coverage', f'no {kind} matched by name: {kind} fields '
                            'were not compared', severity='info')

    return out
