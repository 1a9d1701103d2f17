"""Parity tests for hand-written TPU kernels (ops/).

Each Pallas kernel must match its pure-jnp reference implementation; on
the CPU CI backend the kernel runs in Pallas interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mbrl_tpu import models, planners
from mujoco_mbrl_tpu.ops import (mlp_rollout_costs, mlp_rollout_costs_t,
                                 mlp_rollout_costs_reference)


@pytest.fixture(scope='module')
def setup():
    sd, ad, K, H = 10, 3, 64, 8
    model = models.MLPDynamics(sd, ad, hidden_units=20)
    params = model.init(jax.random.PRNGKey(0))
    s0 = jax.random.normal(jax.random.PRNGKey(1), (K, sd))
    acts = jax.random.normal(jax.random.PRNGKey(2), (H, K, ad)) * 0.5
    goal = jnp.ones(sd) * 0.3
    w = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (sd,)))
    return model, params, s0, acts, goal, w


def test_kernel_matches_reference(setup):
    model, params, s0, acts, goal, w = setup
    ref = mlp_rollout_costs_reference(params, s0, acts, goal, w)
    ker = mlp_rollout_costs(params, s0, acts, goal, w,
                            interpret=True, tile=32)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_reference_matches_model_forward(setup):
    """The fused cost must equal stepping model.forward + cost modules."""
    model, params, s0, acts, goal, w = setup
    K = s0.shape[0]

    def step(carry, a):
        s, acc = carry
        sn = model.forward(params, s, a)
        c = models.smooth_abs_loss(sn, goal, w) + models.cosh_loss(a)
        return (sn, acc + c), None

    (_, manual), _ = jax.lax.scan(step, (s0, jnp.zeros(K)), acts)
    ref = mlp_rollout_costs_reference(params, s0, acts, goal, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(manual),
                               rtol=2e-5, atol=1e-5)


def test_normalizer_folding(setup):
    # Folding ALGEBRA is what is under test (normalize-then-matmul ==
    # folded-weights matmul); pin highest matmul precision so the TPU
    # tier's bf16-default manual path doesn't swamp the 1e-4 check.
    with jax.default_matmul_precision('highest'):
        _check_normalizer_folding(setup)


def _check_normalizer_folding(setup):
    model, params, s0, acts, goal, w = setup
    sd, ad = model.state_dim, model.action_dim
    n = models.Normalizers(
        state_mean=jnp.linspace(-0.2, 0.4, sd),
        state_std=jnp.linspace(0.5, 2.0, sd),
        action_mean=jnp.zeros(ad) + 0.1,
        action_std=jnp.ones(ad) * 1.5)
    K = s0.shape[0]

    def step(carry, a):
        s, acc = carry
        sn = model.forward(params, s, a, n)
        c = models.smooth_abs_loss(sn, goal, w) + models.cosh_loss(a)
        return (sn, acc + c), None

    (_, manual), _ = jax.lax.scan(step, (s0, jnp.zeros(K)), acts)
    ker = mlp_rollout_costs(params, s0, acts, goal, w, normalizers=n,
                            interpret=True, tile=32)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(manual),
                               rtol=1e-4, atol=1e-4)


def test_transposed_entry_point(setup):
    model, params, s0, acts, goal, w = setup
    ref = mlp_rollout_costs_reference(params, s0, acts, goal, w)
    ker = mlp_rollout_costs_t(params, s0.T, acts.transpose(0, 2, 1),
                              goal, w, interpret=True, tile=32)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_cem_batched_matches_vmap_cem_quality(setup):
    """cem_batched must optimize as well as vmap(cem) (same per-env
    semantics; different random draws, so compare achieved costs)."""
    model, params, s0, acts, goal, w = setup
    sd, ad = model.state_dim, model.action_dim
    B, K, H = 8, 128, 8
    model_fn = lambda s, a: model.forward(params, s, a)
    cost = lambda s, a: (models.smooth_abs_loss(s, goal, w)
                         + models.cosh_loss(a))
    obs = jax.random.normal(jax.random.PRNGKey(5), (B, sd))

    def plan_one(o, k):
        return planners.cem(k, o, model_fn, cost, horizon=H,
                            action_dim=ad, num_candidates=K,
                            num_elites=16, num_iterations=3)

    t1 = jax.jit(lambda o, k: jax.vmap(plan_one)(
        o, jax.random.split(k, B)))(obs, jax.random.PRNGKey(6))
    t2 = jax.jit(lambda o, k: planners.cem_batched(
        k, o, model_fn, cost, horizon=H, action_dim=ad,
        num_candidates=K, num_elites=16, num_iterations=3))(
            obs, jax.random.PRNGKey(6))

    def plan_cost(states, actions):
        return (models.smooth_abs_loss(states[1:], goal, w)
                + models.cosh_loss(actions)).sum(0).mean()

    c1 = float(plan_cost(t1.states.transpose(1, 0, 2),
                         t1.actions.transpose(1, 0, 2)))
    c2 = float(plan_cost(t2.states, t2.actions))
    assert c2 <= c1 * 1.1, (c1, c2)
    # fused-kernel path agrees with the generic path under the same key
    rc = lambda s0T, aT: mlp_rollout_costs_t(params, s0T, aT, goal, w,
                                             interpret=True, tile=32)
    t3 = jax.jit(lambda o, k: planners.cem_batched(
        k, o, model_fn, cost, horizon=H, action_dim=ad,
        num_candidates=K, num_elites=16, num_iterations=3,
        rollout_costs_fn=rc))(obs, jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(t3.actions),
                               np.asarray(t2.actions), rtol=1e-3,
                               atol=1e-3)


def test_cem_batched_return_states_false(setup):
    model, params, s0, acts, goal, w = setup
    sd, ad = model.state_dim, model.action_dim
    model_fn = lambda s, a: model.forward(params, s, a)
    cost = lambda s, a: (models.smooth_abs_loss(s, goal, w)
                         + models.cosh_loss(a))
    obs = jax.random.normal(jax.random.PRNGKey(5), (4, sd))
    t = jax.jit(lambda o, k: planners.cem_batched(
        k, o, model_fn, cost, horizon=6, action_dim=ad,
        num_candidates=32, num_elites=8, num_iterations=2,
        return_states=False))(obs, jax.random.PRNGKey(6))
    assert t.states is None
    assert t.actions.shape == (6, 4, ad)
    assert np.isfinite(np.asarray(t.actions)).all()


_ON_TPU = jax.devices()[0].platform in ('tpu', 'axon')


@pytest.mark.skipif(not _ON_TPU, reason='in-kernel PRNG (pltpu.prng_*) '
                    'has no CPU lowering; validated on TPU hardware')
def test_sample_rollout_costs_parity_on_tpu(setup):
    """Fully-fused sampling kernel: costs must equal the reference rollout
    evaluated on the very actions the kernel sampled, and the stream must
    be deterministic in the seed."""
    from mujoco_mbrl_tpu.ops import (mlp_sample_rollout_costs,
                                     mlp_rollout_costs_reference)
    model, params, s0_kxd, acts, goal, w = setup
    B, K, H = 4, 64, 8
    sd, ad = model.state_dim, model.action_dim
    s0 = jax.random.normal(jax.random.PRNGKey(9), (B, sd))
    mean = jnp.zeros((B, H, ad))
    std = jnp.ones((B, H, ad)) * 0.5
    costs, actions = mlp_sample_rollout_costs(
        params, 3, s0, mean, std, goal, w, num_candidates=K)
    a = np.asarray(actions)
    assert abs(a.mean()) < 0.05 and 0.3 < a.std() < 0.55
    flat = jnp.asarray(a).transpose(1, 0, 3, 2).reshape(H, B * K, ad)
    s0f = jnp.broadcast_to(s0[:, None], (B, K, sd)).reshape(B * K, sd)
    ref = mlp_rollout_costs_reference(params, s0f, flat, goal,
                                      w).reshape(B, K)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    c2, _ = mlp_sample_rollout_costs(
        params, 3, s0, mean, std, goal, w, num_candidates=K)
    np.testing.assert_array_equal(np.asarray(costs), np.asarray(c2))


@pytest.mark.skipif(not _ON_TPU, reason='in-kernel PRNG (pltpu.prng_*) '
                                        'has no CPU lowering')
def test_ensemble_sample_kernel_parity_on_tpu():
    """One-launch (member, env)-gridded ensemble kernel: candidate k must
    be costed by member k % n on the kernel's own sampled actions (the
    TS-infinity assignment of models.EnsembleDynamics.forward_ts)."""
    from mujoco_mbrl_tpu import models
    from mujoco_mbrl_tpu.ops import (mlp_rollout_costs_reference,
                                     mlp_sample_rollout_costs_ensemble)
    sd, ad, n, K, B, H = 24, 6, 5, 500, 4, 8
    ens = models.EnsembleDynamics(models.MLPDynamics(sd, ad, 50), n)
    params = ens.init(jax.random.PRNGKey(0))
    goal, w = jnp.zeros(sd), jnp.ones(sd)
    s0 = jax.random.normal(jax.random.PRNGKey(1), (B, sd))
    mean, std = jnp.zeros((B, H, ad)), jnp.full((B, H, ad), 0.5)
    costs, actions = mlp_sample_rollout_costs_ensemble(
        params, 7, s0, mean, std, goal, w, num_candidates=K, n_members=n)
    flat = jnp.asarray(actions, jnp.float32).transpose(1, 0, 3, 2).reshape(
        H, B * K, ad)
    s0f = jnp.broadcast_to(s0[:, None], (B, K, sd)).reshape(B * K, sd)
    refs = jnp.stack([
        mlp_rollout_costs_reference(
            jax.tree_util.tree_map(lambda v: v[mi], params),
            s0f, flat, goal, w).reshape(B, K)
        for mi in range(n)])
    member = jnp.arange(K) % n
    ref = refs[member, :, jnp.arange(K)].T
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the assignment must matter: shifting members by one breaks parity
    wrong = refs[(member + 1) % n, :, jnp.arange(K)].T
    assert float(jnp.abs(costs - wrong).max()) > 1e-3
