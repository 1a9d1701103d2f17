"""Scale-out tests on the virtual 8-device CPU mesh.

Covers what the reference never tested (SURVEY §4.2: "No distributed tests
exist"): sharded lockstep collection and data-parallel training with
explicit psum gradient reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mujoco_mbrl_tpu import data, envs, models, parallel


@pytest.fixture(scope='module')
def mesh():
    return parallel.make_mesh(('env',))


def test_mesh_spans_devices(mesh):
    assert mesh.shape['env'] == len(jax.devices())


def test_sharded_collect(mesh):
    wrapper = envs.load('cartpole', 'swingup')
    n = mesh.shape['env'] * 2
    collect = parallel.sharded_collect(mesh, wrapper, n, 5)
    rolls = collect(jax.random.PRNGKey(0))
    assert rolls.rewards.shape == (n, 5)
    # outputs actually carry the sharding
    sh = rolls.rewards.sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P('env')
    assert np.isfinite(np.asarray(rolls.rewards)).all()


def test_sharded_collect_matches_unsharded(mesh):
    """Sharding must not change results: same keys -> same rollouts."""
    wrapper = envs.load('pendulum', 'swingup')
    n = mesh.shape['env']
    collect = parallel.sharded_collect(mesh, wrapper, n, 4)
    sharded = collect(jax.random.PRNGKey(7))
    plain = jax.jit(lambda k: wrapper.get_rollouts(k, n, 4))(
        jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(sharded.rewards),
                               np.asarray(plain.rewards), atol=1e-6)


def test_dp_train_step_matches_single_device(mesh):
    """psum-reduced data-parallel grads == single-device full-batch grads."""
    model = models.MLPDynamics(4, 2, hidden_units=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)

    B = mesh.shape['env'] * 4
    key = jax.random.PRNGKey(1)
    batch = dict(
        states=jax.random.normal(key, (B, 1, 4)),
        actions=jax.random.normal(jax.random.fold_in(key, 1), (B, 1, 2)),
        rewards=jnp.zeros((B, 1)),
        next_states=jax.random.normal(jax.random.fold_in(key, 2),
                                      (B, 1, 4)))

    step = parallel.dp_train_step(mesh, model, opt)
    sharded_batch = jax.device_put(batch, NamedSharding(mesh, P('env')))
    p_dp, _, loss_dp = step(params, opt_state, sharded_batch)

    # single-device reference update
    def loss_fn(p):
        return model.loss(p, batch)

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))
