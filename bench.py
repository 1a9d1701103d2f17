"""Benchmark: env-steps/s/chip with full CEM-MPC planning in the loop.

Protocol follows BASELINE.md: batched envs each running a CEM plan
(default 1000 candidates x 30-step horizon, 3 iterations — the
reference plans with a single random-shooting pass) over a learned
MLP dynamics model every control step, plus the physics step itself —
the complete per-step MPC workload of SURVEY §3.3, fused into one jitted
scan. Reported metric: aggregate env-steps/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s/chip", "vs_baseline": N}
vs_baseline is value / 10000 (the driver-set north-star target,
BASELINE.json; the reference itself publishes no numbers).

The default task is walker_walk — the BASELINE.md north-star config —
so the driver-recorded number measures the target workload, not an easier
one. `--selfcheck` (on by default on TPU) asserts the fused Pallas
sampling kernel agrees with the XLA scan path before timing, so the
production planning path is numerically validated on the real chip every
round (VERDICT r1 item #5).

Usage: python bench.py [--envs 32] [--candidates 1000] [--horizon 30]
                       [--steps 10] [--task walker_walk] [--cpu]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def build_bench(task: str, B: int, K: int, H: int, cem_iters: int,
                steps: int, sampler: str = 'triangular', compute_dtype=None,
                group: int = 1,
                model_kind: str = 'mlp', n_ensemble: int = 5,
                unroll: int = 1):
    from mujoco_mbrl_tpu import models, planners, suite
    from mujoco_mbrl_tpu.ops import (mlp_sample_rollout_costs,
                                     mlp_sample_rollout_costs_ensemble)

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    state0, ts0 = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0),
                                                       B))
    obs_dim = suite.flatten_observation(
        jax.tree_util.tree_map(lambda x: x[0], ts0.observation)).shape[0]
    act_dim = env.model.nu

    base = models.MLPDynamics(obs_dim, act_dim, hidden_units=50)
    if model_kind == 'ensemble':
        # BASELINE.json configs[3]: walker-walk with the ensemble model.
        # Planning = TS-infinity member propagation (candidate k ->
        # member k % n), through the one-launch (member, env) kernel.
        model = models.EnsembleDynamics(base, n_ensemble)
    else:
        model = base
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(obs_dim).at[1].set(1.0)
    weights = jnp.ones(obs_dim)

    def plan_batch(params, obs, key):
        if model_kind == 'ensemble':
            model_fn = lambda s, a: model.forward_ts(params, s, a)
        else:
            model_fn = lambda s, a: model.forward(params, s, a)
        cost = lambda states, actions: (
            models.smooth_abs_loss(states, goal, weights)
            + models.cosh_loss(actions))
        # The fused Pallas path (in-kernel sampling + rollout + cost)
        # wins when the feature dims carry real MXU work; for very small
        # models (cartpole: 5+1 dims) the XLA scan path is faster — tile
        # padding dominates the kernel.
        from mujoco_mbrl_tpu.ops.cem_rollout import _supports_pallas
        scf = None
        if obs_dim + act_dim >= 16 and _supports_pallas():
            if model_kind == 'ensemble':
                # trailing static True = "padded-lane costs pre-masked
                # in-kernel" (member-blocked layout, cem_batched contract)
                scf = lambda seed, mean, std: (
                    *mlp_sample_rollout_costs_ensemble(
                        params, seed, obs, mean, std, goal, weights,
                        num_candidates=K, n_members=n_ensemble,
                        sampler=sampler, compute_dtype=compute_dtype,
                        return_padded=True), True)
            else:
                # return_padded: hand the planner the kernel's tile-padded
                # (grouped, with --group > 1) buffers; the refit masks
                # lanes in place instead of paying a full-HBM slice copy
                scf = lambda seed, mean, std: mlp_sample_rollout_costs(
                    params, seed, obs, mean, std, goal, weights,
                    num_candidates=K, sampler=sampler,
                    compute_dtype=compute_dtype, envs_per_program=group,
                    unroll=unroll, return_padded=True)
        # else CPU (--cpu / no chip): the fused kernels' on-core PRNG has
        # no CPU lowering; cem_batched falls back to the XLA scan path
        traj = planners.cem_batched(
            key, obs, model_fn, cost, horizon=H, action_dim=act_dim,
            num_candidates=K, num_elites=max(K // 10, 1),
            num_iterations=cem_iters, sample_costs_fn=scf,
            return_states=False)
        return traj.actions[0]

    def run(params, env_state, key):
        # The observation each control step comes from the previous
        # step's TimeStep — env.step already ran the observation forward
        # (with the task's acc_stage fast path). Recomputing it from
        # env_state here would pay a SECOND full forward incl. the
        # constraint solve per control step (~7 ms at 1024 envs).
        obs0 = jax.vmap(lambda s: suite.flatten_observation(
            env._observe(env._model_with(s.params), s.physics,
                         s.params)))(env_state)

        def control_step(carry, k):
            env_state, obs = carry
            actions = plan_batch(params, obs, k)
            env_state, ts = jax.vmap(env.step)(env_state, actions)
            obs = jax.vmap(suite.flatten_observation)(ts.observation)
            return (env_state, obs), ts.reward.mean()

        (env_state, _), rewards = jax.lax.scan(
            control_step, (env_state, obs0), jax.random.split(key, steps))
        return env_state, rewards

    return jax.jit(run), (params, state0, jax.random.PRNGKey(2))


def full_loop_bench(task: str, B: int, K: int, H: int, cem_iters: int,
                    steps: int, repeats: int, sampler: str = 'triangular',
                    compute_dtype=None, train_epochs: int = 50,
                    train_batch: int = 512):
    """Time the COMPLETE MBRL iteration: collect (with MPC planning) ->
    replay add + stats refresh -> model fit — the cheetah-run milestone
    (BASELINE.json configs[2], reference loop agents.py:282-295), fused
    into ONE jitted program with the replay buffer resident in HBM.

    Reported value = env-steps/s over the whole iteration (collection
    env-steps divided by total iteration time, training included) — the
    throughput of the thing the framework is actually for.
    """
    import optax
    from mujoco_mbrl_tpu import models, planners, suite
    from mujoco_mbrl_tpu.data import replay as R
    from mujoco_mbrl_tpu.models.train import make_normalizers, train_model
    from mujoco_mbrl_tpu.ops import mlp_sample_rollout_costs
    from mujoco_mbrl_tpu.ops.cem_rollout import _supports_pallas

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    state0, ts0 = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), B))
    obs_dim = suite.flatten_observation(
        jax.tree_util.tree_map(lambda x: x[0], ts0.observation)).shape[0]
    act_dim = env.model.nu
    model = models.MLPDynamics(obs_dim, act_dim, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    goal = jnp.zeros(obs_dim).at[1].set(1.0)
    weights = jnp.ones(obs_dim)

    # replay: 2 iterations of rollouts resident (ring evicts the oldest —
    # data.py:169-183 semantics), obs_only data mode (agents.py:218-226)
    buf = R.init_replay(capacity_rollouts=2 * B, rollout_length=steps,
                        state_dim=obs_dim, obs_dim=obs_dim,
                        act_dim=act_dim)

    use_kernel = obs_dim + act_dim >= 16 and _supports_pallas()

    def plan_batch(params, norms, obs, key):
        model_fn = lambda s, a: model.forward(params, s, a, norms)
        cost = lambda states, actions: (
            models.smooth_abs_loss(states, goal, weights)
            + models.cosh_loss(actions))
        scf = None
        if use_kernel:
            # grouped lanes (auto-falls back to G=1 if B doesn't tile)
            scf = lambda seed, mean, std: mlp_sample_rollout_costs(
                params, seed, obs, mean, std, goal, weights,
                normalizers=norms, num_candidates=K, sampler=sampler,
                compute_dtype=compute_dtype, envs_per_program=4,
                return_padded=True)
        traj = planners.cem_batched(
            key, obs, model_fn, cost, horizon=H, action_dim=act_dim,
            num_candidates=K, num_elites=max(K // 10, 1),
            num_iterations=cem_iters, sample_costs_fn=scf,
            return_states=False)
        return traj.actions[0]

    def collect(params, norms, env_state, key, random_policy: bool):
        obs0 = jax.vmap(lambda s: suite.flatten_observation(
            env._observe(env._model_with(s.params), s.physics,
                         s.params)))(env_state)

        def control_step(carry, k):
            env_state, obs = carry
            if random_policy:
                actions = jax.random.uniform(
                    k, (B, act_dim), minval=-1.0, maxval=1.0)
            else:
                actions = plan_batch(params, norms, obs, k)
            env_state, ts = jax.vmap(env.step)(env_state, actions)
            new_obs = jax.vmap(suite.flatten_observation)(ts.observation)
            return (env_state, new_obs), (obs, actions, ts.reward)

        (env_state, obsN), (obs_seq, act_seq, rew_seq) = jax.lax.scan(
            control_step, (env_state, obs0), jax.random.split(key, steps))
        obs_all = jnp.concatenate(
            [obs_seq, obsN[None]], axis=0).transpose(1, 0, 2)  # (B,T+1,d)
        return env_state, R.Rollouts(
            states=obs_all, observations=obs_all,
            actions=act_seq.transpose(1, 0, 2), rewards=rew_seq.T)

    def iteration(params, opt_state, buf, env_state, key):
        """collect -> add_rollouts (stats refresh) -> fit."""
        ck, tk = jax.random.split(key)
        norms = make_normalizers(buf)
        env_state, rolls = collect(params, norms, env_state, ck,
                                   random_policy=False)
        buf = R.add_rollouts(buf, rolls)
        norms = make_normalizers(buf)
        params, opt_state, log = train_model(
            model, params, buf, tk, optimizer=optimizer,
            opt_state=opt_state, batch_size=train_batch,
            num_epochs=train_epochs, normalizers=norms, obs_only=True)
        return params, opt_state, buf, env_state, log.final_loss

    seed_j = jax.jit(lambda es, k: collect(params, None, es, k,
                                           random_policy=True))
    iter_j = jax.jit(iteration)

    # seed phase (outside timing, like the reference's initial rollouts):
    # fills the buffer so normalization stats are meaningful
    env_state, rolls = seed_j(state0, jax.random.PRNGKey(3))
    buf = R.add_rollouts(buf, rolls)

    # compile + warmup
    out = iter_j(params, opt_state, buf, env_state, jax.random.PRNGKey(4))
    jax.block_until_ready(out)

    best = float('inf')
    for r in range(repeats):
        t0 = time.perf_counter()
        out = iter_j(params, opt_state, buf, env_state,
                     jax.random.fold_in(jax.random.PRNGKey(5), r))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    p_, o_, b_, e_, final_loss = out

    env_steps = B * steps
    print(json.dumps({
        'metric': (f'full MBRL-loop env-steps/s (collect {B}x{steps} with '
                   f'CEM {K}x{H}x{cem_iters} MPC + replay add + fit '
                   f'{train_epochs} epochs bs{train_batch}) [{task}]'),
        'value': round(env_steps / best, 1),
        'unit': 'env-steps/s',
        'iteration_s': round(best, 3),
        'final_train_loss': round(float(final_loss), 5),
        'vs_baseline': round(env_steps / best / 10000.0, 4),
    }))


def agent_loop_bench(task: str, B: int, K: int, H: int, cem_iters: int,
                     steps: int, repeats: int):
    """Time the PRODUCTION agent collection path: GoalStateAgent's jitted
    batched-CEM policy collector, planning in the agent's own space —
    the featured STATE vector with the domain's goal weights on
    locomotion tasks (agents/mpc.py GoalStateAgent), not the raw
    observation vector the microbench uses. Closes the bench-vs-agent
    cost-space gap flagged in VERDICT r2 (weak #6): a regression in the
    featured-state planning path shows up here.
    """
    import optax
    from mujoco_mbrl_tpu import agents, envs, models, planners

    domain, task_name = task.rsplit('_', 1)
    env = envs.load(domain, task_name)
    w = env.get_goal_weights()
    plan_dim = int(w.shape[0])
    model = models.MLPDynamics(plan_dim, env.action_dim, hidden_units=50)
    agent = agents.GoalStateAgent(
        environment=env, planner=planners.CEMPlanner, model=model,
        horizon=H, optimizer=optax.adam(0.01), rollout_length=steps,
        num_rollouts_per_iteration=B, num_train_iterations=1,
        writer=None, base_path='/tmp/bench_agent_loop', seed=0,
        planner_kwargs=dict(num_candidates=K,
                            num_elites=max(K // 10, 1),
                            num_iterations=cem_iters))
    goal = env.set_goal(jax.random.PRNGKey(3))
    collect = agent._policy_collect(B)

    out = collect(agent.params, None, goal, jax.random.PRNGKey(4))
    jax.block_until_ready(out)
    best = float('inf')
    for r in range(repeats):
        t0 = time.perf_counter()
        out = collect(agent.params, None, goal,
                      jax.random.fold_in(jax.random.PRNGKey(5), r))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    env_steps = B * steps
    print(json.dumps({
        'metric': (f'agent-path env-steps/s (GoalStateAgent batched-CEM '
                   f'{K}x{H}x{cem_iters} in featured-state space, '
                   f'{B} envs) [{task}]'),
        'value': round(env_steps / best, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(env_steps / best / 10000.0, 4),
    }))


# TPU v5e (v5 lite) single-chip peaks for the roofline columns.
# bf16 MXU peak is the published 197 TFLOP/s; the physics path pins
# matmul precision to HIGHEST, which XLA implements as a 6-pass bf16
# decomposition => effective f32 MXU peak ~ peak/6. HBM: 819 GB/s.
V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = V5E_BF16_PEAK / 6.0
V5E_HBM_BPS = 819e9


def analytic_flops(task: str, B: int, K: int, H: int, cem_iters: int,
                   model_kind: str = 'mlp', hidden: int = 50):
    """Analytic FLOP counts per CONTROL STEP for the two phases.

    VERDICT r4 #6: convert the CEM MLP rollouts and the physics
    pipeline into achieved-FLOP/s so bench output can say how far from
    the hardware ceiling each phase runs and where headroom remains.

    Plan phase (per env): cem_iters CEM rounds, each rolling K
    candidates H steps through the MLP dynamics model — the matmul
    FLOPs are the workload; sampling/cost/refit are O(K*H*act_dim)
    noise next to them. Ensemble TS-inf costs the same per candidate
    (each candidate propagates through exactly one member).

    Physics phase (per env): n_substeps of the engine. Counted terms
    (formula documented next to each): smooth-dynamics kinematics/
    CRBA/RNEA (structure-proportional estimate), the two dense
    Cholesky factorizations (qM and M+hB), triangular solves, the
    constraint-solve linear algebra in whichever regime the model
    compiles to (materialized (nr,nr) dual vs factored J/Minv), and
    the APGD iterate at its iteration CAP — early exit usually stops
    sooner, so the physics numbers are an upper bound on useful FLOPs
    (stated in the output).
    """
    import numpy as np
    from mujoco_mbrl_tpu import suite
    from mujoco_mbrl_tpu.ops import apgd_solve as _ker
    from mujoco_mbrl_tpu.physics import collision, smooth
    from mujoco_mbrl_tpu.physics import solver as solver_mod

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    m = env.model
    _, ts0 = jax.eval_shape(env.reset, jax.ShapeDtypeStruct((2,),
                                                            jnp.uint32))
    obs_dim = sum(int(np.prod(v.shape))
                  for v in jax.tree_util.tree_leaves(ts0.observation))
    act_dim = m.nu
    nv = m.nv
    nsub = env._n_sub_steps

    # constraint row count: trace-only probe (no device compute)
    info = {}

    def _probe(qpos, qvel):
        meta = smooth.tree_meta(m)
        (xpos, xquat, xmat, geom_xpos, geom_xmat, site_xpos,
         xanchor, xaxis) = smooth.kinematics(m, qpos, meta)
        cdof = smooth.motion_subspace(m, xquat, xanchor, xaxis, meta)
        contact = None
        pairs = collision.candidate_pairs(
            m, include_geom_geom=m.opt.enable_geom_geom_contacts)
        if pairs:
            contact = collision.detect(m, geom_xpos, geom_xmat, pairs)
        cs = solver_mod.assemble(m, meta, qpos, qvel, cdof, contact,
                                 site_xpos=site_xpos)
        info['nr'] = 0 if cs is None else cs.J.shape[0]
        return qpos

    jax.eval_shape(_probe, jnp.zeros((m.nq,)), jnp.zeros((nv,)))
    nr = info['nr']

    # ---- plan phase ------------------------------------------------------
    mlp = 2 * ((obs_dim + act_dim) * hidden + hidden * hidden
               + hidden * obs_dim)                     # MACs*2 per forward
    plan_flops = B * cem_iters * K * H * mlp

    # ---- physics phase ---------------------------------------------------
    iters = 2 * m.opt.solver_iterations                # solve_apgd cap
    power = 8                                          # warm-start iters
    smooth_est = (m.nbody * 500                        # FK/inertia/bias
                  + nv * nv * 20)                      # CRBA composite
    chol = 2 * (2.0 / 3.0) * nv ** 3                   # qM and M+hB
    tri = 6 * 2 * nv * nv                              # back-substitutions
    if nr:
        minv_jt = 2 * nv * nv * nr                     # cho_solve(J')
        factored = (nr > _ker.MAX_NR
                    and _ker.factored_fits(nr, nv))
        if factored:
            matvec = 2 * (2 * nr * nv + nv * nv)       # J(Minv(J'y))+Rs*y
            build = 2 * nv * nv * nv                   # Minv = solve(I)
        else:
            matvec = 2 * nr * nr                       # resident Ad @ y
            build = 2 * nv * nr * nr                   # A = J @ MinvJT
        solve_flops = (minv_jt + build
                       + (iters + power) * matvec
                       + 2 * nr * nv)                  # J' f back-map
    else:
        solve_flops = 0
    physics_flops = B * nsub * (smooth_est + chol + tri + solve_flops)

    return {
        'plan_flops_per_ctrl_step': plan_flops,
        'physics_flops_per_ctrl_step': physics_flops,
        'nr': nr, 'nv': nv, 'n_substeps': nsub,
        'obs_dim': obs_dim, 'act_dim': act_dim,
    }


def mfu_report(fl, t_plan_s, t_phys_s):
    """Roofline columns from analytic FLOPs + measured phase times.

    Plan runs at the MXU's fast (bf16-pass) precision -> % of the bf16
    peak. Physics pins HIGHEST precision -> % of the 6-pass f32 peak.
    Both carry the achieved TFLOP/s so the reader can re-baseline.
    """
    out = {}
    if t_plan_s and t_plan_s > 0:
        tf = fl['plan_flops_per_ctrl_step'] / t_plan_s
        out['plan_tflops'] = round(tf / 1e12, 2)
        out['plan_mfu_pct_bf16peak'] = round(100 * tf / V5E_BF16_PEAK, 2)
    if t_phys_s and t_phys_s > 0:
        tf = fl['physics_flops_per_ctrl_step'] / t_phys_s
        out['physics_tflops_upper'] = round(tf / 1e12, 2)
        out['physics_mfu_pct_f32peak'] = round(100 * tf / V5E_F32_PEAK, 2)
    return out


def phase_breakdown(task: str, B: int, K: int, H: int, cem_iters: int,
                    sampler: str, compute_dtype=None,
                    group: int = 1):
    """Time the plan and physics phases as separate jitted programs.

    Reproducible evidence for the per-phase claims in README's
    performance table: plan = one full CEM call (cem_iters fused-kernel
    iterations + elite refits), physics = one control step (n_substeps
    scanned physics steps + observation forward). Prints one JSON line.
    """
    run, (params, state0, key) = None, (None, None, None)  # noqa: F841
    from mujoco_mbrl_tpu import models, planners, suite
    from mujoco_mbrl_tpu.ops import mlp_sample_rollout_costs
    from mujoco_mbrl_tpu.ops.cem_rollout import _supports_pallas

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    state0, ts0 = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), B))
    obs_dim = suite.flatten_observation(
        jax.tree_util.tree_map(lambda x: x[0], ts0.observation)).shape[0]
    act_dim = env.model.nu
    model = models.MLPDynamics(obs_dim, act_dim, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(obs_dim).at[1].set(1.0)
    weights = jnp.ones(obs_dim)
    obs = jax.vmap(lambda s: suite.flatten_observation(
        env._observe(env._model_with(s.params), s.physics,
                     s.params)))(state0)

    # Each phase is timed as a jitted scan of `chain` back-to-back
    # calls; dividing by `chain` amortizes the per-dispatch host->device
    # latency (the axon tunnel adds ~tens of ms per call, which would
    # otherwise swamp single-digit-ms phases — the production workload
    # chains steps inside one program and never pays it per step).
    chain = 10

    def timed(fn, *args, repeats=5):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / chain

    # plan phase (full CEM call, as the agent runs it)
    model_fn = lambda s, a: model.forward(params, s, a)
    cost = lambda states, actions: (
        models.smooth_abs_loss(states, goal, weights)
        + models.cosh_loss(actions))
    scf = None
    if obs_dim + act_dim >= 16 and _supports_pallas():
        scf = lambda seed, mean, std: mlp_sample_rollout_costs(
            params, seed, obs, mean, std, goal, weights,
            num_candidates=K, sampler=sampler,
            compute_dtype=compute_dtype, envs_per_program=group,
            return_padded=True)
    def plan_once(key):
        return planners.cem_batched(
            key, obs, model_fn, cost, horizon=H, action_dim=act_dim,
            num_candidates=K, num_elites=max(K // 10, 1),
            num_iterations=cem_iters, sample_costs_fn=scf,
            return_states=False).actions[0]

    plan = jax.jit(lambda key: jax.lax.scan(
        lambda c, k: (c + plan_once(k).sum(), None),
        jnp.zeros(()), jax.random.split(key, chain))[0])
    t_plan = timed(plan, jax.random.PRNGKey(2))

    # physics phase (one control step: substeps + observation forward)
    acts = jnp.zeros((B, act_dim))
    phys = jax.jit(lambda s, a: jax.lax.scan(
        lambda c, _: (jax.vmap(env.step)(c, a)[0], None),
        s, None, length=chain)[0])
    t_phys = timed(phys, state0, acts)

    total = t_plan + t_phys
    fl = analytic_flops(task, B, K, H, cem_iters)
    print(json.dumps({
        'metric': f'phase breakdown ({task}, {B} envs, CEM {K}x{H}'
                  f'x{cem_iters}, sampler={sampler})',
        'plan_ms': round(t_plan * 1e3, 2),
        'plan_ms_per_cem_iter': round(t_plan * 1e3 / cem_iters, 2),
        'physics_ms_per_control_step': round(t_phys * 1e3, 2),
        'implied_env_steps_per_s': round(B / total, 1),
        **mfu_report(fl, t_plan, t_phys),
        'mfu_note': 'physics FLOPs counted at the APGD iteration cap '
                    '(early exit stops sooner): physics_* are upper '
                    'bounds; plan_* are exact matmul counts',
    }))


def selfcheck(task: str, sampler: str = 'normal', compute_dtype=None,
              group: int = 1):
    """Assert the fused Pallas sampling kernel matches the XLA reference.

    Runs on the real chip immediately before timing: the kernel's costs
    must equal the scan-path rollout costs evaluated on the very actions
    the kernel sampled (mirrors tests/test_ops_kernels.py::
    test_sample_rollout_costs_parity_on_tpu, which CPU CI must skip).
    ``group > 1`` validates the grouped-lane kernel variant — the one
    the timed run actually uses.
    """
    import numpy as np
    from mujoco_mbrl_tpu import models, suite
    from mujoco_mbrl_tpu.ops import (mlp_sample_rollout_costs,
                                     mlp_rollout_costs_reference)

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    _, ts0 = env.reset(jax.random.PRNGKey(0))
    obs_dim = suite.flatten_observation(ts0.observation).shape[0]
    act_dim = env.model.nu
    model = models.MLPDynamics(obs_dim, act_dim, hidden_units=50)
    params = model.init(jax.random.PRNGKey(1))
    goal = jnp.zeros(obs_dim)
    weights = jnp.ones(obs_dim)
    B, K, H = 4, 128, 8
    s0 = jax.random.normal(jax.random.PRNGKey(2), (B, obs_dim))
    mean = jnp.zeros((B, H, act_dim))
    std = jnp.ones((B, H, act_dim)) * 0.5
    costs, actions = mlp_sample_rollout_costs(
        params, 7, s0, mean, std, goal, weights, num_candidates=K,
        sampler=sampler, compute_dtype=compute_dtype,
        envs_per_program=group)
    flat = jnp.asarray(actions, jnp.float32).transpose(1, 0, 3, 2).reshape(
        H, B * K, act_dim)
    s0f = jnp.broadcast_to(s0[:, None], (B, K, obs_dim)).reshape(
        B * K, obs_dim)
    ref = mlp_rollout_costs_reference(params, s0f, flat, goal,
                                      weights).reshape(B, K)
    # bf16 kernels roll the MLP at reduced precision while the reference
    # path stays f32 — the comparison bounds accumulated rounding, not
    # bit equality (relu branch flips amplify ~1e-3 relative per step)
    rtol, atol = (5e-2, 5e-1) if compute_dtype is not None else (1e-4, 1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref),
                               rtol=rtol, atol=atol,
                               err_msg='fused sampling kernel diverged '
                                       'from the XLA reference path')
    print('# selfcheck: fused kernel vs XLA parity OK '
          f'(max|d|={np.max(np.abs(np.asarray(costs) - np.asarray(ref))):.2e})',
          file=sys.stderr)


def selfcheck_ensemble(task: str, n: int = 5, sampler: str = 'normal',
                       compute_dtype=None):
    """Validate the one-launch ensemble kernel on the real chip: candidate
    k must be costed by member k % n on the kernel's own sampled actions
    (the TS-infinity assignment), mirroring
    tests/test_ops_kernels.py::test_ensemble_sample_kernel_parity_on_tpu.
    """
    import numpy as np
    from mujoco_mbrl_tpu import models, suite
    from mujoco_mbrl_tpu.ops import (mlp_rollout_costs_reference,
                                     mlp_sample_rollout_costs_ensemble)

    domain, task_name = task.rsplit('_', 1)
    env = suite.load(domain, task_name)
    _, ts0 = env.reset(jax.random.PRNGKey(0))
    obs_dim = suite.flatten_observation(ts0.observation).shape[0]
    act_dim = env.model.nu
    ens = models.EnsembleDynamics(
        models.MLPDynamics(obs_dim, act_dim, hidden_units=50), n)
    params = ens.init(jax.random.PRNGKey(1))
    goal, w = jnp.zeros(obs_dim), jnp.ones(obs_dim)
    B, K, H = 4, 10 * n, 8
    s0 = jax.random.normal(jax.random.PRNGKey(2), (B, obs_dim))
    mean, std = jnp.zeros((B, H, act_dim)), jnp.full((B, H, act_dim), 0.5)
    costs, actions = mlp_sample_rollout_costs_ensemble(
        params, 7, s0, mean, std, goal, w, num_candidates=K, n_members=n,
        sampler=sampler, compute_dtype=compute_dtype)
    flat = jnp.asarray(actions, jnp.float32).transpose(1, 0, 3, 2).reshape(
        H, B * K, act_dim)
    s0f = jnp.broadcast_to(s0[:, None], (B, K, obs_dim)).reshape(
        B * K, obs_dim)
    refs = jnp.stack([
        mlp_rollout_costs_reference(
            jax.tree_util.tree_map(lambda v: v[mi], params),
            s0f, flat, goal, w).reshape(B, K) for mi in range(n)])
    member = jnp.arange(K) % n
    ref = refs[member, :, jnp.arange(K)].T
    rtol, atol = (5e-2, 5e-1) if compute_dtype is not None else (1e-4, 1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref),
                               rtol=rtol, atol=atol,
                               err_msg='ensemble fused kernel diverged '
                                       'from the per-member reference')
    print('# selfcheck: ensemble fused kernel (member k % n assignment) '
          'vs XLA parity OK', file=sys.stderr)


# BASELINE.json milestone configs as presets (BASELINE.md:26). Each maps
# to CLI defaults; explicit flags still override afterwards.
CONFIGS = {
    'northstar': dict(task='walker_walk', envs=1024, candidates=1000,
                      horizon=30),
    'cartpole': dict(task='cartpole_swingup', envs=128, candidates=1000,
                     horizon=30),
    'reacher256': dict(task='reacher_easy', envs=256, candidates=500,
                       horizon=20),
    'cheetah1024': dict(task='cheetah_run', envs=1024, candidates=1000,
                        horizon=30, full_loop=True),
    'walker_ens': dict(task='walker_walk', envs=1024, candidates=1000,
                       horizon=30, model='ensemble'),
    'humanoid': dict(task='humanoid_walk', envs=512, candidates=1000,
                     horizon=30),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default=None, choices=sorted(CONFIGS),
                   help='BASELINE milestone preset; sets task/envs/'
                        'candidates/horizon (+model/full-loop where the '
                        'milestone names them). Explicit flags override.')
    p.add_argument('--task', default='walker_walk')
    p.add_argument('--no-selfcheck', action='store_true',
                   help='skip the kernel-vs-XLA cost parity assert')
    p.add_argument('--envs', type=int, default=1024)
    p.add_argument('--candidates', type=int, default=1000)
    p.add_argument('--horizon', type=int, default=30)
    p.add_argument('--cem_iters', type=int, default=3,
                   help='CEM refinement iterations. The reference plans '
                        'with a SINGLE random-shooting pass '
                        '(planners.py:202-209); 3 CEM iterations is '
                        'already a strictly stronger planner per step.')
    p.add_argument('--steps', type=int, default=10)
    p.add_argument('--sampler', default='triangular',
                   choices=('normal', 'triangular', 'spline4'),
                   help='in-kernel candidate sampler; triangular '
                        '(Irwin-Hall 2, unit variance) avoids Box-Muller '
                        'transcendentals on the VPU; spline4 adds '
                        'iCEM-style low-frequency temporal correlation')
    p.add_argument('--group', type=int, default=None,
                   help='envs per fused-kernel program (grouped lane '
                        'layout: G envs share each MLP matmul pass; the '
                        'elite refit consumes the grouped buffers '
                        'directly, no un-interleave transpose). Default: '
                        'auto — 4 when the config supports it (measured '
                        '+19%% on the walker north-star config: 10,439 '
                        'vs 8,804 env-steps/s), else 1.')
    p.add_argument('--unroll', type=int, default=1,
                   help='horizon-loop unroll inside the sampling kernel; '
                        'Pallas fori_loop supports only 1 (no unroll) or '
                        'the full horizon (complete unroll)')
    p.add_argument('--dtype', default='f32', choices=('f32', 'bf16'),
                   help='in-kernel MLP compute dtype; bf16 runs the '
                        'candidate-rollout matmuls at the MXU double '
                        'rate (cost accumulation stays f32)')
    p.add_argument('--repeats', type=int, default=3)
    p.add_argument('--model', default='mlp', choices=('mlp', 'ensemble'),
                   help="'ensemble' = 5-member bootstrap ensemble planned "
                        "with TS-infinity member propagation through the "
                        "one-launch (member, env) kernel — the walker-walk "
                        "milestone config (BASELINE.json configs[3])")
    p.add_argument('--n_ensemble', type=int, default=5)
    p.add_argument('--agent-loop', action='store_true', dest='agent_loop',
                   help='time the production GoalStateAgent batched-CEM '
                        'collector (plans in the featured-STATE space '
                        'with domain goal weights — the agent path, not '
                        'the obs-space microbench)')
    p.add_argument('--full-loop', action='store_true', dest='full_loop',
                   help='time the COMPLETE collect->fit->plan iteration '
                        '(replay add + train epochs included) instead of '
                        'the plan+physics microbench — the cheetah-run '
                        'milestone (BASELINE.json configs[2])')
    p.add_argument('--train_epochs', type=int, default=50,
                   help='model-fit epochs per full-loop iteration '
                        '(reference default, models.py:57)')
    p.add_argument('--train_batch', type=int, default=512)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--phases', action='store_true',
                   help='time plan/physics as separate jitted programs '
                        'and print the per-phase JSON line instead')
    p.add_argument('--device-timeout', type=float, default=240.0,
                   help='seconds to wait for device init before emitting '
                        'an error JSON line and exiting (the axon TPU '
                        'tunnel can hang jax.devices() indefinitely)')
    args = p.parse_args()

    if args.config:
        # preset first, explicit flags win: re-parse with preset defaults
        preset = CONFIGS[args.config]
        p.set_defaults(**preset)
        args = p.parse_args()

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    if args.unroll not in (1, args.horizon):
        p.error(f'--unroll must be 1 or the full horizon '
                f'({args.horizon}): Pallas fori_loop supports no '
                'partial unroll')

    group_ok = (args.sampler != 'spline4'
                and args.model == 'mlp')
    if args.group is None:
        # auto: grouped lanes win on the north-star config (4 envs per
        # program share each MLP matmul pass; refit reads the grouped
        # buffers in place) — fall back to 1 where the layout doesn't
        # apply
        args.group = 4 if (group_ok and args.envs % 4 == 0) else 1
    elif args.group > 1:
        # --group given explicitly only reaches the kernel through the
        # two-phase sampling path, and the kernel silently falls back to
        # G=1 when the env count doesn't tile into groups
        # (ops/cem_rollout.py) — fail loudly rather than attribute
        # results to grouping that never ran.
        if args.sampler == 'spline4':
            p.error('--group > 1 is not supported with --sampler spline4')
        if args.model == 'ensemble':
            p.error('--group > 1 is not supported with --model ensemble '
                    '(the ensemble kernel blocks lanes by member)')
        if args.envs % args.group != 0:
            p.error(f'--envs {args.envs} must be divisible by '
                    f'--group {args.group}')

    # Device-init watchdog: a broken TPU tunnel hangs jax.devices()
    # forever with 0% CPU; better to emit an explicit error record than
    # to wedge the caller. Cancelled as soon as devices come up.
    import os
    import threading

    def _no_devices():
        print(json.dumps({
            'metric': f'env-steps/s/chip ({args.task}) — DEVICE INIT '
                      'TIMEOUT: TPU tunnel unreachable',
            'value': 0.0, 'unit': 'env-steps/s', 'vs_baseline': 0.0,
            'error': f'device init exceeded {args.device_timeout}s',
        }), flush=True)
        os._exit(3)

    watchdog = threading.Timer(args.device_timeout, _no_devices)
    watchdog.daemon = True
    watchdog.start()
    jax.devices()
    watchdog.cancel()

    # Persistent compiled-program cache: the walker MPC program is large
    # (CEM kernel + contact physics fused into one scan) and its XLA
    # compile dominates cold-start; cache hits make repeat bench runs
    # (and the driver's round-end run) start in seconds.
    # (TPU only: XLA:CPU executable serialization is unreliable on this
    # host class — machine-feature mismatches on load, and the serializer
    # can segfault; see tests/conftest.py.)
    if not args.cpu:
        try:
            jax.config.update('jax_compilation_cache_dir',
                              '/tmp/jax_bench_cache')
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
        except Exception:
            pass

    compute_dtype = jnp.bfloat16 if args.dtype == 'bf16' else None

    if args.phases:
        phase_breakdown(args.task, args.envs, args.candidates,
                        args.horizon, args.cem_iters, args.sampler,
                        compute_dtype, args.group)
        return 0

    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    if on_tpu and not args.no_selfcheck:
        # cost-vs-actions parity is sampler-agnostic: whatever actions
        # the kernel sampled must yield the XLA reference's costs
        if args.model == 'ensemble':
            selfcheck_ensemble(args.task, args.n_ensemble, args.sampler,
                               compute_dtype)
        else:
            selfcheck(args.task, args.sampler, compute_dtype,
                      group=args.group if args.group in (2, 4) else 1)

    if args.agent_loop:
        agent_loop_bench(args.task, args.envs, args.candidates,
                         args.horizon, args.cem_iters, args.steps,
                         args.repeats)
        return 0

    if args.full_loop:
        full_loop_bench(args.task, args.envs, args.candidates,
                        args.horizon, args.cem_iters, args.steps,
                        args.repeats, args.sampler, compute_dtype,
                        args.train_epochs, args.train_batch)
        return 0

    run, (params, state0, key) = build_bench(
        args.task, args.envs, args.candidates, args.horizon,
        args.cem_iters, args.steps, args.sampler, compute_dtype,
        args.group, args.model, args.n_ensemble,
        args.unroll)

    # compile + warmup
    out = run(params, state0, key)
    jax.block_until_ready(out)

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        out = run(params, state0, jax.random.fold_in(key, r))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    env_steps_per_s = args.envs * args.steps / best
    model_tag = (f', {args.n_ensemble}-member ensemble TS-inf'
                 if args.model == 'ensemble' else '')
    # roofline summary: analytic FLOPs over the measured wall time. The
    # plan matmuls dominate every milestone config, so the combined
    # number is reported against the bf16 MXU peak (per-phase splits
    # live in --phases output).
    try:
        fl = analytic_flops(args.task, args.envs, args.candidates,
                            args.horizon, args.cem_iters, args.model)
        step_flops = (fl['plan_flops_per_ctrl_step']
                      + fl['physics_flops_per_ctrl_step'])
        tflops = step_flops * args.steps / best / 1e12
        mfu = {'achieved_tflops_upper': round(tflops, 2),
               'mfu_pct_bf16peak': round(100 * tflops * 1e12
                                         / V5E_BF16_PEAK, 2)}
    except Exception:
        mfu = {}
    print(json.dumps({
        'metric': (f'env-steps/s/chip with CEM '
                   f'{args.candidates}x{args.horizon} MPC planning '
                   f'({args.task}, {args.envs} envs{model_tag})'),
        'value': round(env_steps_per_s, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(env_steps_per_s / 10000.0, 4),
        **mfu,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
