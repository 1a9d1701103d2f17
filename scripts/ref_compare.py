"""Learning-curve comparison against the ACTUAL reference implementation.

Runs the reference `src/mbrl` GoalStateAgent (torch CPU, from
/root/reference, read-only import with small compat shims for
torch>=2 / missing colorlog) and this framework's GoalStateAgent on the
same task with a matched, shrunk configuration, and reports the
per-iteration policy-rollout reward curves side by side
(BASELINE.md "learning-curve parity within seed variance" row;
VERDICT r1 item #1 tail).

Rewards (engine ground truth) are the comparable metric — goal-state
costs depend on each framework's independently sampled goals.

Run:  python scripts/ref_compare.py [--task point_mass_easy]
      [--iters 3] [--rollout-len 40] [--candidates 200] [--seeds 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

_CFG = None  # set in main()


# ---------------------------------------------------------------------------
# reference side (torch, /root/reference)
# ---------------------------------------------------------------------------

def _shim_reference_deps():
    import logging
    import types
    import torch  # noqa: F401
    import torch.autograd.gradcheck  # noqa: F401
    gcm = sys.modules['torch.autograd.gradcheck']
    if not hasattr(gcm, 'zero_gradients'):
        def zero_gradients(x):
            if hasattr(x, 'grad'):
                if x.grad is not None:
                    x.grad.detach_()
                    x.grad.zero_()
            else:
                for e in x:
                    zero_gradients(e)
        gcm.zero_gradients = zero_gradients
    if 'colorlog' not in sys.modules:
        try:
            import colorlog  # noqa: F401
        except ImportError:
            mod = types.ModuleType('colorlog')

            class ColoredFormatter(logging.Formatter):
                def __init__(self, fmt=None, *a, **kw):
                    if fmt:
                        fmt = (fmt.replace('%(log_color)s', '')
                               .replace('%(reset)s', ''))
                    super().__init__(fmt)
            mod.ColoredFormatter = ColoredFormatter
            sys.modules['colorlog'] = mod


class _CaptureWriter:
    """SummaryWriter stand-in recording scalars per tag."""

    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append((int(step), float(value)))

    def add_histogram(self, *a, **k):
        pass

    def close(self):
        pass


def run_reference(task, seed):
    _shim_reference_deps()
    sys.path.insert(0, '/root/reference')
    os.environ.setdefault('MUJOCO_GL', 'disabled')
    import numpy as np
    import torch
    torch.manual_seed(seed)
    np.random.seed(seed)
    from functools import partial
    from src.mbrl.env_wrappers import EnvWrapper
    from src.mbrl.agents import GoalStateAgent, MPCPolicy
    from src.mbrl.data import TransitionsDatasetDataMode
    from src.mbrl.planners import RandomShootingPlanner
    from src.mbrl.models import Model, SmoothAbsLoss, CoshLoss
    from src.mbrl.logger import logger as ref_logger
    os.makedirs('/tmp/ref_compare_ref', exist_ok=True)
    if getattr(ref_logger, '_logger', None) is None:
        ref_logger.setup('ref', '/tmp/ref_compare_ref/ref.log', 'warn')

    # headless: no GL backend here, so route the recorded rollout
    # through the plain (render-free) path
    EnvWrapper.record_rollout = (
        lambda self, num_steps, get_action=None, mp4path=None, **kw:
        self.get_rollout(num_steps, get_action, **kw))

    # Walker/Humanoid get_state read `self.env.physics` but EnvWrapper
    # only sets `self._env` (env_wrappers.py:12 vs :531-534) — a latent
    # upstream bug Cheetah avoids by using `self._env` (:290). Alias it
    # so those wrappers run as their author intended.
    if not hasattr(EnvWrapper, 'env'):
        EnvWrapper.env = property(lambda self: self._env)

    domain, task_name = task.rsplit('_', 1)
    env = EnvWrapper.load(domain, task_name)
    w = env.get_goal_weights()
    # Locomotion domains (e.g. cheetah): the reference's goal weights /
    # goals live in the FEATURED-STATE space (env_wrappers.py:296-309,
    # 19-dim) while GoalStateAgent hardcodes obs_only planning
    # (agents.py:218, 17-dim obs) — the env_wrappers.py:8 TODO; running
    # it as shipped crashes on a dim mismatch. For the cross-engine
    # comparison we resolve the inconsistency the same way our framework
    # does (agents/mpc.py GoalStateAgent): plan/train in the space the
    # goal weights are defined over.
    state_space = int(w.shape[0]) != int(env.observation_dim)
    plan_dim = int(w.shape[0]) if state_space else int(env.observation_dim)
    model = Model(plan_dim, env.action_dim)
    optimizer = torch.optim.Adam(model.parameters(), lr=0.01)
    writer = _CaptureWriter()
    state_cost = SmoothAbsLoss(weights=w, goal_state=torch.zeros_like(w))
    action_cost = CoshLoss()

    # shrink the hard-coded planner population via defaults (the planner
    # is used as a class; plan() reads defaults at call time)
    RandomShootingPlanner.defaults = dict(
        num_trajectories=_CFG.candidates)

    agent = GoalStateAgent(
        environment=env, planner=RandomShootingPlanner, model=model,
        horizon=_CFG.horizon, optimizer=optimizer,
        rollout_length=_CFG.rollout_len,
        num_rollouts_per_iteration=_CFG.rollouts_per_iter,
        num_train_iterations=_CFG.iters, writer=writer,
        action_cost=action_cost, state_cost=state_cost,
        base_path='/tmp/ref_compare_ref')
    agent.num_initial_rollouts = _CFG.initial_rollouts
    if state_space:
        # retarget the agent's data stream + planning space at the
        # featured state (mirrors our GoalStateAgent's obs_only=False
        # branch for goal dims that don't match the observation)
        agent.dataset.set_data_mode(TransitionsDatasetDataMode.state_only)
        agent.normalize_state = partial(
            agent.dataset.normalize_field, field_name='states',
            stats=agent.dataset.statistics)
        agent.unnormalize_state = partial(
            agent.dataset.unnormalize_field, field_name='states',
            stats=agent.dataset.statistics)
        agent.policy.model = partial(
            agent.model, normalize_state=agent.normalize_state,
            normalize_action=agent.normalize_action,
            unnormalize_state=agent.unnormalize_state)

        def _plan_on_state(self, state_and_obs):
            state_and_obs = dict(state_and_obs,
                                 observation=state_and_obs['state'])
            return MPCPolicy.get_action(self, state_and_obs)
        agent.policy.get_action = _plan_on_state.__get__(agent.policy)

        def _record_metrics_states(rollouts, rollout_type,
                                   _agent=agent, _cls=GoalStateAgent):
            # the stock method costs rollout.observations (17-dim);
            # in state space the cost weights are 19-dim
            sup = super(GoalStateAgent, _agent)
            sup._record_metrics(rollouts, rollout_type)
            state_costs = [
                float(sum(map(_agent.state_cost, r.states)))
                for r in rollouts]
            action_costs = [
                float(sum(map(_agent.action_cost, r.actions[:-1])))
                for r in rollouts]
            total = [s + a for s, a in zip(state_costs, action_costs)]
            _agent.writer.add_scalar(
                f'AvgRolloutTotalCosts/{rollout_type}',
                float(np.mean(total)), _agent.train_iterations)
        agent._record_metrics = _record_metrics_states
    t0 = time.time()
    agent.train()
    wall = time.time() - t0
    def series(tag):
        return [v for _, v in sorted(writer.scalars.get(tag, []))]
    return {'rewards': series('AvgRolloutRewards/policy'),
            'costs': series('AvgRolloutTotalCosts/policy'),
            'wall_s': round(wall, 1)}


# ---------------------------------------------------------------------------
# our side (jax)
# ---------------------------------------------------------------------------

def run_ours(task, seed):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import optax
    from mujoco_mbrl_tpu import agents, envs, models, planners
    from mujoco_mbrl_tpu.utils.metrics import MetricsWriter

    domain, task_name = task.rsplit('_', 1)
    env = envs.load(domain, task_name)
    # size the model by the agent's PLANNING space: the per-domain goal
    # weights live over the featured state on locomotion domains and the
    # observation on point_mass/reacher (agents/mpc.py GoalStateAgent
    # resolves obs_only from this dim; the reference left the mismatch
    # as a TODO and crashes on e.g. cheetah)
    plan_dim = int(env.get_goal_weights().shape[0])
    model = models.MLPDynamics(plan_dim, env.action_dim)
    out_dir = f'/tmp/ref_compare_ours_{_CFG.task}_{seed}'
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)   # stale metrics corrupt curves
    os.makedirs(out_dir, exist_ok=True)
    writer = MetricsWriter(out_dir)
    agent = agents.GoalStateAgent(
        environment=env, planner=planners.RandomShootingPlanner,
        model=model, horizon=_CFG.horizon, optimizer=optax.adam(0.01),
        rollout_length=_CFG.rollout_len,
        num_rollouts_per_iteration=_CFG.rollouts_per_iter,
        num_train_iterations=_CFG.iters, writer=writer,
        base_path=out_dir, seed=seed,
        num_initial_rollouts=_CFG.initial_rollouts,
        planner_kwargs=dict(num_trajectories=_CFG.candidates))
    t0 = time.time()
    agent.train()
    wall = time.time() - t0
    writer.close()
    with open(os.path.join(out_dir, 'metrics.jsonl')) as f:
        rows = [json.loads(ln) for ln in f]

    def series(tag):
        sel = [r for r in rows if r.get('tag') == tag]
        return [r['value'] for r in sorted(sel, key=lambda r: r['step'])]
    return {'rewards': series('AvgRolloutRewards/policy'),
            'costs': series('AvgRolloutTotalCosts/policy'),
            'wall_s': round(wall, 1)}


def main():
    global _CFG
    ap = argparse.ArgumentParser()
    ap.add_argument('--task', default='point_mass_easy')
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--rollout-len', type=int, default=40)
    ap.add_argument('--rollouts-per-iter', type=int, default=3)
    ap.add_argument('--initial-rollouts', type=int, default=5)
    ap.add_argument('--horizon', type=int, default=10)
    ap.add_argument('--candidates', type=int, default=200)
    ap.add_argument('--seeds', type=int, default=5)
    ap.add_argument('--plot', default=None,
                    help='write a learning-curve PNG to this path')
    ap.add_argument('--out', default=None,
                    help='write the result JSON to this path directly '
                         '(avoids shell redirection mixing stderr into '
                         'the artifact)')
    ap.add_argument('--skip-reference', action='store_true')
    _CFG = ap.parse_args()

    out = {'task': _CFG.task,
           'config': {k: v for k, v in vars(_CFG).items()
                      if k not in ('skip_reference',)},
           'ours': [], 'reference': []}
    for s in range(_CFG.seeds):
        out['ours'].append(run_ours(_CFG.task, seed=s))
    if not _CFG.skip_reference:
        for s in range(_CFG.seeds):
            try:
                out['reference'].append(run_reference(_CFG.task, seed=s))
            except Exception as e:
                # the reference crashes on domains where its goal-weight
                # dim mismatches the observation (the env_wrappers.py:8
                # TODO — e.g. cheetah: 19-dim weights vs 17-dim obs);
                # record the failure instead of faking a comparison
                out['reference_error'] = f'{type(e).__name__}: {e}'[:300]
                break
    out['reference'] = [r for r in out['reference'] if r.get('rewards')]

    # Statistical summary (BASELINE.md "within seed variance"): mean+-std
    # of the final-iteration policy-rollout reward across seeds, plus a
    # Welch-style overlap verdict. Engines use independent RNG streams,
    # so the comparison is distribution-vs-distribution.
    import math

    def final_rewards(runs):
        return [r['rewards'][-1] for r in runs if r['rewards']]

    def best_rewards(runs):
        return [max(r['rewards']) for r in runs if r['rewards']]

    def mean_std(xs):
        m = sum(xs) / len(xs)
        v = sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)
        return m, math.sqrt(v)

    def final_costs(runs):
        return [r['costs'][-1] for r in runs if r.get('costs')]

    def best_costs(runs):
        return [min(r['costs']) for r in runs if r.get('costs')]

    if out['ours'] and out['reference']:
        out['summary'] = {}
        verdicts = []
        # Goal-state training optimizes the COST to a per-iteration
        # resampled random goal, not the task reward — on sparse-reward
        # domains (point_mass: tolerance() indicator around a target the
        # goal rarely lands on) both engines' final-iteration task
        # rewards are legitimately ~0 while the cost curve is the signal
        # that actually moves. Compare both: rewards for the
        # BASELINE.md parity row, costs for statistical power.
        for label, pick in (('final', final_rewards),
                            ('best', best_rewards),
                            ('final_cost', final_costs),
                            ('best_cost', best_costs)):
            fo, fr = pick(out['ours']), pick(out['reference'])
            if not fo or not fr:
                continue
            mo, so = mean_std(fo)
            mr, sr = mean_std(fr)
            se = math.sqrt(so * so / len(fo) + sr * sr / len(fr))
            welch_t = abs(mo - mr) / max(se, 1e-9)
            verdicts.append(welch_t < 3.0)
            key = 'cost' if label.endswith('cost') else 'reward'
            out['summary'][label] = {
                f'{key}_ours': {'mean': round(mo, 3), 'std': round(so, 3),
                                'n': len(fo)},
                f'{key}_reference': {'mean': round(mr, 3),
                                     'std': round(sr, 3), 'n': len(fr)},
                'welch_t': round(welch_t, 3),
            }
        out['summary']['within_seed_variance'] = bool(all(verdicts))

    if _CFG.plot:
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(6, 4))
            for i, r in enumerate(out['ours']):
                ax.plot(r['rewards'], color='tab:blue', alpha=0.6,
                        label='ours' if i == 0 else None)
            for i, r in enumerate(out['reference']):
                ax.plot(r['rewards'], color='tab:orange', alpha=0.6,
                        label='reference (torch)' if i == 0 else None)
            ax.set_xlabel('training iteration')
            ax.set_ylabel('avg policy rollout reward')
            ax.set_title(f'{_CFG.task}: learning curves, '
                         f'{_CFG.seeds} seeds/engine')
            ax.legend()
            fig.tight_layout()
            fig.savefig(_CFG.plot, dpi=110)
            out['plot'] = _CFG.plot
        except Exception as e:   # matplotlib optional
            out['plot_error'] = repr(e)
    if _CFG.out:
        with open(_CFG.out, 'w') as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
