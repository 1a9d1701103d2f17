"""Control suite environments explorer (suite/explore.py analogue).

The reference explorer (``dm_control/dm_control/suite/explore.py:30-84``)
lists every registered ``domain.task``, prompts for one, and launches the
interactive GLFW viewer with optional ``--timeout``, ``--action_noise``
and ``--visualize_reward`` flags.  This build targets headless TPU hosts,
so the same selection/flag surface drives either

  * the offline renderer (default): one random-policy episode rendered
    to a GIF + interactive HTML player (``viewer.launch``), or
  * the live policy-in-the-loop HTTP viewer (``--serve``): step/reset/
    perturb from the browser (``viewer.serve``).

Run::

    python -m mujoco_mbrl_tpu.suite.explore                  # list + prompt
    python -m mujoco_mbrl_tpu.suite.explore cartpole.swingup \
        --visualize_reward --action_noise 0.3 --out /tmp/ep
    python -m mujoco_mbrl_tpu.suite.explore walker.walk --serve
"""

from __future__ import annotations

import argparse


def _all_names():
    from . import all_tasks
    return ['.'.join(dt) for dt in all_tasks()]


def prompt_environment_name(prompt, values):
    """Interactive task picker (reference explore.py:47-54)."""
    environment_name = None
    while not environment_name:
        environment_name = input(prompt)
        if environment_name not in values:
            print(f'"{environment_name}" is not a valid environment name.')
            environment_name = None
    return environment_name


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('environment_name', nargs='?', default=None,
                        help="'domain.task' pair; prompted if omitted")
    parser.add_argument('--timeout', action=argparse.BooleanOptionalAction,
                        default=True,
                        help='whether episodes have a time limit')
    parser.add_argument('--visualize_reward', action='store_true',
                        help='tint geom colors by the current reward')
    parser.add_argument('--action_noise', type=float, default=0.0,
                        help='Gaussian action noise as a fraction of the '
                             'action range')
    parser.add_argument('--steps', type=int, default=200)
    parser.add_argument('--out', default='/tmp/explore_episode',
                        help='output path stem for the GIF/HTML episode')
    parser.add_argument('--serve', action='store_true',
                        help='launch the live HTTP viewer instead of '
                             'rendering an offline episode')
    parser.add_argument('--port', type=int, default=8000)
    args = parser.parse_args(argv)

    names = _all_names()
    environment_name = args.environment_name
    if environment_name is None:
        print('\n  '.join(['Available environments:'] + names))
        environment_name = prompt_environment_name(
            'Please select an environment name: ', names)
    if environment_name not in names:
        parser.error(f'unknown environment {environment_name!r}; '
                     f'run with no argument to list them')
    domain_name, task_name = environment_name.split('.')

    from . import load
    task_kwargs = {}
    if not args.timeout:
        task_kwargs['time_limit'] = float('inf')
    env = load(domain_name, task_name, task_kwargs=task_kwargs)
    env.task.visualize_reward = bool(args.visualize_reward)
    if args.action_noise > 0:
        from .wrappers import ActionNoiseWrapper
        env = ActionNoiseWrapper(env, scale=args.action_noise)

    from .. import viewer
    if args.serve:
        viewer.serve(env, port=args.port)
        return None
    return viewer.launch(env, steps=args.steps, path=args.out + '.gif',
                         html=True)


if __name__ == '__main__':
    main()
