"""Composer-lite: entity/task composition over the programmatic builder.

A functional analogue of dm_control's composer core (reference
``dm_control/dm_control/composer/``): reusable :class:`Entity` objects
own an MJCF sub-model (built with :mod:`physics.builder`) plus named
:func:`observable` methods; a :class:`Task` wires entities together and
implements the lifecycle hooks; :func:`make_env` compiles the composed
scene into this engine's pure-function environment.

Deviations from the reference, by design of the AOT/jit architecture:

* ``initialize_episode_mjcf`` runs ONCE at environment build (the
  reference recompiles physics every episode, composer/environment.py:
  300-318 — incompatible with a traced, fixed-shape step). Per-episode
  variation goes through ``initialize_episode`` returning episode params
  consumed by ``apply_params`` (functional model overrides), exactly like
  the suite tasks.
* ``before_substep``/``after_substep`` hooks are out of scope (the
  substep loop is a lax.scan inside control.Environment).
* The observation pipeline's buffering/delay/corruptor machinery
  (composer/observation/) is not replicated; observables are pure
  functions of (model, physics state, forward data).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax

from .physics import builder
from .suite import base as suite_base
from .suite import control


def observable(fn: Callable = None, **options) -> Callable:
    """Mark an Entity/Task method as a named observable
    (composer/define.py:59's `observable` decorator role). The method
    receives (model, phys, data) and returns an array.

    Optional pipeline options (update_interval, buffer_size, delay,
    aggregator, corruptor, enabled) configure the observation pipeline
    (observation.ObservableSpec; the updater.py:90 machinery) — e.g.::

        @observable(buffer_size=4, aggregator='mean',
                    corruptor=variation.Additive(variation.Normal(0, .01)))
        def tip_position(self, model, phys, data): ...
    """
    def mark(f):
        f._is_observable = True
        if options:
            from .observation import ObservableSpec
            f._observable_spec = ObservableSpec(**options)
        return f
    if fn is not None:
        return mark(fn)
    return mark


def _collect_observables(obj) -> Dict[str, Callable]:
    out = {}
    for name in dir(type(obj)):
        fn = getattr(type(obj), name, None)
        if callable(fn) and getattr(fn, '_is_observable', False):
            out[name] = getattr(obj, name)
    return out


def _collect_observable_specs(obj) -> Dict[str, Any]:
    out = {}
    for name in dir(type(obj)):
        fn = getattr(type(obj), name, None)
        spec = getattr(fn, '_observable_spec', None)
        if spec is not None:
            out[name] = spec
    # per-INSTANCE enabled overrides (Entity.enable_observable): specs
    # live on class methods, so flipping spec.enabled directly would
    # leak across every instance of the class in the process
    for name, enabled in getattr(obj, '_observable_overrides',
                                 {}).items():
        from .observation import ObservableSpec
        base = out.get(name)
        if base is None:
            out[name] = ObservableSpec(enabled=enabled)
        else:
            clone = ObservableSpec(update_interval=base.update_interval,
                                   buffer_size=base.buffer_size,
                                   delay=base.delay,
                                   aggregator=base.aggregator,
                                   corruptor=base.corruptor,
                                   enabled=enabled)
            out[name] = clone
    return out


class Entity:
    """A reusable scene component owning an MJCF sub-model
    (composer/entity.py:199).

    Subclasses implement ``_build() -> builder.RootElement`` and may
    decorate methods with :func:`observable`. ``prefix`` scopes the
    entity's names once attached.
    """

    def __init__(self, **kwargs):
        self._mjcf_root = self._build(**kwargs)
        self.prefix = ''
        self._observable_overrides: Dict[str, bool] = {}

    def enable_observable(self, name: str, enabled: bool = True) -> None:
        """Per-instance enable/disable of a named observable (the
        reference's `entity.observables.<name>.enabled = True` workflow,
        composer/observation/observable.py). Call before make_env:
        e.g. ``walker.enable_observable('egocentric_camera')``."""
        if name not in _collect_observables(self):
            raise KeyError(f'{type(self).__name__} has no observable '
                           f'{name!r}')
        self._observable_overrides[name] = bool(enabled)

    def _build(self, **kwargs) -> builder.RootElement:
        raise NotImplementedError

    @property
    def mjcf_model(self) -> builder.RootElement:
        return self._mjcf_root

    def name(self, base: str) -> str:
        """Scoped name of one of this entity's elements after attach."""
        return self.prefix + base

    def observables(self) -> Dict[str, Callable]:
        return _collect_observables(self)

    # lifecycle hooks (no-ops by default; called by the Task wrapper)
    def initialize_episode(self, model, key):
        """Return a pytree of episode params for this entity (or ())."""
        return ()

    def apply_params(self, model, params):
        return model


class Task:
    """Composed task: a root entity plus attached sub-entities
    (composer/task.py:44).

    Lifecycle: ``initialize_episode_mjcf`` (once, at build) ->
    compile -> per episode ``initialize_episode`` -> per step
    ``before_step`` / reward / observables.
    """

    control_timestep: Optional[float] = None

    def __init__(self, root_entity: Entity):
        self.root_entity = root_entity
        self._entities = [root_entity]

    def attach(self, entity: Entity, prefix: str,
               frame: Optional[builder.Element] = None) -> Entity:
        """Attach `entity` under the root (or `frame`) with scoped names."""
        target = frame if frame is not None else \
            self.root_entity.mjcf_model.worldbody
        target.attach(entity.mjcf_model, prefix)
        entity.prefix = prefix
        self._entities.append(entity)
        return entity

    # -- lifecycle hooks -------------------------------------------------
    def initialize_episode_mjcf(self, root: builder.RootElement) -> None:
        """Mutate the composed model before compilation (runs once)."""

    def initialize_episode(self, model, key) -> Tuple[Any, Any]:
        """Return (physics State, params pytree). Default: reference pose
        plus each entity's episode params."""
        from .physics import make_state
        keys = jax.random.split(key, len(self._entities))
        params = tuple(e.initialize_episode(model, k)
                       for e, k in zip(self._entities, keys))
        return make_state(model), params

    def apply_params(self, model, params):
        for e, p in zip(self._entities, params):
            model = e.apply_params(model, p)
        return model

    def before_step(self, action, model):
        return action

    def observables(self) -> Dict[str, Callable]:
        out = {}
        for e in self._entities:
            for name, fn in e.observables().items():
                out[(e.prefix + name) if e.prefix else name] = fn
        out.update(_collect_observables(self))
        return out

    def observable_specs(self) -> Dict[str, Any]:
        """Pipeline options per observable name (entities' prefixed)."""
        out = {}
        for e in self._entities:
            for name, spec in _collect_observable_specs(e).items():
                out[(e.prefix + name) if e.prefix else name] = spec
        out.update(_collect_observable_specs(self))
        return out

    def get_reward(self, model, phys, data, ctrl):
        raise NotImplementedError


class _TaskAdapter(suite_base.Task):
    """Bridges a composer Task onto the suite's functional Task protocol."""

    def __init__(self, task: Task):
        self._task = task
        self._observables = task.observables()
        # drop enabled=False observables at the source: they must not
        # be computed at all (an off-by-default egocentric camera would
        # otherwise render every step only to be discarded)
        for name, spec in task.observable_specs().items():
            if not spec.enabled:
                self._observables.pop(name, None)
        # early-termination protocol is optional (rl/control.py:115-121);
        # only surface it when the composer task defines it
        if hasattr(task, 'get_termination'):
            self.get_termination = (
                lambda model, phys, data:
                task.get_termination(model, phys, data))

    def initialize_episode(self, model, key):
        return self._task.initialize_episode(model, key)

    def apply_params(self, model, params):
        return self._task.apply_params(model, params)

    def before_step(self, action, model):
        return self._task.before_step(action, model)

    def get_observation(self, model, phys, data):
        return {name: fn(model, phys, data)
                for name, fn in sorted(self._observables.items())}

    def get_reward(self, model, phys, data, ctrl):
        return self._task.get_reward(model, phys, data, ctrl)


def make_env(task: Task, time_limit: float = float('inf'),
             **environment_kwargs) -> control.Environment:
    """Compile the composed scene and return a pure-function environment
    (composer/environment.py:266's Environment constructor role)."""
    root = task.root_entity.mjcf_model
    task.initialize_episode_mjcf(root)
    model = root.compile()
    if task.control_timestep is not None:
        environment_kwargs.setdefault('control_timestep',
                                      task.control_timestep)
    env = control.Environment(model, _TaskAdapter(task),
                              time_limit=time_limit,
                              **environment_kwargs)
    # wrap only when some ENABLED observable needs pipeline machinery;
    # enabled=False entries are filtered inside _TaskAdapter and a spec
    # that is merely a disable-switch must not change the env state type
    specs = {name: s for name, s in task.observable_specs().items()
             if s.enabled and (s.update_interval > 1 or s.buffer_size > 1
                               or s.delay > 0 or s.aggregator is not None
                               or s.corruptor is not None)}
    if specs:
        from .observation import BufferedEnvironment
        env = BufferedEnvironment(env, specs)
    return env
