"""Scale-out: device meshes, sharded collection, data-parallel training.

TPU-native replacement for the reference's only parallelism — a
torch.multiprocessing rollout pool (``src/mbrl/parallel.py:20-52``,
SURVEY §2.4). Here:

* env batches and planner candidate populations shard over a named
  `jax.sharding.Mesh` axis; XLA inserts the collectives;
* gradient all-reduce for data-parallel model fitting is an explicit
  `psum` inside `shard_map`;
* multi-host runs initialize via `jax.distributed.initialize` (control
  plane) with the same code path — collectives ride ICI within a slice.
"""

from .mesh import (make_mesh, shard_batch, replicate, distributed_init,
                   sharded_collect, dp_train_step)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'distributed_init',
           'sharded_collect', 'dp_train_step']
