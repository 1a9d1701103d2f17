"""Hand-written TPU kernels (Pallas) for the framework's hot ops.

The compute paths here are the profiled bottlenecks of the MPC loop
(SURVEY §3.3): the CEM/random-shooting candidate rollout, which is
HBM-bandwidth-bound when expressed as a lax.scan of small matmuls.
Each op ships with a pure-jnp reference implementation used on CPU and in
parity tests.
"""

from .cem_rollout import (mlp_rollout_costs,
                          mlp_rollout_costs_reference, mlp_rollout_costs_t,
                          mlp_sample_rollout_costs,
                          mlp_sample_rollout_costs_ensemble)

__all__ = ['mlp_rollout_costs',
           'mlp_rollout_costs_reference', 'mlp_rollout_costs_t',
           'mlp_sample_rollout_costs', 'mlp_sample_rollout_costs_ensemble']
