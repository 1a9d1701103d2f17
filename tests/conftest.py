"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver environment registers a TPU PJRT plugin in every interpreter and
forces jax_platforms to it; tests override back to CPU with 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware
(mirrors how the driver validates `dryrun_multichip`).
"""

import os
import sys

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
if '--xla_force_host_platform_device_count' not in os.environ['XLA_FLAGS']:
    os.environ['XLA_FLAGS'] += ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

# TEST_PLATFORM=tpu runs the suite on the real chip instead — the heavy
# tier (RUN_HEAVY=1: humanoid_cmu conformance, 16 heavy-threshold parity
# tasks, contact-rich distributional parity) compiles in ~20 s/program
# there vs minutes on XLA:CPU. The committed artifact of that run lives
# in benchmarks/heavy_tier_r*.txt.
_plat = os.environ.get('TEST_PLATFORM', 'cpu')
jax.config.update('jax_platforms', _plat if _plat != 'tpu' else None)
if _plat == 'tpu':
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
# NOTE: the persistent compilation cache is deliberately NOT enabled for
# CPU test runs. On this host the XLA:CPU executable serializer segfaults
# in compilation_cache.put_executable_and_time for some large AOT
# programs (reproduced twice with a fresh cache dir; the loader also
# warns about machine-feature mismatches like +prefer-no-scatter). TPU
# executables serialize fine — bench.py keeps its cache.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
