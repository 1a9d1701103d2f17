"""Multi-process weak-scaling measurement (BASELINE.md multi-host row).

Launches N OS processes joined via jax.distributed over localhost (CPU
devices simulate hosts), runs the data-parallel train step on a global
mesh with a fixed PER-DEVICE batch, and reports aggregate steps/s and
weak-scaling efficiency vs the single-process run.

Run:  python scripts/scaling_bench.py [--procs 2] [--local-devices 4]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

_WORKER = r'''
import json, os, sys, time
import numpy as np
os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count='
                           + os.environ['LOCAL_DEVICES'])
import jax
jax.config.update('jax_platforms', 'cpu')
pid = int(os.environ['PROC_ID']); nproc = int(os.environ['NUM_PROCS'])
if nproc > 1:
    jax.distributed.initialize(os.environ['COORD'], nproc, pid)
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from mujoco_mbrl_tpu import models
from mujoco_mbrl_tpu.parallel import mesh as pmesh

mesh = pmesh.make_mesh(('env',))
ndev = len(jax.devices())
model = models.MLPDynamics(24, 6, hidden_units=50)
params = model.init(jax.random.PRNGKey(0))
opt = optax.adam(1e-3)
opt_state = opt.init(params)
PER_DEV = int(os.environ.get('PER_DEV', '128'))
B = PER_DEV * ndev
key = jax.random.PRNGKey(1)
local_rows = B // nproc
batch_local = dict(
    states=np.asarray(jax.random.normal(key, (local_rows, 24))),
    actions=np.asarray(jax.random.normal(key, (local_rows, 6))),
    next_states=np.asarray(jax.random.normal(key, (local_rows, 24))))
gshard = NamedSharding(mesh, P('env'))
batch = {k: jax.make_array_from_process_local_data(gshard, v)
         for k, v in batch_local.items()}
step = pmesh.dp_train_step(mesh, model, opt)
params, opt_state, loss = step(params, opt_state, batch)
jax.block_until_ready(loss)
N = int(os.environ.get('BENCH_STEPS', '50'))
t0 = time.perf_counter()
for _ in range(N):
    params, opt_state, loss = step(params, opt_state, batch)
jax.block_until_ready(loss)
dt = time.perf_counter() - t0
if pid == 0:
    print('RESULT ' + json.dumps({
        'steps_per_s': N / dt, 'global_batch': B, 'ndev': ndev,
        'nproc': nproc}))
'''


def _run(nproc, local_devices):
    s = socket.socket(); s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]; s.close()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)
        env.update(COORD=f'127.0.0.1:{port}', NUM_PROCS=str(nproc),
                   PROC_ID=str(pid), LOCAL_DEVICES=str(local_devices),
                   JAX_PLATFORMS='cpu',
                   PYTHONPATH=os.path.join(os.path.dirname(__file__),
                                           os.pardir))
        procs.append(subprocess.Popen([sys.executable, '-c', _WORKER],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    result = None
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(err[-2000:])
        for line in out.splitlines():
            if line.startswith('RESULT '):
                result = json.loads(line[7:])
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--procs', type=int, default=2)
    ap.add_argument('--local-devices', type=int, default=2)
    args = ap.parse_args()
    one = _run(1, args.local_devices)
    multi = _run(args.procs, args.local_devices)
    # weak scaling: per-device batch fixed; ideal = same steps/s with
    # procs x the global batch
    eff = multi['steps_per_s'] / one['steps_per_s']
    # Weak scaling: fixed per-device batch, so ideal multi-process
    # steps/s equals single-process steps/s (eff = 1.0). On a host with
    # fewer cores than processes the number measures core contention,
    # not the framework — report host_cores so readers can judge.
    print(json.dumps({
        'single_process': one, 'multi_process': multi,
        'weak_scaling_efficiency': round(eff, 3),
        'host_cores': os.cpu_count()}))


if __name__ == '__main__':
    main()
