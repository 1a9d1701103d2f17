"""On-chip A/B sweep for the walker MPC bench configuration.

Runs bench.py's workload across the knobs that matter (sampler,
env-batch size, CEM iterations, solver warm start) and prints one JSON
line per configuration plus a winner summary. Use when the axon tunnel
is up:

    python scripts/tpu_ab.py [--quick]

Each run is a subprocess so a bad configuration can't wedge the sweep;
per-run timeout keeps tunnel hangs bounded.
"""

import argparse
import itertools
import json
import subprocess
import sys
import time

BENCH = [sys.executable, 'bench.py', '--no-selfcheck', '--repeats', '2',
         '--steps', '10']


def run_one(extra, timeout=900):
    cmd = BENCH + extra
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return {'args': extra, 'error': 'timeout'}
    line = None
    for ln in out.stdout.splitlines():
        if ln.startswith('{'):
            line = ln
    if out.returncode != 0 or line is None:
        return {'args': extra, 'error': (out.stderr or out.stdout)[-500:]}
    rec = json.loads(line)
    rec['args'] = extra
    rec['wall_s'] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='samplers x envs only, skip iteration sweep')
    args = ap.parse_args()

    grids = [
        # sampler A/B at the default config
        (['--sampler', s] for s in ('normal', 'triangular', 'spline4')),
        # env-batch scaling with the better sampler filled in manually
        (['--envs', str(b)] for b in (128, 256, 512)),
    ]
    if not args.quick:
        grids.append((['--cem_iters', str(i)] for i in (2, 3)))

    results = []
    for grid in grids:
        for extra in grid:
            rec = run_one(extra)
            print(json.dumps(rec), flush=True)
            results.append(rec)

    ok = [r for r in results if 'value' in r]
    if ok:
        best = max(ok, key=lambda r: r['value'])
        print(json.dumps({'winner': best['args'], 'value': best['value'],
                          'vs_baseline': best.get('vs_baseline')}))


if __name__ == '__main__':
    main()
