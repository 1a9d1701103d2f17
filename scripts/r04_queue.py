"""Round-4 consolidated TPU work queue: ONE process, one device claim.

The axon tunnel grants the chip to one client at a time and a client
killed mid-claim can wedge later claims for a long time, so everything
that needs the real chip this round runs sequentially inside this one
interpreter: APGD-kernel unit tests, the six milestone benches, the
plan/physics phase breakdown (kernel on vs off), and finally the
RUN_HEAVY=1 full test tier. Each stage flushes its results before the
next starts; a stage failure is logged and the queue moves on.

Usage: python scripts/r04_queue.py [stage ...]   (default: all stages)
Stages: ktest bench phases heavy
"""

import io
import json
import os
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
devs = jax.devices()
print(f'[queue] devices={devs} in {time.time()-t0:.1f}s', flush=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


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


@stage('ktest')
def run_ktest():
    import pytest
    rc = pytest.main(['-q', '-x', 'tests/test_apgd_kernel.py',
                      '-p', 'no:cacheprovider'])
    if rc != 0:
        # a broken kernel must not poison every bench downstream
        os.environ['MBRL_APGD_KERNEL'] = '0'
        print('[queue] APGD kernel tests FAILED -> MBRL_APGD_KERNEL=0',
              flush=True)


@stage('bench')
def run_benches():
    import bench as bench_mod
    cases = [
        ['--config', 'northstar', '--steps', '10'],
        ['--config', 'reacher256', '--steps', '20'],
        ['--config', 'walker_ens', '--steps', '10'],
        ['--config', 'cheetah1024', '--steps', '25'],
        ['--config', 'humanoid', '--steps', '10'],
        ['--agent-loop', '--task', 'walker_walk'],
    ]
    for extra in cases:
        argv = ['bench.py'] + extra
        print(f'[queue] bench {" ".join(extra)}', flush=True)
        sys.argv = argv
        t = time.time()
        try:
            bench_mod.main()
        except SystemExit:
            pass
        except Exception:
            traceback.print_exc()
        print(f'[queue] bench done ({time.time()-t:.0f}s)', flush=True)


@stage('bench1')
def run_bench_northstar():
    """Just the north-star config (kernel-path A/B follow-up runs)."""
    import bench as bench_mod
    sys.argv = ['bench.py', '--config', 'northstar', '--steps', '10']
    try:
        bench_mod.main()
    except SystemExit:
        pass


@stage('phases')
def run_phases():
    import bench as bench_mod
    # honor an outer kill-switch: with MBRL_APGD_KERNEL=0 exported the
    # kernel side of the A/B is skipped entirely
    flags = (('1', '0') if os.environ.get('MBRL_APGD_KERNEL', '1') != '0'
             else ('0',))
    for flag in flags:
        os.environ['MBRL_APGD_KERNEL'] = flag
        print(f'[queue] phase breakdown MBRL_APGD_KERNEL={flag}',
              flush=True)
        try:
            bench_mod.phase_breakdown('walker_walk', 1024, 1000, 30, 3,
                                      'triangular', None, 4)
        except Exception:
            traceback.print_exc()
    os.environ['MBRL_APGD_KERNEL'] = flags[0]


@stage('heavy')
def run_heavy():
    import pytest
    # The multi-hour artifact run pins the proven solve path: the APGD
    # kernel is validated separately (ktest/bench1/phases) and a kernel
    # regression must not wedge the whole tier on-device.
    os.environ['MBRL_APGD_KERNEL'] = '0'
    rc = pytest.main(['-q', 'tests/', '-rf', '-p', 'no:cacheprovider'])
    print(f'[queue] heavy tier pytest rc={rc}', flush=True)


ALL = [run_ktest, run_benches, run_bench_northstar, run_phases,
       run_heavy]

if __name__ == '__main__':
    want = sys.argv[1:]
    for s in ALL:
        if (s.stage_name in want if want
                else s.stage_name != 'bench1'):   # bench1 is opt-in
            s()
    print('[queue] ALL_DONE', flush=True)
