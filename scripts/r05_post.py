"""Round-5 post-heavy TPU stage: milestone benches + walker ref_compare.

Runs after scripts/r05_queue.py releases the single axon chip claim:

  bench     the six BASELINE.json milestone configs (same list as the
            r04 queue's bench stage) -> parse with
            scripts/assemble_milestones_r05.py into
            benchmarks/milestones_r05.json
  refcmp    5-seed walker_walk learning-curve comparison against the
            actual reference implementation (VERDICT r4 #5) ->
            benchmarks/ref_compare_walker_walk.json

Usage: python scripts/r05_post.py [stage ...]   (default: all)
"""

import os
import subprocess
import sys
import time
import traceback

os.environ.setdefault('TEST_PLATFORM', 'tpu')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import jax  # noqa: E402

print(f'[post] devices={jax.devices()}', flush=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def stage(name):
    def deco(fn):
        def run():
            print(f'\n[post] ===== stage {name} start '
                  f'{time.strftime("%H:%M:%S")} =====', flush=True)
            t = time.time()
            try:
                fn()
                print(f'[post] ===== stage {name} OK '
                      f'({time.time()-t:.0f}s) =====', flush=True)
            except SystemExit as e:
                print(f'[post] stage {name} SystemExit({e.code})', flush=True)
            except Exception:
                traceback.print_exc()
                print(f'[post] ===== stage {name} FAILED =====', flush=True)
        run.stage_name = name
        return run
    return deco


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
        print(f'[post] bench {" ".join(extra)}', flush=True)
        sys.argv = ['bench.py'] + extra
        t = time.time()
        try:
            bench_mod.main()
        except SystemExit:
            pass
        except Exception:
            traceback.print_exc()
        print(f'[post] bench done ({time.time()-t:.0f}s)', flush=True)


# NOTE: the walker ref_compare runs as its OWN process after this one
# exits (the axon tunnel grants the chip to one client at a time, and
# this interpreter's claim would wedge a child's):
#   python scripts/r05_post.py && \
#   python scripts/ref_compare.py --task walker_walk --seeds 5 \
#     --out benchmarks/ref_compare_walker_walk.json \
#     --plot benchmarks/ref_compare_walker_walk.png

ALL = [run_benches]

if __name__ == '__main__':
    wanted = sys.argv[1:] or [s.stage_name for s in ALL]
    sys.argv = [sys.argv[0]]
    for s in ALL:
        if s.stage_name in wanted:
            s()
    print(f'\n[post] all done {time.strftime("%H:%M:%S")}', flush=True)
