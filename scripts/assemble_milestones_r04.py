"""Assemble benchmarks/milestones_r04.json from the r04 queue log.

Parses the JSON lines bench.py printed during scripts/r04_queue.py's
bench stage and writes the round-4 milestone artifact in the same shape
as benchmarks/milestones_r03.json (BASELINE.json milestone configs;
vs_baseline divides by the 10k north-star target, BASELINE.md:22).
"""

import json
import re
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else '/tmp/r04_queue.log'

ORDER = [
    ('northstar', 'python bench.py --config northstar --steps 10'),
    ('reacher256', 'python bench.py --config reacher256 --steps 20'),
    ('walker_ens', 'python bench.py --config walker_ens --steps 10'),
    ('cheetah1024 (full loop)',
     'python bench.py --config cheetah1024 --steps 25'),
    ('humanoid', 'python bench.py --config humanoid --steps 10'),
    ('agent-loop (walker_walk)',
     'python bench.py --agent-loop --task walker_walk'),
]

results = []
selfchecks = []
with open(LOG) as f:
    for line in f:
        line = line.strip()
        m = re.match(r'# selfcheck: (.*)', line)
        if m:
            selfchecks.append(m.group(1))
            continue
        if line.startswith('{') and '"metric"' in line:
            try:
                results.append(json.loads(line))
            except json.JSONDecodeError:
                pass

out = {
    'round': 4,
    'hardware': '1x TPU v5e chip (axon tunnel)',
    'note': ('BASELINE.json milestone configs, measured by '
             'scripts/r04_queue.py (one-process serial TPU queue). '
             'vs_baseline divides by the 10k north-star target '
             '(BASELINE.md:22).'),
    'results': [],
}
for (config, cmd), rec in zip(ORDER, results):
    entry = {'config': config, 'cmd': cmd, 'metric': rec['metric'],
             'value': rec['value'], 'unit': rec['unit'],
             'vs_baseline': rec.get('vs_baseline')}
    for k in ('iteration_s', 'error', 'note'):
        if k in rec:
            entry[k] = rec[k]
    out['results'].append(entry)
if selfchecks:
    out['selfchecks'] = selfchecks

path = 'benchmarks/milestones_r04.json'
with open(path, 'w') as f:
    json.dump(out, f, indent=2)
    f.write('\n')
print(f'wrote {path} with {len(out["results"])} results')
for r in out['results']:
    print(f'  {r["config"]}: {r["value"]} {r["unit"]}')
