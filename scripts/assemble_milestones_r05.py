"""Assemble benchmarks/milestones_r05.json from the r05 post-stage log.

Parses the JSON lines bench.py printed during scripts/r05_post.py's
bench stage and writes the round-5 milestone artifact in the same shape
as benchmarks/milestones_r04.json (BASELINE.json milestone configs;
vs_baseline divides by the 10k north-star target, BASELINE.md:22).

Usage: python scripts/assemble_milestones_r05.py [/tmp/r05_post.log]
"""

import json
import re
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else '/tmp/r05_post.log'

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

# Attribute each JSON result to the bench case whose '[post] bench ...'
# marker preceded it — a crashed case then yields a MISSING row rather
# than shifting every later measurement onto the wrong config (zip()
# would silently misattribute on any gap).
by_case = {}
selfchecks = []
current = None
with open(LOG) as f:
    for line in f:
        line = line.strip()
        m = re.match(r'\[post\] bench (.*)', line)
        if m and not m.group(1).startswith('done'):
            current = m.group(1)
            continue
        m = re.match(r'# selfcheck: (.*)', line)
        if m:
            selfchecks.append(m.group(1))
            continue
        if line.startswith('{') and '"metric"' in line and current:
            try:
                by_case.setdefault(current, []).append(json.loads(line))
            except json.JSONDecodeError:
                pass

out = {
    'round': 5,
    'hardware': '1x TPU v5e chip (axon tunnel)',
    'note': ('BASELINE.json milestone configs, measured by '
             'scripts/r05_post.py (one-process serial TPU queue). '
             'vs_baseline divides by the 10k north-star target '
             '(BASELINE.md:22).'),
    'results': [],
}
for config, cmd in ORDER:
    args = cmd.replace('python bench.py ', '')
    recs = by_case.get(args, [])
    if not recs:
        out['results'].append({'config': config, 'cmd': cmd,
                               'missing': True})
        continue
    rec = dict(recs[-1])
    rec['config'] = config
    rec['cmd'] = cmd
    out['results'].append(rec)
if selfchecks:
    out['selfchecks'] = selfchecks

path = 'benchmarks/milestones_r05.json'
with open(path, 'w') as f:
    json.dump(out, f, indent=1)
    f.write('\n')
print(f'wrote {path} with {len(out["results"])} rows')
