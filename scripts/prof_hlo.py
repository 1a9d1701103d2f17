import jax, re; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import smooth
from mujoco_mbrl_tpu.suite import humanoid as H

m = physics.parse(H._XML)
meta = smooth.tree_meta(m)
s = physics.make_state(m)
fn = jax.jit(lambda q: smooth.kinematics(m, q, meta))
txt = fn.lower(s.qpos).compile().as_text()
shapes = re.findall(r'f32\[([\d,]+)\]', txt)
from collections import Counter
sizes = []
for sh in shapes:
    dims = [int(x) for x in sh.split(',') if x]
    n = 1
    for d in dims: n *= d
    sizes.append((n, sh))
sizes.sort(reverse=True)
print('largest tensors:', sizes[:10])
print('total ops:', len(txt.splitlines()))
# count op kinds
kinds = Counter(re.findall(r'= ([a-z-]+)\(', txt))
print('top ops:', kinds.most_common(15))
