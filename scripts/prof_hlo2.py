import jax, re; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from collections import Counter
from mujoco_mbrl_tpu import physics
from mujoco_mbrl_tpu.physics import smooth
from mujoco_mbrl_tpu.suite import humanoid as H, walker as W

for name, xml in [('walker', W._XML), ('humanoid', H._XML)]:
    m = physics.parse(xml)
    meta = smooth.tree_meta(m)
    s = physics.make_state(m)
    fn = jax.jit(lambda q: smooth.kinematics(m, q, meta))
    txt = fn.lower(s.qpos).compile().as_text()
    kinds = Counter(re.findall(r'\] ([a-z0-9_-]+)\(', txt))
    print(name, 'optimized lines:', len(txt.splitlines()))
    print('  top:', kinds.most_common(10), flush=True)
