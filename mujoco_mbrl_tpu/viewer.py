"""Offline rollout viewer: `viewer.launch(env, policy)` analogue.

The reference ships an interactive GLFW application
(``dm_control/viewer/application.py:183``: a simulation runtime thread
stepping the env under a policy while rendering to a window). This
environment is headless and the GL stack is a deliberate non-goal, so
the same surface is re-designed as an *offline* viewer: the whole
rollout executes on-device as one jitted scan, frames come from the
analytic ray caster at a configurable stride, and the result is written
as an animated GIF plus a printed reward strip.

    from mujoco_mbrl_tpu import suite, viewer
    env = suite.load('cartpole', 'swingup')
    viewer.launch(env, policy=None, steps=100, path='/tmp/roll')

`policy` is `(timestep_observation_dict, key) -> action`; None uses
uniform random actions from the action spec (the reference viewer's
default policy=None passivity maps to zero actions — pass
`policy=viewer.zero_policy(env)` for that).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .suite import control
from .utils.raycast import Camera
from .utils.recorder import Recorder


def zero_policy(env: control.Environment) -> Callable:
    nu = env.action_spec().shape[0]

    def policy(obs, key):
        return jnp.zeros((nu,))

    return policy


def random_policy(env: control.Environment) -> Callable:
    spec = env.action_spec()
    lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
    hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)

    def policy(obs, key):
        return jax.random.uniform(key, spec.shape, minval=lo, maxval=hi)

    return policy


def export_html(frames: np.ndarray, rewards: np.ndarray, path: str,
                fps: int = 20, frame_stride: int = 1,
                title: str = 'rollout') -> str:
    """Write an interactive HTML player for a rendered rollout.

    The reference's interactive viewer is a GLFW window with
    play/pause/scrub/speed controls driven by a live simulation thread
    (``dm_control/viewer/application.py:183``,
    ``viewer/gui/glfw_gui.py``). On a headless TPU host the same
    interaction redesigns as a self-contained HTML document: frames are
    embedded as base64 PNGs and a small script provides play/pause,
    single-step, a scrub slider, speed control, and the per-frame
    reward readout. No server, no GL — open the file in any browser.
    """
    import base64
    import io as _io

    from PIL import Image

    if not path.endswith('.html'):
        path = path + '.html'
    srcs = []
    for f in frames:
        buf = _io.BytesIO()
        Image.fromarray(f).save(buf, format='PNG')
        srcs.append('data:image/png;base64,'
                    + base64.b64encode(buf.getvalue()).decode())
    rew = [float(r) for r in rewards]
    html = f"""<!DOCTYPE html>
<html><head><meta charset='utf-8'><title>{title}</title><style>
body{{font-family:monospace;background:#111;color:#ddd;margin:1em}}
img{{image-rendering:pixelated;width:{frames.shape[2] * 3}px;
     border:1px solid #444}}
button,input{{font-family:monospace}}
#bar{{margin:0.5em 0}}
</style></head><body>
<h3>{title}</h3>
<img id='view'/>
<div id='bar'>
<button id='play'>&#9654;</button>
<button id='stepb'>&#8676;</button>
<button id='stepf'>&#8677;</button>
<input id='scrub' type='range' min='0' max='{len(srcs) - 1}' value='0'
 style='width:{frames.shape[2] * 3 - 180}px'/>
<select id='speed'><option>0.25</option><option>0.5</option>
<option selected>1</option><option>2</option><option>4</option></select>x
</div>
<div id='info'></div>
<script>
const F=__FRAMES__;const R={rew};
const stride={frame_stride};const fps={fps};
let i=0,playing=false,timer=null;
const img=document.getElementById('view'),
 scrub=document.getElementById('scrub'),
 info=document.getElementById('info'),
 play=document.getElementById('play');
function show(k){{i=(k+F.length)%F.length;img.src=F[i];scrub.value=i;
 const s=i*stride;
 info.textContent='frame '+i+'/'+(F.length-1)+'  step '+s+
  '  reward '+(R[s]!==undefined?R[s].toFixed(4):'-');}}
function tick(){{if(playing){{show(i+1);}}}}
function setspeed(){{if(timer)clearInterval(timer);
 timer=setInterval(tick,1000/(fps*parseFloat(
  document.getElementById('speed').value)));}}
play.onclick=()=>{{playing=!playing;
 play.innerHTML=playing?'&#9646;&#9646;':'&#9654;';}};
document.getElementById('stepf').onclick=()=>{{playing=false;show(i+1);}};
document.getElementById('stepb').onclick=()=>{{playing=false;show(i-1);}};
scrub.oninput=()=>{{playing=false;show(parseInt(scrub.value));}};
document.getElementById('speed').onchange=setspeed;
setspeed();show(0);
</script></body></html>
"""
    # placeholder substitution keeps the 100k-char frame array out of
    # the f-string expression
    html = html.replace('__FRAMES__',
                        '[' + ','.join(f'"{s}"' for s in srcs) + ']')
    with open(path, 'w') as fh:
        fh.write(html)
    return path


def launch(env: control.Environment, policy: Optional[Callable] = None,
           steps: int = 200, path: Optional[str] = None,
           camera_id=0, height: int = 120, width: int = 160,
           frame_stride: int = 2, fps: int = 20,
           seed: int = 0, verbose: bool = True,
           html: bool = False) -> dict:
    """Run one episode under `policy` and render it.

    Returns {'rewards': (steps,), 'frames': (F, H, W, 3) uint8,
    'gif': written path or '', 'html': written path or ''}. The physics
    rollout runs as a single jitted scan; rendering vmaps the ray caster
    over the recorded qpos trajectory (device-side, no per-frame
    dispatch). ``html=True`` also writes the interactive scrub/player
    document (:func:`export_html`).
    """
    policy = policy or random_policy(env)
    key = jax.random.PRNGKey(seed)
    state0, ts0 = env.reset(key)

    def body(carry, k):
        st = carry
        a = policy(None, k)
        st, ts = env.step(st, a)
        return st, (st.physics, ts.reward)

    keys = jax.random.split(jax.random.fold_in(key, 1), steps)
    _, (traj, rewards) = jax.jit(
        lambda s, k: jax.lax.scan(body, s, k))(state0, keys)
    rewards = np.asarray(rewards)

    frames = np.zeros((0, height, width, 3), np.uint8)
    gif = ''
    html_path = ''
    if env.model.ncam > 0:
        from .physics import engine
        cam = Camera(env, height=height, width=width, camera_id=camera_id)
        m = env._model_with(state0.params)
        idx = jnp.arange(0, steps, frame_stride)

        def render_at(i):
            phys = jax.tree_util.tree_map(lambda x: x[i], traj)
            data = engine.forward(m, phys, jnp.zeros((m.nu,)),
                                  env._contact_fn, acc_stage=False)
            return cam.render(data)

        rgb = jax.jit(jax.vmap(render_at))(idx)
        frames = np.asarray(
            jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8))
        if path:
            rec = Recorder(fps=fps)
            for f in frames:
                rec.record_frame(f)
            gif = rec.make_movie(path)
        if html and path:
            html_path = export_html(frames, rewards, path, fps=fps,
                                    frame_stride=frame_stride,
                                    title=getattr(env, 'name', 'rollout'))
    elif verbose:
        print('# model has no cameras; skipping frames '
              '(rewards still returned)')

    if verbose:
        # compact reward strip, one glyph per ~2% of the episode
        glyphs = ' .:-=+*#%@'
        n = max(len(rewards) // 50, 1)
        chunks = [rewards[i:i + n].mean() for i in range(0, len(rewards), n)]
        strip = ''.join(glyphs[min(int(c * (len(glyphs) - 1) + 0.5),
                                   len(glyphs) - 1)] for c in chunks)
        print(f'# reward [{strip}] total={rewards.sum():.2f}'
              + (f' gif={gif}' if gif else ''))

    return {'rewards': rewards, 'frames': frames, 'gif': gif,
            'html': html_path}
