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

        viz = bool(getattr(env.task, 'visualize_reward', False))

        def render_at(i):
            phys = jax.tree_util.tree_map(lambda x: x[i], traj)
            data = engine.forward(m, phys, jnp.zeros((m.nu,)),
                                  env._contact_fn, acc_stage=False)
            r = jnp.asarray(rewards)[i] if viz else None
            return cam.render(data, reward=r)

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


# ---------------------------------------------------------------------------
# live viewer: policy-in-the-loop HTTP server
# ---------------------------------------------------------------------------

_LIVE_HTML = """<!DOCTYPE html>
<html><head><meta charset='utf-8'><title>live viewer</title><style>
body{font-family:monospace;background:#111;color:#ddd;margin:1em}
img{image-rendering:pixelated;width:480px;border:1px solid #444}
button,select,input{font-family:monospace}
#bar{margin:0.5em 0}
</style></head><body>
<h3>live viewer</h3>
<img id='view'/>
<div id='bar'>
<button id='play'>&#9654;</button>
<button id='stepf'>step</button>
<button id='reset'>reset</button>
<select id='pol'><option selected>policy</option><option>zero</option>
<option>random</option></select>
speed <select id='speed'><option>0.25</option><option>0.5</option>
<option selected>1</option><option>2</option></select>x
</div>
<div id='bar'>perturb dof <input id='dof' type='number' value='0'
 style='width:4em'/> dv <input id='dv' type='number' value='2.0'
 step='0.5' style='width:4em'/>
<button id='kick'>kick</button>
(keys: space=play, r=reset, k=kick)</div>
<div id='info'></div>
<script>
let playing=false,busy=false,t=0;
const img=document.getElementById('view'),
 info=document.getElementById('info'),
 play=document.getElementById('play');
async function post(u,b){const r=await fetch(u,{method:'POST',
 headers:{'Content-Type':'application/json'},
 body:JSON.stringify(b||{})});return r.json();}
function show(d){if(d.frame)img.src='data:image/png;base64,'+d.frame;
 t=d.t;info.textContent='t='+d.t+'  reward='+d.reward.toFixed(4)+
  '  return='+d.ret.toFixed(2)+(d.last?'  [EPISODE END]':'');}
async function step(){if(busy)return;busy=true;
 show(await post('/step',{policy:document.getElementById('pol').value}));
 busy=false;}
async function loop(){if(playing){await step();}
 setTimeout(loop,50/parseFloat(document.getElementById('speed').value));}
play.onclick=()=>{playing=!playing;
 play.innerHTML=playing?'&#9646;&#9646;':'&#9654;';};
document.getElementById('stepf').onclick=()=>{playing=false;step();};
document.getElementById('reset').onclick=async()=>{
 show(await post('/reset'));};
document.getElementById('kick').onclick=async()=>{
 show(await post('/perturb',{dof:parseInt(
   document.getElementById('dof').value),
  dv:parseFloat(document.getElementById('dv').value)}));};
document.body.onkeydown=(e)=>{if(e.key===' ')play.onclick();
 if(e.key==='r')document.getElementById('reset').onclick();
 if(e.key==='k')document.getElementById('kick').onclick();};
loop();post('/reset').then(show);
</script></body></html>
"""


class LiveSession:
    """Policy-in-the-loop stepping + perturbation, transport-agnostic.

    The reference viewer's core loop (``viewer/application.py:183``:
    a runtime thread stepping env-under-policy, with keyboard pause/
    step/reset and mouse body perturbation writing ``xfrc_applied``)
    redesigned for a headless host: one jitted step-and-render program,
    stateful session on the host, perturbation as a velocity impulse on
    a chosen dof (the impulse analogue of the reference's applied
    Cartesian force, expressed in joint space where the batched engine
    state lives). An HTTP front end (:func:`serve`) exposes it to any
    browser; tests drive the session object directly.
    """

    def __init__(self, env, policy=None, height=120, width=160,
                 camera_id=0, seed=0):
        self.env = env
        self.policy = policy or random_policy(env)
        self._zero = zero_policy(env)
        self._random = random_policy(env)
        self.key = jax.random.PRNGKey(seed)
        self.t = 0
        self.ret = 0.0
        self.last_reward = 0.0
        self.last_flag = False
        self._has_cam = env.model.ncam > 0
        if self._has_cam:
            cam = Camera(env, height=height, width=width,
                         camera_id=camera_id)
            from .physics import engine as _eng

            viz = bool(getattr(getattr(env, 'task', None),
                               'visualize_reward', False))

            def render(phys, params, reward):
                m = env._model_with(params)
                data = _eng.forward(m, phys, jnp.zeros((m.nu,)),
                                    env._contact_fn, acc_stage=False)
                rgb = cam.render(data, reward=reward if viz else None)
                return jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)

            self._render = jax.jit(render)
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)
        self.state, self._ts = self._reset(self.key)

    # -- commands --------------------------------------------------------
    def reset(self):
        self.key = jax.random.fold_in(self.key, 7)
        self.state, self._ts = self._reset(self.key)
        self.t = 0
        self.ret = 0.0
        self.last_reward = 0.0
        self.last_flag = False
        return self.snapshot()

    def step(self, policy_name: str = 'policy'):
        pol = {'policy': self.policy, 'zero': self._zero,
               'random': self._random}.get(policy_name, self.policy)
        self.key = jax.random.fold_in(self.key, self.t + 13)
        a = pol(self._ts.observation, self.key)
        self.state, self._ts = self._step(self.state, a)
        self.t += 1
        self.last_reward = float(self._ts.reward)
        self.ret += self.last_reward
        self.last_flag = bool(np.asarray(self.state.last))
        return self.snapshot()

    def perturb(self, dof: int = 0, dv: float = 2.0):
        """Velocity impulse on one dof (reference mouse perturbation)."""
        nv = self.env.model.nv
        dof = int(np.clip(dof, 0, nv - 1))
        phys = self.state.physics
        self.state = self.state.replace(
            physics=phys.replace(qvel=phys.qvel.at[dof].add(dv)))
        return self.snapshot()

    def snapshot(self):
        out = {'t': self.t, 'reward': self.last_reward,
               'ret': self.ret, 'last': self.last_flag}
        if self._has_cam:
            import base64
            import io as _io

            from PIL import Image
            frame = np.asarray(self._render(
                self.state.physics, self.state.params,
                jnp.asarray(self.last_reward, jnp.float32)))
            buf = _io.BytesIO()
            Image.fromarray(frame).save(buf, format='PNG')
            out['frame'] = base64.b64encode(buf.getvalue()).decode()
        return out


def serve(env, policy=None, host: str = '127.0.0.1', port: int = 8000,
          **session_kw):
    """Serve the live viewer; blocks until Ctrl-C.

    `python -m mujoco_mbrl_tpu.viewer --env walker_walk` convenience
    entry; open http://host:port in a browser. The simulation steps on
    demand (one control step per /step POST), so the policy really runs
    in the loop — the reference `viewer.launch(env, policy)` behavior
    without a GL window.
    """
    import http.server
    import json as _json

    session = LiveSession(env, policy, **session_kw)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json_reply(self, obj):
            body = _json.dumps(obj).encode()
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            body = _LIVE_HTML.encode()
            self.send_response(200)
            self.send_header('Content-Type', 'text/html')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get('Content-Length', 0))
            req = _json.loads(self.rfile.read(n) or b'{}')
            if self.path == '/reset':
                self._json_reply(session.reset())
            elif self.path == '/perturb':
                self._json_reply(session.perturb(
                    int(req.get('dof', 0)), float(req.get('dv', 2.0))))
            else:
                self._json_reply(session.step(
                    str(req.get('policy', 'policy'))))

    httpd = http.server.HTTPServer((host, port), Handler)
    print(f'# live viewer at http://{host}:{port} (Ctrl-C to stop)')
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def _main():
    import argparse
    ap = argparse.ArgumentParser(description='live policy viewer')
    ap.add_argument('--env', default='cartpole_swingup')
    ap.add_argument('--port', type=int, default=8000)
    ap.add_argument('--policy', default='random',
                    choices=('random', 'zero'))
    args = ap.parse_args()
    from . import suite
    domain, task = args.env.rsplit('_', 1)
    env = suite.load(domain, task)
    pol = zero_policy(env) if args.policy == 'zero' else None
    serve(env, pol, port=args.port)


if __name__ == '__main__':
    _main()
