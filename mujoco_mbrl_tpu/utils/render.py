"""Software renderer: jittable SDF rasterization of geoms.

Replaces the reference's OpenGL offscreen rendering stack (GLFW/EGL/OSMesa
reached through ``dm_control/dm_control/_render/``) for the two things the
MBRL loop actually uses it for — debug rollout videos
(``src/mbrl/utils.py:34-54``) and pixel observations
(``dm_control/dm_control/suite/wrappers/pixels.py``) — with a pure-jnp
z-buffered signed-distance rasterizer: geoms render as projected disks /
thick segments / half-spaces on a pixel grid. Being pure jnp it jits and
vmaps, so pixel observations can be generated on-device for whole env
batches (something the GL stack fundamentally could not do).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import model as M

# distinct pseudo-colors per geom (cycled)
_PALETTE = np.array([
    [0.90, 0.40, 0.25], [0.25, 0.60, 0.90], [0.40, 0.80, 0.40],
    [0.85, 0.75, 0.25], [0.70, 0.45, 0.85], [0.30, 0.80, 0.75],
    [0.85, 0.45, 0.60], [0.55, 0.65, 0.30],
], dtype=np.float32)
_BACKGROUND = np.array([0.12, 0.14, 0.18], dtype=np.float32)
_FLOOR = np.array([0.25, 0.28, 0.32], dtype=np.float32)


def render(m: M.Model, data, height: int = 64, width: int = 64,
           center: Optional[Tuple[float, float]] = None,
           extent: float = 2.0, plane: str = 'xz') -> jnp.ndarray:
    """Render one configuration to (height, width, 3) float RGB in [0,1].

    Orthographic projection onto `plane` ('xz' for the planar suite,
    'xy' for top-down tasks like point_mass/swimmer); the third axis is
    depth for the z-buffer.
    """
    ax_u, ax_v, ax_d = {'xz': (0, 2, 1), 'xy': (0, 1, 2)}[plane]
    if center is None:
        # follow the first moving body
        root = min(2, m.nbody - 1)
        cu = data.xpos[root, ax_u]
        cv = data.xpos[root, ax_v] if plane == 'xz' else data.xpos[root,
                                                                   ax_v]
    else:
        cu = jnp.asarray(center[0])
        cv = jnp.asarray(center[1])

    us = cu + jnp.linspace(-extent / 2, extent / 2, width)
    vs = cv + jnp.linspace(extent / 2, -extent / 2, height)
    U = us[None, :].repeat(height, 0)        # (H, W)
    V = vs[:, None].repeat(1, 1).repeat(width, 1)

    img = jnp.broadcast_to(jnp.asarray(_BACKGROUND), (height, width, 3))
    zbuf = jnp.full((height, width), jnp.inf)

    for g in range(m.ngeom):
        gtype = m.geom_type[g]
        pos = data.geom_xpos[g]
        R = data.geom_xmat[g]
        size = m.geom_size[g]
        color = jnp.asarray(_PALETTE[g % len(_PALETTE)])

        if gtype == M.PLANE:
            # half-space below the plane's surface line in the view plane
            n = R[:, 2]
            nu, nv = n[ax_u], n[ax_v]
            d = (U - pos[ax_u]) * nu + (V - pos[ax_v]) * nv
            sdf = d                     # distance above the plane
            depth = jnp.full((height, width), 1e3)   # always behind
            color = jnp.asarray(_FLOOR)
        elif gtype in (M.SPHERE, M.BOX, M.ELLIPSOID):
            r = (size[0] if gtype == M.SPHERE
                 else jnp.linalg.norm(size))
            du = U - pos[ax_u]
            dv = V - pos[ax_v]
            sdf = jnp.sqrt(du * du + dv * dv) - r
            depth = jnp.full((height, width), pos[ax_d])
        else:   # capsule / cylinder: thick segment along local z
            half = size[1]
            a = pos - half * R[:, 2]
            b = pos + half * R[:, 2]
            au, av = a[ax_u], a[ax_v]
            bu, bv = b[ax_u], b[ax_v]
            eu, ev = bu - au, bv - av
            ee = eu * eu + ev * ev
            t = jnp.clip(((U - au) * eu + (V - av) * ev)
                         / jnp.maximum(ee, 1e-12), 0.0, 1.0)
            du = U - (au + t * eu)
            dv = V - (av + t * ev)
            sdf = jnp.sqrt(du * du + dv * dv) - size[0]
            depth = jnp.full((height, width), pos[ax_d])

        inside = sdf < 0
        visible = jnp.logical_and(inside, depth < zbuf)
        # soft edge shading from the SDF
        shade = jnp.clip(-sdf / jnp.maximum(
            jnp.abs(size[0]) + 1e-6, 1e-6), 0.2, 1.0)
        pixel = color[None, None, :] * shade[..., None]
        img = jnp.where(visible[..., None], pixel, img)
        zbuf = jnp.where(visible, depth, zbuf)

    return img


def render_to_uint8(img: jnp.ndarray) -> np.ndarray:
    return np.asarray(jnp.clip(img * 255, 0, 255).astype(jnp.uint8))
