"""Rollout video recorder.

Role of the reference's Recorder (``src/mbrl/utils.py:34-54``): collect
frames during a rollout and write a movie. The reference shelled out to
ffmpeg for mp4; this environment has no ffmpeg, so movies are animated
GIFs via PIL (and raw frames can be saved as .npz for external encoding).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


class Recorder:
    def __init__(self, fps: int = 25):
        self.frames: List[np.ndarray] = []
        self.fps = fps

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def record_frame(self, frame: np.ndarray, t: Optional[int] = None):
        self.frames.append(np.asarray(frame))

    def make_movie(self, path: str) -> str:
        """Write frames to `<path>.gif` (returns the written filename)."""
        if not self.frames:
            return ''
        from PIL import Image
        out = path if path.endswith('.gif') else path + '.gif'
        os.makedirs(os.path.dirname(out) or '.', exist_ok=True)
        ims = [Image.fromarray(f) for f in self.frames]
        ims[0].save(out, save_all=True, append_images=ims[1:],
                    duration=int(1000 / self.fps), loop=0)
        return out

    def save_frames(self, path: str) -> str:
        out = path if path.endswith('.npz') else path + '.npz'
        os.makedirs(os.path.dirname(out) or '.', exist_ok=True)
        np.savez_compressed(out, frames=np.stack(self.frames))
        return out
