"""Metrics writer: jsonl primary, TensorBoard events optional.

Plays the role of the reference's tensorboardX SummaryWriter usage
(agents.py:157-166, 241-280; models.py:89-92). jsonl is the source of
truth (portable, greppable on any host); TB event files are written too
when torch's SummaryWriter is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        value = float(np.asarray(value))
        self._f.write(json.dumps(
            {'t': time.time(), 'tag': tag, 'value': value,
             'step': int(step)}) + '\n')
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_histogram(self, tag: str, values: Sequence, step: int):
        arr = np.asarray(values, dtype=np.float64).reshape(-1)
        self._f.write(json.dumps(
            {'t': time.time(), 'tag': tag, 'step': int(step),
             'hist': {'mean': float(arr.mean()), 'std': float(arr.std()),
                      'min': float(arr.min()), 'max': float(arr.max()),
                      'n': int(arr.size)}}) + '\n')
        self._f.flush()
        if self._tb is not None:
            self._tb.add_histogram(tag, arr, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
