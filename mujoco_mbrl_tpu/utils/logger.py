"""Console + file logger singleton.

Same role as the reference's colorlog singleton (``src/mbrl/logger.py:5-106``)
without the third-party dependency: ANSI color formatting is inlined, and
`setup()` attaches an optional plain-text file handler.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

_COLORS = {
    logging.DEBUG: '\033[36m',     # cyan
    logging.INFO: '\033[32m',      # green
    logging.WARNING: '\033[33m',   # yellow
    logging.ERROR: '\033[31m',     # red
    logging.CRITICAL: '\033[41m',  # red background
}
_RESET = '\033[0m'


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, '')
        base = super().format(record)
        if sys.stderr.isatty():
            return f'{color}{base}{_RESET}'
        return base


class LoggerClass:
    """Singleton wrapper (logger.py:5-106 semantics)."""

    _instance: Optional['LoggerClass'] = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._init()
        return cls._instance

    def _init(self):
        self._logger = logging.getLogger('mujoco_mbrl_tpu')
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter(
            '%(asctime)s %(levelname)s %(message)s', '%H:%M:%S'))
        self._logger.addHandler(handler)
        self._file_handler = None

    def setup(self, log_path: Optional[str] = None, level: str = 'info'):
        self._logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        if log_path:
            if self._file_handler:
                self._logger.removeHandler(self._file_handler)
            self._file_handler = logging.FileHandler(log_path)
            self._file_handler.setFormatter(logging.Formatter(
                '%(asctime)s %(levelname)s %(message)s'))
            self._logger.addHandler(self._file_handler)

    def __getattr__(self, name):
        return getattr(self._logger, name)


logger = LoggerClass()
