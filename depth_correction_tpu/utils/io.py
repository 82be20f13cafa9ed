"""File IO with lock-file mutual exclusion.

Concurrent experiment jobs append to shared CSVs; a lock file with O_EXCL
creation plus randomized retry serializes writers across processes
(reference: src/depth_correction/io.py:7-65).
"""
from __future__ import annotations

import os
import random
import time

__all__ = ["PathLock", "append", "write"]


class PathLock:
    """``with PathLock(path):`` — exclusive lock via ``<path>.lock``."""

    def __init__(self, path: str, interval: float = 0.01, timeout: float = 60.0):
        self.lock_path = path + ".lock"
        self.interval = interval
        self.timeout = timeout
        self._fd = None

    def __enter__(self):
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                self._fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError("Could not acquire %s" % self.lock_path)
                time.sleep(self.interval * (1.0 + random.random()))

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        try:
            os.remove(self.lock_path)
        except FileNotFoundError:
            pass
        return False


def write(path: str, text: str, mode: str = "w"):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with PathLock(path):
        with open(path, mode) as f:
            f.write(text)


def append(path: str, text: str):
    """Locked append (reference: io.py:16-21)."""
    write(path, text, mode="a")
