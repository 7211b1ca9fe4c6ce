"""Console+file tee logger.

Same observable behavior as the reference's Loger.Logger
(/root/reference/CODON_X4/Loger.py:22-57): writes to console and a file
simultaneously, fsyncs on flush, creates parent dirs. Clean-room,
context-manager-friendly implementation.
"""
from __future__ import annotations

import os
import sys


def mkdir_if_missing(path: str) -> None:
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


class Logger:
    """sys.stdout tee: `sys.stdout = Logger('log.txt')` or use as a context
    manager to restore the original stream on exit."""

    def __init__(self, fpath: str | None = None, mode: str = "a"):
        # append by default, matching the reference (Loger.py:32 opens 'a'
        # so repeated runs accumulate into one log)
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            mkdir_if_missing(os.path.dirname(fpath))
            self.file = open(fpath, mode)

    def __enter__(self):
        self._saved = sys.stdout
        sys.stdout = self
        return self

    def __exit__(self, *exc):
        sys.stdout = self._saved
        self.close()

    def __del__(self):
        self.close()

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        if self.file is not None:
            self.file.close()
            self.file = None
