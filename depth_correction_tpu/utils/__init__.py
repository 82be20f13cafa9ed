"""Host-side utilities: IO with file locking, checkpoints, timing."""

from .io import PathLock, append, write
from .timing import timing

__all__ = ["PathLock", "append", "timing", "write"]
