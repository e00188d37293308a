"""Pallas/XLA dispatch bookkeeping.

The point-cloud ops (fps/knn/ball_query) prefer hand-written Pallas kernels
on TPU and fall back to XLA compositions elsewhere.  A silent fallback would
hide a Mosaic regression as a quiet perf cliff, so every fallback warns once
per process, and the chosen path is recorded so the benchmark can assert the
Pallas paths were actually taken on TPU (see bench.py).
"""

from __future__ import annotations

import warnings

# op name -> "pallas" | "xla"; recorded at trace time (once per jit cache
# entry), which is exactly when the dispatch decision is made.
_paths_taken: dict[str, str] = {}
_warned: set[str] = set()


def record(op: str, path: str) -> None:
    _paths_taken[op] = path


def paths_taken() -> dict[str, str]:
    return dict(_paths_taken)


def warn_fallback(op: str, exc: BaseException) -> None:
    """One-time loud warning when a TPU Pallas path degrades to XLA."""
    if op in _warned:
        return
    _warned.add(op)
    warnings.warn(
        f"etch_tpu: Pallas path for '{op}' failed on TPU; falling back to "
        f"the slower XLA path: {exc!r}",
        RuntimeWarning,
        stacklevel=3,
    )
