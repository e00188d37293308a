"""Deterministic kernel-point layouts for the EPN inter-convolution.

The reference loads fixed kernel-point clouds from bundled ply files
(kpsphere24/30/66, `so3conv/functional.py:146-157`) — one center point plus a
shell of quasi-uniform points near the unit sphere — then rescales so the
max-norm equals 0.7 * conv radius (`modules.py:13,46,99`).

We generate an equivalent layout ourselves: a center point plus (n-1) points
placed by a deterministic repulsion descent initialized from a Fibonacci
sphere.  The layout is computed once and cached.
"""

from __future__ import annotations

import functools

import numpy as np

KERNEL_CONDENSE_RATIO = 0.7  # reference modules.py:13

_SIZE_MAP = {1: 24, 2: 30, 3: 66}  # reference functional.py:148


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + np.sqrt(5.0)) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=1,
    )


def _repulse(points: np.ndarray, iters: int = 200, step: float = 5e-3) -> np.ndarray:
    """Simple Coulomb repulsion on the sphere surface (deterministic)."""
    p = points.copy()
    for _ in range(iters):
        d = p[:, None] - p[None, :]
        dist2 = (d ** 2).sum(-1) + np.eye(len(p))
        force = (d / dist2[..., None] ** 1.5).sum(1)
        p = p + step * force
        p /= np.linalg.norm(p, axis=1, keepdims=True)
    return p


@functools.lru_cache(maxsize=8)
def _unit_kernel(n: int) -> np.ndarray:
    shell = _repulse(_fibonacci_sphere(n - 1))
    pts = np.concatenate([np.zeros((1, 3)), shell], axis=0)
    return pts.astype(np.float32)


def get_kernel_points(radius: float, kernel_size: int = 1) -> np.ndarray:
    """(ks, 3) kernel points with max-norm == KERNEL_CONDENSE_RATIO * radius.

    `kernel_size` selects the layout family exactly as the reference maps
    {1: 24, 2: 30, 3: 66} points (`functional.py:148`); the caller passes the
    conv radius and we apply the 0.7 condense ratio internally (the reference
    applies it at the call sites, `modules.py:46,99`).
    """
    n = _SIZE_MAP[kernel_size]
    pts = _unit_kernel(n)
    scale = KERNEL_CONDENSE_RATIO * radius / np.abs(np.linalg.norm(pts, axis=1)).max()
    return (pts * scale).astype(np.float32)
