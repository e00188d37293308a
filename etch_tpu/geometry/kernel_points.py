"""Deterministic kernel-point layouts for the EPN inter-convolution.

The reference loads fixed kernel-point clouds from bundled ply files
(kpsphere24/30/66, `so3conv/functional.py:146-157`) and rescales so the
max-norm equals 0.7 * conv radius (`modules.py:13,46,99` +
`functional.py:153-156` normalize).

Two layout families are provided:

* ``"reference"`` (default): the exact point dispositions of the reference's
  kpsphere{24,30,66}.ply files, embedded as constants (pure geometry data —
  one center point plus a quasi-uniform near-unit shell for 24; 30/66 also
  contain interior points).  Matching these exactly removes the one untested
  inductive-bias deviation flagged in round 1: the conv's relu(1-d^2/sigma)
  kernel-point responses are identical to the reference's.
* ``"repulsion"``: our original generated layout (center + Coulomb-repulsed
  Fibonacci shell).  Kept for A/B comparison; the overfit A/B recorded in
  docs/DESIGN.md showed no measurable quality difference at K=24, so the
  default follows the reference for strict parity.
"""

from __future__ import annotations

import functools
import os

import numpy as np

KERNEL_CONDENSE_RATIO = 0.7  # reference modules.py:13

_SIZE_MAP = {1: 24, 2: 30, 3: 66}  # reference functional.py:148

# Exact kpsphere{24,30,66}.ply vertex coordinates (reference
# external/vgtk/vgtk/data/anchors/, ascii ply payload — fixed geometry
# constants, required for numerical parity of the conv weights).
_REFERENCE_LAYOUTS = {
    24: [
        (0.0, 0.0, 0.0),
        (0.6299, -0.2149, -0.7423),
        (-0.3022, 0.7119, -0.6461),
        (-0.2966, -0.9471, -0.1752),
        (0.2247, 0.226, 0.9405),
        (-0.9917, 0.0428, 0.1434),
        (0.5258, 0.7599, 0.402),
        (-0.2035, -0.0206, -0.9718),
        (0.3777, 0.4709, -0.8007),
        (0.0201, -0.8949, 0.4631),
        (0.1504, 0.9692, -0.1638),
        (-0.6206, 0.2209, 0.7483),
        (-0.7326, -0.4753, -0.4757),
        (-0.1841, 0.7913, 0.5883),
        (-0.7168, -0.5765, 0.3743),
        (0.58, -0.4954, 0.6381),
        (0.0465, -0.6561, -0.7571),
        (0.8635, 0.1413, 0.4999),
        (0.5038, -0.8428, -0.1487),
        (-0.6553, 0.7446, 0.0504),
        (0.9561, -0.2905, -0.0871),
        (-0.8158, 0.2253, -0.5471),
        (-0.2005, -0.3558, 0.9158),
        (0.8413, 0.4655, -0.2484),
    ],
    30: [
        (0.0, 0.0, 0.0),
        (0.3652, -0.3791, -0.8628),
        (-0.4803, 0.6644, 0.5948),
        (0.3332, -0.4217, 0.8705),
        (-0.6308, 0.8077, -0.0669),
        (0.1518, -0.9318, 0.3939),
        (-1.0532, 0.2475, 0.143),
        (0.3315, -0.9158, -0.2675),
        (1.0801, 0.0438, 0.1552),
        (-0.8004, 0.3207, -0.6279),
        (0.7509, -0.5757, 0.3404),
        (0.1998, 0.3141, -0.9507),
        (0.7376, 0.7613, 0.2401),
        (-0.5152, -0.0709, -0.0869),
        (-0.3344, -0.0976, -0.9577),
        (0.4523, 0.846, -0.4607),
        (0.0082, 1.0084, 0.0926),
        (0.8411, -0.4832, -0.3561),
        (-0.6912, 0.028, 0.759),
        (0.4739, 0.2228, -0.0761),
        (-0.2315, 0.747, -0.635),
        (-0.1966, -0.7407, -0.6733),
        (-0.886, -0.5346, 0.2965),
        (-0.3921, -0.9375, -0.0178),
        (0.6689, 0.1576, 0.7531),
        (0.8571, 0.206, -0.6344),
        (-0.3328, -0.5827, 0.7463),
        (-0.0618, 0.1242, 1.0014),
        (-0.8578, -0.4656, -0.4937),
        (0.1931, 0.6978, 0.7148),
    ],
    66: [
        (0.0, 0.0, 0.0),
        (0.0, 0.0, 0.5),
        (0.433, 0.0, 0.25),
        (0.433, 0.0, -0.25),
        (-0.0, -0.0, -0.5),
        (-0.0, 0.0, 0.5),
        (-0.0, 0.433, 0.25),
        (-0.0, 0.433, -0.25),
        (0.0, -0.0, -0.5),
        (-0.0, -0.0, 0.5),
        (-0.433, -0.0, 0.25),
        (-0.433, -0.0, -0.25),
        (0.0, 0.0, -0.5),
        (0.0, -0.0, 0.5),
        (0.0, -0.433, 0.25),
        (0.0, -0.433, -0.25),
        (-0.0, 0.0, -0.5),
        (0.0, 0.0, 1.0),
        (0.5, 0.0, 0.866),
        (0.866, 0.0, 0.5),
        (1.0, 0.0, -0.0),
        (0.866, 0.0, -0.5),
        (0.5, 0.0, -0.866),
        (-0.0, -0.0, -1.0),
        (0.0, 0.0, 1.0),
        (0.3117, 0.3909, 0.866),
        (0.54, 0.6771, 0.5),
        (0.6235, 0.7818, -0.0),
        (0.54, 0.6771, -0.5),
        (0.3117, 0.3909, -0.866),
        (-0.0, -0.0, -1.0),
        (-0.0, 0.0, 1.0),
        (-0.1113, 0.4875, 0.866),
        (-0.1927, 0.8443, 0.5),
        (-0.2225, 0.9749, -0.0),
        (-0.1927, 0.8443, -0.5),
        (-0.1113, 0.4875, -0.866),
        (0.0, -0.0, -1.0),
        (-0.0, 0.0, 1.0),
        (-0.4505, 0.2169, 0.866),
        (-0.7803, 0.3758, 0.5),
        (-0.901, 0.4339, -0.0),
        (-0.7803, 0.3758, -0.5),
        (-0.4505, 0.2169, -0.866),
        (0.0, -0.0, -1.0),
        (-0.0, -0.0, 1.0),
        (-0.4505, -0.2169, 0.866),
        (-0.7803, -0.3758, 0.5),
        (-0.901, -0.4339, -0.0),
        (-0.7803, -0.3758, -0.5),
        (-0.4505, -0.2169, -0.866),
        (0.0, 0.0, -1.0),
        (-0.0, -0.0, 1.0),
        (-0.1113, -0.4875, 0.866),
        (-0.1927, -0.8443, 0.5),
        (-0.2225, -0.9749, -0.0),
        (-0.1927, -0.8443, -0.5),
        (-0.1113, -0.4875, -0.866),
        (0.0, 0.0, -1.0),
        (0.0, -0.0, 1.0),
        (0.3117, -0.3909, 0.866),
        (0.54, -0.6771, 0.5),
        (0.6235, -0.7818, -0.0),
        (0.54, -0.6771, -0.5),
        (0.3117, -0.3909, -0.866),
        (-0.0, 0.0, -1.0),
    ],
}


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
def _unit_kernel(n: int, layout: str) -> np.ndarray:
    if layout == "reference":
        return np.asarray(_REFERENCE_LAYOUTS[n], np.float32)
    if layout == "repulsion":
        shell = _repulse(_fibonacci_sphere(n - 1))
        pts = np.concatenate([np.zeros((1, 3)), shell], axis=0)
        return pts.astype(np.float32)
    raise ValueError(f"unknown kernel-point layout {layout!r}")


def default_layout() -> str:
    """Layout family used when callers don't pass one explicitly.

    ETCH_KP_LAYOUT=repulsion switches the whole model to the generated
    layout for A/B runs (docs/DESIGN.md records the overfit comparison).
    """
    return os.environ.get("ETCH_KP_LAYOUT", "reference")


def get_kernel_points(
    radius: float, kernel_size: int = 1, layout: str | None = None
) -> np.ndarray:
    """(ks, 3) kernel points with max-norm == KERNEL_CONDENSE_RATIO * radius.

    `kernel_size` selects the layout family exactly as the reference maps
    {1: 24, 2: 30, 3: 66} points (`functional.py:148`); the caller passes the
    conv radius and we apply the 0.7 condense ratio internally (the reference
    applies it at the call sites, `modules.py:46,99`, then normalizes by the
    max norm, `functional.py:153-156`).
    """
    n = _SIZE_MAP[kernel_size]
    pts = _unit_kernel(n, layout or default_layout())
    scale = KERNEL_CONDENSE_RATIO * radius / np.abs(np.linalg.norm(pts, axis=1)).max()
    return (pts * scale).astype(np.float32)
