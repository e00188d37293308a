"""Cylindrical (direction-binned) ZP convolutions, TPU-first.

Rebuild of the reference's vgtk zpconv subsystem
(`external/vgtk/vgtk/zpconv/{base,functional,modules}.py`, ~788 LoC +
the `epn_zpconv` CUDA kernels `zpconv_cuda_kernel.cu:33-200`).  The
subsystem is part of the EPN model zoo and is never imported by any ETCH
entry point (SURVEY §1 "dead/legacy layers"); it is rebuilt here for
component-inventory completeness as compact dense-batched JAX:

  * anchors are unit DIRECTION vectors (not rotations; reference loads
    `sphere{n}.ply` and filters to unit norm, functional.py:22-43) —
    generated here: icosahedron vertices for n=12, Fibonacci sphere
    otherwise.
  * IntraZPConv: features indexed by direction bins are re-binned through
    `ann` angular neighbors with linear-falloff angular-kernel influences
    (functional.py:170-212), then a (ks*c_in -> c_out) BasicZPConv matmul.
  * InterZPConv: FPS/ball-query spatial grouping (shared etch_tpu.ops),
    ring kernels (r, omega) with the reference's linear kernel
    `relu(1 - (| |x|-r_k | + |x|*|theta-omega_k|/3)/sqrt(sigma))`
    (functional.py:425-460), neighbor contraction, BasicZPConv.
  * AnchorProp: angular k-NN propagation between anchor sets.
  * inter_pooling / inter_blurring helpers (functional.py:396-410).

Layouts are channels-last (B, P, A, C) like the rest of etch_tpu; all
gathers go through etch_tpu.ops (flat global-index gathers).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.geometry.icosahedral import _icosahedron_vertices
from etch_tpu.ops import ball_query, fps, gather_points, group_points

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def get_z_anchors(n: int) -> np.ndarray:
    """n unit direction vectors (reference sphere{n}.ply semantics)."""
    if n == 12:
        v = _icosahedron_vertices()
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
            np.float32
        )
    # Fibonacci sphere for other counts
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    v = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)], axis=1
    )
    return v.astype(np.float32)


def get_intra_kernels(aperture: float, kernel_size: int) -> np.ndarray:
    """Angular bins in [0, aperture/2] (reference functional.py:136-139)."""
    return np.linspace(0.0, 0.5 * aperture, kernel_size, dtype=np.float32)


def get_kernel_rings(radius: float, aperture: float, kernel_size: int,
                     multiplier: int = 3) -> np.ndarray:
    """(r, omega) ring kernels (reference functional.py:45-65)."""
    rrange = np.linspace(0, radius, kernel_size + 2, dtype=np.float32)[1:-1]
    kps = []
    for ri in range(kernel_size):
        wrange = np.linspace(
            0.0, 0.5 * aperture, multiplier * ri + 1, dtype=np.float32
        )
        for wi in wrange:
            kps.append([rrange[ri], wi])
    return np.asarray(kps, dtype=np.float32)


def _acos_safe(x, eps: float = 1e-4):
    """Gradient-safe arccos (reference functional.py:141-146)."""
    sign = jnp.sign(x)
    slope = np.arccos(1.0 - eps) / eps
    return jnp.where(
        jnp.abs(x) <= 1.0 - eps,
        jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps)),
        jnp.arccos(sign * (1.0 - eps)) - slope * sign * (jnp.abs(x) - 1.0 + eps),
    )


def anchor_knn(a_src: np.ndarray, a_tgt: np.ndarray, k: int = 3):
    """Angular k nearest anchors: (a_tgt, k) idx + angles
    (reference functional.py:148-168, metric='angular')."""
    cos = np.clip(a_tgt @ a_src.T, -1.0, 1.0)
    ang = np.arccos(cos)
    idx = np.argsort(ang, axis=1)[:, :k]
    return np.take_along_axis(ang, idx, axis=1).astype(np.float32), idx


def get_intra_kernel_weights(anchor_in: np.ndarray,
                             anchor_out: Optional[np.ndarray],
                             kernels: np.ndarray, ann: int,
                             sigma: float = 1e-1):
    """(a_out, ann) indices + (a_out, ks, ann) linear-falloff influences
    (reference functional.py:170-212, 'linear' branch)."""
    if anchor_out is None:
        anchor_out = anchor_in
    angles, idx = anchor_knn(anchor_in, anchor_out, k=ann)
    diff = np.abs(angles[:, None, :] - kernels[None, :, None]) / np.pi
    infl = np.maximum(1.0 - diff / (3.0 * (sigma / 2.0) ** 0.5), 0.0)
    return idx.astype(np.int32), infl.astype(np.float32)


class BasicZPConv(nn.Module):
    """(ks * c_in -> c_out) 1x1 conv (reference modules.py:15-48)."""

    dim_in: int
    dim_out: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:     # (B, P, A, ks, C) -> (B,P,A,O)
        B, P, A = x.shape[:3]
        W = self.param(
            "W", nn.initializers.xavier_normal(),
            (self.kernel_size * self.dim_in, self.dim_out), x.dtype,
        )
        bias = self.param(
            "bias", nn.initializers.constant(1e-3), (self.dim_out,), x.dtype
        )
        h = x.reshape(B, P, A, self.kernel_size * self.dim_in)
        return jax.lax.dot_general(
            h, W, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias


class IntraZPConv(nn.Module):
    """Direction-bin re-binning conv (reference modules.py:53-91)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    aperture: float
    sigma: float
    anchor_nn: int
    anchor_in: int
    anchor_out: Optional[int] = None

    @nn.compact
    def __call__(self, xyz: Array, feats: Array):
        """feats: (B, P, A_in, C) -> (xyz, (B, P, A_out, O))."""
        a_in = get_z_anchors(self.anchor_in)
        a_out = get_z_anchors(self.anchor_out or self.anchor_in)
        kernels = get_intra_kernels(self.aperture, self.kernel_size)
        idx, infl = get_intra_kernel_weights(
            a_in, a_out, kernels, self.anchor_nn, self.sigma
        )                                      # (Ao, ann), (Ao, ks, ann)
        ks = kernels.shape[0]
        # gather: (B, P, Ao, ann, C); contraction 'bpanc,akn->bpakc'
        g = feats[:, :, jnp.asarray(idx), :]
        h = jnp.einsum("bpanc,akn->bpakc", g, jnp.asarray(infl))
        out = BasicZPConv(
            dim_in=self.dim_in, dim_out=self.dim_out, kernel_size=ks,
            name="basic_conv",
        )(h)
        return xyz, out


class InterZPConv(nn.Module):
    """Spatial ring-kernel conv (reference modules.py:94-131 +
    functional.py:416-470)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    aperture: float
    sigma: float
    anchors_dim: int
    n_neighbor: int
    multiplier: int = 3
    lazy_sample: bool = True

    @nn.compact
    def __call__(self, xyz: Array, feats: Array):
        """xyz: (B, P, 3); feats: (B, P, A, C) -> sampled xyz + conv feats."""
        anchors = jnp.asarray(get_z_anchors(self.anchors_dim))   # (A, 3)
        kernels = get_kernel_rings(
            self.radius, self.aperture, self.kernel_size, self.multiplier
        )                                                        # (ks, 2)
        ks = kernels.shape[0]
        B, P, A, C = feats.shape

        P2 = -(-P // self.stride)
        sample_idx = fps(xyz, P2, lazy=self.lazy_sample)
        new_xyz = gather_points(xyz, sample_idx)
        nbr_idx = ball_query(new_xyz, xyz, self.radius, self.n_neighbor)

        gx = group_points(xyz, nbr_idx) - new_xyz[:, :, None, :]  # (B,p,nn,3)
        norm = jnp.sqrt(jnp.sum(gx * gx, axis=-1)) + 1e-6         # (B,p,nn)
        cos_t = jnp.einsum("bpnj,aj->bpan", gx, anchors) / norm[:, :, None, :]
        theta = _acos_safe(cos_t)[:, :, :, None, :]               # (B,p,a,1,nn)

        knorm = jnp.asarray(kernels[:, 0])[None, None, None, :, None]
        komega = jnp.asarray(kernels[:, 1])[None, None, None, :, None]
        norm2 = norm[:, :, None, None, :]
        # linear ring kernel (functional.py:448-460)
        dist1 = jnp.abs(norm2 - knorm) + jnp.abs(norm2 * (theta - komega)) / 3.0
        inter_w = jax.nn.relu(1.0 - dist1 / self.sigma**0.5)      # (B,p,a,ks,nn)

        gf = group_points(feats, nbr_idx)                         # (B,p,nn,A,C)
        h = jnp.einsum("bpnac,bpakn->bpakc", gf, inter_w)
        out = BasicZPConv(
            dim_in=self.dim_in, dim_out=self.dim_out, kernel_size=ks,
            name="basic_conv",
        )(h)
        return new_xyz, out


class AnchorProp(nn.Module):
    """Propagate features between anchor sets by angular k-NN with gaussian
    weights (reference modules.py:133-149)."""

    anchor_in: int
    anchor_out: int
    sigma: float
    k: int = 6

    @nn.compact
    def __call__(self, xyz: Array, feats: Array):
        a_in = get_z_anchors(self.anchor_in)
        a_out = get_z_anchors(self.anchor_out)
        angles, idx = anchor_knn(a_in, a_out, k=self.k)
        w = np.exp(-(angles**2) / self.sigma)
        w = w / np.sum(w, axis=1, keepdims=True)                  # (Ao, k)
        g = feats[:, :, jnp.asarray(idx), :]                      # (B,P,Ao,k,C)
        return xyz, jnp.einsum("bpakc,ak->bpac", g, jnp.asarray(w))


def inter_pooling(nbr_idx: Array, sample_idx: Array, feats: Array,
                  alpha: float = 0.5) -> Array:
    """alpha * feats[sample] + (1-alpha) * mean over ball neighbors
    (reference functional.py:396-403)."""
    new_feats = gather_points(feats, sample_idx)
    grouped = group_points(feats, nbr_idx)                        # (B,p,nn,...)
    return alpha * new_feats + (1.0 - alpha) * jnp.mean(grouped, axis=2)


def inter_blurring(nbr_idx: Array, feats: Array, alpha: float = 0.5) -> Array:
    """Self-smoothing over ball neighborhoods (functional.py:405-410)."""
    grouped = group_points(feats, nbr_idx)
    return alpha * feats + (1.0 - alpha) * jnp.mean(grouped, axis=2)
