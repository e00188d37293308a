"""EPN backbone tests: shapes, and the SE(3) (rotation) equivariance property
that defines the architecture.

The equivariance contract (implicit in the reference design,
external/vgtk/vgtk/so3conv/*): rotating the input cloud by a group element g
permutes the 60 anchor channels by p_g and rotates the center coordinates,
leaving feature values unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etch_tpu.geometry import anchor_permutation, get_anchors
from etch_tpu.nn.epn import EPNBackbone, SphericalCloud, occupancy_features
from etch_tpu.models.etch_net import _freeze_plan
from etch_tpu.utils.config import EtchConfig, backbone_plan


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = EtchConfig(num_point=128, epn_layer_num=2)
    plan = _freeze_plan(backbone_plan(cfg))
    model = EPNBackbone(plan=plan)
    rng = np.random.RandomState(0)
    # points on a sphere of radius 0.2: spacing ~0.06 < first conv radius
    # 0.08, so balls are populated (matches human-scan density the radii are
    # sized for)
    v = rng.randn(1, 128, 3).astype(np.float32)
    xyz = 0.2 * v / np.linalg.norm(v, axis=-1, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz))
    return cfg, plan, model, xyz, params


def test_backbone_shapes(tiny_setup):
    cfg, plan, model, xyz, params = tiny_setup
    (cloud, idx_lists) = model.apply(params, jnp.asarray(xyz))
    # plan: 128 -> 64 (stride2) -> 64 -> 32 (stride2) -> 32
    assert cloud.xyz.shape == (1, 32, 3)
    assert cloud.feats.shape == (1, 32, 60, 64)
    assert len(idx_lists) == 2 and len(idx_lists[0]) == 2


def test_backbone_finite(tiny_setup):
    cfg, plan, model, xyz, params = tiny_setup
    (cloud, _) = model.apply(params, jnp.asarray(xyz))
    assert np.isfinite(np.asarray(cloud.feats)).all()
    assert np.abs(np.asarray(cloud.feats)).max() > 0


def test_backbone_equivariance(tiny_setup):
    cfg, plan, model, xyz, params = tiny_setup
    anchors = get_anchors()
    g = anchors[17]
    perm = anchor_permutation(g)

    out1, _ = model.apply(params, jnp.asarray(xyz))
    out2, _ = model.apply(params, jnp.asarray(xyz @ g.T))

    # rotated centers
    np.testing.assert_allclose(
        np.asarray(out2.xyz), np.asarray(out1.xyz) @ g.T, atol=1e-3
    )
    # permuted anchor channels: feats2[..., perm[a], :] == feats1[..., a, :]
    # the contraction streams in bf16, so fp32 input jitter (~1e-7 from the
    # rotation) can flip values across bf16 rounding boundaries — a ~0.8%
    # relative tail on a small fraction of elements.  The structure check is
    # that the bulk matches tightly and no element deviates beyond bf16 ULP
    # scale.
    f1 = np.asarray(out1.feats)
    f2 = np.asarray(out2.feats)
    err = np.abs(f2[:, :, perm, :] - f1)
    assert np.median(err) < 2e-4, f"median {np.median(err)}"
    assert np.quantile(err, 0.99) < 5e-3, f"p99 {np.quantile(err, 0.99)}"
    assert err.max() < 3e-2, f"max {err.max()}"


def test_occupancy_features():
    xyz = jnp.zeros((2, 10, 3))
    f = occupancy_features(xyz)
    assert f.shape == (2, 10, 60, 1)
    assert float(f.min()) == 1.0


def test_kernel_propagation_matches_cuda_oracle():
    """KernelPropagation == the reference initial_anchor_query semantics
    (grouping_cuda_kernel.cu:117-180 + modules.py:71-86 normalization)."""
    import numpy as np
    from etch_tpu.geometry import get_anchors, get_kernel_points
    from etch_tpu.nn.epn import KernelPropagation

    rng = np.random.RandomState(0)
    B, P, M = 2, 16, 64
    radius, sigma = 0.4, 0.08
    clouds = rng.randn(B, P, 3).astype(np.float32) * 0.3
    frag = rng.randn(M, 3).astype(np.float32) * 0.3

    mod = KernelPropagation(
        dim_out=8, n_center=P, kernel_size=1, radius=radius, sigma=sigma,
        chunk=16,
    )
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(frag),
                      jnp.asarray(clouds))
    out = mod.apply(params, jnp.asarray(frag), jnp.asarray(clouds))

    kernels = get_kernel_points(radius, 1)
    anchors = get_anchors(60)
    K = kernels.shape[0]
    rk = np.einsum("aij,kj->kai", anchors, kernels)      # (K, A, 3)
    wts = np.zeros((B, P, K, 60), np.float32)
    ctn = np.zeros((B, P), np.float32)
    for b in range(B):
        for m in range(M):
            for c in range(P):
                if np.linalg.norm(clouds[b, c] - frag[m]) <= radius:
                    ctn[b, c] += 1.0
                    d = frag[m] - (clouds[b, c] + rk)    # (K, A, 3)
                    w = np.maximum(1.0 - np.sum(d * d, -1) / sigma, 0.0)
                    wts[b, c] += w
    wts = wts / (ctn[:, :, None, None] + 1.0)
    W = np.asarray(params["params"]["W"])
    bias = np.asarray(params["params"]["bias"])
    expect = np.einsum("bnka,ko->bnao", wts, W) + bias
    np.testing.assert_allclose(np.asarray(out.feats), expect,
                               rtol=2e-4, atol=2e-5)
