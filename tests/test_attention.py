"""Packed block-diagonal attention == plain per-head attention."""

import numpy as np
import jax
import jax.numpy as jnp

from etch_tpu.nn.attention import MultiHeadAttention, StackedMHSA


def test_packed_attention_matches_plain():
    B, L, E = 32, 60, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, E).astype(np.float32))

    plain = MultiHeadAttention(
        embedding_dim=E, value_dim=128, num_heads=8, packed=False
    )
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(plain.apply(params, x))

    packed = MultiHeadAttention(
        embedding_dim=E, value_dim=128, num_heads=8, packed=True
    )
    out = np.asarray(packed.apply(params, x))

    # packed path computes the dots in bf16 (f32 accumulation/softmax)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-2
    assert np.mean(np.abs(out - ref)) / scale < 2e-3


def test_stacked_mhsa_runs_and_shapes():
    B, L, E = 8, 60, 64
    x = jnp.asarray(np.random.RandomState(1).randn(B, L, E).astype(np.float32))
    m = StackedMHSA(embedding_dim=E, value_dim=128, num_heads=8, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (B, L, 128)
    assert np.isfinite(np.asarray(y)).all()
