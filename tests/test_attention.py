"""Packed block-diagonal attention == plain per-head attention."""

import numpy as np
import pytest
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


def test_pallas_attention_matches_ref():
    from etch_tpu.nn.pallas_attention import attention_pallas, attention_ref

    B, L, E, H = 16, 60, 64, 8
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, L, E).astype(np.float32) / np.sqrt(8))
    k = jnp.asarray(rng.randn(B, L, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, E).astype(np.float32))
    ref = np.asarray(attention_ref(q, k, v, H))
    out = np.asarray(attention_pallas(q, k, v, H, tile=8, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-2
    assert np.mean(np.abs(out - ref)) / scale < 2e-3


def test_fused_attention_grads_match_ref():
    from etch_tpu.nn.pallas_attention import attention_ref, fused_attention

    B, L, E, H = 4, 12, 16, 4
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, L, E).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, E).astype(np.float32))

    g1 = jax.grad(lambda a, b, c: jnp.sum(
        fused_attention(a, b, c, H, False) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: jnp.sum(
        attention_ref(a, b, c, H) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_attention_extreme_head_gap_no_nan():
    """Heads whose logits sit hundreds of nats below another head's must
    still softmax exactly (a global-row-max shift underflows the whole
    block: denominator 0 -> NaN — hit on the trained real-scan checkpoint)."""
    from etch_tpu.nn.pallas_attention import attention_pallas, attention_ref

    B, L, E, H = 8, 60, 64, 8
    rng = np.random.RandomState(4)
    q = rng.randn(B, L, E).astype(np.float32)
    k = rng.randn(B, L, E).astype(np.float32)
    v = rng.randn(B, L, E).astype(np.float32)
    # head 0 gets enormous logits; heads 1.. keep O(1) logits -> with a
    # global row shift their exps all underflow to 0
    q[:, :, :8] *= 40.0
    k[:, :, :8] *= 40.0
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    ref = np.asarray(attention_ref(q, k, v, H))
    out = np.asarray(attention_pallas(q, k, v, H, tile=8, interpret=True))
    assert np.isfinite(out).all()
    # value check on the O(1)-logit heads (1..): head 0's logits are ~1e3,
    # where bf16 rounding legitimately moves its own softmax — the property
    # under test is that head 0's magnitude does not corrupt the others
    scale = np.abs(ref[..., 8:]).max()
    assert np.abs(out[..., 8:] - ref[..., 8:]).max() / scale < 2e-2


class TestVectorAttentionPallas:
    """Fused U-Net vector-attention kernel vs its XLA reference."""

    def _inputs(self, R=40, ns=8, c=64, s=8, seed=0):
        import numpy as np

        rng = np.random.RandomState(seed)
        cs = c // s
        xq = rng.randn(R, c).astype(np.float32)
        gk = rng.randn(R, ns, c).astype(np.float32)
        gv = rng.randn(R, ns, c).astype(np.float32)
        pe = rng.randn(R, ns, c).astype(np.float32)
        a0 = np.stack([rng.rand(c) + 0.5, rng.randn(c)]).astype(np.float32)
        w0 = (rng.randn(c, cs) / np.sqrt(c)).astype(np.float32)
        a1 = np.stack([rng.rand(cs) + 0.5, rng.randn(cs)]).astype(np.float32)
        w1 = (rng.randn(cs, cs) / np.sqrt(cs)).astype(np.float32)
        b1 = rng.randn(1, cs).astype(np.float32)
        return xq, gk, gv, pe, a0, w0, a1, w1, b1

    @pytest.mark.slow
    @pytest.mark.parametrize("ns,c", [(8, 64), (16, 128), (16, 256)])
    def test_interpret_matches_reference(self, ns, c):
        import jax.numpy as jnp

        from etch_tpu.nn.pallas_vector_attention import (
            vector_attention_pallas, vector_attention_ref)

        args = self._inputs(R=40, ns=ns, c=c)
        ref = vector_attention_ref(*[jnp.asarray(a) for a in args])
        xq, gk, gv, pe, a0, w0, a1, w1, b1 = [jnp.asarray(a) for a in args]
        tr = lambda t: t.transpose(1, 0, 2)
        out = vector_attention_pallas(
            xq, tr(gk), tr(gv), tr(pe), a0, w0, a1, w1, b1,
            interpret=True)
        # kernel computes in bf16 operands / f32 accum
        err = jnp.abs(out - ref) / (jnp.abs(ref) + 1e-2)
        assert float(jnp.median(err)) < 0.02, float(jnp.median(err))
        assert float(jnp.mean(jnp.abs(out - ref))) < 0.05

    def test_softmax_head_gap_stability(self):
        """Large per-lane logit offsets must not produce NaN (round-4
        per-block-softmax lesson applied to the ns-softmax)."""
        import jax.numpy as jnp

        from etch_tpu.nn.pallas_vector_attention import (
            vector_attention_pallas, vector_attention_ref)

        args = list(self._inputs(R=16, ns=8, c=64))
        args[8] = args[8] + 300.0  # huge b1 bias -> exp overflow if unshifted
        ref = vector_attention_ref(*[jnp.asarray(a) for a in args])
        assert bool(jnp.isfinite(ref).all())
        xq, gk, gv, pe, a0, w0, a1, w1, b1 = [jnp.asarray(a) for a in args]
        tr = lambda t: t.transpose(1, 0, 2)
        out = vector_attention_pallas(
            xq, tr(gk), tr(gv), tr(pe), a0, w0, a1, w1, b1,
            interpret=True)
        assert bool(jnp.isfinite(out).all())


class TestGroupedHeadPallas:
    def test_interpret_matches_reference(self):
        import jax.numpy as jnp

        from etch_tpu.nn.pallas_grouped_head import (grouped_head_pallas,
                                                     grouped_head_ref)

        rng = np.random.RandomState(1)
        R, c0, k = 70, 128, 86
        h = jnp.asarray(rng.randn(R, c0), jnp.float32)
        w0 = jnp.asarray(rng.randn(c0, c0 * k) / np.sqrt(c0), jnp.float32)
        b0 = jnp.asarray(rng.randn(c0 * k) * 0.1, jnp.float32)
        wg = jnp.asarray(rng.randn(k, c0) / np.sqrt(c0), jnp.float32)
        bg = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
        ref = grouped_head_ref(h, w0, b0, wg, bg)
        out = grouped_head_pallas(h, w0, b0, wg, bg, interpret=True)
        err = jnp.abs(out - ref) / (jnp.abs(ref) + 1e-2)
        assert float(jnp.median(err)) < 0.02, float(jnp.median(err))


class TestDirectionCorePallas:
    def _params(self, E=64, V=128, seed=3):
        import jax.numpy as jnp

        rng = np.random.RandomState(seed)
        p = {}
        for l in (0, 1):
            for nm in ("wq", "wk", "wv"):
                p[f"{nm}{l}"] = jnp.asarray(
                    rng.randn(E, E) / np.sqrt(E), jnp.float32)
        p["wc0"] = jnp.asarray(rng.randn(E, E) / np.sqrt(E), jnp.float32)
        p["bc0"] = jnp.asarray(rng.randn(E) * 0.1, jnp.float32)
        p["wc1"] = jnp.asarray(rng.randn(E, V) / np.sqrt(E), jnp.float32)
        p["bc1"] = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        p["wm0"] = jnp.asarray(rng.randn(V, V) / np.sqrt(V), jnp.float32)
        p["bm0"] = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        p["wm1"] = jnp.asarray(rng.randn(V, V) / np.sqrt(V), jnp.float32)
        p["bm1"] = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        p["wr"] = jnp.asarray(rng.randn(V, 1) / np.sqrt(V), jnp.float32)
        p["br"] = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)
        return p

    @pytest.mark.slow
    def test_interpret_matches_reference(self):
        import jax.numpy as jnp

        from etch_tpu.nn.pallas_dircore import (direction_core_pallas,
                                                direction_core_ref)

        p = self._params()
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randn(24, 60, 64), jnp.float32)
        ref = direction_core_ref(tokens, p, 8)
        out = direction_core_pallas(tokens, p, 8, interpret=True)
        err = jnp.abs(out - ref) / (jnp.abs(ref) + 1e-2)
        assert float(jnp.median(err)) < 0.05, float(jnp.median(err))

    def test_packed_equals_plain_attention(self):
        import jax.numpy as jnp

        from etch_tpu.nn.pallas_attention import (attention_ref,
                                                  packed_attention)

        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(12, 60, 64), jnp.float32)
        k = jnp.asarray(rng.randn(12, 60, 64), jnp.float32)
        v = jnp.asarray(rng.randn(12, 60, 64), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(packed_attention(q, k, v, 8)),
            np.asarray(attention_ref(q, k, v, 8)), rtol=2e-4, atol=2e-4)
