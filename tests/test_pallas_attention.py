"""Fused cross-attention kernel (interpret mode) vs the XLA attention core,
and its wiring through MultiHeadAttention."""

import jax
import jax.numpy as jnp
import numpy as np

from leccr_tpu.ops.attention import MultiHeadAttention, dot_product_attention
from leccr_tpu.ops.pallas_attention import fused_cross_attention

RS = np.random.RandomState(5)


def test_fused_matches_xla_core():
    b, h, lq, lk, dh = 2, 4, 4, 24, 16
    q = jnp.asarray(RS.randn(b, h, lq, dh), jnp.float32)
    k = jnp.asarray(RS.randn(b, h, lk, dh), jnp.float32)
    v = jnp.asarray(RS.randn(b, h, lk, dh), jnp.float32)
    pad = np.zeros((b, lk), bool)
    pad[:, -5:] = True

    want = dot_product_attention(q, k, v, key_padding_mask=jnp.asarray(pad))
    got = fused_cross_attention(q, k, v, jnp.asarray(pad), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # no mask
    want2 = dot_product_attention(q, k, v)
    got2 = fused_cross_attention(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_fused_path_through_module(monkeypatch):
    """MultiHeadAttention(fused=True) must agree with the XLA path."""
    import leccr_tpu.ops.pallas_attention as pa

    # interpret mode on CPU
    orig = pa.fused_cross_attention.__wrapped__ \
        if hasattr(pa.fused_cross_attention, "__wrapped__") else None
    d, heads = 32, 4
    mod = MultiHeadAttention(d, heads, dropout=0.0)
    q = jnp.asarray(RS.randn(2, 3, d), jnp.float32)
    m = jnp.asarray(RS.randn(2, 7, d), jnp.float32)
    pad = jnp.zeros((2, 7), bool).at[:, -2:].set(True)
    params = mod.init(jax.random.PRNGKey(0), q, m, m)["params"]
    want = mod.apply({"params": params}, q, m, m, key_padding_mask=pad)

    # monkeypatch the kernel to interpret mode for the CPU test
    real = pa.fused_cross_attention

    def interp(q_, k_, v_, mask_, interpret=False):
        return real(q_, k_, v_, mask_, True)

    monkeypatch.setattr(pa, "fused_cross_attention", interp)
    got = mod.apply({"params": params}, q, m, m, key_padding_mask=pad,
                    fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
