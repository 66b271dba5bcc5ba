"""Fused blockwise InfoNCE vs the dense reference loss: values, gradients,
XLA path on CPU + Pallas kernel in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leccr_tpu.models.losses import soft_label_contrastive_loss
from leccr_tpu.ops.infonce import infonce_loss, infonce_stats

RS = np.random.RandomState(21)


def _feats(m=24, n=24, e=16, dup=True):
    a = RS.randn(m, e).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = RS.randn(n, e).astype(np.float32)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    if dup:
        idx = RS.randint(0, m // 2, size=m).astype(np.int32)
    else:
        idx = np.arange(m, dtype=np.int32)
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(idx)


def _dense_stats(q, k, idx, inv_temp):
    logits = np.asarray(q) @ np.asarray(k).T * inv_temp
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) + \
        logits.max(1)
    pos = np.asarray(idx)[:, None] == np.asarray(idx)[None, :]
    ps = (logits * pos).sum(1)
    pc = pos.sum(1).astype(np.float32)
    return lse, ps, pc


@pytest.mark.parametrize("m,n", [(24, 24), (17, 33)])
def test_stats_xla_matches_dense(m, n):
    q, k, idx = _feats(m, m, 8)
    k = k[:m]
    lse, ps, pc = infonce_stats(q, k, idx, idx, 1.0 / 0.07, impl="xla")
    w_lse, w_ps, w_pc = _dense_stats(q, k, idx, 1.0 / 0.07)
    np.testing.assert_allclose(np.asarray(lse), w_lse, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), w_ps, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pc), w_pc)


def test_stats_pallas_interpret_matches_dense():
    q, k, idx = _feats(40, 40, 16)
    lse, ps, pc = infonce_stats(q, k, idx, idx, 1.0 / 0.07, impl="pallas",
                                interpret=True)
    w_lse, w_ps, w_pc = _dense_stats(q, k, idx, 1.0 / 0.07)
    np.testing.assert_allclose(np.asarray(lse), w_lse, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), w_ps, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pc), w_pc)


def test_infonce_loss_matches_dense_loss():
    a, b, idx = _feats()
    temp = jnp.float32(0.07)
    want = soft_label_contrastive_loss(a, b, temp, idx)
    got = infonce_loss(a, b, temp, idx, impl="xla")
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # identity labels too
    want2 = soft_label_contrastive_loss(a, b, temp, None)
    got2 = infonce_loss(a, b, temp, None, impl="xla")
    np.testing.assert_allclose(float(got2), float(want2), rtol=1e-5)


def test_infonce_loss_gradients_match_dense():
    a, b, idx = _feats(16, 16, 8)
    temp = jnp.float32(0.07)

    def dense(a_, b_, t_):
        return soft_label_contrastive_loss(a_, b_, t_, idx)

    def fused(a_, b_, t_):
        return infonce_loss(a_, b_, t_, idx, impl="xla")

    gw = jax.grad(dense, argnums=(0, 1, 2))(a, b, temp)
    gg = jax.grad(fused, argnums=(0, 1, 2))(a, b, temp)
    for w, g in zip(gw, gg):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_pallas_backward_matches_dense_grads():
    """Pallas dq/dk/dtemp kernels (interpret mode) vs the dense loss."""
    a, b, idx = _feats(24, 24, 16)
    temp = jnp.float32(0.07)

    g_want = jax.grad(
        lambda x, y, t: soft_label_contrastive_loss(x, y, t, idx),
        argnums=(0, 1, 2))(a, b, temp)
    g_got = jax.grad(
        lambda x, y, t: infonce_loss(x, y, t, idx, impl="pallas",
                                     interpret=True),
        argnums=(0, 1, 2))(a, b, temp)
    for w, g in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)
