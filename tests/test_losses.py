"""Golden tests for the LECCR loss suite against independent numpy oracles
(SURVEY.md §4 item 2 — loss semantics fidelity is the hard part)."""

import jax.numpy as jnp
import numpy as np
import pytest

from leccr_tpu.models import losses as L

B, E, N, D = 8, 6, 3, 10
RS = np.random.RandomState(7)


def np_log_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def l2(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def feats():
    a = l2(RS.randn(B, E)).astype(np.float32)
    b = l2(RS.randn(B, E)).astype(np.float32)
    idx = np.array([0, 1, 2, 2, 3, 4, 4, 4])  # duplicates on purpose
    return a, b, idx


def test_soft_label_itc(feats):
    a, b, idx = feats
    temp = 0.07
    logits = a @ b.T / temp
    pos = (idx[:, None] == idx[None, :]).astype(np.float32)
    labels = pos / pos.sum(1, keepdims=True)
    want = (
        -np.mean((np_log_softmax(logits, 1) * labels).sum(1))
        - np.mean((np_log_softmax(logits.T, 1) * labels).sum(1))
    ) / 2
    got = L.soft_label_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(temp), jnp.asarray(idx))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_itc_without_idx_is_diagonal_ce(feats):
    a, b, _ = feats
    temp = 0.07
    logits = a @ b.T / temp
    want = (
        -np.mean(np_log_softmax(logits, 1)[np.arange(B), np.arange(B)])
        - np.mean(np_log_softmax(logits.T, 1)[np.arange(B), np.arange(B)])
    ) / 2
    got = L.soft_label_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(temp), None)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_caption_contrastive_oracle():
    slots = RS.randn(B, N, E).astype(np.float32)
    text = l2(RS.randn(B, E)).astype(np.float32)
    temp = 0.07
    # oracle: max over slots, diagonal CE both directions
    sim = np.einsum("bne,ce->bc", np.zeros_like(slots[:, :1]), text)
    sim = np.max(np.einsum("bne,ce->bnc", slots, text), axis=1) / temp
    d = np.arange(B)
    want = (
        -np.mean(np_log_softmax(sim, 1)[d, d])
        - np.mean(np_log_softmax(sim.T, 1)[d, d])
    ) / 2
    got = L.caption_contrastive_loss(
        jnp.asarray(slots), jnp.asarray(text), jnp.float32(temp))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_caption_contrastive_blocks_match_per_block_mean():
    """num_blocks=W must equal the mean of the per-block (per-rank local)
    losses — the reference computes this loss without allgather
    (model_retrieval_caption.py:145-152)."""
    slots = RS.randn(B, N, E).astype(np.float32)
    text = l2(RS.randn(B, E)).astype(np.float32)
    temp = jnp.float32(0.07)
    got = float(L.caption_contrastive_loss(
        jnp.asarray(slots), jnp.asarray(text), temp, num_blocks=2))
    half = B // 2
    want = np.mean([
        float(L.caption_contrastive_loss(
            jnp.asarray(slots[i * half:(i + 1) * half]),
            jnp.asarray(text[i * half:(i + 1) * half]), temp))
        for i in range(2)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dstl_oracle(feats):
    img, _, idx = feats
    ts = l2(RS.randn(B, E)).astype(np.float32)
    tt = l2(RS.randn(B, E)).astype(np.float32)
    slots = RS.randn(B, N, E).astype(np.float32)
    alpha = 0.8

    def norm_score(s):
        s = s - s.min()
        return s / s.max()

    logits_tv = tt @ img.T
    logits_sv = norm_score(ts @ img.T)
    logits_sc = norm_score(np.max(np.einsum("bne,ce->bnc", slots, ts), axis=1))
    lab = alpha * logits_sv + (1 - alpha) * logits_sc
    lab = np.exp(np_log_softmax(lab, 1))
    logp = np_log_softmax(logits_tv, 1)
    want = np.sum(lab * (np.log(lab) - logp)) / B

    got = L.dstl_loss(jnp.asarray(img), jnp.asarray(slots), jnp.asarray(ts),
                      jnp.asarray(tt), alpha)
    # the KL is a sum of near-cancelling fp32 terms; 1e-3 relative is the
    # realistic agreement bound between XLA and numpy accumulation orders
    np.testing.assert_allclose(float(got), want, rtol=1e-3)


def test_caption_vision_loss_bilinearity():
    """The model reduces token means before the loss; the oracle computes the
    reference's mean-over-all-token-pairs similarity
    (model_retrieval_caption.py:126-134) — they must agree exactly."""
    cn, vn = 4, 5
    cap_tokens = RS.randn(B, cn, D).astype(np.float32)
    vis_tokens = RS.randn(B, vn, D).astype(np.float32)
    idx = np.array([0, 0, 1, 2, 3, 3, 4, 5])

    capn = l2(cap_tokens)
    visn = l2(vis_tokens)
    # oracle: sim[b_c, b_v] = mean over (c_token, v_token) pairs
    sim = np.einsum("bcd,avd->bcav", capn, visn).mean(axis=(1, 3))
    pos = (idx[:, None] == idx[None, :]).astype(np.float32)
    labels = pos / pos.sum(1, keepdims=True)
    want = -np.mean((np_log_softmax(sim, 1) * labels).sum(1))

    got = L.caption_vision_loss(
        jnp.asarray(capn.mean(1)), jnp.asarray(visn.mean(1)),
        jnp.asarray(idx))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_caption_regularization_oracle():
    slots = RS.randn(B, N, D).astype(np.float32)
    s = l2(slots)
    sim = np.einsum("bnd,bmd->bnm", s, s) - np.eye(N)[None]
    want = sim.mean()
    got = L.caption_regularization(jnp.asarray(slots))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_compute_losses_composition(feats):
    from leccr_tpu.models.leccr import TrainEmbeddings

    img, ts, idx = feats
    tt = l2(RS.randn(B, E)).astype(np.float32)
    emb = TrainEmbeddings(
        image_feat=jnp.asarray(img),
        text_feat_s=jnp.asarray(ts),
        text_feat_t=jnp.asarray(tt),
        slots=jnp.asarray(RS.randn(B, N, E).astype(np.float32)),
        ori_slots=jnp.asarray(RS.randn(B, N, D).astype(np.float32)),
        cv_caption_mean=jnp.asarray(l2(RS.randn(B, D)).astype(np.float32)),
        cv_vision_mean=jnp.asarray(l2(RS.randn(B, D)).astype(np.float32)),
        temp=jnp.float32(0.07),
    )
    out = L.compute_losses(
        emb, jnp.asarray(idx),
        weight_caption_loss=0.01, weight_reg_loss=0.01,
        weight_dstl_loss=0.5, weight_cv_loss=0.01)
    for key, value in out.items():
        assert np.isfinite(float(value)), key
    # composition identities (reference model_retrieval_caption.py:196-199)
    np.testing.assert_allclose(
        float(out["loss_itc_vt"]),
        float(out["raw_itc_vt"]) * 0.5 + float(out["raw_dstl"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(out["loss_itc_vs"]),
        float(out["raw_itc_vs"]) + float(out["raw_cv"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(out["total"]),
        sum(float(out[k]) for k in
            ("loss_itc_vs", "loss_itc_vt", "loss_itc_st", "loss_itc_c",
             "loss_reg_c")), rtol=1e-6)


def test_dstl_blockwise_matches_dense():
    from leccr_tpu.models.losses import dstl_loss, dstl_loss_blockwise

    img = l2(RS.randn(16, E)).astype(np.float32)
    ts = l2(RS.randn(16, E)).astype(np.float32)
    tt = l2(RS.randn(16, E)).astype(np.float32)
    slots = RS.randn(16, N, E).astype(np.float32)
    want = dstl_loss(jnp.asarray(img), jnp.asarray(slots), jnp.asarray(ts),
                     jnp.asarray(tt), 0.8)
    got = dstl_loss_blockwise(jnp.asarray(img), jnp.asarray(slots),
                              jnp.asarray(ts), jnp.asarray(tt), 0.8,
                              block_rows=4)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # gradients (labels detached in both)
    import jax

    g_want = jax.grad(lambda a: dstl_loss(
        a, jnp.asarray(slots), jnp.asarray(ts), jnp.asarray(tt), 0.8))(
        jnp.asarray(img))
    g_got = jax.grad(lambda a: dstl_loss_blockwise(
        a, jnp.asarray(slots), jnp.asarray(ts), jnp.asarray(tt), 0.8, 4))(
        jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-6)


def test_cv_blockwise_matches_dense():
    from leccr_tpu.models.losses import (caption_vision_loss,
                                         caption_vision_loss_blockwise)

    cap = l2(RS.randn(16, D)).astype(np.float32)
    vis = l2(RS.randn(16, D)).astype(np.float32)
    idx = np.arange(16) % 6
    want = caption_vision_loss(jnp.asarray(cap), jnp.asarray(vis),
                               jnp.asarray(idx))
    got = caption_vision_loss_blockwise(jnp.asarray(cap), jnp.asarray(vis),
                                        jnp.asarray(idx), block_rows=4)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
