"""The LECCR multi-level loss suite as pure functions on global batches.

Capability parity with reference models/xvlm.py:260-292 (soft-label InfoNCE)
and models/model_retrieval_caption.py:65-152,196-197 (caption contrastive,
KL distillation, caption-vision matching, slot-diversity regularization).

TPU-first design: the reference wraps every loss in an explicit NCCL
AllGather autograd function (xvlm.py:50-70) to build the global negative
pool.  Here the losses are written for the GLOBAL batch; under `jit` over a
`Mesh` with the batch sharded on the `data` axis, XLA inserts the all-gathers
(and the backward reduce-scatters) automatically — same math, no hand-rolled
collectives.  A ring variant that never materializes the [B,B] logits lives
in leccr_tpu.parallel.ring (for very large negative pools).

`num_blocks` reproduces the reference's per-rank-local losses: the caption
contrastive loss and the video caption-vision loss are computed per device on
the LOCAL batch only (model_retrieval_caption.py:145-152 has no allgather).
With num_blocks = world_size the global batch is split into contiguous blocks
and the loss is the mean of per-block losses — numerically identical to the
reference's average-over-ranks gradient.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

from leccr_tpu.models.leccr import TrainEmbeddings


def _log_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=axis)


def soft_label_contrastive_loss(
    feat_a: jax.Array,
    feat_b: jax.Array,
    temp: jax.Array,
    idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Bidirectional InfoNCE with duplicate-aware soft labels
    (reference models/xvlm.py:260-292).

    feat_a/feat_b: [B, E] L2-normalized; idx: [B] int sample ids — rows with
    equal idx are all positives, with the positive mass split uniformly.
    """
    logits = (feat_a @ feat_b.T) / temp
    bsz = logits.shape[0]
    if idx is None:
        labels = jnp.eye(bsz, dtype=jnp.float32)
    else:
        pos = (idx[:, None] == idx[None, :]).astype(jnp.float32)
        labels = pos / jnp.sum(pos, axis=1, keepdims=True)
    loss_a2b = -jnp.mean(jnp.sum(_log_softmax(logits, 1) * labels, axis=1))
    # the reference reuses the row-normalized label matrix for both
    # directions (xvlm.py:289-290); pos is symmetric so this is consistent.
    loss_b2a = -jnp.mean(jnp.sum(_log_softmax(logits.T, 1) * labels, axis=1))
    return (loss_a2b + loss_b2a) / 2.0


def caption_contrastive_loss(
    slots: jax.Array,
    text_feat: jax.Array,
    temp: jax.Array,
    num_blocks: int = 1,
) -> jax.Array:
    """Max-over-slot caption↔text InfoNCE
    (reference model_retrieval_caption.py:145-152).

    slots: [B, n, E] (NOT normalized — reference doesn't normalize them);
    text_feat: [B, E].  This loss is LOCAL in the reference (no allgather);
    num_blocks splits the global batch into per-device blocks.
    """
    b, n, e = slots.shape
    assert b % num_blocks == 0
    bl = b // num_blocks
    slots_b = slots.reshape(num_blocks, bl, n, e)
    text_b = text_feat.reshape(num_blocks, bl, e)
    # per-block sim: [W, bl(slots), bl(text)] after max over slots
    sim = jnp.einsum("wbne,wce->wbnc", slots_b, text_b)
    logits = jnp.max(sim, axis=2) / temp
    labels = jnp.arange(bl)
    logp_i2t = _log_softmax(logits, axis=2)
    logp_t2i = _log_softmax(jnp.swapaxes(logits, 1, 2), axis=2)
    diag = lambda lp: lp[:, labels, labels]
    loss_i2t = -jnp.mean(diag(logp_i2t))
    loss_t2i = -jnp.mean(diag(logp_t2i))
    return (loss_i2t + loss_t2i) / 2.0


def _norm_score(score: jax.Array) -> jax.Array:
    """Global min-max normalization (reference
    model_retrieval_caption.py:87-90).  Under sharding these reduce to two
    scalar all-reduces."""
    score = score - jnp.min(score)
    return score / jnp.max(score)


def dstl_loss(
    image_feat: jax.Array,
    slots: jax.Array,
    text_feat_s: jax.Array,
    text_feat_t: jax.Array,
    alpha: float = 0.8,
) -> jax.Array:
    """KL soft-label distillation (reference
    model_retrieval_caption.py:94-116): target-language↔image logits are
    pulled toward a detached blend of normalized source↔image and
    source↔caption-slot scores.

    Note the reference blends logits_sv[text, image] with
    logits_sc[image, text] — mixed orientations — and we reproduce that
    exactly (the matrices are square).
    """
    logits_tv = text_feat_t @ image_feat.T
    logits_sv = text_feat_s @ image_feat.T
    # slots: [B, n, E] -> max over n of slot·text_s: [B(image), B(text_s)]
    sim = jnp.einsum("bne,ce->bnc", slots, text_feat_s)
    logits_sc = jnp.max(sim, axis=1)

    labels = alpha * _norm_score(logits_sv) + (1.0 - alpha) * _norm_score(
        logits_sc)
    labels = jax.nn.softmax(labels.astype(jnp.float32), axis=1)
    labels = jax.lax.stop_gradient(labels)

    logp = _log_softmax(logits_tv, axis=1)
    # F.kl_div(log_probs, labels, reduction='batchmean')
    kl = jnp.sum(xlogy(labels, labels) - labels * logp)
    return kl / logits_tv.shape[0]


def caption_vision_loss(
    cv_caption_mean: jax.Array,
    cv_vision_mean: jax.Array,
    idx: jax.Array,
    num_blocks: int = 1,
) -> jax.Array:
    """Token-level caption↔vision matching
    (reference model_retrieval_caption.py:118-143).

    The reference computes mean over all (caption token, visual token) pairs
    of normalized dot products; by bilinearity that equals the dot of the
    per-sample token means, which the model precomputes ([B, Dv] each).
    Soft labels from duplicate idx; softmax WITHOUT temperature.

    The image variant allgathers (global, num_blocks=1); the video variant is
    local (video_model_retrieval_caption.py:144-169, num_blocks=world).
    """
    b, d = cv_caption_mean.shape
    assert b % num_blocks == 0
    bl = b // num_blocks
    cap = cv_caption_mean.reshape(num_blocks, bl, d)
    vis = cv_vision_mean.reshape(num_blocks, bl, d)
    idx_b = idx.reshape(num_blocks, bl)
    sim = jnp.einsum("wcd,wvd->wcv", cap, vis)
    pos = (idx_b[:, :, None] == idx_b[:, None, :]).astype(jnp.float32)
    labels = pos / jnp.sum(pos, axis=2, keepdims=True)
    logp = _log_softmax(sim, axis=2)
    return -jnp.mean(jnp.sum(logp * labels, axis=2))


def dstl_loss_blockwise(
    image_feat: jax.Array,
    slots: jax.Array,
    text_feat_s: jax.Array,
    text_feat_t: jax.Array,
    alpha: float = 0.8,
    block_rows: int = 256,
) -> jax.Array:
    """Streaming dstl: identical math to dstl_loss but never materializes a
    full BxB matrix — rows are processed in blocks of `block_rows`
    ([block, B] working set, O(B·block) memory instead of 3·B²).  Use for
    the 32k-negative scale config.

    Two passes: (1) global min/max of the raw sv/sc scores (the reference's
    norm_score is a global min-max, model_retrieval_caption.py:87-90), then
    (2) per-row-block softmax/KL accumulation.  Both scans are
    rematerialized so autodiff memory stays bounded."""
    b = image_feat.shape[0]
    block_rows = min(block_rows, b)
    assert b % block_rows == 0, (b, block_rows)
    nb = b // block_rows

    tt_blocks = text_feat_t.reshape(nb, block_rows, -1)
    ts_blocks = text_feat_s.reshape(nb, block_rows, -1)
    slots_blocks = slots.reshape(nb, block_rows, *slots.shape[1:])

    def rows(blk):
        ts_b, slots_b = blk
        sv = ts_b @ image_feat.T  # [rb, B] (rows = texts)
        sc = jnp.max(jnp.einsum("bne,ce->bnc", slots_b, text_feat_s),
                     axis=1)  # [rb, B] (rows = images — mixed orientation
        # exactly as the reference, see dstl_loss)
        return sv, sc

    def pass1(carry, blk):
        sv_lo, sv_hi, sc_lo, sc_hi = carry
        sv, sc = rows(blk)
        return (jnp.minimum(sv_lo, jnp.min(sv)),
                jnp.maximum(sv_hi, jnp.max(sv)),
                jnp.minimum(sc_lo, jnp.min(sc)),
                jnp.maximum(sc_hi, jnp.max(sc))), None

    inf = jnp.float32(jnp.inf)
    (sv_lo, sv_hi, sc_lo, sc_hi), _ = jax.lax.scan(
        jax.checkpoint(pass1), (inf, -inf, inf, -inf),
        (ts_blocks, slots_blocks))

    def pass2(carry, blk):
        tt_b, ts_b, slots_b = blk
        sv, sc = rows((ts_b, slots_b))
        # norm_score: (x - min) / max_after_shift = (x - lo) / (hi - lo)
        sv_n = (sv - sv_lo) / jnp.maximum(sv_hi - sv_lo, 1e-12)
        sc_n = (sc - sc_lo) / jnp.maximum(sc_hi - sc_lo, 1e-12)
        labels = jax.nn.softmax(
            (alpha * sv_n + (1.0 - alpha) * sc_n).astype(jnp.float32), axis=1)
        labels = jax.lax.stop_gradient(labels)
        logits_tv = tt_b @ image_feat.T
        logp = _log_softmax(logits_tv, axis=1)
        kl = jnp.sum(xlogy(labels, labels) - labels * logp)
        return carry + kl, None

    total, _ = jax.lax.scan(
        jax.checkpoint(pass2), jnp.float32(0.0),
        (tt_blocks, ts_blocks, slots_blocks))
    return total / b


def caption_vision_loss_blockwise(
    cv_caption_mean: jax.Array,
    cv_vision_mean: jax.Array,
    idx: jax.Array,
    block_rows: int = 256,
) -> jax.Array:
    """Streaming caption_vision_loss (global variant, num_blocks=1):
    row blocks of the [B, B] token-mean similarity matrix."""
    b, d = cv_caption_mean.shape
    block_rows = min(block_rows, b)
    assert b % block_rows == 0
    nb = b // block_rows
    cap_blocks = cv_caption_mean.reshape(nb, block_rows, d)
    idx_blocks = idx.reshape(nb, block_rows)

    def body(carry, blk):
        cap_b, idx_b = blk
        sim = cap_b @ cv_vision_mean.T  # [rb, B]
        pos = (idx_b[:, None] == idx[None, :]).astype(jnp.float32)
        labels = pos / jnp.sum(pos, axis=1, keepdims=True)
        logp = _log_softmax(sim, axis=1)
        return carry - jnp.sum(logp * labels), None

    total, _ = jax.lax.scan(
        jax.checkpoint(body), jnp.float32(0.0), (cap_blocks, idx_blocks))
    return total / b


def caption_regularization(ori_slots: jax.Array) -> jax.Array:
    """Slot-diversity penalty: mean of (cosine-sim matrix − I) over all
    [B, n, n] entries (reference model_retrieval_caption.py:65-73)."""
    norm = jnp.maximum(
        jnp.linalg.norm(ori_slots.astype(jnp.float32), axis=-1, keepdims=True),
        1e-12)
    slots = ori_slots.astype(jnp.float32) / norm
    sim = jnp.einsum("bnd,bmd->bnm", slots, slots)
    n = ori_slots.shape[1]
    sim = sim - jnp.eye(n, dtype=sim.dtype)[None]
    return jnp.mean(sim)


def compute_losses(
    emb: TrainEmbeddings,
    idx: jax.Array,
    *,
    weight_caption_loss: float,
    weight_reg_loss: float,
    weight_dstl_loss: float,
    weight_cv_loss: float,
    dstl_alpha: float = 0.8,
    num_blocks: int = 1,
    cv_loss_local: bool = False,
    itc_loss_fn=None,
    stream_block_rows: int = 0,
) -> Dict[str, jax.Array]:
    """Assemble the 5-loss objective exactly as the reference composes it
    (model_retrieval_caption.py:172-199; trainer sums the 5 returned values,
    image_Retrieval_caption.py:63-64).

    Returns the individual raw losses plus the composed terms and `total`.
    cv_loss_local selects the video semantics (local caption-vision loss).
    itc_loss_fn overrides the InfoNCE implementation — e.g. the ring
    (parallel.ring.ring_infonce) or the fused blockwise kernel
    (ops.infonce.infonce_loss); signature (feat_a, feat_b, temp, idx).
    """
    temp = emb.temp
    itc = itc_loss_fn or soft_label_contrastive_loss
    loss_itc_vs = itc(emb.image_feat, emb.text_feat_s, temp, idx)
    loss_itc_vt = itc(emb.image_feat, emb.text_feat_t, temp, idx)
    loss_itc_st = itc(emb.text_feat_s, emb.text_feat_t, temp, idx)

    loss_itc_sc = caption_contrastive_loss(
        emb.slots, emb.text_feat_s, temp, num_blocks)
    loss_itc_tc = caption_contrastive_loss(
        emb.slots, emb.text_feat_t, temp, num_blocks)
    loss_itc_c = loss_itc_sc + loss_itc_tc

    # zero-weight losses are skipped entirely (dstl otherwise materializes
    # full BxB logit matrices); stream_block_rows > 0 selects the streaming
    # row-block implementations for very large global batches
    if weight_dstl_loss != 0.0:
        if stream_block_rows > 0:
            loss_dstl = dstl_loss_blockwise(
                emb.image_feat, emb.slots, emb.text_feat_s, emb.text_feat_t,
                dstl_alpha, stream_block_rows) * weight_dstl_loss
        else:
            loss_dstl = dstl_loss(
                emb.image_feat, emb.slots, emb.text_feat_s, emb.text_feat_t,
                dstl_alpha) * weight_dstl_loss
    else:
        loss_dstl = jnp.float32(0.0)

    if weight_cv_loss != 0.0:
        if stream_block_rows > 0 and not cv_loss_local:
            loss_cv = caption_vision_loss_blockwise(
                emb.cv_caption_mean, emb.cv_vision_mean, idx,
                stream_block_rows) * weight_cv_loss
        else:
            loss_cv = caption_vision_loss(
                emb.cv_caption_mean, emb.cv_vision_mean, idx,
                num_blocks if cv_loss_local else 1) * weight_cv_loss
    else:
        loss_cv = jnp.float32(0.0)
    loss_reg = caption_regularization(emb.ori_slots)

    term_vs = loss_itc_vs + loss_cv
    term_vt = loss_itc_vt * (1.0 - weight_dstl_loss) + loss_dstl
    term_st = loss_itc_st
    term_c = loss_itc_c * weight_caption_loss
    term_reg = loss_reg * weight_reg_loss
    total = term_vs + term_vt + term_st + term_c + term_reg

    return {
        "loss_itc_vs": term_vs,
        "loss_itc_vt": term_vt,
        "loss_itc_st": term_st,
        "loss_itc_c": term_c,
        "loss_reg_c": term_reg,
        "raw_itc_vs": loss_itc_vs,
        "raw_itc_vt": loss_itc_vt,
        "raw_dstl": loss_dstl,
        "raw_cv": loss_cv,
        "total": total,
    }
