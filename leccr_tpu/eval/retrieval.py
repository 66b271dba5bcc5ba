"""Retrieval evaluation: sim-matrix ranking + Recall@K, TPU-first.

Capability parity with the reference evaluator
(image_Retrieval_caption.py:83-163 `evaluation_coarse`, :261-317 `itm_eval`;
video double-sim variant video_Retrieval_caption_double_sim.py:87-190) with a
very different execution plan:

The reference materializes the full N_img x N_txt score matrix on device,
copies it to host, and `np.argsort`s every row (O(N² log N) on one CPU core).
Here ranks are computed ON DEVICE in a single streaming pass:

    rank(row, gt) = #\{j : s_j > s_gt\} + #\{j : s_j == s_gt and j > gt\}

which reproduces `np.argsort(score)[::-1]` ordering exactly, including its
tie behavior (descending stable sort puts equal scores in *descending* index
order — SURVEY.md §7 "Eval ranking ties").  Ground-truth scores come straight
from the embeddings, so the N x N matrix is only ever held one block at a
time; nothing but the final rank vectors leaves the device.

Double-sim fusion (video): final = a*norm(v·t) + (1-a)*norm(max_slot c·t)
with norm(S) = (S - max S)/(max S - min S) (reference video_…py:87-91) —
per-matrix global min/max are computed in the same streaming pass (pass 1)
before the rank pass (pass 2).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def score_matrix(img_embeds: jax.Array, txt_embeds: jax.Array) -> jax.Array:
    """Dense [N_img, N_txt] cosine score matrix (embeddings are already
    L2-normalized). Reference image_Retrieval_caption.py:151."""
    return img_embeds @ txt_embeds.T


def _slot_scores(slots: jax.Array, txt_embeds: jax.Array) -> jax.Array:
    """Max-over-query-slot caption scores: [N_img, N_txt]
    (reference video_…py:173-176)."""
    return jnp.max(jnp.einsum("ine,te->int", slots, txt_embeds), axis=1)


def _minmax_norm_params(lo: jax.Array, hi: jax.Array):
    """Increasing linear form of the reference's double-negated min-max
    normalization (video_…py:87-91): norm(S) = (S - hi) / (hi - lo)."""
    scale = 1.0 / jnp.maximum(hi - lo, 1e-12)
    return scale, -hi * scale


@functools.partial(jax.jit, static_argnames=("block", "fusion", "alpha"))
def _ranks_impl(
    img_embeds: jax.Array,
    txt_embeds: jax.Array,
    txt2img: jax.Array,
    img2txt: jax.Array,
    slots: Optional[jax.Array],
    *,
    block: int,
    fusion: str,
    alpha: float,
):
    n_img, e = img_embeds.shape
    n_txt = txt_embeds.shape[0]
    n_gt = img2txt.shape[1]

    def fused_block(img_chunk, slot_chunk, a0, a1, b0, b1):
        s = img_chunk @ txt_embeds.T
        if fusion == "none":
            return s
        c = _slot_scores(slot_chunk, txt_embeds)
        if fusion == "raw":  # image_…py:244-246 (alpha * S + (1-alpha) * C)
            return alpha * s + (1.0 - alpha) * c
        return alpha * (s * a0 + a1) + (1.0 - alpha) * (c * b0 + b1)

    # ---- pass 1: global min/max for minmax fusion --------------------
    if fusion == "minmax":
        def mm_body(carry, chunk):
            (s_lo, s_hi, c_lo, c_hi) = carry
            img_chunk, slot_chunk = chunk
            s = img_chunk @ txt_embeds.T
            c = _slot_scores(slot_chunk, txt_embeds)
            return (jnp.minimum(s_lo, jnp.min(s)),
                    jnp.maximum(s_hi, jnp.max(s)),
                    jnp.minimum(c_lo, jnp.min(c)),
                    jnp.maximum(c_hi, jnp.max(c))), None

        n_blocks = n_img // block
        img_b = img_embeds.reshape(n_blocks, block, e)
        slots_b = slots.reshape(n_blocks, block, *slots.shape[1:])
        inf = jnp.float32(jnp.inf)
        (s_lo, s_hi, c_lo, c_hi), _ = jax.lax.scan(
            mm_body, (inf, -inf, inf, -inf), (img_b, slots_b))
        a0, a1 = _minmax_norm_params(s_lo, s_hi)
        b0, b1 = _minmax_norm_params(c_lo, c_hi)
    else:
        a0 = a1 = b0 = b1 = jnp.float32(0.0)

    # ---- ground-truth scores straight from embeddings ----------------
    # t2i: per text t, score of its gt image (txt2img[t]).
    gt_img = img_embeds[txt2img]  # [n_txt, e]
    gt_t2i = jnp.sum(gt_img * txt_embeds, axis=-1)
    if fusion != "none":
        gt_slots = slots[txt2img]  # [n_txt, n_q, e]
        gt_c = jnp.max(jnp.einsum("tne,te->tn", gt_slots, txt_embeds), axis=1)
        if fusion == "raw":
            gt_t2i = alpha * gt_t2i + (1.0 - alpha) * gt_c
        else:
            gt_t2i = alpha * (gt_t2i * a0 + a1) + (1.0 - alpha) * (
                gt_c * b0 + b1)

    # i2t: per image i and gt slot k, score of text img2txt[i, k] (pad = -1).
    gt_valid = img2txt >= 0
    gt_txt_idx = jnp.maximum(img2txt, 0)
    gt_txt = txt_embeds[gt_txt_idx]  # [n_img, n_gt, e]
    gt_i2t = jnp.einsum("ie,ike->ik", img_embeds, gt_txt)
    if fusion != "none":
        gt_ci = jnp.max(jnp.einsum("ine,ike->ink", slots, gt_txt), axis=1)
        if fusion == "raw":
            gt_i2t = alpha * gt_i2t + (1.0 - alpha) * gt_ci
        else:
            gt_i2t = alpha * (gt_i2t * a0 + a1) + (1.0 - alpha) * (
                gt_ci * b0 + b1)

    # ---- pass 2: streaming rank counts --------------------------------
    txt_ids = jnp.arange(n_txt)

    def rank_body(carry, chunk):
        t2i_cnt, i2t_ranks_acc = carry
        img_chunk, slot_chunk, row0 = chunk
        s = fused_block(img_chunk, slot_chunk, a0, a1, b0, b1)  # [blk, n_txt]
        rows = row0 + jnp.arange(block)  # image indices of this chunk

        # t2i: text t competes against every image row j.
        greater = (s > gt_t2i[None, :])
        ties = (s == gt_t2i[None, :]) & (rows[:, None] > txt2img[None, :])
        t2i_cnt = t2i_cnt + jnp.sum(greater | ties, axis=0)

        # i2t: image rows in this chunk, rank per gt text then min.
        # s: [blk, n_txt]; gt_i2t rows for these images: [blk, n_gt]
        g = jax.lax.dynamic_slice_in_dim(gt_i2t, row0, block, axis=0)
        gidx = jax.lax.dynamic_slice_in_dim(gt_txt_idx, row0, block, axis=0)
        gvalid = jax.lax.dynamic_slice_in_dim(gt_valid, row0, block, axis=0)
        greater_i = (s[:, None, :] > g[:, :, None])  # [blk, n_gt, n_txt]
        ties_i = (s[:, None, :] == g[:, :, None]) & (
            txt_ids[None, None, :] > gidx[:, :, None])
        ranks_k = jnp.sum(greater_i | ties_i, axis=-1)  # [blk, n_gt]
        ranks_k = jnp.where(gvalid, ranks_k, n_txt + 1)
        i2t_ranks = jnp.min(ranks_k, axis=-1)
        i2t_ranks_acc = jax.lax.dynamic_update_slice_in_dim(
            i2t_ranks_acc, i2t_ranks, row0, axis=0)
        return (t2i_cnt, i2t_ranks_acc), None

    n_blocks = n_img // block
    img_b = img_embeds.reshape(n_blocks, block, e)
    if slots is None:
        slots_b = jnp.zeros((n_blocks, block, 1, e), img_embeds.dtype)
    else:
        slots_b = slots.reshape(n_blocks, block, *slots.shape[1:])
    row0s = jnp.arange(n_blocks) * block
    init = (jnp.zeros((n_txt,), jnp.int32), jnp.zeros((n_img,), jnp.int32))
    (t2i_ranks, i2t_ranks), _ = jax.lax.scan(
        rank_body, init, (img_b, slots_b, row0s))
    return i2t_ranks, t2i_ranks


def retrieval_ranks(
    img_embeds,
    txt_embeds,
    txt2img: Dict[int, int] | np.ndarray,
    img2txt: Dict[int, List[int]] | np.ndarray,
    slots=None,
    fusion: str = "none",
    alpha: float = 0.9,
    block: int = 256,
):
    """Compute (i2t_ranks [N_img], t2i_ranks [N_txt]) on device.

    txt2img/img2txt accept the reference's dict-of-lists ground-truth maps
    (retrieval_dataset.py:208-226) or pre-padded arrays.
    fusion: "none" | "raw" (image alpha-blend, image_…py:244-246) |
    "minmax" (video double-sim, video_…py:169-179).
    """
    img_embeds = jnp.asarray(img_embeds, jnp.float32)
    txt_embeds = jnp.asarray(txt_embeds, jnp.float32)
    n_img = img_embeds.shape[0]

    if isinstance(txt2img, dict):
        txt2img = np.asarray([txt2img[t] for t in range(len(txt2img))])
    txt2img = jnp.asarray(txt2img, jnp.int32)

    if isinstance(img2txt, dict):
        n_gt = max(len(v) for v in img2txt.values())
        arr = np.full((n_img, n_gt), -1, np.int32)
        for i, txts in img2txt.items():
            arr[i, : len(txts)] = txts
        img2txt = arr
    img2txt = jnp.asarray(img2txt, jnp.int32)

    block = min(block, n_img)
    # pad images to a multiple of the block size with -inf-like rows that
    # can never outrank anything (zero embeddings score 0 > some gt? no:
    # we instead pad and mark their t2i contributions via row index >= n_img)
    pad = (-n_img) % block
    if pad:
        img_embeds = jnp.concatenate(
            [img_embeds, jnp.full((pad, img_embeds.shape[1]), -1e30,
                                  jnp.float32)], axis=0)
        if slots is not None:
            slots = jnp.concatenate(
                [jnp.asarray(slots, jnp.float32),
                 jnp.full((pad, *np.shape(slots)[1:]), -1e30, jnp.float32)],
                axis=0)
        img2txt = jnp.concatenate(
            [img2txt, jnp.full((pad, img2txt.shape[1]), -1, jnp.int32)],
            axis=0)
    if slots is not None:
        slots = jnp.asarray(slots, jnp.float32)

    i2t_ranks, t2i_ranks = _ranks_impl(
        img_embeds, txt_embeds, txt2img, img2txt, slots,
        block=block, fusion=fusion, alpha=float(alpha))
    return np.asarray(i2t_ranks[:n_img]), np.asarray(t2i_ranks)


def itm_metrics_from_ranks(
    i2t_ranks: np.ndarray, t2i_ranks: np.ndarray
) -> Dict[str, float]:
    """R@1/5/10 + means + sumR from 0-based rank vectors
    (reference itm_eval, image_Retrieval_caption.py:261-317)."""
    def recalls(ranks):
        ranks = np.asarray(ranks)
        return tuple(100.0 * np.mean(ranks < k) for k in (1, 5, 10))

    tr1, tr5, tr10 = recalls(i2t_ranks)
    ir1, ir5, ir10 = recalls(t2i_ranks)
    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    txt_sumr = tr1 + tr5 + tr10
    img_sumr = ir1 + ir5 + ir10
    return {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
        "txt_r_mean": tr_mean, "txt_sum_r": txt_sumr,
        "img_r1": ir1, "img_r5": ir5, "img_r10": ir10,
        "img_r_mean": ir_mean,
        "r_mean": (tr_mean + ir_mean) / 2,
        "img_sumr": img_sumr,
        "sumr_avg": float(np.round((txt_sumr + img_sumr) / 6, 2)),
        "sumr_sum": txt_sumr + img_sumr,
    }


def retrieval_metrics(
    img_embeds,
    txt_embeds,
    txt2img,
    img2txt,
    slots=None,
    fusion: str = "none",
    alpha: float = 0.9,
    block: int = 256,
) -> Dict[str, float]:
    """End-to-end: embeddings -> itm_eval metric dict."""
    i2t, t2i = retrieval_ranks(
        img_embeds, txt_embeds, txt2img, img2txt, slots, fusion, alpha, block)
    return itm_metrics_from_ranks(i2t, t2i)
