"""Retrieval evaluation: sim-matrix ranking + Recall@K, TPU-first.

Capability parity with the reference evaluator
(image_Retrieval_caption.py:83-163 `evaluation_coarse`, :261-317 `itm_eval`;
video double-sim variant video_Retrieval_caption_double_sim.py:87-190) with a
very different execution plan:

The reference materializes the full N_img x N_txt score matrix on device,
copies it to host, and `np.argsort`s every row (O(N² log N) on one CPU core).
Here ranks are computed ON DEVICE in streaming passes over row blocks:

    rank(row, gt) = #{j : s_j > s_gt} + #{j : s_j == s_gt and j > gt}

which reproduces `np.argsort(score, kind='stable')[::-1]` ordering exactly:
equal scores rank in descending index order (SURVEY.md §7 "Eval ranking
ties").  Note the reference's np.argsort default is introsort, whose tie
order is arbitrary — ties there are non-deterministic by fractions of an R@K
point; this implementation pins the stable ordering as the spec.

Exactness note: ground-truth scores are GATHERED from the same block matmuls
used for the comparisons (pass 1), never recomputed from the embeddings —
a separately computed dot product can differ in the last ulp and silently
demote an exact-tie self-match.  Pass 2 streams the same blocks again and
counts.  Nothing but O(N) rank/gt vectors ever leaves the device, and the
N x N matrix is never materialized.

Double-sim fusion (video): final = a*norm(v·t) + (1-a)*norm(max_slot c·t)
with norm(S) = (S - max S)/(max S - min S) (an increasing linear rewrite of
the reference's double-negated normalization, video_…py:87-91).  Both fused
variants are linear in the raw scores, so pass 1 collects raw gt values and
min/max, and the same affine map is applied to blocks and gt alike.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def score_matrix(img_embeds: jax.Array, txt_embeds: jax.Array) -> jax.Array:
    """Dense [N_img, N_txt] cosine score matrix (embeddings are already
    L2-normalized). Reference image_Retrieval_caption.py:151."""
    return img_embeds @ txt_embeds.T


@functools.partial(
    jax.jit, static_argnames=("n_img", "block", "fusion", "alpha"))
def _ranks_impl(
    img_embeds: jax.Array,
    txt_embeds: jax.Array,
    txt2img: jax.Array,
    img2txt: jax.Array,
    slots: jax.Array | None,
    *,
    n_img: int,
    block: int,
    fusion: str,
    alpha: float,
):
    # All padding happens in-graph: over a remote transport every eager op
    # outside jit is its own dispatch round trip, and at MSCOCO scale the
    # whole ranker's device time (~1.3 ms) is smaller than ONE round trip.
    img_embeds = jnp.asarray(img_embeds, jnp.float32)
    txt_embeds = jnp.asarray(txt_embeds, jnp.float32)
    pad = (-n_img) % block
    if pad:
        img_embeds = jnp.pad(img_embeds, ((0, pad), (0, 0)))
        img2txt = jnp.pad(img2txt, ((0, pad), (0, 0)), constant_values=-1)
        if slots is not None:
            slots = jnp.pad(slots, ((0, pad), (0, 0), (0, 0)))
    n_img_pad, e = img_embeds.shape
    n_txt = txt_embeds.shape[0]
    n_gt = img2txt.shape[1]
    n_blocks = n_img_pad // block
    img_b = img_embeds.reshape(n_blocks, block, e)
    if slots is not None:
        slots = jnp.asarray(slots, jnp.float32)
        slots_b = slots.reshape(n_blocks, block, *slots.shape[1:])
    else:
        assert fusion == "none"
        slots_b = jnp.zeros((n_blocks, block, 0, e), jnp.float32)
    row0s = jnp.arange(n_blocks) * block
    txt_ids = jnp.arange(n_txt)
    gt_valid = img2txt >= 0
    gt_txt_idx = jnp.maximum(img2txt, 0)
    n_valid = jnp.int32(n_img)

    def raw_scores(img_chunk, slot_chunk):
        s = img_chunk @ txt_embeds.T  # [blk, n_txt]
        if fusion == "none":
            return s, s  # c unused
        c = jnp.max(jnp.einsum("ine,te->int", slot_chunk, txt_embeds), axis=1)
        return s, c

    # ---- pass 1: min/max (minmax fusion) + exact gt gathers ------------
    def pass1(carry, chunk):
        s_lo, s_hi, c_lo, c_hi, gts_t2i, gtc_t2i, gts_i2t, gtc_i2t = carry
        img_chunk, slot_chunk, row0 = chunk
        rows = row0 + jnp.arange(block)
        valid = rows < n_valid
        s, c = raw_scores(img_chunk, slot_chunk)

        big, small = jnp.float32(jnp.inf), jnp.float32(-jnp.inf)
        s_masked_lo = jnp.where(valid[:, None], s, big)
        s_masked_hi = jnp.where(valid[:, None], s, small)
        s_lo = jnp.minimum(s_lo, jnp.min(s_masked_lo))
        s_hi = jnp.maximum(s_hi, jnp.max(s_masked_hi))
        if fusion != "none":
            c_lo = jnp.minimum(
                c_lo, jnp.min(jnp.where(valid[:, None], c, big)))
            c_hi = jnp.maximum(
                c_hi, jnp.max(jnp.where(valid[:, None], c, small)))

        # t2i gt: entry (txt2img[t], t) if that image row is in this block
        hit = (rows[:, None] == txt2img[None, :]) & valid[:, None]
        gts_t2i = gts_t2i + jnp.sum(jnp.where(hit, s, 0.0), axis=0)
        if fusion != "none":
            gtc_t2i = gtc_t2i + jnp.sum(jnp.where(hit, c, 0.0), axis=0)

        # i2t gt: per image row, its gt texts' entries
        gidx = jax.lax.dynamic_slice_in_dim(gt_txt_idx, row0, block, axis=0)
        g_s = jnp.take_along_axis(s, gidx, axis=1)  # [blk, n_gt]
        gts_i2t = jax.lax.dynamic_update_slice_in_dim(
            gts_i2t, g_s, row0, axis=0)
        if fusion != "none":
            g_c = jnp.take_along_axis(c, gidx, axis=1)
            gtc_i2t = jax.lax.dynamic_update_slice_in_dim(
                gtc_i2t, g_c, row0, axis=0)
        return (s_lo, s_hi, c_lo, c_hi, gts_t2i, gtc_t2i, gts_i2t,
                gtc_i2t), None

    inf = jnp.float32(jnp.inf)
    init1 = (inf, -inf, inf, -inf,
             jnp.zeros((n_txt,), jnp.float32),
             jnp.zeros((n_txt,), jnp.float32),
             jnp.zeros((n_img_pad, n_gt), jnp.float32),
             jnp.zeros((n_img_pad, n_gt), jnp.float32))
    (s_lo, s_hi, c_lo, c_hi, gts_t2i, gtc_t2i, gts_i2t, gtc_i2t), _ = (
        jax.lax.scan(pass1, init1, (img_b, slots_b, row0s)))

    # affine fusion map: fused = a0*s + (1-α-part) ... all linear in (s, c)
    if fusion == "minmax":
        sa = 1.0 / jnp.maximum(s_hi - s_lo, 1e-12)
        ca = 1.0 / jnp.maximum(c_hi - c_lo, 1e-12)
        a0, a1 = alpha * sa, alpha * (-s_hi * sa)
        b0, b1 = (1.0 - alpha) * ca, (1.0 - alpha) * (-c_hi * ca)
    elif fusion == "raw":
        a0, a1 = jnp.float32(alpha), jnp.float32(0.0)
        b0, b1 = jnp.float32(1.0 - alpha), jnp.float32(0.0)
    else:
        a0, a1 = jnp.float32(1.0), jnp.float32(0.0)
        b0, b1 = jnp.float32(0.0), jnp.float32(0.0)

    def fuse(s, c):
        out = s * a0 + a1
        if fusion != "none":
            out = out + c * b0 + b1
        return out

    gt_t2i = fuse(gts_t2i, gtc_t2i)  # [n_txt]
    gt_i2t = fuse(gts_i2t, gtc_i2t)  # [n_img_pad, n_gt]

    # i2t rank = min over gt captions of that caption's rank.  The minimum
    # is achieved by the best-scoring gt, tie-broken by the LARGEST text
    # index: rank_k = #{s_j > g_k} + #{s_j == g_k, j > gidx_k}, and because
    # g_k is itself the row's entry at column gidx_k (gathered from the same
    # block matmul), any k with g_k < g_max ranks at least one worse (the
    # g_max column itself counts), and among k with g_k == g_max the tie
    # term shrinks as gidx_k grows.  So pass 2 compares each row against ONE
    # (score, index) pair instead of n_gt of them — the [blk, n_gt, n_txt]
    # comparison tensor (5x the work at MSCOCO's 5 gt/image) disappears.
    gt_i2t_masked = jnp.where(gt_valid, gt_i2t, -jnp.inf)
    g_best = jnp.max(gt_i2t_masked, axis=1)  # [n_img_pad]
    best_mask = gt_valid & (gt_i2t_masked == g_best[:, None])
    gidx_best = jnp.max(
        jnp.where(best_mask, gt_txt_idx, -1), axis=1)  # [n_img_pad]

    # ---- pass 2: streaming rank counts ---------------------------------
    def pass2(carry, chunk):
        t2i_cnt, i2t_ranks_acc = carry
        img_chunk, slot_chunk, row0 = chunk
        rows = row0 + jnp.arange(block)
        valid = rows < n_valid
        s_raw, c_raw = raw_scores(img_chunk, slot_chunk)
        s = fuse(s_raw, c_raw)

        greater = s > gt_t2i[None, :]
        ties = (s == gt_t2i[None, :]) & (rows[:, None] > txt2img[None, :])
        t2i_cnt = t2i_cnt + jnp.sum(
            (greater | ties) & valid[:, None], axis=0)

        g = jax.lax.dynamic_slice_in_dim(g_best, row0, block, axis=0)
        gidx = jax.lax.dynamic_slice_in_dim(gidx_best, row0, block, axis=0)
        greater_i = s > g[:, None]  # [blk, n_txt]
        ties_i = (s == g[:, None]) & (txt_ids[None, :] > gidx[:, None])
        ranks = jnp.sum(greater_i | ties_i, axis=-1).astype(jnp.int32)
        i2t_ranks_acc = jax.lax.dynamic_update_slice_in_dim(
            i2t_ranks_acc, ranks, row0, axis=0)
        return (t2i_cnt, i2t_ranks_acc), None

    init2 = (jnp.zeros((n_txt,), jnp.int32),
             jnp.zeros((n_img_pad,), jnp.int32))
    (t2i_ranks, i2t_ranks), _ = jax.lax.scan(
        pass2, init2, (img_b, slots_b, row0s))
    return i2t_ranks[:n_img], t2i_ranks


def retrieval_ranks(
    img_embeds,
    txt_embeds,
    txt2img: Dict[int, int] | np.ndarray,
    img2txt: Dict[int, List[int]] | np.ndarray,
    slots=None,
    fusion: str = "none",
    alpha: float = 0.9,
    block: int = 256,
    as_numpy: bool = True,
):
    """Compute (i2t_ranks [N_img], t2i_ranks [N_txt]) on device.

    as_numpy=False skips the host fetch and returns device arrays — the
    whole call is then ONE async jit dispatch (device time ~1.3 ms at
    MSCOCO scale), letting callers pipeline rank computations or defer the
    O(N) fetch.

    txt2img/img2txt accept the reference's dict-of-lists ground-truth maps
    (retrieval_dataset.py:208-226) or pre-padded arrays (img2txt padded with
    -1).  fusion: "none" | "raw" (image alpha-blend, image_…py:244-246) |
    "minmax" (video double-sim, video_…py:169-179)."""
    n_img = img_embeds.shape[0]

    if isinstance(txt2img, dict):
        txt2img = np.asarray([txt2img[t] for t in range(len(txt2img))])
    if not isinstance(txt2img, jax.Array):
        txt2img = np.asarray(txt2img, np.int32)

    if isinstance(img2txt, dict):
        n_gt = max(len(v) for v in img2txt.values())
        arr = np.full((n_img, n_gt), -1, np.int32)
        for i, txts in img2txt.items():
            arr[i, : len(txts)] = txts
        img2txt = arr
    if not isinstance(img2txt, jax.Array):
        img2txt = np.asarray(img2txt, np.int32)

    if slots is None:
        assert fusion == "none"

    i2t_ranks, t2i_ranks = _ranks_impl(
        img_embeds, txt_embeds, txt2img, img2txt, slots,
        n_img=n_img, block=min(block, n_img), fusion=fusion,
        alpha=float(alpha))
    if not as_numpy:
        return i2t_ranks, t2i_ranks
    return _fetch(i2t_ranks), _fetch(t2i_ranks)


def _fetch(x: jax.Array) -> np.ndarray:
    """Host fetch that works under multi-process: rank vectors computed from
    sharded embeddings may come back sharded across non-addressable devices,
    so replicate first (every process needs the full vectors — the metrics
    gate the collective best-checkpoint save in the trainer)."""
    if jax.process_count() > 1 and not x.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(x.sharding.mesh, PartitionSpec())
        x = jax.jit(lambda a: a, out_shardings=rep)(x)
    return np.asarray(x)


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
