"""Fused cross-attention Pallas kernel for the caption-interaction branch.

BASELINE.json: "the MLLM-caption branch (soft-prompt cross-attention that
injects description features into the multilingual text encoder) becomes a
fused attention block".  The shapes are small and fixed — query slots
(num_queries ≤ 8) or visual tokens (≤ 145) attending over caption tokens
(≤ 200) at vision_width 512 / 8 heads — so one (batch, head) program holds
the whole q/k/v tile in VMEM and fuses QKᵀ → mask → softmax → PV with a
single HBM round-trip, instead of XLA's 3 separate HLOs with [B,H,Lq,Lk]
probability tensors hitting HBM between them.

Forward-only by design: it serves the no-grad eval/serving path (the
benchmark-critical `embed_images`); training uses the autodiff-friendly XLA
attention (ops/attention.py).  A custom_vjp raises if differentiated.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    # one program per batch item; all heads computed together so the MXU
    # sees [H·Lq, Dh] x [Dh, Lk]-scale contractions instead of 8 slivers
    q = q_ref[0].astype(jnp.float32)  # [H, Lq, Dh]
    k = k_ref[0].astype(jnp.float32)  # [H, Lk, Dh]
    v = v_ref[0].astype(jnp.float32)  # [H, Lk, Dh]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, Lq, Lk]
    scores = scores * (1.0 / (q.shape[-1] ** 0.5))
    pad = mask_ref[0] != 0  # [1, Lk] int32, nonzero = padding
    scores = jnp.where(pad[0][None, None, :], jnp.finfo(jnp.float32).min,
                       scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out_ref[0] = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_cross_attention(q, k, v, padding_mask, interpret=False):
    """softmax((q kᵀ)/√d + mask) v, one fused kernel per (batch, head).

    q: [B, H, Lq, Dh]; k, v: [B, H, Lk, Dh];
    padding_mask: [B, Lk] (nonzero/True = padding) or None.
    """
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    if padding_mask is None:
        padding_mask = jnp.zeros((b, lk), jnp.int32)
    padding_mask = padding_mask.astype(jnp.int32)

    return pl.pallas_call(
        _attn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, lq, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, lq, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, padding_mask[:, None, :])


def _fca_fwd(q, k, v, padding_mask, interpret):
    return fused_cross_attention(q, k, v, padding_mask, interpret), None


def _fca_bwd(interpret, res, g):
    raise NotImplementedError(
        "fused_cross_attention is eval/serving-only; training uses the "
        "autodiff XLA attention (leccr_tpu.ops.attention)")


fused_cross_attention.defvjp(_fca_fwd, _fca_bwd)
