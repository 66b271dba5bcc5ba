"""Attention blocks for the LECCR caption-interaction branch.

Capability parity with reference models/attention.py:24-128 — multi-layer
cross/self attention stacks with a post-LN residual block and a d→d GELU FFN.
The reference uses torch's seq-first nn.MultiheadAttention; here everything is
batch-first [B, L, D], pure-functional flax, and jit/shard_map friendly.

Note the (unusual) residual pattern of the reference block
(models/attention.py:47-54): the attention output feeds the FFN directly and
the residual connects the *block input* to the FFN output:

    out = LayerNorm(x + Dropout(FFN(MHA(x, memory))))

We reproduce that exactly — retrieval numbers depend on it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from leccr_tpu.ops.dropout import LeanDropout  # noqa: E402


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched multi-head attention core.

    q: [B, H, Lq, Dh]; k, v: [B, H, Lk, Dh].
    key_padding_mask: [B, Lk] bool, True = position is PADDING (masked out),
    matching torch MultiheadAttention semantics.
    """
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(depth).astype(q.dtype)
    if key_padding_mask is not None:
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with separate q/k/v/out projections.

    Functionally equivalent to torch nn.MultiheadAttention (packed in_proj is
    just the concatenation of these three kernels); see
    leccr_tpu.models.convert for the weight mapping.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        fused: bool = False,
    ) -> jax.Array:
        assert self.d_model % self.num_heads == 0
        head_dim = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if fused and deterministic:
            # no-grad eval/serving path: single fused Pallas kernel
            from leccr_tpu.ops.pallas_attention import fused_cross_attention

            out = fused_cross_attention(
                split(q), split(k), split(v), key_padding_mask)
        else:
            rng = None
            if self.dropout > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
            out = dot_product_attention(
                split(q), split(k), split(v),
                key_padding_mask=key_padding_mask,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                dropout_rng=rng,
            )
        b, _, lq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.d_model)
        return dense("out_proj")(out)


class _FFN(nn.Module):
    """d→d GELU feed-forward (reference models/attention.py:28-30,52)."""

    d_model: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.d_model, dtype=self.dtype, name="linear1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LeanDropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)


class CrossAttentionBlock(nn.Module):
    """One LECCR cross-attention layer (reference CrossAttentionLayer)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        memory_key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        fused: bool = False,
    ) -> jax.Array:
        attn_out = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, self.dtype,
            name="attn")(
            tgt, memory, memory,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic,
            fused=fused,
        )
        ffn_out = _FFN(self.d_model, self.dropout, self.dtype, name="ffn")(
            attn_out, deterministic=deterministic)
        ffn_out = LeanDropout(self.dropout)(ffn_out, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt + ffn_out)


class CrossAttentionStack(nn.Module):
    """N cross-attention layers (reference CrossAttention :61-83)."""

    d_model: int
    num_heads: int
    num_layers: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        memory_key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        fused: bool = False,
    ) -> jax.Array:
        out = tgt
        for i in range(self.num_layers):
            out = CrossAttentionBlock(
                self.d_model, self.num_heads, self.dropout, self.dtype,
                name=f"layer_{i}")(
                out, memory, memory_key_padding_mask, deterministic, fused)
        return out


class SelfAttentionBlock(nn.Module):
    """One LECCR self-attention layer (reference SelfAttentionLayer :87-114).

    Same residual pattern as the cross block, q=k=v=src; the key padding mask
    masks src positions (used by the video temporal encoder over padded
    frame sequences)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn_out = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, self.dtype,
            name="attn")(
            src, src, src,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic,
        )
        ffn_out = _FFN(self.d_model, self.dropout, self.dtype, name="ffn")(
            attn_out, deterministic=deterministic)
        ffn_out = LeanDropout(self.dropout)(ffn_out, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(src + ffn_out)


class SelfAttentionStack(nn.Module):
    """N self-attention layers (reference SelfAttention :116-128)."""

    d_model: int
    num_heads: int
    num_layers: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        out = src
        for i in range(self.num_layers):
            out = SelfAttentionBlock(
                self.d_model, self.num_heads, self.dropout, self.dtype,
                name=f"layer_{i}")(out, key_padding_mask, deterministic)
        return out
