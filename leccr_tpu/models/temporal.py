"""Video temporal tower: self-attention over precomputed per-frame features.

Capability parity with reference models/video_model_retrieval_caption.py:27-34
— a `SelfAttention(d_model=vision_width, nhead=8, num_layers=vision_layer)`
stack applied to padded frame-feature sequences with a key padding mask.
MSR-VTT ships 4096-d frame CNN features (SURVEY.md §2 #11/#19).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from leccr_tpu.ops.attention import SelfAttentionStack


class TemporalTower(nn.Module):
    """Frame-feature encoder.

    __call__(frames [B, T, D], frame_mask [B, T] bool True=VALID) ->
    [B, T, D] contextualized frame features.  Note the reference flips the
    valid-mask into a padding mask before attention
    (video_model_retrieval_caption.py:30-34); we take the valid mask and flip
    internally.
    """

    d_model: int
    num_heads: int = 8
    num_layers: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,
        frame_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        padding_mask = None if frame_mask is None else ~frame_mask.astype(bool)
        return SelfAttentionStack(
            self.d_model, self.num_heads, self.num_layers, self.dropout,
            self.dtype, name="encoder")(
            frames.astype(self.dtype), padding_mask, deterministic)


def masked_mean_pool(embeds: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean over the sequence axis (reference
    models/xvlm_video.py:268-271)."""
    mask = mask.astype(embeds.dtype)[..., None]
    return jnp.sum(embeds * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-6)
