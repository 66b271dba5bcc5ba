"""OpenAI-CLIP-architecture towers in flax.

Capability parity with the reference's vendored CLIP
(reference clip/model.py:161-365): pre-LN residual transformer with QuickGELU
MLPs, ViT patch embedding with a class token, and the LECCR-patched
`encode_image`/`encode_text` that return the FULL projected hidden state
(clip/model.py:340-365) — LECCR consumes per-token features, not just the
pooled embedding.  Position-embedding interpolation for non-224 resolutions
mirrors clip/model.py:456-481 (bicubic over the patch grid).

TPU notes: everything is batch-first, static-shape, and runs in a configurable
compute dtype (bf16 on TPU keeps the MXU fed; LayerNorm/softmax accumulate in
fp32).  Weight import from OpenAI/HF checkpoints lives in
leccr_tpu.models.convert.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVariant:
    vision_width: int
    vision_layers: int
    vision_heads: int
    patch_size: int
    embed_dim: int  # projection dim == the "vision_width" LECCR sees
    text_width: int
    text_layers: int
    text_heads: int
    vocab_size: int = 49408
    context_length: int = 77


CLIP_VARIANTS = {
    "ViT-B/32": CLIPVariant(768, 12, 12, 32, 512, 512, 12, 8),
    "ViT-B/16": CLIPVariant(768, 12, 12, 16, 512, 512, 12, 8),
    "ViT-L/14": CLIPVariant(1024, 24, 16, 14, 768, 768, 12, 12),
}


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation (reference clip/model.py:161-163)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    """Attention of a CLIP residual block (torch nn.MultiheadAttention
    equivalent, with optional causal masking for the text tower)."""

    width: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, l, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, l, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        from leccr_tpu.ops.flash_attention import flash_tower_attention

        # no fits_vmem gate: flash_tower_attention dispatches internally to
        # the Lk-tiled kernel past the single-block VMEM limit (ViT-L@336)
        if (self.fused and not self.causal and not deterministic
                and jax.default_backend() == "tpu"):
            out = flash_tower_attention(q, k, v, None, 0, 0.0)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                head_dim).astype(x.dtype)
            if self.causal:
                mask = jnp.tril(jnp.ones((l, l), dtype=bool))
                scores = jnp.where(mask[None, None], scores,
                                   jnp.finfo(scores.dtype).min)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class _ResidualBlock(nn.Module):
    """Pre-LN residual attention block (reference clip/model.py:166-192)."""

    width: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x + _CLIPAttention(self.width, self.heads, self.causal, self.dtype,
                               self.fused, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x),
            deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class _ScannedResidualBlock(nn.Module):
    """nn.scan adapter for _ResidualBlock (carry = hidden state)."""

    width: int
    heads: int
    causal: bool
    dtype: jnp.dtype
    remat: bool
    fused: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, _):
        block_cls = (nn.remat(_ResidualBlock, static_argnums=(2,))
                     if self.remat else _ResidualBlock)
        x = block_cls(self.width, self.heads, self.causal, self.dtype,
                      self.fused, name="block")(x, self.deterministic)
        return x, None


class _Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.scan_layers:
            scanned = nn.scan(
                _ScannedResidualBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.layers,
            )(self.width, self.heads, self.causal, self.dtype, self.remat,
              self.fused, deterministic, name="resblocks")
            x, _ = scanned(x, None)
            return x
        block_cls = (nn.remat(_ResidualBlock, static_argnums=(2,))
                     if self.remat else _ResidualBlock)
        for i in range(self.layers):
            x = block_cls(self.width, self.heads, self.causal, self.dtype,
                          self.fused, name=f"resblock_{i}")(x, deterministic)
        return x


def interpolate_pos_embed(
    pos_embed: jax.Array, target_grid: int
) -> jax.Array:
    """Bicubic-resample a [1+G*G, W] CLIP position embedding to a new grid.

    Mirrors reference clip/model.py:456-481 (class token kept, patch grid
    resized bicubically)."""
    num_tokens, width = pos_embed.shape
    grid = int(round((num_tokens - 1) ** 0.5))
    if grid == target_grid:
        return pos_embed
    cls_tok, patches = pos_embed[:1], pos_embed[1:]
    patches = patches.reshape(grid, grid, width)
    patches = jax.image.resize(
        patches, (target_grid, target_grid, width), method="bicubic")
    return jnp.concatenate(
        [cls_tok, patches.reshape(target_grid * target_grid, width)], axis=0)


class CLIPVisionTower(nn.Module):
    """CLIP ViT returning the full projected hidden state.

    Output: [B, 1+G*G, embed_dim] — ln_post + proj applied to every token,
    matching the LECCR patch of encode_image (reference clip/model.py:340-346).
    For ViT-B/32 @ 384²: [B, 145, 512].
    """

    width: int
    layers: int
    heads: int
    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    fused_attention: bool = False

    @nn.compact
    def __call__(self, image: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        b, h, w, _ = image.shape  # NHWC
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(image.astype(self.dtype))
        grid = h // self.patch_size
        x = x.reshape(b, grid * grid, self.width)
        cls_embed = self.param(
            "class_embedding", nn.initializers.normal(self.width ** -0.5),
            (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_embed.astype(self.dtype), (b, 1, self.width)),
             x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(self.width ** -0.5),
            (grid * grid + 1, self.width))
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = _Transformer(self.width, self.layers, self.heads, dtype=self.dtype,
                         remat=self.remat, scan_layers=self.scan_layers,
                         fused=self.fused_attention,
                         name="transformer")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))
        return x @ proj.astype(self.dtype)


class CLIPTextTower(nn.Module):
    """CLIP text transformer returning (eot_features, full hidden state).

    hidden = ln_final(transformer(tok+pos)) @ text_projection per token;
    pooled = hidden at the EOT position (argmax of token ids), matching the
    LECCR patch of encode_text (reference clip/model.py:348-365)."""

    width: int
    layers: int
    heads: int
    embed_dim: int
    vocab_size: int = 49408
    context_length: int = 77
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, text_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(text_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        x = tok + pos[None, : text_ids.shape[1]].astype(self.dtype)
        x = _Transformer(self.width, self.layers, self.heads, causal=True,
                         dtype=self.dtype, remat=self.remat,
                         scan_layers=self.scan_layers,
                         name="transformer")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))
        hidden = x @ proj.astype(self.dtype)
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = jnp.take_along_axis(
            hidden, eot[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return pooled, hidden


def build_vision_tower(cfg, dtype=jnp.float32, remat=False, scan_layers=False
                       ) -> Tuple[CLIPVisionTower, int]:
    """Build a CLIPVisionTower from a VisionConfig; returns (tower, width seen
    by the retrieval head)."""
    var = CLIP_VARIANTS[cfg.variant]
    width = cfg.width or var.vision_width
    depth = cfg.depth or var.vision_layers
    heads = (var.vision_heads if width == var.vision_width
             else max(1, width // 64))
    embed_dim = var.embed_dim if not cfg.width else width
    tower = CLIPVisionTower(
        width=width, layers=depth, heads=heads,
        patch_size=var.patch_size, embed_dim=embed_dim, dtype=dtype,
        remat=remat, scan_layers=scan_layers,
        fused_attention=getattr(cfg, "fused_attention", False))
    return tower, embed_dim
