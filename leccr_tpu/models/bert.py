"""Multilingual BERT-family text tower in flax.

Capability parity with the reference's text tower — HuggingFace
`BertModel('bert-base-multilingual-cased')` used for both the multilingual
texts and the MLLM captions (reference models/xvlm.py:91-103,237-238;
models/model_retrieval_caption.py:33-36,55-63).  The same architecture covers
XLM-R (different vocab/tokenizer, no token types beyond 1), so one module
serves both `kind`s in TextConfig.

Forward contract: __call__(input_ids, attention_mask) -> last_hidden_state
[B, L, H], numerically matching HF BertModel's encoder output (post-LN
blocks, exact-erf GELU, LN eps 1e-12).  Weight import from HF checkpoints is
in leccr_tpu.models.convert.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from leccr_tpu.config import TextConfig
from leccr_tpu.ops.dropout import LeanDropout


class _BertSelfAttention(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic=True):
        cfg = self.cfg
        b, l, _ = hidden.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)

        def split(x):
            return x.reshape(b, l, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(dense("query")(hidden))
        k = split(dense("key")(hidden))
        v = split(dense("value")(hidden))
        from leccr_tpu.ops.flash_attention import flash_tower_attention

        # no fits_vmem gate: flash_tower_attention dispatches internally to
        # the Lk-tiled kernel past the single-block VMEM limit
        if (cfg.fused_attention and not deterministic
                and jax.default_backend() == "tpu"):
            rate = 0.0 if deterministic else cfg.attention_dropout
            seed = 0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2 ** 31 - 1)
            padding = None
            if attention_mask is not None:
                padding = 1 - attention_mask.astype(jnp.int32)
            out = flash_tower_attention(q, k, v, padding, seed, rate)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                head_dim).astype(self.dtype)
            if attention_mask is not None:
                bias = (1.0
                        - attention_mask[:, None, None, :].astype(jnp.float32))
                scores = scores + (bias * jnp.finfo(jnp.float32).min).astype(
                    scores.dtype)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
                self.dtype)
            probs = LeanDropout(cfg.attention_dropout)(probs, deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, cfg.hidden_size)
        # attention output projection + residual LN (HF BertSelfOutput)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out")(out)
        out = LeanDropout(cfg.hidden_dropout)(out, deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="out_ln")(out + hidden)


class _BertLayer(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic=True):
        cfg = self.cfg
        attn = _BertSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attention_mask, deterministic)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(attn)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        out = LeanDropout(cfg.hidden_dropout)(out, deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_ln")(out + attn)


class _ScannedBertLayer(nn.Module):
    """nn.scan adapter: (carry=hidden, None) -> (hidden, None)."""

    cfg: TextConfig
    dtype: jnp.dtype
    deterministic: bool
    remat: bool

    @nn.compact
    def __call__(self, hidden, _):
        layer_cls = (nn.remat(_BertLayer, static_argnums=(3,))
                     if self.remat else _BertLayer)
        hidden, mask = hidden
        out = layer_cls(self.cfg, self.dtype, name="layer")(
            hidden, mask, self.deterministic)
        return (out, mask), None


class BertEncoder(nn.Module):
    """BERT encoder returning last_hidden_state [B, L, H].

    scan_layers=True stacks the layer params along a leading axis and runs
    the depth loop as lax.scan — one compiled layer body instead of
    num_layers unrolled copies (an order of magnitude faster XLA compiles at
    production sizes; weight import via convert.bert_params(scan=True))."""

    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if cfg.kind == "xlmr":
            # RoBERTa/XLM-R position ids: padding_idx = pad_token_id (1 for
            # XLM-R), real tokens get cumulative positions starting past it
            # (HF create_position_ids_from_input_ids semantics)
            mask = attention_mask.astype(jnp.int32)
            positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            positions = jnp.arange(input_ids.shape[1])[None, :]

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(positions)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(token_type_ids)
        hidden = word + pos + typ
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="embeddings_ln")(hidden)
        hidden = LeanDropout(cfg.hidden_dropout)(hidden, deterministic)

        if self.scan_layers:
            scanned = nn.scan(
                _ScannedBertLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_layers,
            )(cfg, self.dtype, deterministic, self.remat, name="layers")
            (hidden, _), _ = scanned((hidden, attention_mask), None)
            return hidden

        # static_argnums: `deterministic` (arg 3, counting self) is a python
        # bool that gates dropout branches
        layer_cls = (nn.remat(_BertLayer, static_argnums=(3,))
                     if self.remat else _BertLayer)
        for i in range(cfg.num_layers):
            hidden = layer_cls(cfg, self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, deterministic)
        return hidden
