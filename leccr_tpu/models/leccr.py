"""The LECCR retrieval model: towers + caption-interaction branch + heads.

Capability parity with reference models/model_retrieval_caption.py (image) and
models/video_model_retrieval_caption.py (video), on top of the XVLMBase
projection heads (reference models/xvlm.py:150-256).  One module covers both
modalities — the vision tower is selected by config (SURVEY.md §7 "Tower
protocol"), fixing the reference's 2x model duplication.

Key semantics preserved:
- caption encoder shares weights with the text tower when
  `caption_encoder_name == 'mbert'` and receives no gradient (the reference
  runs it under torch.no_grad, model_retrieval_caption.py:158-163; we use
  stop_gradient on its output);
- `interaction_with_caption` (reference :76-84): `num_queries` learned zero-
  init query slots cross-attend to projected caption tokens (caption_ca_layer
  layers), then visual tokens attend to the slots and the slots attend back
  to visual tokens (caption_interaction_layer layers each);
- features are 256-d L2-normalized projections — CLS pooling for images,
  masked mean pooling for video (reference xvlm.py:241-256,
  xvlm_video.py:260-277).

Everything is batch-first: caption slots are [B, n_queries, D] (the reference
keeps torch's seq-first [n, B, D]).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from leccr_tpu.config import ModelConfig
from leccr_tpu.models.bert import BertEncoder
from leccr_tpu.models.clip import (
    CLIP_VARIANTS,
    CLIPTextTower,
    build_vision_tower,
)
from leccr_tpu.models.temporal import TemporalTower, masked_mean_pool
from leccr_tpu.ops.attention import CrossAttentionStack


@dataclasses.dataclass
class TrainEmbeddings:
    """Everything the loss suite consumes, all computed on-device.

    Shapes use B = per-call batch, n = num_queries, E = embed_dim,
    Dv = vision width."""

    image_feat: jax.Array  # [B, E] L2-normalized fused visual feature
    text_feat_s: jax.Array  # [B, E] source-language text feature
    text_feat_t: jax.Array  # [B, E] target-language text feature
    slots: jax.Array  # [B, n, E] caption_proj1(fused caption slots)
    ori_slots: jax.Array  # [B, n, Dv] caption-only slots (pre-fusion)
    cv_caption_mean: jax.Array  # [B, Dv] token-mean of normalized cproj slots
    cv_vision_mean: jax.Array  # [B, Dv] token-mean of normalized vproj tokens
    temp: jax.Array  # scalar temperature


jax.tree_util.register_dataclass(
    TrainEmbeddings,
    data_fields=[f.name for f in dataclasses.fields(TrainEmbeddings)],
    meta_fields=[],
)


class LECCRModel(nn.Module):
    """LECCR retrieval model (image or video variant by config)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype

        if cfg.vision.kind == "clip_vit":
            self.vision_tower, self.vision_width = build_vision_tower(
                cfg.vision, dtype=dtype, remat=cfg.remat,
                scan_layers=cfg.scan_layers)
        elif cfg.vision.kind == "temporal":
            self.vision_width = cfg.vision.frame_feat_dim
            self.vision_tower = TemporalTower(
                d_model=self.vision_width,
                num_heads=cfg.vision.num_heads,
                num_layers=cfg.vision.num_layers,
                dropout=cfg.dropout,
                dtype=dtype,
            )
        else:
            raise ValueError(f"unknown vision tower: {cfg.vision.kind}")

        self.text_encoder = BertEncoder(cfg.text, dtype=dtype,
                                        remat=cfg.remat,
                                        scan_layers=cfg.scan_layers)
        self.text_width = cfg.text.hidden_size

        if cfg.caption_encoder_name == "mbert":
            # weight sharing with the text tower (reference
            # model_retrieval_caption.py:34-36): same submodule, called twice.
            self.caption_width = self.text_width
            self.clip_text_tower = None
        elif cfg.caption_encoder_name == "clip":
            # the vendored CLIP's own text branch encodes the captions
            # (model_retrieval_caption.py:57-63); its dims come from the
            # variant's text fields — NOT the vision-tower overrides
            var = CLIP_VARIANTS[cfg.vision.variant]
            self.clip_text_tower = CLIPTextTower(
                width=var.text_width,
                layers=var.text_layers,
                heads=var.text_heads,
                embed_dim=self.vision_width,
                vocab_size=var.vocab_size,
                context_length=var.context_length,
                dtype=dtype,
                scan_layers=cfg.scan_layers,
            )
            self.caption_width = self.vision_width
        else:
            raise ValueError(
                f"unknown caption encoder: {cfg.caption_encoder_name}")

        d = self.vision_width
        heads = 8 if d % 8 == 0 else max(
            h for h in (1, 2, 4) if d % h == 0)
        self.caption_proj = nn.Dense(d, dtype=dtype)
        self.queries = self.param(
            "queries", nn.initializers.zeros, (cfg.num_queries, d))
        self.crossattn_query = CrossAttentionStack(
            d, heads, cfg.caption_ca_layer, cfg.dropout, dtype)
        self.crossattn = CrossAttentionStack(
            d, heads, cfg.caption_interaction_layer, cfg.dropout, dtype)
        self.crossattn2 = CrossAttentionStack(
            d, heads, cfg.caption_interaction_layer, cfg.dropout, dtype)
        self.caption_proj1 = nn.Dense(cfg.embed_dim, dtype=dtype)
        self.cproj = nn.Dense(d, dtype=dtype)
        self.vproj = nn.Dense(d, dtype=dtype)

        self.text_proj = nn.Dense(cfg.embed_dim, dtype=dtype)
        if cfg.use_one_cl_proj_only:
            assert self.vision_width == self.text_width
            self.vision_proj = None
        else:
            self.vision_proj = nn.Dense(cfg.embed_dim, dtype=dtype)
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp), ())

    # ------------------------------------------------------------- towers

    def encode_vision(
        self,
        vision_input: jax.Array,
        vision_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Image [B,H,W,3] -> ([B, 1+G², Dv], None); video frames
        ([B,T,Df], mask [B,T]) -> ([B,T,Dv], mask)."""
        if self.cfg.vision.kind == "clip_vit":
            return self.vision_tower(vision_input, deterministic), None
        return (
            self.vision_tower(vision_input, vision_mask, deterministic),
            vision_mask,
        )

    def encode_text(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        return self.text_encoder(
            input_ids, attention_mask, deterministic=deterministic)

    def encode_caption(
        self,
        caption_ids: Optional[jax.Array],
        caption_mask: Optional[jax.Array] = None,
        caption_feats: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Encode the MLLM-generated caption -> (embeds [B,L,Dc],
        key_padding_mask [B,L] True=pad).  No gradient flows into the caption
        encoder (reference model_retrieval_caption.py:158-163).

        caption_feats short-circuits the encoder for precomputed per-token
        features (`generated_caption_type: feats`,
        reference retrieval_dataset.py:67-69)."""
        if caption_feats is not None:
            return (jax.lax.stop_gradient(caption_feats.astype(self.dtype)),
                    ~caption_mask.astype(bool))
        if self.cfg.caption_encoder_name == "clip":
            _, hidden = self.clip_text_tower(caption_ids)
            padding_mask = caption_ids == 0
        else:
            hidden = self.text_encoder(
                caption_ids, caption_mask, deterministic=deterministic)
            padding_mask = ~caption_mask.astype(bool)
        return jax.lax.stop_gradient(hidden), padding_mask

    # ------------------------------------------------- caption interaction

    def interact(
        self,
        vision_embeds: jax.Array,
        caption_embeds: jax.Array,
        caption_padding_mask: Optional[jax.Array],
        vision_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        fused: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """reference interaction_with_caption (:76-84 image, video :99-110).

        Returns (fused_vision [B,L,Dv], fused_slots [B,n,Dv],
        ori_slots [B,n,Dv]).  fused=True runs the attention cores as single
        Pallas kernels (eval/serving only)."""
        b = vision_embeds.shape[0]
        queries = jnp.broadcast_to(
            self.queries[None].astype(vision_embeds.dtype),
            (b, self.cfg.num_queries, self.vision_width))
        cap = self.caption_proj(caption_embeds)
        ori_slots = self.crossattn_query(
            queries, cap, caption_padding_mask, deterministic, fused)
        fused_vision = self.crossattn(
            vision_embeds, ori_slots, None, deterministic, fused)
        fused_slots = self.crossattn2(
            ori_slots, vision_embeds, vision_padding_mask, deterministic,
            fused)
        return fused_vision, fused_slots, ori_slots

    # ------------------------------------------------------------ features

    def vision_features(
        self,
        vision_embeds: jax.Array,
        vision_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """256-d L2-normalized visual feature: CLS pooling for images,
        masked mean for video (reference xvlm.py:241-256 /
        xvlm_video.py:260-277)."""
        proj = self.vision_proj if self.vision_proj is not None else self.text_proj
        if self.cfg.vision.kind == "temporal":
            pooled = masked_mean_pool(vision_embeds, vision_mask)
        else:
            pooled = vision_embeds[:, 0]
        out = proj(pooled)
        return _l2_normalize(out)

    def text_features(self, text_embeds: jax.Array) -> jax.Array:
        out = self.text_proj(text_embeds[:, 0])
        return _l2_normalize(out)

    # --------------------------------------------------------- full passes

    def __call__(self, batch: Dict[str, jax.Array],
                 deterministic: bool = True) -> TrainEmbeddings:
        """Training forward: towers + interaction + all loss inputs.

        batch keys: vision (image [B,H,W,3] or frames [B,T,Df]),
        vision_mask (video only), text_ids_s/text_mask_s,
        text_ids_t/text_mask_t, caption_ids/caption_mask.
        """
        cfg = self.cfg
        ori_vision, vision_mask = self.encode_vision(
            batch["vision"], batch.get("vision_mask"), deterministic)

        caption_embeds, caption_padding = self.encode_caption(
            batch.get("caption_ids"), batch.get("caption_mask"),
            batch.get("caption_feats"), deterministic)

        fused_vision, fused_slots, ori_slots = self.interact(
            ori_vision, caption_embeds, caption_padding,
            None if vision_mask is None else ~vision_mask.astype(bool),
            deterministic)

        image_feat = self.vision_features(fused_vision, vision_mask)
        # source+target texts share width (bucketed together) and both need
        # grads: one doubled-batch tower pass keeps the MXU busier than two
        # half-size calls (the reference runs them separately,
        # model_retrieval_caption.py:177-185)
        b = batch["text_ids_s"].shape[0]
        text_embeds_st = self.encode_text(
            jnp.concatenate([batch["text_ids_s"], batch["text_ids_t"]], 0),
            jnp.concatenate([batch["text_mask_s"], batch["text_mask_t"]], 0),
            deterministic)
        text_feat_st = self.text_features(text_embeds_st)
        text_feat_s, text_feat_t = text_feat_st[:b], text_feat_st[b:]

        slots = self.caption_proj1(fused_slots)

        # caption_vision_loss inputs: L2-normalize after cproj/vproj (over
        # cfg.cv_normalize_dim — the reference's F.normalize defaults to the
        # TOKEN axis), then mean over tokens.  The reference computes the
        # mean over all token *pairs* of dot products
        # (model_retrieval_caption.py:126-134); since dot is bilinear that
        # equals the dot of token means regardless of how each token was
        # normalized, so we reduce before the (possibly cross-device) loss —
        # gathering [B, Dv] instead of [B, 145, Dv].
        cv_axis = 1 if cfg.cv_normalize_dim == 1 else -1
        cap_norm = _l2_normalize(self.cproj(ori_slots), axis=cv_axis)
        if vision_mask is None:
            vis_norm = _l2_normalize(self.vproj(ori_vision), axis=cv_axis)
            cv_vision_mean = jnp.mean(vis_norm, axis=1)
        else:
            # the reference's video cv-loss does NOT mask padded frames
            # (video_model_retrieval_caption.py:144-160 uses plain mean);
            # the masked mean (default) is strictly more correct and
            # identical when batches are unpadded —
            # cfg.video_cv_mask_frames=False reproduces the reference
            vis_norm = _l2_normalize(self.vproj(ori_vision), axis=cv_axis)
            if cfg.video_cv_mask_frames:
                cv_vision_mean = masked_mean_pool(vis_norm, vision_mask)
            else:
                cv_vision_mean = jnp.mean(vis_norm, axis=1)
        cv_caption_mean = jnp.mean(cap_norm, axis=1)

        return TrainEmbeddings(
            image_feat=image_feat.astype(jnp.float32),
            text_feat_s=text_feat_s.astype(jnp.float32),
            text_feat_t=text_feat_t.astype(jnp.float32),
            slots=slots.astype(jnp.float32),
            ori_slots=ori_slots.astype(jnp.float32),
            cv_caption_mean=cv_caption_mean.astype(jnp.float32),
            cv_vision_mean=cv_vision_mean.astype(jnp.float32),
            temp=self.temp.astype(jnp.float32),
        )

    def embed_images(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Eval-side visual embedding: towers + caption interaction
        (reference evaluation_coarse, image_Retrieval_caption.py:123-145).

        Returns {"feat": [B,E], "slots": [B,n,E]} — slots feed the video
        double-sim eval (video_Retrieval_caption_double_sim.py:169-179)."""
        import jax as _jax

        use_fused = (self.cfg.fused_eval_attention
                     and _jax.default_backend() == "tpu")
        ori_vision, vision_mask = self.encode_vision(
            batch["vision"], batch.get("vision_mask"), True)
        caption_embeds, caption_padding = self.encode_caption(
            batch.get("caption_ids"), batch.get("caption_mask"),
            batch.get("caption_feats"), True)
        fused_vision, fused_slots, _ = self.interact(
            ori_vision, caption_embeds, caption_padding,
            None if vision_mask is None else ~vision_mask.astype(bool), True,
            fused=use_fused)
        feat = self.vision_features(fused_vision, vision_mask)
        slots = self.caption_proj1(fused_slots)
        return {"feat": feat.astype(jnp.float32),
                "slots": slots.astype(jnp.float32)}

    def embed_texts(self, input_ids: jax.Array,
                    attention_mask: jax.Array) -> jax.Array:
        """Eval-side text embedding -> [B, E] L2-normalized."""
        hidden = self.encode_text(input_ids, attention_mask, True)
        return self.text_features(hidden).astype(jnp.float32)


def _l2_normalize(x: jax.Array, eps: float = 1e-12,
                  axis: int = -1) -> jax.Array:
    """torch F.normalize semantics (clamped norm) over `axis`."""
    norm = jnp.maximum(
        jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True), eps)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)
