"""Serving API: load a trained LECCR checkpoint and run retrieval online.

The reference has no serving story (eval scripts only); this module provides
the production path implied by its capability set: embed texts/images once,
keep the index on device, answer top-K queries with a single fused
matmul+top_k per batch.

    emb = Embedder.from_checkpoint("out/m30k_fr/config.json")
    index = emb.build_image_index(image_paths, mllm_captions)
    hits = emb.search_texts(["ein mann fährt rad"], index, k=10)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leccr_tpu.config import LECCRConfig
from leccr_tpu.data.images import load_eval_image, normalize_images
from leccr_tpu.data.tokenizers import ClipBPETokenizer, WordPieceTokenizer
from leccr_tpu.models.leccr import LECCRModel


@dataclasses.dataclass
class ImageIndex:
    feats: jax.Array  # [N, E] L2-normalized, device-resident
    slots: Optional[jax.Array]  # [N, n_q, E] (double-sim fusion)
    ids: List[str]


class Embedder:
    def __init__(self, cfg: LECCRConfig, params, batch_size: int = 64):
        self.cfg = cfg
        self.model = LECCRModel(cfg.model)
        self.params = params
        self.batch_size = batch_size
        if cfg.model.text.kind == "xlmr":
            from leccr_tpu.data.tokenizers import UnigramTokenizer

            self.tokenizer = UnigramTokenizer(
                cfg.data.text_vocab, lowercase=cfg.data.lowercase)
        else:
            self.tokenizer = WordPieceTokenizer(
                cfg.data.text_vocab, lowercase=cfg.data.lowercase)
        self.caption_tokenizer = (
            ClipBPETokenizer(cfg.data.clip_bpe_vocab)
            if cfg.model.caption_encoder_name == "clip" else self.tokenizer)
        self._embed_texts = jax.jit(lambda p, i, m: self.model.apply(
            {"params": p}, i, m, method="embed_texts"))
        self._embed_images = jax.jit(lambda p, b: self.model.apply(
            {"params": p}, b, method="embed_images"))
        self._topk = jax.jit(
            lambda q, f, k: jax.lax.top_k(q @ f.T, k),
            static_argnums=2)
        # single-dispatch query path: tokenized query -> embed -> top-k in
        # ONE compiled program (each extra dispatch costs a full round trip
        # over a remote-device transport; measured 113 -> ~60 ms/query on
        # the tunnel at 100k indexed images)
        self._embed_and_topk = jax.jit(
            lambda p, i, m, f, k: jax.lax.top_k(
                self.model.apply({"params": p}, i, m,
                                 method="embed_texts") @ f.T, k),
            static_argnums=4)

        # double-sim fusion (video serving): blend the feature similarity
        # with the per-slot caption similarity exactly like the eval ranker
        # (reference video_Retrieval_caption_double_sim.py:87-91,169-179;
        # leccr_tpu/eval/retrieval.py fuse()).  fusion/alpha/k are static so
        # each (fusion, alpha) pair compiles once.
        def _fused_scores(q, f, sl, valid, fusion, alpha):
            s = q @ f.T  # [B, N]
            c = jnp.max(jnp.einsum("nke,be->bnk", sl, q), axis=-1)  # [B, N]
            if fusion == "raw":
                return alpha * s + (1.0 - alpha) * c
            # minmax: norm(S) = (S - max S)/(max S - min S) over the query
            # batch's score matrix (the eval ranker normalizes over the full
            # N x N matrix; fused SCORES are therefore not comparable across
            # batches).  `valid` [B] masks pad queries out of the min/max so
            # padding never shifts the blend's relative scale factors.
            def norm(x):
                hi = jnp.max(jnp.where(valid[:, None], x, -jnp.inf))
                lo = jnp.min(jnp.where(valid[:, None], x, jnp.inf))
                return (x - hi) / jnp.maximum(hi - lo, 1e-12)

            return alpha * norm(s) + (1.0 - alpha) * norm(c)

        self._fused_topk = jax.jit(
            lambda q, f, sl, valid, k, fusion, alpha: jax.lax.top_k(
                _fused_scores(q, f, sl, valid, fusion, alpha), k),
            static_argnums=(4, 5, 6))
        self._embed_and_fused_topk = jax.jit(
            lambda p, i, m, f, sl, valid, k, fusion, alpha: jax.lax.top_k(
                _fused_scores(
                    self.model.apply({"params": p}, i, m,
                                     method="embed_texts"),
                    f, sl, valid, fusion, alpha), k),
            static_argnums=(6, 7, 8))

    @classmethod
    def from_checkpoint(cls, config_path: str,
                        checkpoint: Optional[str] = None,
                        batch_size: int = 64) -> "Embedder":
        from leccr_tpu.config import load_config
        from leccr_tpu.train.checkpoints import CheckpointManager

        cfg = load_config(config_path)
        model = LECCRModel(cfg.model)
        rs = np.random.RandomState(0)
        width = cfg.data.token_buckets[0]
        vocab = cfg.model.text.vocab_size
        init_batch: Dict[str, np.ndarray] = {
            "text_ids_s": rs.randint(1, vocab, (1, width)).astype(np.int32),
            "text_mask_s": np.ones((1, width), np.int32),
            "text_ids_t": rs.randint(1, vocab, (1, width)).astype(np.int32),
            "text_mask_t": np.ones((1, width), np.int32),
            "caption_ids": rs.randint(1, vocab, (1, width)).astype(np.int32),
            "caption_mask": np.ones((1, width), np.int32),
        }
        if cfg.model.vision.kind == "temporal":
            init_batch["vision"] = np.zeros(
                (1, cfg.model.vision.max_frames,
                 cfg.model.vision.frame_feat_dim), np.float32)
            init_batch["vision_mask"] = np.ones(
                (1, cfg.model.vision.max_frames), bool)
        else:
            res = cfg.model.vision.image_res
            init_batch["vision"] = np.zeros((1, res, res, 3), np.float32)
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                     init_batch)["params"]
        if checkpoint:
            from leccr_tpu.models.weights import load_initial_checkpoint

            params = load_initial_checkpoint(checkpoint, params, cfg)
        else:
            mgr = CheckpointManager(cfg.output_dir)
            if mgr.latest_step() is not None:
                abstract = {"params": params, "opt_state": None,
                            "meta": {"step": 0, "epoch": 0}}
                try:
                    params, _, _ = mgr.restore(abstract)
                except Exception:
                    pass
        return cls(cfg, params, batch_size)

    # ------------------------------------------------------------- texts

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = list(texts[i: i + bs])
            n = len(chunk)
            chunk += [""] * (bs - n)
            ids, mask = self.tokenizer.encode(chunk, self.cfg.data.max_tokens)
            emb = self._embed_texts(self.params, ids, mask)
            out.append(emb[:n])  # async; one host sync at the end
        return np.asarray(jnp.concatenate(out, axis=0))

    # ------------------------------------------------------------ images

    def _caption_batch(self, captions: Sequence[str]) -> Dict[str, np.ndarray]:
        if hasattr(self.caption_tokenizer, "cls_id"):
            ids, mask = self.caption_tokenizer.encode(
                list(captions), self.cfg.data.max_tokens)
        else:
            ids = self.caption_tokenizer.encode(list(captions))
            mask = (ids != 0).astype(np.int32)
        return {"caption_ids": ids, "caption_mask": mask}

    def build_image_index(
        self,
        images: Sequence[str] | np.ndarray,
        mllm_captions: Sequence[str],
        ids: Optional[List[str]] = None,
    ) -> ImageIndex:
        """images: file paths (decoded+resized on host) or a pre-sized uint8
        array [N, H, W, 3]."""
        res = self.cfg.model.vision.image_res
        n = len(images)
        feats, slots = [], []
        bs = self.batch_size
        # all dispatches stay async: embeddings accumulate on device and
        # concatenate there; no per-batch host round trip
        for i in range(0, n, bs):
            chunk = images[i: i + bs]
            if isinstance(chunk[0], str):
                arr = np.stack([load_eval_image(p, res) for p in chunk])
            else:
                arr = np.asarray(chunk)
            count = arr.shape[0]
            if count < bs:
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], bs - count, 0)])
            caps = list(mllm_captions[i: i + count])
            caps += [caps[-1]] * (bs - count)
            batch = self._caption_batch(caps)
            batch["vision"] = normalize_images(jnp.asarray(arr))
            out = self._embed_images(self.params, batch)
            feats.append(out["feat"][:count])
            slots.append(out["slots"][:count])
        return ImageIndex(
            feats=jnp.concatenate(feats),
            slots=jnp.concatenate(slots),
            ids=list(ids) if ids else [str(i) for i in range(n)])

    def build_video_index(
        self,
        frame_feats: Sequence[np.ndarray] | np.ndarray,
        mllm_captions: Sequence[str],
        frame_masks: Optional[np.ndarray] = None,
        ids: Optional[List[str]] = None,
    ) -> ImageIndex:
        """Index pre-extracted per-frame video features — the serving path
        for the video retrieval model (reference consumes BigFile frame
        features, video_Retrieval_caption_double_sim.py + retrieval
        dataset).  frame_feats: [N, T, D] array at T == max_frames (with
        optional bool frame_masks [N, T]), or a list of per-video [t_i, D]
        arrays that are padded/truncated to max_frames with the mask
        derived.  Search with fusion="minmax" for the double-sim ranking
        the video evaluator uses."""
        vcfg = self.cfg.model.vision
        if vcfg.kind != "temporal":
            raise ValueError("build_video_index needs a temporal vision "
                             f"tower, got {vcfg.kind!r}")
        t_max, d = vcfg.max_frames, vcfg.frame_feat_dim
        if isinstance(frame_feats, np.ndarray) and frame_feats.ndim == 3:
            n = frame_feats.shape[0]
            arr = frame_feats[:, :t_max].astype(np.float32)
            if arr.shape[1] < t_max:
                arr = np.pad(arr, ((0, 0), (0, t_max - arr.shape[1]), (0, 0)))
            if frame_masks is None:
                m = np.zeros((n, t_max), bool)
                m[:, :min(frame_feats.shape[1], t_max)] = True
            else:
                m = np.asarray(frame_masks, bool)[:, :t_max]
                if m.shape[1] < t_max:
                    m = np.pad(m, ((0, 0), (0, t_max - m.shape[1])))
        else:
            n = len(frame_feats)
            arr = np.zeros((n, t_max, d), np.float32)
            m = np.zeros((n, t_max), bool)
            for i, f in enumerate(frame_feats):
                t = min(f.shape[0], t_max)
                arr[i, :t] = f[:t]
                m[i, :t] = True
        feats, slots = [], []
        bs = self.batch_size
        for i in range(0, n, bs):
            v, vm = arr[i: i + bs], m[i: i + bs]
            count = v.shape[0]
            if count < bs:
                v = np.concatenate([v, np.repeat(v[-1:], bs - count, 0)])
                vm = np.concatenate([vm, np.repeat(vm[-1:], bs - count, 0)])
            caps = list(mllm_captions[i: i + count])
            caps += [caps[-1]] * (bs - count)
            batch = self._caption_batch(caps)
            batch["vision"] = jnp.asarray(v)
            batch["vision_mask"] = jnp.asarray(vm)
            out = self._embed_images(self.params, batch)
            feats.append(out["feat"][:count])
            slots.append(out["slots"][:count])
        return ImageIndex(
            feats=jnp.concatenate(feats),
            slots=jnp.concatenate(slots),
            ids=list(ids) if ids else [str(i) for i in range(n)])

    # ------------------------------------------------------------ search

    def search_texts(self, queries: Sequence[str], index: ImageIndex,
                     k: int = 10, fusion: str = "none",
                     alpha: float = 0.9) -> List[List[Tuple[str, float]]]:
        """text → image/video retrieval: top-k items per query (one
        dispatch when the query batch fits batch_size).  fusion:
        "none" (feature similarity only) | "raw" | "minmax" (double-sim
        slot blend, the video evaluator's ranking — see eval/retrieval.py);
        alpha weights the feature term."""
        if fusion not in ("none", "raw", "minmax"):
            raise ValueError(f"unknown fusion {fusion!r}")
        k = min(k, index.feats.shape[0])
        n = len(queries)
        alpha = float(alpha)
        if n <= self.batch_size:
            # pad to batch_size: ONE static shape -> one compiled program
            # regardless of the incoming query count
            chunk = list(queries) + [""] * (self.batch_size - n)
            ids, mask = self.tokenizer.encode(
                chunk, self.cfg.data.max_tokens)
            if fusion == "none":
                scores, idxs = self._embed_and_topk(
                    self.params, ids, mask, index.feats, k)
            else:
                valid = np.arange(self.batch_size) < n
                scores, idxs = self._embed_and_fused_topk(
                    self.params, ids, mask, index.feats, index.slots,
                    valid, k, fusion, alpha)
            scores, idxs = np.asarray(scores)[:n], np.asarray(idxs)[:n]
        else:
            q = jnp.asarray(self.embed_texts(queries))
            if fusion == "none":
                scores, idxs = self._topk(q, index.feats, k)
            else:
                valid = np.ones((q.shape[0],), bool)
                scores, idxs = self._fused_topk(
                    q, index.feats, index.slots, valid, k, fusion, alpha)
            scores, idxs = np.asarray(scores), np.asarray(idxs)
        return [[(index.ids[j], float(s)) for j, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idxs, scores)]

    def search_images(self, index: ImageIndex, texts: Sequence[str],
                      k: int = 10) -> List[List[Tuple[int, float]]]:
        """image → text retrieval over an embedded text corpus."""
        t = jnp.asarray(self.embed_texts(texts))
        k = min(k, t.shape[0])
        scores, idxs = self._topk(index.feats, t, k)
        return [[(int(j), float(s)) for j, s in zip(ri, rs)]
                for ri, rs in zip(np.asarray(idxs), np.asarray(scores))]
