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
    feats: jax.Array  # [N, E] L2-normalized, device-resident (f32 or int8)
    slots: Optional[jax.Array]  # [N, n_q, E] (double-sim fusion)
    ids: List[str]
    # set by shard_index(): rows are sharded over mesh axis `axis`
    # (feats/slots padded to a multiple of the axis size; the pad rows are
    # masked out of every search).  None = single-device index.
    mesh: Optional[jax.sharding.Mesh] = None
    axis: str = "data"
    # set by quantize_index(): per-row symmetric-int8 dequant scales
    # (feats/slots are int8 and score = int8-dot × qscale × row scale)
    scale: Optional[jax.Array] = None  # [N] f32
    slot_scale: Optional[jax.Array] = None  # [N] f32

    @property
    def n_valid(self) -> int:
        return len(self.ids)

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: q = round(x / s), s = max|row| / 127.
    Rows are the leading axis; the max runs over every other axis (a
    [N, K, E] slot bank gets ONE scale per item, so the scale factors out
    of the max-over-slots reduction).  Returns (int8 x, f32 scale [N])."""
    m = jnp.max(jnp.abs(x), axis=tuple(range(1, x.ndim)), keepdims=True)
    scale = m / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.round(x / safe).astype(jnp.int8)
    return q, scale.reshape(x.shape[0]).astype(jnp.float32)


def _int8_scores(q: jax.Array, f: jax.Array,
                 fscale: jax.Array) -> jax.Array:
    """[B, N] similarity against an int8 index: quantize the query batch
    on the fly, run the int8×int8 dot on the MXU with int32 accumulation
    (2× the bf16 MXU rate on v5e, 4× less index HBM read — search at
    scale is index-bandwidth-bound), dequantize in the epilogue."""
    qq, qs = _quantize_rows(q)
    s = jax.lax.dot_general(
        qq, f, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return s.astype(jnp.float32) * qs[:, None] * fscale[None, :]


def _int8_slot_scores(q: jax.Array, sl: jax.Array,
                      sscale: jax.Array) -> jax.Array:
    """[B, N] max-over-slot similarity against an int8 slot bank; the
    per-item scale is positive so it commutes with the max."""
    qq, qs = _quantize_rows(q)
    c = jnp.einsum("nke,be->bnk", sl, qq,
                   preferred_element_type=jnp.int32)
    return (jnp.max(c, axis=-1).astype(jnp.float32)
            * qs[:, None] * sscale[None, :])


def _feat_scores(q: jax.Array, f: jax.Array,
                 fscale: Optional[jax.Array]) -> jax.Array:
    return (q @ f.T) if fscale is None else _int8_scores(q, f, fscale)


def _slot_scores(q: jax.Array, sl: jax.Array,
                 sscale: Optional[jax.Array]) -> jax.Array:
    if sscale is None:
        return jnp.max(jnp.einsum("nke,be->bnk", sl, q), axis=-1)
    return _int8_slot_scores(q, sl, sscale)


def quantize_index(index: ImageIndex) -> ImageIndex:
    """Symmetric per-row int8 quantization of a device index: 4× less
    index HBM (a 10M-image × 256-d index drops 10.2 GB → 2.6 GB — HBM-
    resident on one v5e) and the query matmul runs int8×int8 on the MXU.
    Feature rows are L2-normalized, so per-row scales are tight and the
    cosine ordering is preserved to ~1e-3 score error (test-pinned).
    Quantize BEFORE shard_index; search/save/load handle the rest."""
    if index.mesh is not None:
        raise ValueError("quantize_index before shard_index")
    if index.quantized:
        return index
    jq = jax.jit(_quantize_rows)
    feats, scale = jq(index.feats)
    slots, slot_scale = (None, None)
    if index.slots is not None:
        slots, slot_scale = jq(index.slots)
    return ImageIndex(feats=feats, slots=slots, ids=list(index.ids),
                      scale=scale, slot_scale=slot_scale)


def merge_indexes(a: ImageIndex, b: ImageIndex) -> ImageIndex:
    """Incremental index maintenance: append ``b``'s items to ``a``
    (build_image_index/build_video_index the new items, then merge — no
    re-embed of the existing corpus).  Exact for int8 indexes too: the
    dequant scales are per-row, so existing rows keep their bytes and
    scales bit-for-bit.  Both operands must share a layout (same
    quantization, same slot presence) and be unsharded — re-shard the
    merged index for pod serving."""
    if a.mesh is not None or b.mesh is not None:
        raise ValueError("merge unsharded indexes (shard_index after)")
    if a.quantized != b.quantized:
        raise ValueError("cannot merge a quantized index with an fp32 one")
    if (a.slots is None) != (b.slots is None):
        raise ValueError("cannot merge a slot-carrying index with a "
                         "feats-only one")
    dup = set(a.ids) & set(b.ids)
    if dup:
        raise ValueError(f"duplicate ids in merge: {sorted(dup)[:5]} ...")

    def cat(x, y):
        return None if x is None else jnp.concatenate([x, y])

    return ImageIndex(
        feats=cat(a.feats, b.feats), slots=cat(a.slots, b.slots),
        ids=list(a.ids) + list(b.ids), scale=cat(a.scale, b.scale),
        slot_scale=cat(a.slot_scale, b.slot_scale))


def remove_from_index(index: ImageIndex, ids: Sequence[str]) -> ImageIndex:
    """Drop items by id (deleted/expired corpus entries) without
    re-embedding anything; unknown ids are an error.  Unsharded only —
    re-shard after."""
    if index.mesh is not None:
        raise ValueError("remove from the unsharded index (re-shard after)")
    drop = set(ids)
    unknown = drop - set(index.ids)
    if unknown:
        raise ValueError(f"unknown ids: {sorted(unknown)[:5]} ...")
    keep = np.asarray([i not in drop for i in index.ids])
    rows = jnp.asarray(np.nonzero(keep)[0])

    def take(x):
        return None if x is None else jnp.take(x, rows, axis=0)

    return ImageIndex(
        feats=take(index.feats), slots=take(index.slots),
        ids=[i for i in index.ids if i not in drop],
        scale=take(index.scale), slot_scale=take(index.slot_scale))


# optional per-layout arrays a save may or may not carry; the manifest
# records which ones belong to THIS save so a load over a re-used
# directory (local overwrite or hdfs re-sync, which never deletes) can't
# resurrect a previous save's stale scale.npy/slots.npy into an
# inconsistent index (e.g. fp32 feats + leftover int8 scales)
_INDEX_OPTIONAL = ("slots", "scale", "slot_scale")


def _staged_save_dir(path: str, prefix: str):
    """Context manager yielding the LOCAL directory for a directory
    save; an hdfs:// destination stages through a tempdir synced up
    (contents-mirroring) only on clean exit.  One copy of the staging
    contract for every index family (exact serve.py + serve_ann.py)."""
    import contextlib
    import os
    import shutil
    import tempfile

    from leccr_tpu.utils import io

    @contextlib.contextmanager
    def cm():
        if path.startswith("hdfs://"):
            local = tempfile.mkdtemp(prefix=prefix)
            try:
                yield local
                io.makedirs(path)
                io.sync_dir_to_remote(local, path)
            finally:
                shutil.rmtree(local, ignore_errors=True)
        else:
            os.makedirs(path, exist_ok=True)
            yield path

    return cm()


def _staged_load_dir(path: str, prefix: str):
    """Context manager yielding a LOCAL directory holding the save;
    hdfs:// sources are staged down and cleaned up on exit."""
    import contextlib
    import shutil
    import tempfile

    from leccr_tpu.utils import io

    @contextlib.contextmanager
    def cm():
        if path.startswith("hdfs://"):
            local = tempfile.mkdtemp(prefix=prefix)
            try:
                io.stage_remote_dir(path, local)
                yield local
            finally:
                shutil.rmtree(local, ignore_errors=True)
        else:
            yield path

    return cm()


def _write_array_save(local: str, required: Dict[str, np.ndarray],
                      optional: Dict[str, Optional[np.ndarray]],
                      ids: List[str], extra: Dict) -> None:
    """The directory-save layout shared by the index families: required
    arrays always written, optional arrays written when present and
    their stale .npy REMOVED when absent, ids.json, and a manifest that
    scopes the optional set to THIS save (see _INDEX_OPTIONAL note)."""
    import json
    import os

    for name, arr in required.items():
        np.save(os.path.join(local, name + ".npy"), arr)
    written = []
    for name, arr in optional.items():
        p = os.path.join(local, name + ".npy")
        if arr is not None:
            np.save(p, arr)
            written.append(name)
        elif os.path.exists(p):  # stale file from a previous save
            os.remove(p)
    with open(os.path.join(local, "ids.json"), "w") as f:
        json.dump(list(ids), f)
    with open(os.path.join(local, "manifest.json"), "w") as f:
        json.dump({"optional": written, "n": len(ids), **extra}, f)


def save_index(index: ImageIndex, path: str) -> None:
    """Persist an index (feats/slots/ids) so serving restarts skip the
    embed pass — build once with build_image_index/build_video_index,
    serve many.  `path` is a directory; hdfs:// transparent via utils.io.
    Sharded indexes are saved unsharded (re-shard after load)."""
    n = index.n_valid
    with _staged_save_dir(path, "leccr_index_") as local:
        _write_array_save(
            local, {"feats": np.asarray(index.feats)[:n]},
            {name: None if getattr(index, name) is None
             else np.asarray(getattr(index, name))[:n]
             for name in _INDEX_OPTIONAL},
            index.ids, {})


def load_index(path: str,
               mesh: Optional[jax.sharding.Mesh] = None,
               axis: str = "data") -> ImageIndex:
    """Load a saved index onto the device; pass ``mesh`` to lay it out
    row-sharded (shard_index) in the same call."""
    import json
    import os

    with _staged_load_dir(path, "leccr_index_") as local:
        feats = np.load(os.path.join(local, "feats.npy"))
        with open(os.path.join(local, "ids.json")) as f:
            ids = json.load(f)
        if len(ids) != feats.shape[0]:
            raise ValueError(
                f"index corrupt: {len(ids)} ids vs {feats.shape[0]} rows")

        # the manifest scopes the optional files to THIS save; without it
        # (a pre-manifest save) fall back to file presence
        mpath = os.path.join(local, "manifest.json")
        allowed = None
        if os.path.exists(mpath):
            with open(mpath) as f:
                allowed = set(json.load(f)["optional"])

        def opt(name):
            if allowed is not None and name not in allowed:
                return None
            p = os.path.join(local, name + ".npy")
            return np.load(p) if os.path.exists(p) else None

        # keep host-resident until the layout is known: with a mesh the
        # rows go straight to their shards (an index bigger than ONE
        # device's HBM must never be staged unsharded)
        index = ImageIndex(
            feats=feats, slots=opt("slots"), ids=list(ids),
            scale=opt("scale"), slot_scale=opt("slot_scale"))
    if mesh is not None:
        return shard_index(index, mesh, axis)
    put = lambda x: None if x is None else jax.device_put(x)  # noqa: E731
    return ImageIndex(feats=put(feats), slots=put(index.slots),
                      ids=index.ids, scale=put(index.scale),
                      slot_scale=put(index.slot_scale))


def shard_index(index: ImageIndex, mesh: jax.sharding.Mesh,
                axis: str = "data") -> ImageIndex:
    """Re-lay an index out row-sharded over ``mesh`` axis ``axis`` — the
    pod-scale serving layout: each device holds N/W rows, every query
    fans out to all shards (local matmul + local top-k), and only the
    [B, W·k] candidate lists cross the ICI for the global merge, never
    the [B, N] score matrix.  Scales both index capacity (HBM) and
    per-query FLOPs with the mesh."""
    w = mesh.shape[axis]
    n = index.feats.shape[0]
    pad = (-n) % w
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lay_out(x):
        if x is None:
            return None
        # pad on the host: device_put with a sharding sends each row
        # range straight to its shard, so the full padded array is never
        # resident on any single device (the whole point of sharding an
        # index that exceeds one chip's HBM)
        x = np.asarray(x)
        if pad:
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return ImageIndex(feats=lay_out(index.feats), slots=lay_out(index.slots),
                      ids=list(index.ids), mesh=mesh, axis=axis,
                      scale=lay_out(index.scale),
                      slot_scale=lay_out(index.slot_scale))


def load_params_for_inference(cfg: LECCRConfig,
                              checkpoint: Optional[str] = None):
    """Initialize LECCR params and load weights for an inference-only
    consumer (Embedder, run.py --task export): explicit `checkpoint`
    (orbax dir / torch file / reference .pth) if given, else the latest
    orbax step under cfg.output_dir, else random init."""
    from leccr_tpu.train.checkpoints import CheckpointManager

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
                restored, _, ema, _ = mgr.restore(abstract)
                # serve/export what eval gated on: the EMA weights when
                # the run tracked them (config.py ema_decay/ema_eval)
                params = (ema if ema is not None and cfg.train.ema_eval
                          else restored)
            except Exception:
                pass
    return params


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
        self._sharded_progs: Dict[tuple, object] = {}
        self._embed_texts = jax.jit(lambda p, i, m: self.model.apply(
            {"params": p}, i, m, method="embed_texts"))
        self._embed_images = jax.jit(lambda p, b: self.model.apply(
            {"params": p}, b, method="embed_images"))
        # fs = per-row dequant scales for an int8-quantized index (None on
        # the f32 path; _feat_scores branches at trace time)
        self._topk = jax.jit(
            lambda q, f, fs, k: jax.lax.top_k(_feat_scores(q, f, fs), k),
            static_argnums=3)
        # image→text over an int8 index: score text-side, then transpose
        self._qtopk_t = jax.jit(
            lambda t, f, fs, k: jax.lax.top_k(_feat_scores(t, f, fs).T, k),
            static_argnums=3)
        # single-dispatch query path: tokenized query -> embed -> top-k in
        # ONE compiled program (each extra dispatch costs a full round trip
        # over a remote-device transport; measured 113 -> ~60 ms/query on
        # the tunnel at 100k indexed images)
        self._embed_and_topk = jax.jit(
            lambda p, i, m, f, fs, k: jax.lax.top_k(
                _feat_scores(self.model.apply({"params": p}, i, m,
                                              method="embed_texts"), f, fs),
                k),
            static_argnums=5)

        # double-sim fusion (video serving): blend the feature similarity
        # with the per-slot caption similarity exactly like the eval ranker
        # (reference video_Retrieval_caption_double_sim.py:87-91,169-179;
        # leccr_tpu/eval/retrieval.py fuse()).  fusion/alpha/k are static so
        # each (fusion, alpha) pair compiles once.
        def _fused_scores(q, f, sl, valid, fusion, alpha, fs=None, ss=None):
            s = _feat_scores(q, f, fs)  # [B, N]
            c = _slot_scores(q, sl, ss)  # [B, N]
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
            lambda q, f, sl, valid, fs, ss, k, fusion, alpha: jax.lax.top_k(
                _fused_scores(q, f, sl, valid, fusion, alpha, fs, ss), k),
            static_argnums=(6, 7, 8))
        self._embed_and_fused_topk = jax.jit(
            lambda p, i, m, f, sl, valid, fs, ss, k, fusion, alpha:
            jax.lax.top_k(
                _fused_scores(
                    self.model.apply({"params": p}, i, m,
                                     method="embed_texts"),
                    f, sl, valid, fusion, alpha, fs, ss), k),
            static_argnums=(8, 9, 10))

    def _sharded_search_prog(self, mesh, axis, k: int, fusion: str,
                             alpha: float, n_valid: int, with_slots: bool,
                             quant: bool):
        """One compiled program per (mesh, statics): tokenized queries →
        embed (replicated) → per-shard scores + local top-k → all_gather
        of the [B, W·k] candidates → global top-k.  The minmax fusion's
        global min/max become pmax/pmin over the shard axis (two scalar
        all-reduces — the same two the sharded evaluator pays).  quant=True
        is the int8 index layout: per-row dequant scales ride the same
        row sharding as the feats/slots they scale."""
        key = (mesh, axis, k, fusion, alpha, n_valid, with_slots, quant)
        prog = self._sharded_progs.get(key)
        if prog is not None:
            return prog
        from jax.sharding import PartitionSpec as P

        from leccr_tpu.parallel.ring import shard_map

        def body(q, f, sl, valid_q, fs=None, ss=None):
            # q [B, E] replicated; f [n_loc, E] / sl [n_loc, n_q, E] local
            n_loc = f.shape[0]
            gid = jax.lax.axis_index(axis) * n_loc + jnp.arange(n_loc)
            live = gid < n_valid
            s = _feat_scores(q, f, fs)  # [B, n_loc]
            if fusion != "none":
                c = _slot_scores(q, sl, ss)
                if fusion == "minmax":
                    def norm(x):
                        m = valid_q[:, None] & live[None, :]
                        hi = jax.lax.pmax(
                            jnp.max(jnp.where(m, x, -jnp.inf)), axis)
                        lo = jax.lax.pmin(
                            jnp.min(jnp.where(m, x, jnp.inf)), axis)
                        return (x - hi) / jnp.maximum(hi - lo, 1e-12)

                    s, c = norm(s), norm(c)
                s = alpha * s + (1.0 - alpha) * c
            s = jnp.where(live[None, :], s, -jnp.inf)
            ls, li = jax.lax.top_k(s, min(k, n_loc))
            lgi = jnp.take(gid, li)
            s_all = jax.lax.all_gather(ls, axis, axis=1, tiled=True)
            i_all = jax.lax.all_gather(lgi, axis, axis=1, tiled=True)
            fs, pos = jax.lax.top_k(s_all, k)
            return fs, jnp.take_along_axis(i_all, pos, axis=1)

        specs = (P(), P(axis), P(axis), P())
        if quant:
            specs += (P(axis), P(axis))
        mapped = shard_map(body, mesh, in_specs=specs,
                           out_specs=(P(), P()))

        def prog(params, ids, mask, f, sl, valid_q, *scales):
            q = self.model.apply({"params": params}, ids, mask,
                                 method="embed_texts")
            return mapped(q, f, sl, valid_q, *scales)

        prog = jax.jit(prog)
        self._sharded_progs[key] = prog
        return prog

    def _search_sharded(self, queries: Sequence[str], index: ImageIndex,
                        k: int, fusion: str, alpha: float):
        with_slots = fusion != "none"
        if with_slots and index.slots is None:
            raise ValueError(f"fusion={fusion!r} needs a slot-carrying "
                             "index")
        prog = self._sharded_search_prog(
            index.mesh, index.axis, k, fusion, float(alpha),
            index.n_valid, with_slots, index.quantized)
        # the slots input must exist even on the feature-only path (it is
        # DCE'd inside the program); a row-sharded view of feats keeps the
        # dummy on the same layout with no extra transfer
        sl = index.slots if with_slots else index.feats[:, :1, None]
        scales = ()
        if index.quantized:
            # the slot-scale slot is likewise DCE'd when fusion == "none"
            scales = (index.scale,
                      index.slot_scale if with_slots else index.scale)
        bs = self.batch_size
        out_s, out_i = [], []
        for i in range(0, len(queries), bs):
            chunk = list(queries[i: i + bs])
            n = len(chunk)
            chunk += [""] * (bs - n)
            ids, mask = self.tokenizer.encode(chunk, self.cfg.data.max_tokens)
            valid_q = np.arange(bs) < n
            scores, idxs = prog(self.params, ids, mask, index.feats, sl,
                                valid_q, *scales)
            out_s.append(np.asarray(scores)[:n])
            out_i.append(np.asarray(idxs)[:n])
        return np.concatenate(out_s), np.concatenate(out_i)

    @classmethod
    def from_checkpoint(cls, config_path: str,
                        checkpoint: Optional[str] = None,
                        batch_size: int = 64) -> "Embedder":
        from leccr_tpu.config import load_config

        return cls.from_config(load_config(config_path), checkpoint,
                               batch_size)

    @classmethod
    def from_config(cls, cfg: LECCRConfig,
                    checkpoint: Optional[str] = None,
                    batch_size: int = 64) -> "Embedder":
        """Build from an already-loaded config: explicit `checkpoint`
        (orbax dir / torch file / reference .pth) if given, else the
        latest orbax step under cfg.output_dir, else random init."""
        return cls(cfg, load_params_for_inference(cfg, checkpoint),
                   batch_size)

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

    def _embed_chunks(self, n: int, chunk_fn, mllm_captions: Sequence[str],
                      ids: Optional[List[str]]) -> ImageIndex:
        """Shared index-build loop: chunk_fn(i) -> (vision sub-batch dict,
        count).  Pads every chunk to batch_size by repeating the last row
        (ONE static shape -> one compiled program), tokenizes the chunk's
        captions, embeds, slices the pads back off.  All dispatches stay
        async: embeddings accumulate on device and concatenate there; no
        per-batch host round trip.

        mllm_captions may also be precomputed per-token caption FEATURE
        arrays ([t_i, D] each — `generated_caption_type: feats`, the
        reference's MSCOCO-CN `.npy` caption path); they are padded to one
        dataset-global width (static shapes) and fed as `caption_feats`,
        short-circuiting the caption encoder exactly like training does
        (data/pipeline.py image_batches)."""
        if n == 0:
            raise ValueError("cannot build an index from zero items")
        feats_mode = not isinstance(mllm_captions[0], str)
        if feats_mode:
            cap_w = max(np.asarray(c).shape[0] for c in mllm_captions)
            cap_d = np.asarray(mllm_captions[0]).shape[1]
        feats, slots = [], []
        bs = self.batch_size
        for i in range(0, n, bs):
            vis, count = chunk_fn(i)
            pad = bs - count
            if pad:
                vis = {k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, 0)])
                       for k, v in vis.items()}
            caps = list(mllm_captions[i: i + count])
            caps += [caps[-1]] * pad
            if feats_mode:
                arr = np.zeros((bs, cap_w, cap_d), np.float32)
                msk = np.zeros((bs, cap_w), np.int32)
                for j, c in enumerate(caps):
                    c = np.asarray(c, np.float32)
                    arr[j, : c.shape[0]] = c
                    msk[j, : c.shape[0]] = 1
                batch = {"caption_feats": arr, "caption_mask": msk}
            else:
                batch = self._caption_batch(caps)
            batch.update(vis)
            out = self._embed_images(self.params, batch)
            feats.append(out["feat"][:count])
            slots.append(out["slots"][:count])
        return ImageIndex(
            feats=jnp.concatenate(feats),
            slots=jnp.concatenate(slots),
            ids=list(ids) if ids else [str(i) for i in range(n)])

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

        def chunk(i):
            chunk = images[i: i + self.batch_size]
            if isinstance(chunk[0], str):
                arr = np.stack([load_eval_image(p, res) for p in chunk])
            else:
                arr = np.asarray(chunk)
            return {"vision": normalize_images(jnp.asarray(arr))}, len(chunk)

        return self._embed_chunks(n, chunk, mllm_captions, ids)

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
        def chunk(i):
            v, vm = arr[i: i + self.batch_size], m[i: i + self.batch_size]
            return ({"vision": jnp.asarray(v),
                     "vision_mask": jnp.asarray(vm)}, v.shape[0])

        return self._embed_chunks(n, chunk, mllm_captions, ids)

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
        if fusion != "none" and index.slots is None:
            raise ValueError(f"fusion={fusion!r} needs a slot-carrying "
                             "index (built by build_image_index/"
                             "build_video_index, or loaded from a save "
                             "that included slots.npy)")
        k = min(k, index.n_valid)
        n = len(queries)
        if n == 0:  # np.concatenate([]) on the sharded path would raise
            return []
        alpha = float(alpha)
        if index.mesh is not None:
            scores, idxs = self._search_sharded(queries, index, k, fusion,
                                                alpha)
            return [[(index.ids[j], float(s)) for j, s in zip(ri, rs)]
                    for ri, rs in zip(idxs, scores)]
        if n <= self.batch_size:
            # pad to batch_size: ONE static shape -> one compiled program
            # regardless of the incoming query count
            chunk = list(queries) + [""] * (self.batch_size - n)
            ids, mask = self.tokenizer.encode(
                chunk, self.cfg.data.max_tokens)
            if fusion == "none":
                scores, idxs = self._embed_and_topk(
                    self.params, ids, mask, index.feats, index.scale, k)
            else:
                valid = np.arange(self.batch_size) < n
                scores, idxs = self._embed_and_fused_topk(
                    self.params, ids, mask, index.feats, index.slots,
                    valid, index.scale, index.slot_scale, k, fusion, alpha)
            scores, idxs = np.asarray(scores)[:n], np.asarray(idxs)[:n]
        else:
            q = jnp.asarray(self.embed_texts(queries))
            if fusion == "none":
                scores, idxs = self._topk(q, index.feats, index.scale, k)
            else:
                valid = np.ones((q.shape[0],), bool)
                scores, idxs = self._fused_topk(
                    q, index.feats, index.slots, valid, index.scale,
                    index.slot_scale, k, fusion, alpha)
            scores, idxs = np.asarray(scores), np.asarray(idxs)
        return [[(index.ids[j], float(s)) for j, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idxs, scores)]

    def search_images(self, index: ImageIndex, texts: Sequence[str],
                      k: int = 10) -> List[List[Tuple[int, float]]]:
        """image → text retrieval over an embedded text corpus.  For an
        int8 index the similarity runs text-side (_feat_scores needs the
        quantized operand in index position) and transposes — same
        [N, T] score matrix either way."""
        t = jnp.asarray(self.embed_texts(texts))
        k = min(k, t.shape[0])
        if index.quantized:
            scores, idxs = self._qtopk_t(t, index.feats, index.scale, k)
        else:
            scores, idxs = self._topk(index.feats, t, None, k)
        # a row-sharded index is padded to a multiple of the shard count;
        # the pad rows sit at the END (shard_index appends), so slicing to
        # n_valid drops exactly them.  The jitted matmul itself partitions
        # over the sharded rows (top-k runs over the replicated text axis,
        # so no cross-shard merge is needed on this direction).
        scores = np.asarray(scores)[: index.n_valid]
        idxs = np.asarray(idxs)[: index.n_valid]
        return [[(int(j), float(s)) for j, s in zip(ri, rs)]
                for ri, rs in zip(idxs, scores)]
