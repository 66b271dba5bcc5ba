"""Input pipeline: deterministic sharded sampling, offline tokenization,
bucketed static shapes, threaded decode, device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler + per-step
host tokenization stack (dataset/__init__.py:179-212,
image_Retrieval_caption.py:42-61) with a TPU-friendly design:

- texts and MLLM captions are tokenized ONCE at construction (the reference
  re-tokenizes on every step on the training critical path — SURVEY.md §3.2
  flags this as a host bottleneck);
- batches are padded to a small set of bucket widths (config.token_buckets)
  so the jitted train step compiles at most len(buckets) times — the
  reference pads to the per-batch longest which would recompile endlessly
  under XLA;
- the global shuffle is a seeded permutation of the full index set, sharded
  deterministically across processes (DistributedSampler parity: equal
  per-process counts, drop_last for training);
- image decode/augment runs in a thread pool; normalization happens on
  device (leccr_tpu.data.images.normalize_images).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Sequence

import numpy as np

from leccr_tpu.config import DataConfig


def shard_indices(
    n: int,
    epoch: int,
    seed: int,
    process_count: int = 1,
    process_index: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
) -> np.ndarray:
    """Deterministic global permutation, sharded per process (parity with
    torch DistributedSampler: pad-to-even when not dropping)."""
    order = np.arange(n)
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    if drop_last:
        per = n // process_count
        order = order[: per * process_count]
    else:
        per = -(-n // process_count)
        pad = per * process_count - n
        if pad:
            order = np.concatenate([order, order[:pad]])
    return order[process_index::process_count]


def bucket_width(lengths: Sequence[int], buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ the longest sequence (clamped to the largest)."""
    need = max(lengths)
    for b in sorted(buckets):
        if b >= need:
            return b
    return sorted(buckets)[-1]


def pad_token_batch(
    token_lists: Sequence[Sequence[int]], width: int, pad_id: int = 0
):
    ids = np.full((len(token_lists), width), pad_id, np.int32)
    mask = np.zeros((len(token_lists), width), np.int32)
    for i, toks in enumerate(token_lists):
        toks = list(toks)[:width]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = 1
    return ids, mask


class TrainLoader:
    """Epoch iterator over fixed-shape numpy batches for the jitted step.

    Yields dicts with keys matching LECCRModel.__call__'s batch contract plus
    `idx` ([B] int32) and `flip` ([B] bool, image datasets)."""

    def __init__(
        self,
        dataset,
        tokenizer,
        cfg: DataConfig,
        batch_size: int,
        process_count: int = 1,
        process_index: int = 0,
        num_workers: int = 4,
        caption_tokenizer=None,
        prefetch: int = 2,
    ):
        assert batch_size % max(process_count, 1) == 0
        self.dataset = dataset
        self.cfg = cfg
        self.local_batch = batch_size // max(process_count, 1)
        self.process_count = process_count
        self.process_index = process_index
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.tokenizer = tokenizer
        self.caption_tokenizer = caption_tokenizer or tokenizer
        self._tokenize_all()

    def _batch_tokenize(self, texts: List[str]) -> List[List[int]]:
        """Tokenize a text list to unpadded id rows, preferring the native
        C++ batch tokenizer (native/wordpiece.cpp) when available."""
        max_len = self.cfg.max_tokens
        enc = self._native if self._native is not None else self.tokenizer
        ids, mask = enc.encode(texts, max_len)
        return [row[: int(m.sum())].tolist() for row, m in zip(ids, mask)]

    def _tokenize_all(self) -> None:
        """Offline tokenization of every (sample, language) text and every
        MLLM caption."""
        ds = self.dataset
        n_lang = len(ds.caption_maps)
        self._native = None
        try:
            from leccr_tpu.data.native_tokenizer import (
                NativeUnigramTokenizer,
                NativeWordPieceTokenizer,
            )
            from leccr_tpu.data.tokenizers import (
                UnigramTokenizer,
                WordPieceTokenizer,
            )

            if isinstance(self.tokenizer, WordPieceTokenizer):
                self._native = NativeWordPieceTokenizer(
                    self.tokenizer.vocab_file,
                    lowercase=self.tokenizer.lowercase,
                    strip_accents=self.tokenizer.strip_accents)
            elif isinstance(self.tokenizer, UnigramTokenizer):
                self._native = NativeUnigramTokenizer(self.tokenizer)
        except Exception:
            self._native = None
        self.text_tokens: List[List[List[int]]] = [
            [None] * len(ds) for _ in range(n_lang)]
        cap = {}
        max_len = self.cfg.max_tokens
        if self.cfg.generated_caption_type == "feats":
            # fixed width across the dataset -> no per-batch recompiles
            self._feats_max_t = max(
                np.asarray(v).shape[0] for v in ds.generated.values())
        from leccr_tpu.data.text import normalize_caption, video_id_of
        for k, cmap in enumerate(ds.caption_maps):
            texts = []
            for i in range(len(ds)):
                cap_id = ds.cap_ids[i]
                key = cap_id if k == 0 else cap_id.replace(
                    "#enc#", f"#enc2{ds.languages[k - 1]}#")
                texts.append(normalize_caption(cmap[key], self.cfg.max_words))
            self.text_tokens[k] = self._batch_tokenize(texts)
        if self.cfg.generated_caption_type != "feats":
            # ONE batch encode over the unique images (MSCOCO has ~123k;
            # per-text encode() calls pay numpy/tokenizer setup each time)
            uniq: List[str] = []
            seen = set()
            for cap_id in ds.cap_ids:
                image_id = video_id_of(cap_id)
                if image_id not in seen:
                    seen.add(image_id)
                    uniq.append(image_id)
            texts = [ds.generated[i] for i in uniq]
            if hasattr(self.caption_tokenizer, "cls_id"):
                # WordPiece / Unigram: cls…sep, unpadded rows (native C++
                # encoder when the caption tokenizer is the text tokenizer)
                cap_enc = (self._native
                           if (self._native is not None
                               and self.caption_tokenizer is self.tokenizer)
                           else self.caption_tokenizer)
                ids, mask = cap_enc.encode(texts, max_len)
                for image_id, row, m in zip(uniq, ids, mask):
                    cap[image_id] = row[: int(m.sum())].tolist()
            else:  # CLIP BPE: fixed 77-wide, pad id 0
                rows = self.caption_tokenizer.encode(texts)
                for image_id, row in zip(uniq, rows):
                    cap[image_id] = list(row)
        self.caption_tokens = cap

    def steps_per_epoch(self) -> int:
        per = len(self.dataset) // (self.local_batch * self.process_count)
        return per

    def epoch(self, epoch: int,
              start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """start_step skips the epoch's first batches (exact mid-epoch
        resume: the skipped batches were already consumed before the
        snapshot; the permutation is deterministic per epoch)."""
        idxs = shard_indices(
            len(self.dataset), epoch, self.cfg.seed, self.process_count,
            self.process_index, shuffle=True, drop_last=True)
        nb = len(idxs) // self.local_batch
        idxs = idxs[: nb * self.local_batch].reshape(nb, self.local_batch)
        if start_step:
            idxs = idxs[start_step:]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for step, batch_idx in enumerate(idxs):
                    if stop.is_set():
                        return
                    rngs = [np.random.RandomState(
                        (self.cfg.seed * 1000003 + epoch * 10007 + int(i))
                        % (2 ** 31)) for i in batch_idx]
                    samples = list(pool.map(
                        lambda a: self.dataset.get(int(a[0]), a[1]),
                        zip(batch_idx, rngs)))
                    out_q.put(self._collate(batch_idx, samples, step))
            out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()

    def _collate(self, batch_idx, samples, step: int = 0
                 ) -> Dict[str, np.ndarray]:
        buckets = self.cfg.token_buckets
        cap_bpe = not hasattr(self.caption_tokenizer, "cls_id")

        # multiple translated-target files (full-multilingual training,
        # BASELINE.json config #3): round-robin the target language per
        # batch.  With the reference's 2-file configs this is always file 1.
        n_lang = len(self.text_tokens)
        k_t = 1 + (step % (n_lang - 1)) if n_lang > 1 else 0
        toks_s = [self.text_tokens[0][int(i)] for i in batch_idx]
        toks_t = [self.text_tokens[k_t][int(i)] for i in batch_idx]
        width = bucket_width(
            [len(t) for t in toks_s] + [len(t) for t in toks_t], buckets)
        ids_s, mask_s = pad_token_batch(toks_s, width)
        ids_t, mask_t = pad_token_batch(toks_t, width)

        batch: Dict[str, np.ndarray] = {
            "text_ids_s": ids_s, "text_mask_s": mask_s,
            "text_ids_t": ids_t, "text_mask_t": mask_t,
            "idx": np.asarray([s.idx for s in samples], np.int32),
        }

        if self.cfg.generated_caption_type == "feats":
            feats = [np.asarray(s.caption, np.float32) for s in samples]
            t = self._feats_max_t  # dataset-global width: static shapes
            arr = np.zeros((len(feats), t, feats[0].shape[1]), np.float32)
            msk = np.zeros((len(feats), t), np.int32)
            for i, f in enumerate(feats):
                arr[i, : f.shape[0]] = f
                msk[i, : f.shape[0]] = 1
            batch["caption_feats"] = arr
            batch["caption_mask"] = msk
        else:
            from leccr_tpu.data.text import video_id_of
            caps = [self.caption_tokens[video_id_of(s.cap_id)]
                    for s in samples]
            if cap_bpe:
                cw = self.caption_tokenizer.context_length
                cap_ids = np.zeros((len(caps), cw), np.int32)
                for i, c in enumerate(caps):
                    cap_ids[i, : len(c)] = c
                batch["caption_ids"] = cap_ids
                batch["caption_mask"] = (cap_ids != 0).astype(np.int32)
            else:
                cwidth = bucket_width([len(c) for c in caps], buckets)
                cap_ids, cap_mask = pad_token_batch(caps, cwidth)
                batch["caption_ids"] = cap_ids
                batch["caption_mask"] = cap_mask

        if samples[0].image_u8 is not None:
            batch["vision"] = np.stack([s.image_u8 for s in samples])
            batch["flip"] = np.asarray([s.flip for s in samples], bool)
        else:
            batch["vision"] = np.stack([s.frames for s in samples])
            batch["vision_mask"] = np.stack([s.frame_mask for s in samples])
        return batch


def device_prefetch(iterator, sharding, depth: int = 2):
    """Wrap a host-batch iterator so the next `depth` batches are copied to
    device (sharded) on a background thread while the current step computes —
    transfer rides under compute instead of serializing with it."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    from leccr_tpu.parallel.mesh import host_local_to_global

    def worker():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(jax.tree.map(
                    lambda x: host_local_to_global(x, sharding), batch))
        finally:
            q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()


class EvalLoader:
    """Eval batches: text chunks (padded to max_tokens, reference
    image_Retrieval_caption.py:105) and image/caption batches padded to a
    fixed batch size (static shapes; surplus rows are sliced off after the
    forward).

    Multi-host: each process materializes only the contiguous slice of every
    global batch that lands on its addressable devices under a
    ``P('data')`` sharding (decode/tokenize cost drops by 1/process_count);
    the trainer reassembles via `host_local_to_global`.  Yielded counts are
    GLOBAL row counts."""

    def __init__(self, dataset, tokenizer, cfg: DataConfig, batch_size: int,
                 text_batch_size: int, caption_tokenizer=None,
                 num_workers: int = 4, process_count: int = 1,
                 process_index: int = 0):
        assert batch_size % max(process_count, 1) == 0
        assert text_batch_size % max(process_count, 1) == 0
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.caption_tokenizer = caption_tokenizer or tokenizer
        self.cfg = cfg
        self.batch_size = batch_size
        self.text_batch_size = text_batch_size
        self.num_workers = max(1, num_workers)
        self.process_count = max(process_count, 1)
        self.process_index = process_index

    def _local_slice(self, global_width: int) -> slice:
        """This process's contiguous rows of a padded global batch (mesh
        device order is process-major, so P('data') shards are contiguous
        per process)."""
        per = global_width // self.process_count
        return slice(self.process_index * per, (self.process_index + 1) * per)

    def text_batches(self):
        """Eval texts at a bucketed static width: the reference pads every
        eval text to max_tokens (image_…py:104 'max_length' padding — 200
        for Multi30K whose captions are ~30 tokens); here the whole split
        is tokenized once and padded to the smallest token bucket covering
        its longest sequence — one compile, ~6x less text-tower compute on
        real data."""
        texts = self.dataset.texts
        loc = self._local_slice(self.text_batch_size)
        # the split is fixed: tokenize it once and cache on the dataset
        # (every process needs the full split anyway — the bucketed width
        # must be agreed globally for host_local_to_global batches)
        cache = getattr(self.dataset, "_tok_cache", None)
        if cache is None:
            ids_all, mask_all = self.tokenizer.encode(
                list(texts), self.cfg.max_tokens)
            longest = int(mask_all.sum(axis=1).max()) if len(texts) else 1
            width = next((b for b in sorted(self.cfg.token_buckets)
                          if b >= longest), self.cfg.max_tokens)
            ids_all = ids_all[:, :width]
            mask_all = mask_all[:, :width]
            self.dataset._tok_cache = (ids_all, mask_all)
        else:
            ids_all, mask_all = cache
        pad_rows = (-len(texts)) % self.text_batch_size
        if pad_rows:
            ids_all = np.pad(ids_all, ((0, pad_rows), (0, 0)))
            mask_all = np.pad(mask_all, ((0, pad_rows), (0, 0)))
        for i in range(0, len(texts), self.text_batch_size):
            n = min(self.text_batch_size, len(texts) - i)
            block = slice(i, i + self.text_batch_size)
            yield ids_all[block][loc], mask_all[block][loc], n

    def image_batches(self):
        n = len(self.dataset)
        cap_bpe = not hasattr(self.caption_tokenizer, "cls_id")
        loc = self._local_slice(self.batch_size)
        feats_width = 0
        if self.cfg.generated_caption_type == "feats":
            # dataset-global width: computed ONCE (it is an O(N) scan over
            # every generated feat) so batches keep static shapes without
            # re-scanning per batch
            feats_width = max(
                np.asarray(v).shape[0]
                for v in self.dataset.generated.values())
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, n, self.batch_size):
                stop = min(start + self.batch_size, n)
                count = stop - start
                rows = list(range(start, stop))
                rows += [rows[-1]] * (self.batch_size - count)
                items = list(pool.map(self.dataset.get, rows[loc]))
                vision = [it[0] for it in items]
                caps = [it[1] for it in items]
                batch: Dict[str, np.ndarray] = {}
                if isinstance(vision[0], tuple):  # video (frames, mask)
                    batch["vision"] = np.stack([v[0] for v in vision])
                    batch["vision_mask"] = np.stack([v[1] for v in vision])
                else:
                    batch["vision"] = np.stack(vision)
                if self.cfg.generated_caption_type == "feats":
                    t = feats_width
                    d = np.asarray(caps[0]).shape[1]
                    arr = np.zeros((len(caps), t, d), np.float32)
                    msk = np.zeros((len(caps), t), np.int32)
                    for i, c in enumerate(caps):
                        c = np.asarray(c, np.float32)
                        arr[i, : c.shape[0]] = c
                        msk[i, : c.shape[0]] = 1
                    batch["caption_feats"] = arr
                    batch["caption_mask"] = msk
                elif cap_bpe:
                    cap_ids = self.caption_tokenizer.encode(caps)
                    batch["caption_ids"] = cap_ids
                    batch["caption_mask"] = (cap_ids != 0).astype(np.int32)
                else:
                    ids, mask = self.caption_tokenizer.encode(
                        caps, self.cfg.max_tokens)
                    batch["caption_ids"] = ids
                    batch["caption_mask"] = mask
                yield batch, count
