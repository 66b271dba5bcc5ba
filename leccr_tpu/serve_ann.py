"""Approximate-NN serving: an IVF (inverted-file) index over retrieval
embeddings, built and searched on the TPU.

The reference scores every query against the FULL corpus (the eval ranker
materializes the whole N×M similarity matrix,
`image_Retrieval_caption.py:151-163`; it has no serving path at all).  Our
exact `serve.py` index keeps that semantics at 100k-1M rows by brute
matmul; past that, per-query cost grows linearly with the corpus.  This
module trades a little recall for a corpus-size-independent probe cost —
the standard IVF recipe (Johnson et al., "Billion-scale similarity search
with GPUs", re-designed TPU-first):

- **Spherical k-means on the MXU**: Lloyd iterations where the assignment
  step is one [N, E] × [E, C] matmul and the update step is one
  segment-sum — both ideal TPU shapes.  Centroids are re-L2-normalized
  every iteration (rows are L2-normalized, so cosine == dot).
- **Capacity-bounded packing, static shapes**: every cluster is padded to
  one fixed capacity (`capacity_factor` × the mean occupancy, ≥8-aligned),
  rows greedily placed into the fullest-preference cluster with space
  (strong-margin rows first).  The packed bank is a dense [C, cap, E]
  array + validity mask — no ragged lists, no dynamic shapes, so the
  whole search compiles to one XLA program.
- **Scan-over-probes search**: a query scores the C centroids (one small
  matmul), takes its top-`nprobe` clusters, and a `lax.scan` step gathers
  ONE [B, cap, E] cluster slab per probe and dots it against the query
  batch.  Peak memory is one slab, not nprobe of them; the full [B, N]
  score matrix never exists.
- **int8 option** (`quantize_ivf`): the packed bank stores symmetric
  per-row int8 (4× less HBM read per probe — probe cost is
  gather-bandwidth-bound) with the same dequant-in-epilogue contract as
  `serve.quantize_index`.

Probing all clusters (`nprobe == n_clusters`) is EXACT brute-force search
(every row is packed exactly once) — test-pinned against the dense
ranker, which anchors the recall/approximation dial to a ground truth.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leccr_tpu.serve import Embedder, ImageIndex, _quantize_rows


@dataclasses.dataclass
class IVFIndex:
    centroids: jax.Array      # [C, E] f32, L2-normalized
    packed: jax.Array         # [C, cap, E] f32 (or int8 after quantize_ivf)
    valid: jax.Array          # [C, cap] bool — pad slots are False
    rows: jax.Array           # [C, cap] int32 global row id (0 where pad)
    ids: List[str]            # global row id -> item id
    scale: Optional[jax.Array] = None  # [C, cap] f32 int8 dequant scales
    # searches with nprobe=None use this (calibrate_nprobe sets it;
    # persisted by save_ivf) — the index carries its own operating point
    default_nprobe: Optional[int] = None

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def capacity(self) -> int:
        return int(self.packed.shape[1])

    @property
    def n_valid(self) -> int:
        return len(self.ids)

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def _sim_block_rows(n: int, c: int) -> int:
    """Rows per assignment block: cap the live [blk, C] f32 similarity
    block at ~256 MiB so the full [N, C] matrix — 14.9 GiB at the 1M×4000
    production point, more than one chip's HBM — never exists."""
    blk = max(8, (256 << 20) // (4 * max(c, 1)))
    blk = min(blk, -(-n // 8) * 8)
    return -(-blk // 8) * 8


def _kmeans(feats: jax.Array, n_clusters: int, iters: int,
            seed: int) -> jax.Array:
    """Spherical k-means (Lloyd) on device.  Init = a random row sample.
    ALL iterations run inside one jitted fori_loop — one dispatch for the
    whole build (a per-iteration host sync costs a transport round trip
    each) — and each iteration streams the assignment as a scan over row
    blocks (`_sim_block_rows`), accumulating segment sums/counts so the
    [N, C] similarity never materializes.  A cluster that goes empty is
    reseeded in-graph to the rows FARTHEST from their assigned centroids
    (the classic split-the-worst heuristic), effective next iteration."""
    n, e = feats.shape
    rs = np.random.RandomState(seed)
    init = feats[jnp.asarray(rs.choice(n, n_clusters, replace=False))]
    blk = _sim_block_rows(n, n_clusters)
    nb = -(-n // blk)
    padded = nb * blk

    def run(cent, f, w):
        fb = f.reshape(nb, blk, e)
        wb = w.reshape(nb, blk)

        def body(_, cent):
            def blk_stats(carry, inp):
                sums, counts = carry
                fblk, wblk = inp
                sim = fblk @ cent.T                       # [blk, C]
                assign = jnp.argmax(sim, axis=1)
                # pad rows (w=0) score +inf so they sort LAST among
                # reseed candidates and weigh 0 in the update
                best = jnp.where(wblk > 0, jnp.max(sim, axis=1), jnp.inf)
                sums = sums + jax.ops.segment_sum(
                    fblk * wblk[:, None], assign, num_segments=n_clusters)
                counts = counts + jax.ops.segment_sum(
                    wblk, assign, num_segments=n_clusters)
                return (sums, counts), best

            (sums, counts), best = jax.lax.scan(
                blk_stats,
                (jnp.zeros((n_clusters, e), jnp.float32),
                 jnp.zeros((n_clusters,), jnp.float32)),
                (fb, wb))
            new = sums / jnp.maximum(counts[:, None], 1.0)
            norm = jnp.linalg.norm(new, axis=1, keepdims=True)
            new = new / jnp.maximum(norm, 1e-12)
            empty = counts == 0                           # [C]
            # k-th empty cluster <- k-th worst-fit row (erank is garbage
            # on non-empty entries; the where masks them).  top_k of the
            # negated fits: at most C reseeds are ever consumed, so the
            # full [padded] sort is waste (pads carry +inf fit -> they
            # can enter this candidate set only if C > N, impossible)
            worst = jax.lax.top_k(-best.reshape(padded), n_clusters)[1]
            erank = jnp.clip(jnp.cumsum(empty) - 1, 0, n_clusters - 1)
            reseed = jnp.take(f, jnp.take(worst, erank), axis=0)
            return jnp.where(empty[:, None], reseed, new)

        return jax.lax.fori_loop(0, max(1, iters), body, cent)

    f = jnp.pad(feats, ((0, padded - n), (0, 0)))
    w = (jnp.arange(padded) < n).astype(jnp.float32)
    return jax.jit(run)(init, f, w)


def _candidate_clusters(feats: jax.Array, cent: jax.Array,
                        p: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`p` candidate clusters per row, streamed: lax.map over row
    blocks keeps one [blk, C] similarity live at a time.  Returns
    (sims [N, p], cluster ids [N, p]) on host."""
    n = feats.shape[0]
    blk = _sim_block_rows(n, cent.shape[0])
    nb = -(-n // blk)
    fpad = jnp.pad(feats, ((0, nb * blk - n), (0, 0)))
    sims, cids = jax.jit(lambda f, ct: jax.lax.map(
        lambda fblk: jax.lax.top_k(fblk @ ct.T, p),
        f.reshape(nb, blk, -1)))(fpad, cent)
    return (np.asarray(sims).reshape(nb * blk, p)[:n],
            np.asarray(cids).reshape(nb * blk, p)[:n])


def _greedy_place(cids: np.ndarray, margin: np.ndarray, cap: int,
                  fill: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Capacity-bounded placement of N rows into clusters with free
    slots (mutates `fill` — pass existing occupancy to add to a built
    bank).  Vectorized round-based greedy: round j places every
    still-unplaced row into its rank-j candidate while space lasts
    (within a round, contested slots go to the rows with the strongest
    top1-top2 margin) — every row gets a shot at its TRUE nearest
    cluster before any row falls back to its second choice.  A row whose
    candidates all filled spills to the emptiest clusters; total free
    capacity ≥ N by the callers' invariants, so placement never fails.
    Pure numpy sorts — O(P · N log N) host time, no Python-per-row loop.
    Returns (cluster [N], slot [N]) per row."""
    c = fill.shape[0]
    n, p = cids.shape
    place_c = -np.ones(n, np.int64)
    place_s = -np.ones(n, np.int64)
    todo = np.argsort(-margin)  # row ids, strongest preference first
    for j in range(p):
        if not todo.size:
            break
        cand = cids[todo, j]
        order = np.argsort(cand, kind="stable")  # grouped, margin-ordered
        sc = cand[order]
        rank = np.arange(sc.size) - np.searchsorted(sc, np.arange(c))[sc]
        acc = rank < (cap - fill)[sc]
        rid = todo[order[acc]]
        place_c[rid] = sc[acc]
        place_s[rid] = fill[sc[acc]] + rank[acc]
        fill += np.bincount(sc[acc], minlength=c)
        keep = np.ones(todo.size, bool)
        keep[order[acc]] = False
        todo = todo[keep]
    if todo.size:  # spill to the emptiest clusters' free slots
        cl_order = np.argsort(fill)
        free = cap - fill
        slot_c = np.repeat(cl_order, free[cl_order])
        slot_p = np.concatenate(
            [np.arange(fill[cc], cap) for cc in cl_order if free[cc]]
            or [np.empty(0, np.int64)])
        m = todo.size
        place_c[todo] = slot_c[:m]
        place_s[todo] = slot_p[:m]
        fill += np.bincount(slot_c[:m], minlength=c)
    return place_c, place_s


def _pack(feats: jax.Array, cent: jax.Array, capacity_factor: float,
          candidates: int) -> Tuple[np.ndarray, int]:
    """Capacity-bounded assignment at build time.  Returns (rows
    [C, cap] int64 with -1 pads, cap)."""
    n = feats.shape[0]
    c = cent.shape[0]
    cap = int(np.ceil(n / c * capacity_factor))
    cap = max(8, -(-cap // 8) * 8)  # sublane-aligned [*, cap, E] layout
    p = min(candidates, c)
    sims, cids = _candidate_clusters(feats, cent, p)
    margin = sims[:, 0] - (sims[:, 1] if p > 1 else 0.0)
    place_c, place_s = _greedy_place(cids, margin, cap,
                                     np.zeros(c, np.int64))
    rows = -np.ones((c, cap), np.int64)
    rows[place_c, place_s] = np.arange(n)
    return rows, cap


def build_ivf_index(index: ImageIndex, n_clusters: Optional[int] = None,
                    iters: int = 15, capacity_factor: float = 1.3,
                    candidates: int = 8, seed: int = 0) -> IVFIndex:
    """Cluster an exact index into an IVF index.  Defaults: C ≈ 4·√N
    (probe cost balances centroid-scan cost at nprobe ≈ √N/4·cap reads),
    15 Lloyd iterations.  Build from the fp32 index; `quantize_ivf`
    afterward for the int8 bank.  Unsharded single-device layout (an IVF
    probe reads nprobe·cap rows — a corpus whose IVF bank exceeds one
    chip's HBM should shard the EXACT index instead, serve.shard_index)."""
    if index.mesh is not None:
        raise ValueError("build_ivf_index from the unsharded index")
    if index.quantized:
        raise ValueError("build_ivf_index from the fp32 index "
                         "(quantize_ivf afterward)")
    n = index.n_valid
    if n_clusters is None:
        n_clusters = max(1, min(n, int(4 * np.sqrt(n))))
    if not 1 <= n_clusters <= n:
        raise ValueError(f"n_clusters={n_clusters} not in [1, {n}]")
    if capacity_factor < 1.0:
        raise ValueError(  # _pack's never-fails invariant needs cap·C ≥ N
            f"capacity_factor={capacity_factor} must be >= 1")
    feats = index.feats[:n].astype(jnp.float32)
    import time as _time

    t0 = _time.time()
    cent = _kmeans(feats, n_clusters, iters, seed)
    jax.block_until_ready(cent)
    t1 = _time.time()
    rows, cap = _pack(feats, cent, capacity_factor, candidates)
    t2 = _time.time()
    if t2 - t0 > 30:  # surface the build breakdown at production scale
        print(f"[serve_ann] kmeans {t1 - t0:.1f}s "
              f"pack {t2 - t1:.1f}s (N={n}, C={n_clusters})", flush=True)
    rj = jnp.asarray(np.maximum(rows, 0), jnp.int32)
    packed = jax.jit(lambda f, r: jnp.take(f, r, axis=0))(feats, rj)
    return IVFIndex(centroids=cent, packed=packed,
                    valid=jnp.asarray(rows >= 0), rows=rj,
                    ids=list(index.ids))


def quantize_ivf(ivf: IVFIndex) -> IVFIndex:
    """Symmetric per-row int8 over the packed bank (same scheme/accuracy
    contract as serve.quantize_index: rows are L2-normalized, ordering
    preserved to ~1e-3).  Probe reads drop 4×; the per-probe dot runs
    int8×int8 on the MXU."""
    if ivf.quantized:
        return ivf
    c, cap, e = ivf.packed.shape

    @jax.jit
    def q(x):
        qx, s = _quantize_rows(x.reshape(c * cap, e))
        return qx.reshape(c, cap, e), s.reshape(c, cap)

    packed, scale = q(ivf.packed)
    return IVFIndex(centroids=ivf.centroids, packed=packed,
                    valid=ivf.valid, rows=ivf.rows, ids=list(ivf.ids),
                    scale=scale, default_nprobe=ivf.default_nprobe)


def add_to_ivf(ivf: IVFIndex, new: ImageIndex,
               candidates: int = 8) -> IVFIndex:
    """Incremental IVF maintenance: append a built exact index's items
    (`build_image_index`/`build_video_index` the NEW items only, then
    add — nothing existing is re-embedded or re-clustered).  Mirrors
    `serve.merge_indexes` for the approximate family.

    Each new row lands in its nearest candidate cluster with free
    capacity (same greedy placement as build time, seeded with the
    bank's current occupancy; spill to the emptiest clusters if its
    candidates are full); when the bank itself is full, the shared
    capacity grows (8-aligned) so placement never fails.  Existing rows
    keep their bytes bit-for-bit — int8 dequant scales are per-row, so
    adding to a quantized index is exact; new rows are quantized with
    the same per-row scheme on the way in.

    RELIES on the bank-wide prefix-occupancy invariant: every cluster's
    valid slots are exactly [0, fill) with fill == valid.sum(axis=1) —
    new rows are written at slots fill..fill+count-1 and would clobber
    live rows if holes existed mid-prefix.  `build_ivf_index` packs that
    way and `remove_from_ivf` compacts to preserve it, so every
    reachable IVFIndex satisfies it.

    Centroids are NOT re-fit: recall at a fixed nprobe degrades slowly
    as the add fraction grows (new rows still pack under their true
    nearest centroid, but the partition no longer reflects them).  After
    adds comparable to the original corpus size, rebuild — and
    re-run `calibrate_nprobe` either way if the operating point
    matters."""
    if new.mesh is not None:
        raise ValueError("add_to_ivf from an unsharded index")
    if new.quantized:
        raise ValueError("add_to_ivf from the fp32 index (new rows are "
                         "quantized on the way in when the bank is int8)")
    dup = set(ivf.ids) & set(new.ids)
    if dup:
        raise ValueError(f"duplicate ids in add: {sorted(dup)[:5]} ...")
    n_new = new.n_valid
    if n_new == 0:
        return ivf
    c, cap = ivf.n_clusters, ivf.capacity
    feats = new.feats[:n_new].astype(jnp.float32)
    fill = np.asarray(ivf.valid).sum(axis=1).astype(np.int64)
    packed, vmask, rows, scale = ivf.packed, ivf.valid, ivf.rows, ivf.scale
    free = c * cap - int(fill.sum())
    if free < n_new:  # grow every cluster's capacity, 8-aligned
        grow = -(-(n_new - free) // c)  # ceil: extra slots per cluster
        grow = -(-grow // 8) * 8        # keep cap sublane-aligned
        packed = jnp.pad(packed, ((0, 0), (0, grow), (0, 0)))
        vmask = jnp.pad(vmask, ((0, 0), (0, grow)))
        rows = jnp.pad(rows, ((0, 0), (0, grow)))
        if scale is not None:
            scale = jnp.pad(scale, ((0, 0), (0, grow)))
        cap += grow
    p = min(candidates, c)
    sims, cids = _candidate_clusters(feats, ivf.centroids, p)
    margin = sims[:, 0] - (sims[:, 1] if p > 1 else 0.0)
    place_c, place_s = _greedy_place(cids, margin, cap, fill)
    pc = jnp.asarray(place_c, jnp.int32)
    ps = jnp.asarray(place_s, jnp.int32)
    if ivf.quantized:
        qnew, snew = jax.jit(_quantize_rows)(feats)
        packed = packed.at[pc, ps].set(qnew)
        scale = scale.at[pc, ps].set(snew)
    else:
        packed = packed.at[pc, ps].set(feats)
    gids = len(ivf.ids) + jnp.arange(n_new, dtype=jnp.int32)
    return IVFIndex(centroids=ivf.centroids, packed=packed,
                    valid=vmask.at[pc, ps].set(True),
                    rows=rows.at[pc, ps].set(gids),
                    ids=list(ivf.ids) + list(new.ids), scale=scale,
                    default_nprobe=ivf.default_nprobe)


def remove_from_ivf(ivf: IVFIndex, ids: Sequence[str]) -> IVFIndex:
    """Drop items by id without re-clustering: surviving rows renumber so
    global row ids stay dense (the ids list compacts), and each cluster's
    survivors COMPACT down to a slot prefix — the bank-wide invariant
    that every cluster's valid slots occupy [0, fill) with fill ==
    valid.sum().  `add_to_ivf`/`_greedy_place` rely on that invariant
    (new rows are written at slot indices fill..fill+count-1); masking
    slots invalid in place without compacting would leave holes that a
    later add silently overwrites.  Compaction permutes slots WITHIN a
    cluster only: each surviving row keeps its cluster and its exact
    packed bytes (per-row int8 dequant scales move with their row), so
    removal stays exact on quantized banks too.  Unknown ids are an
    error.  Mirrors `serve.remove_from_index` for the approximate
    family."""
    drop = set(ids)
    unknown = drop - set(ivf.ids)
    if unknown:
        raise ValueError(f"unknown ids: {sorted(unknown)[:5]} ...")
    if not drop:
        return ivf
    keep = np.asarray([i not in drop for i in ivf.ids])
    new_gid = np.cumsum(keep) - 1  # meaningful only where keep
    rows = np.asarray(ivf.rows)
    valid = np.asarray(ivf.valid) & keep[rows]
    # per-cluster compaction: stable-sort slots by ~valid so survivors
    # slide to a prefix in their original order and holes sink to the
    # tail.  One gather per array on device — the [C, cap, E] bank is
    # permuted without staging it through the host.
    order = np.argsort(~valid, axis=1, kind="stable")       # [C, cap]
    oj = jnp.asarray(order)
    packed = jax.jit(
        lambda p, o: jnp.take_along_axis(p, o[:, :, None], axis=1)
    )(ivf.packed, oj)
    scale = None if ivf.scale is None else jax.jit(
        lambda s, o: jnp.take_along_axis(s, o, axis=1))(ivf.scale, oj)
    rows_c = np.take_along_axis(
        np.where(valid, new_gid[rows], 0), order, axis=1)
    return IVFIndex(centroids=ivf.centroids, packed=packed,
                    valid=jnp.asarray(np.take_along_axis(valid, order,
                                                         axis=1)),
                    rows=jnp.asarray(rows_c.astype(np.int32)),
                    ids=[i for i in ivf.ids if i not in drop],
                    scale=scale, default_nprobe=ivf.default_nprobe)


def _ivf_topk(q: jax.Array, ivf_arrays, k: int, nprobe: int):
    """[B, E] queries → (scores [B, k], global row ids [B, k]).  One
    centroid matmul, then a scan over the nprobe probe positions: each
    step gathers ONE [B, cap, E] cluster slab and dots it against the
    query batch — peak live memory is a single slab regardless of nprobe.
    Traced under jit with k/nprobe static."""
    cent, packed, valid, rows, scale = ivf_arrays
    cap = packed.shape[1]
    csim = q @ cent.T                                         # [B, C]
    _, cids = jax.lax.top_k(csim, nprobe)                     # [B, nprobe]
    if scale is not None:
        qq, qs = _quantize_rows(q)

    def step(_, cid_col):                                     # cid_col [B]
        f = jnp.take(packed, cid_col, axis=0)                 # [B, cap, E]
        r = jnp.take(rows, cid_col, axis=0)                   # [B, cap]
        v = jnp.take(valid, cid_col, axis=0)
        if scale is None:
            s = jnp.einsum("bce,be->bc", f, q)
        else:
            s = jnp.einsum("bce,be->bc", f, qq,
                           preferred_element_type=jnp.int32)
            s = (s.astype(jnp.float32) * qs[:, None]
                 * jnp.take(scale, cid_col, axis=0))
        # a probed cluster can still hold pad slots (capacity padding)
        s = jnp.where(v, s, -jnp.inf)
        return None, (s, r)

    _, (s_all, r_all) = jax.lax.scan(step, None, cids.T)
    # [nprobe, B, cap] -> [B, nprobe*cap]
    s_all = jnp.transpose(s_all, (1, 0, 2)).reshape(q.shape[0], -1)
    r_all = jnp.transpose(r_all, (1, 0, 2)).reshape(q.shape[0], -1)
    vals, pos = jax.lax.top_k(s_all, k)
    return vals, jnp.take_along_axis(r_all, pos, axis=1)


def calibrate_nprobe(ivf: IVFIndex, target_recall: float = 0.95,
                     k: int = 10, sample: int = 256,
                     seed: int = 0) -> Tuple[int, float]:
    """Smallest nprobe whose recall@k ≥ target_recall, measured on
    `sample` corpus rows used as self-queries against the index's own
    full probe (exact — every row is packed once), with the trivial
    self-hit excluded from the ground truth.  Per-query probe sets are
    NESTED in nprobe (top-nprobe clusters are a prefix of top-2nprobe),
    so measured recall is monotone and a doubling ladder + binary refine
    finds the exact threshold on the sample.  Returns (nprobe, recall);
    stamp it with `dataclasses.replace(ivf, default_nprobe=n)` or let
    run.py --task build_index --ivf_recall do both.  Runs on the bank as
    deployed: calibrating the int8 index measures int8 scoring."""
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall={target_recall} not in (0, 1]")
    c = ivf.n_clusters
    rs = np.random.RandomState(seed)
    valid = np.asarray(ivf.valid)
    ci, si = np.nonzero(valid)
    pick = rs.choice(ci.size, min(sample, ci.size), replace=False)
    ci, si = ci[pick], si[pick]
    packed = np.asarray(ivf.packed)[ci, si].astype(np.float32)
    if ivf.scale is not None:
        packed *= np.asarray(ivf.scale)[ci, si][:, None]
    q = jnp.asarray(packed)
    self_ids = np.asarray(ivf.rows)[ci, si]
    arrays = (ivf.centroids, ivf.packed, ivf.valid, ivf.rows, ivf.scale)
    kk = min(k + 1, ivf.n_valid)  # +1 absorbs the self-hit

    def ids_at(nprobe):
        f = jax.jit(_ivf_topk, static_argnums=(2, 3))
        return np.asarray(f(q, arrays, kk, nprobe)[1])

    gt = [set(r[r != s][:k]) or {s} for r, s in zip(ids_at(c), self_ids)]

    def recall(nprobe):
        got = ids_at(nprobe)
        return float(np.mean([len(set(r[r != s][:k]) & g) / len(g)
                              for r, s, g in zip(got, self_ids, gt)]))

    lo, hi, r_hi = 0, 1, recall(1)  # invariant: lo fails, hi passes
    while r_hi < target_recall and hi < c:
        lo, hi = hi, min(2 * hi, c)
        r_hi = recall(hi)
    if r_hi < target_recall:  # even the exact probe missed (ties): C
        return c, r_hi
    while hi - lo > 1:  # recall is monotone (nested probe prefixes)
        mid = (lo + hi) // 2
        r_mid = recall(mid)
        if r_mid >= target_recall:
            hi, r_hi = mid, r_mid
        else:
            lo = mid
    return hi, r_hi


def _search_prog(emb: Embedder, k: int, nprobe: int, quant: bool):
    """One compiled tokenized-queries → embed → IVF top-k program per
    (k, nprobe, layout) — the same single-dispatch contract as the exact
    path (each extra dispatch is a transport round trip)."""
    cache: Dict[tuple, object] = getattr(emb, "_ivf_progs", None)
    if cache is None:
        cache = emb._ivf_progs = {}
    key = (k, nprobe, quant)
    prog = cache.get(key)
    if prog is None:
        def run(params, tids, mask, cent, packed, valid, rows, scale):
            q = emb.model.apply({"params": params}, tids, mask,
                                method="embed_texts")
            return _ivf_topk(q, (cent, packed, valid, rows, scale),
                             k, nprobe)

        prog = jax.jit(run)
        cache[key] = prog
    return prog


def search_texts_ivf(emb: Embedder, queries: Sequence[str], ivf: IVFIndex,
                     k: int = 10, nprobe: Optional[int] = None,
                     ) -> List[List[Tuple[str, float]]]:
    """text → item retrieval over an IVF index: top-k (id, score) per
    query, scoring only the nprobe most-promising clusters.  nprobe dials
    recall vs cost (default: the index's calibrated default_nprobe if
    set, else min(8, C)); nprobe == ivf.n_clusters is
    exact.  A row may come back SHORTER than k: the candidate pool is
    nprobe·capacity, and probed clusters can hold fewer than k live rows
    between them (pad slots score -inf and are dropped host-side rather
    than surfaced as bogus row-0 aliases) — raise nprobe for more."""
    if nprobe is None:
        nprobe = ivf.default_nprobe or min(8, ivf.n_clusters)
    if not 1 <= nprobe <= ivf.n_clusters:
        raise ValueError(f"nprobe={nprobe} not in [1, {ivf.n_clusters}]")
    k = min(k, ivf.n_valid, nprobe * ivf.capacity)
    if not queries:
        return []
    prog = _search_prog(emb, k, nprobe, ivf.quantized)
    bs = emb.batch_size
    out: List[List[Tuple[str, float]]] = []
    for i in range(0, len(queries), bs):
        chunk = list(queries[i: i + bs])
        n = len(chunk)
        chunk += [""] * (bs - n)
        tids, mask = emb.tokenizer.encode(chunk, emb.cfg.data.max_tokens)
        scores, gids = prog(emb.params, tids, mask, ivf.centroids,
                            ivf.packed, ivf.valid, ivf.rows, ivf.scale)
        scores, gids = np.asarray(scores)[:n], np.asarray(gids)[:n]
        out.extend([(ivf.ids[j], float(s))
                    for j, s in zip(ri, rs) if np.isfinite(s)]
                   for ri, rs in zip(gids, scores))
    return out


_IVF_ARRAYS = ("centroids", "packed", "valid", "rows", "scale")


def save_ivf(ivf: IVFIndex, path: str) -> None:
    """Persist an IVF index (directory; hdfs:// transparent) — cluster
    once, serve many restarts.  Shares the staging + stale-optional-file
    manifest contract with serve.save_index (serve._write_array_save)."""
    from leccr_tpu.serve import _staged_save_dir, _write_array_save

    with _staged_save_dir(path, "leccr_ivf_") as local:
        _write_array_save(
            local, {},
            {name: None if getattr(ivf, name) is None
             else np.asarray(getattr(ivf, name)) for name in _IVF_ARRAYS},
            ivf.ids,
            {"kind": "ivf", **({"nprobe": ivf.default_nprobe}
                               if ivf.default_nprobe else {})})


def is_ivf_save(path: str) -> bool:
    """True if `path` holds an IVF save (save_ivf) rather than an exact
    one (serve.save_index) — lets consumers (run.py --task serve) load a
    directory without knowing how it was built.  hdfs:// transparent."""
    from leccr_tpu.utils import io

    mpath = os.path.join(path, "manifest.json")
    if not io.exists(mpath):
        return False
    with io.open_file(mpath) as f:
        return json.load(f).get("kind") == "ivf"


def load_ivf(path: str) -> IVFIndex:
    from leccr_tpu.serve import _staged_load_dir

    with _staged_load_dir(path, "leccr_ivf_") as local:
        with open(os.path.join(local, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("kind") != "ivf":
            raise ValueError(f"{path} is not an IVF index save")
        allowed = set(manifest["optional"])
        with open(os.path.join(local, "ids.json")) as f:
            ids = json.load(f)

        def arr(name):
            if name not in allowed:
                return None
            return jax.device_put(np.load(os.path.join(local,
                                                       name + ".npy")))

        ivf = IVFIndex(centroids=arr("centroids"), packed=arr("packed"),
                       valid=arr("valid"), rows=arr("rows"),
                       ids=list(ids), scale=arr("scale"),
                       default_nprobe=manifest.get("nprobe"))
    if len(ivf.ids) != manifest["n"]:
        raise ValueError(f"ivf index corrupt: {len(ivf.ids)} ids vs "
                         f"manifest n={manifest['n']}")
    return ivf
