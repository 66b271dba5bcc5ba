"""Fused tower attention (training) as a Pallas TPU kernel.

The tower sequences are short (text ≤ 200 tokens, vision 145), so one
(batch) program holds the whole [H, L, L] score tile in VMEM and fuses
QKᵀ → padding mask → softmax → dropout → PV in a single HBM round trip.
What this buys over the XLA lowering at training time (measured on the
bs128 flagship step): no [B, H, L, L] probability tensors or dropout masks
ever reach HBM — those residuals (u32 bits + bf16 probs per layer) were
large enough to push XLA into whole-block rematerialization.

Dropout runs on the TPU hardware RNG inside the kernel
(pltpu.prng_seed/prng_random_bits), seeded per (program, layer-seed); the
backward kernel re-seeds identically and regenerates the same mask instead
of storing it.  The backward recomputes scores flash-style from q/k plus
the saved per-row logsumexp.

Semantics match the tower attention in models/bert.py (softmax in f32,
inverted-scale dropout on the probabilities; reference torch semantics via
nn.MultiheadAttention/HF BertSelfAttention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)

# single-block kernel: one program holds q/k/v + the [H, Lq, Lk] score,
# prob and (bwd) dP tiles in VMEM.  ~16 MiB VMEM per core on v5e; leave
# headroom for pipelining.
_VMEM_BUDGET = 10 * 2 ** 20


def fits_vmem(h: int, lq: int, lk: int, d: int) -> bool:
    """Whether the single-block kernel's working set fits VMEM (the towers
    fall back to the XLA attention otherwise — e.g. ViT-L/14 @336 has 577
    tokens and a 21 MiB f32 score tile alone).

    Budgeted on the BACKWARD worst case, which is what compiles during
    training: up to ~5 live [H, Lq, Lk] f32 tiles (p, keep, pd, dpd/dp, ds)
    plus 7 [H, L, D] operand/grad tiles (q, k, v, g, dq, dk, dv)."""
    tiles = 5 * h * lq * lk * 4
    qkv = 7 * h * max(lq, lk) * d * 4
    return tiles + qkv <= _VMEM_BUDGET


def _keep_mask(seed_ref, h, lq, lk, rate, interpret):
    """Regenerable dropout keep-mask in {0, 1/(1-rate)} (f32).

    On hardware this is the TPU PRNG (pltpu.prng_*), re-seeded identically
    in the backward kernel so the mask is never stored.  seed_ref is a [B]
    per-example seed array (globally unique even on multi-device meshes,
    where pl.program_id restarts per shard — the seeds are sharded along
    with q, so the i-th local program reads its own global seed).
    Interpreter mode (CPU tests) falls back to a counter-based avalanche
    hash with the same determinism contract."""
    seed = seed_ref[pl.program_id(0)]
    if interpret:
        ctr = jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 0) * (lq * lk)
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 1) * lk
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 2)
        x = ctr + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        # murmur3 finalizer
        x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        keep = x >= jnp.uint32(int(rate * 4294967296.0))
    else:
        pltpu.prng_seed(seed)
        # bitcast: prng_random_bits returns int32 on the pinned jax but
        # uint32 on newer releases — compare in uint32 either way so the
        # threshold semantics are version-independent
        bits = pltpu.bitcast(pltpu.prng_random_bits((h, lq, lk)), jnp.uint32)
        keep = bits >= jnp.uint32(int(rate * 4294967296.0))
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref,
                *, rate, interpret):
    # dots take the INPUT dtype (bf16 on the towers -> full-rate MXU) and
    # accumulate f32 (preferred_element_type); softmax stats stay f32
    q = q_ref[0]  # [H, L, D]
    k = k_ref[0]
    v = v_ref[0]
    h, lq, d = q.shape
    lk = k.shape[1]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (d ** 0.5))
    pad = mask_ref[0] != 0  # [1, Lk]; nonzero = padding
    s = jnp.where(pad[0][None, None, :], _NEG, s)
    smax = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - smax)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0] = (smax + jnp.log(denom))[..., 0]
    p = p / denom
    if rate > 0.0:
        p = p * _keep_mask(seed_ref, h, lq, lk, rate, interpret)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, rate, interpret):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]  # [H, Lq, D]
    h, lq, d = q.shape
    lk = k.shape[1]
    dt = q.dtype
    scale = 1.0 / (d ** 0.5)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    pad = mask_ref[0] != 0
    s = jnp.where(pad[0][None, None, :], _NEG, s)
    p = jnp.exp(s - lse_ref[0][..., None])  # [H, Lq, Lk]
    if rate > 0.0:
        keep = _keep_mask(seed_ref, h, lq, lk, rate, interpret)
        pd = p * keep
    else:
        keep = None
        pd = p
    # dV = Pdᵀ g
    dv_ref[0] = jax.lax.dot_general(
        pd.astype(dt), g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dPd = g Vᵀ ; dP = dPd ∘ keep ; softmax bwd
    dpd = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dp = dpd * keep if keep is not None else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(dt)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(b, h, lq, lk, d):
    # index maps take (program_id, scalar_prefetch_ref)
    qspec = pl.BlockSpec((1, h, lq, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, h, lk, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, lk), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, h, lq), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, mspec, lspec


def _fwd_pallas(seed, q, k, v, mask3, rate, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qspec, kspec, mspec, lspec = _specs(b, h, lq, lk, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[qspec, kspec, kspec, mspec],
            out_specs=[qspec, lspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lq), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, mask3)


def _bwd_pallas(seed, q, k, v, mask3, lse, g, rate, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qspec, kspec, mspec, lspec = _specs(b, h, lq, lk, d)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[qspec, kspec, kspec, mspec, lspec, qspec],
            out_specs=[qspec, kspec, kspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, d), v.dtype)],
        interpret=interpret,
    )(seed, q, k, v, mask3, lse, g)


# --------------------------------------------------------- Lk-tiled kernels
#
# When the [H, Lq, Lk] score tile does not fit VMEM (ViT-L/14 @336 has 577
# tokens -> 21 MiB f32), the single-block kernel above cannot run.  These
# kernels tile BOTH sequence axes with streaming-softmax state (the
# ops/infonce.py _stats_kernel pattern): grid (B, nq, nk) with the key axis
# innermost, carrying running max / denominator / unnormalized output in
# VMEM scratch.  Same regenerable-dropout contract — the mask for tile
# (i, j) is a pure function of (per-example seed, i, j), re-derived
# identically by every backward kernel.

_TILE_Q = 128
_TILE_K = 128


def _head_group(h: int) -> int:
    """Heads per grid step: the largest divisor of h that is <= 8.  Heads
    are a sliceable block dim in the [B, H, L, D] layout (dim 1, NOT one of
    the (8,128)-constrained last two), and grouping bounds the kernel's
    [hg, bq, bk] temporaries — at hg=16 the Mosaic scoped-vmem stack
    overflows the 16 MiB limit (measured on v5e at L=640)."""
    for hg in (8, 7, 6, 5, 4, 3, 2, 1):
        if h % hg == 0:
            return hg
    return 1


def _tile_keep(seed_ref, hi, i, j, h, bq, bk, rate, interpret):
    """Dropout keep-mask for head-group hi / q-tile i / k-tile j, in
    {0, 1/(1-rate)} (reads the per-example seed via program_id — must be
    called at kernel top level, not inside lax control flow)."""
    return _tile_keep_from(seed_ref[pl.program_id(0)], hi, i, j, h, bq, bk,
                           rate, interpret)


def _tile_keep_from(seed, hi, i, j, h, bq, bk, rate, interpret):
    if interpret:
        ctr = jax.lax.broadcasted_iota(jnp.uint32, (h, bq, bk), 0) * (bq * bk)
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, bq, bk), 1) * bk
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, bq, bk), 2)
        x = (ctr + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
             + hi.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
             + i.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
             + j.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
        x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        keep = x >= jnp.uint32(int(rate * 4294967296.0))
    else:
        # prng_seed accepts at most 2 scalars (Mosaic): fold the tile
        # coordinates into one mixed value (same pure function of
        # (hi, i, j) in every kernel that regenerates this tile's mask)
        mix = (hi * jnp.int32(0x27D4EB2F) + i * jnp.int32(-2048144777)
               + j * jnp.int32(-1028477379))
        pltpu.prng_seed(seed, mix)
        bits = pltpu.bitcast(pltpu.prng_random_bits((h, bq, bk)), jnp.uint32)
        keep = bits >= jnp.uint32(int(rate * 4294967296.0))
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


def _bh_dot(a, b, contract_a, contract_b):
    """Batched-over-heads dot: a [H, M, X] x b [H, N, Y] contracting the
    given dims, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _tiled_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                      out_ref, lse_ref, m_scr, s_scr, o_scr,
                      *, rate, interpret):
    hi, i, j = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    q = q_ref[0]  # [H, bq, D]; dots run in the input dtype (bf16 MXU)
    k = k_ref[0]  # [H, bk, D]
    v = v_ref[0]
    h, bq, d = q.shape
    bk = k.shape[1]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        o_scr[:] = jnp.zeros_like(o_scr)

    s = _bh_dot(q, k, 2, 2) * (1.0 / (d ** 0.5))  # [H, bq, bk]
    pad = mask_ref[0][0] != 0  # [bk]
    s = jnp.where(pad[None, None, :], -jnp.inf, s)

    m_old = m_scr[:]                      # [H, bq]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - safe_m), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - safe_m[..., None]), 0.0)
    s_scr[:] = s_scr[:] * alpha + jnp.sum(p, axis=-1)
    m_scr[:] = m_new
    if rate > 0.0:
        p = p * _tile_keep(seed_ref, hi, i, j, h, bq, bk, rate, interpret)
    o_scr[:] = (o_scr[:] * alpha[..., None]
                + _bh_dot(p.astype(v.dtype), v, 2, 1))

    @pl.when(j == nk - 1)
    def _flush():
        denom = s_scr[:]
        safe = jnp.where(denom > 0, denom, 1.0)
        out_ref[0] = (o_scr[:] / safe[..., None]).astype(out_ref.dtype)
        lse_ref[0] = jnp.where(denom > 0, m_scr[:] + jnp.log(safe), -jnp.inf)


def _tile_p(q, k, pad, lse, d):
    """Recompute normalized probabilities for one (q-tile, k-tile): the
    flash-bwd identity p = exp(s - lse), with fully-masked/-inf rows
    guarded to 0."""
    s = _bh_dot(q, k, 2, 2) * (1.0 / (d ** 0.5))
    s = jnp.where(pad[None, None, :], -jnp.inf, s)
    l = lse[..., None]
    return jnp.where(jnp.isfinite(s) & jnp.isfinite(l), jnp.exp(s - l), 0.0), s


def _tiled_dq_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref,
                     delta_ref, g_ref, dq_ref, dq_scr, *, rate, interpret):
    hi, i, j = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]      # [H, bq, D]
    h, bq, d = q.shape
    bk = k.shape[1]

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    pad = mask_ref[0][0] != 0
    p, _ = _tile_p(q, k, pad, lse_ref[0], d)
    dpd = _bh_dot(g, v, 2, 2)             # [H, bq, bk]
    if rate > 0.0:
        dp = dpd * _tile_keep(seed_ref, hi, i, j, h, bq, bk, rate,
                              interpret)
    else:
        dp = dpd
    ds = p * (dp - delta_ref[0][..., None]) * (1.0 / (d ** 0.5))
    dq_scr[:] = dq_scr[:] + _bh_dot(ds.astype(k.dtype), k, 2, 1)

    @pl.when(j == nk - 1)
    def _flush():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _tiled_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref,
                      delta_ref, g_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                      *, rate, interpret):
    # grid (B, nh, nkj, nqi): k-tile j is the outer (revisit) axis, q-tile
    # i streams innermost so dk/dv accumulate in scratch
    hi, j, i = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    nq = pl.num_programs(3)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    h, bq, d = q.shape
    bk = k.shape[1]

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    pad = mask_ref[0][0] != 0
    p, _ = _tile_p(q, k, pad, lse_ref[0], d)
    dpd = _bh_dot(g, v, 2, 2)
    if rate > 0.0:
        keep = _tile_keep(seed_ref, hi, i, j, h, bq, bk, rate, interpret)
        pd = p * keep
        dp = dpd * keep
    else:
        pd, dp = p, dpd
    dv_scr[:] = dv_scr[:] + _bh_dot(pd.astype(g.dtype), g, 1, 1)
    ds = p * (dp - delta_ref[0][..., None]) * (1.0 / (d ** 0.5))
    dk_scr[:] = dk_scr[:] + _bh_dot(ds.astype(q.dtype), q, 1, 1)

    @pl.when(i == nq - 1)
    def _flush():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ------------------------------------------------------- chunked kernels
#
# Middle regime between the single-block kernel (whole [H, L, L] score in
# VMEM) and the fully streamed tiles above: one program per (batch,
# head-group) holds the ENTIRE padded q/k/v (and, in the backward, g/dq/
# dk/dv) for its head group in VMEM — [hg, Lp, D] is only ~hg*Lp*128 bytes
# in bf16 — and loops over (q-chunk, k-chunk) score tiles internally.
# This kills the per-program launch/DMA overhead that made the streamed
# grid 2x slower than XLA at ViT-L@336 (1600+ programs of ~33 MF each),
# and the single backward kernel computes dq, dk AND dv from one score
# recompute per tile instead of two.

_CHUNK = 128


def _chunk_head_group(h: int) -> int:
    """Heads per chunked-kernel program: ≤2.  Mosaic's scoped-vmem stack
    accounting for the doubly-nested fori_loop kernels charges ~5x the f32
    temp estimate, nearly independent of the input dtype (measured on v5e
    at L=640: 16.09M for f32 and 16.41M for bf16 at hg=4 — both over the
    16 MiB limit), so the chunked family runs hg=2."""
    return 2 if h % 2 == 0 else 1


def _chunk_budget(h, lq, lk, d, itemsize):
    hg = _chunk_head_group(h)
    lqp, lkp = _round_up(lq, _CHUNK), _round_up(lk, _CHUNK)
    # q,k,v,g,dk,dv at io dtype + the dq accumulator block at f32
    refs = (6 * itemsize + 4) * hg * max(lqp, lkp) * d
    temps = 6 * hg * _CHUNK * _CHUNK * 4          # s/p/dpd/dp/ds/keep (f32)
    # Mosaic's measured stack accounting on v5e: ~5x the temp estimate
    # (fori-carried lifetimes), ~2x the ref windows (double buffering)
    return 5 * temps + 2 * refs


def fits_chunked(h: int, lq: int, lk: int, d: int,
                 itemsize: int = 2) -> bool:
    # 14 MiB of the 16 MiB scoped-vmem limit, against the CALIBRATED
    # budget above (hg=2, L=640: 6.6M bf16 / 8.5M f32 — both chunk)
    return _chunk_budget(h, lq, lk, d, itemsize) <= 14 * 2 ** 20


def _chunk_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                      out_ref, lse_ref, *, rate, interpret):
    hi = pl.program_id(1)
    ex_seed = seed_ref[pl.program_id(0)]  # program_id illegal inside fori
    h, lqp, d = q_ref.shape[1:]  # [hg, Lqp, D]
    lkp = k_ref.shape[2]
    nq, nk = lqp // _CHUNK, lkp // _CHUNK
    scale = 1.0 / (d ** 0.5)

    def q_body(qi, _):
        q = q_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :]

        def k_body(kj, carry):
            m, ssum, o = carry
            k = k_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :]
            v = v_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :]
            pad = mask_ref[0, 0, pl.ds(kj * _CHUNK, _CHUNK)] != 0
            s = _bh_dot(q, k, 2, 2) * scale
            s = jnp.where(pad[None, None, :], -jnp.inf, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
            p = jnp.where(jnp.isfinite(s), jnp.exp(s - safe_m[..., None]),
                          0.0)
            ssum = ssum * alpha + jnp.sum(p, axis=-1)
            if rate > 0.0:
                p = p * _tile_keep_from(ex_seed, hi, qi, kj, h, _CHUNK,
                                        _CHUNK, rate, interpret)
            o = o * alpha[..., None] + _bh_dot(p.astype(v.dtype), v, 2, 1)
            return m_new, ssum, o

        m, ssum, o = jax.lax.fori_loop(
            0, nk, k_body,
            (jnp.full((h, _CHUNK), -jnp.inf, jnp.float32),
             jnp.zeros((h, _CHUNK), jnp.float32),
             jnp.zeros((h, _CHUNK, d), jnp.float32)))
        safe = jnp.where(ssum > 0, ssum, 1.0)
        out_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :] = (
            o / safe[..., None]).astype(out_ref.dtype)
        # lse rides in a [B, H, Lqp, 1] array: a (1, hg, Lqp) block violates
        # the (8,128)-divisible-or-full rule when hg < 8, a trailing
        # singleton dim satisfies it ("equal to the respective dimension")
        lse_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), 0] = jnp.where(
            ssum > 0, m + jnp.log(safe), -jnp.inf)
        return 0

    jax.lax.fori_loop(0, nq, q_body, 0)


def _chunk_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref,
                      delta_ref, g_ref, dq_ref, dk_ref, dv_ref,
                      *, rate, interpret):
    hi = pl.program_id(1)
    ex_seed = seed_ref[pl.program_id(0)]
    h, lqp, d = q_ref.shape[1:]
    lkp = k_ref.shape[2]
    nq, nk = lqp // _CHUNK, lkp // _CHUNK
    scale = 1.0 / (d ** 0.5)

    def zero_body(qi, _):
        dq_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :] = jnp.zeros(
            (h, _CHUNK, d), dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, zero_body, 0)

    def k_body(kj, _):
        k = k_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :]
        v = v_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :]
        pad = mask_ref[0, 0, pl.ds(kj * _CHUNK, _CHUNK)] != 0

        def q_body(qi, carry):
            dk_acc, dv_acc = carry
            q = q_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :]
            g = g_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :]
            lse = lse_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), 0]
            delta = delta_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), 0]
            p, _ = _tile_p(q, k, pad, lse, d)
            dpd = _bh_dot(g, v, 2, 2)
            if rate > 0.0:
                keep = _tile_keep_from(ex_seed, hi, qi, kj, h, _CHUNK,
                                       _CHUNK, rate, interpret)
                pd = p * keep
                dp = dpd * keep
            else:
                pd, dp = p, dpd
            dv_acc = dv_acc + _bh_dot(pd.astype(g.dtype), g, 1, 1)
            ds = p * (dp - delta[..., None]) * scale
            ds = ds.astype(k.dtype)
            dk_acc = dk_acc + _bh_dot(ds, q, 1, 1)
            # dq_ref is the f32 accumulator (out_shape f32, cast to the io
            # dtype by the caller): one partial per k-chunk must NOT round
            # to bf16 every iteration (advisor r3; the tiled family
            # likewise accumulates dq in f32)
            dq_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :] = (
                dq_ref[0, :, pl.ds(qi * _CHUNK, _CHUNK), :]
                + _bh_dot(ds, k, 2, 1))
            return dk_acc, dv_acc

        dk_acc, dv_acc = jax.lax.fori_loop(
            0, nq, q_body,
            (jnp.zeros((h, _CHUNK, d), jnp.float32),
             jnp.zeros((h, _CHUNK, d), jnp.float32)))
        dk_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :] = dk_acc.astype(
            dk_ref.dtype)
        dv_ref[0, :, pl.ds(kj * _CHUNK, _CHUNK), :] = dv_acc.astype(
            dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nk, k_body, 0)


def _chunk_fwd_pallas(seed, q, k, v, mask3, rate, interpret):
    b, h, lqp, d = q.shape
    lkp = k.shape[2]
    hg = _chunk_head_group(h)
    qspec = pl.BlockSpec((1, hg, lqp, d), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hg, lkp, d), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, lkp), lambda bi, hi, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, hg, lqp, 1), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    out, lse4 = pl.pallas_call(
        functools.partial(_chunk_fwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg),
            in_specs=[qspec, kspec, kspec, mspec],
            out_specs=[qspec, lspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lqp, 1), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, mask3)
    return out, lse4[..., 0]


def _chunk_bwd_pallas(seed, q, k, v, mask3, lse, delta, g, rate, interpret):
    b, h, lqp, d = q.shape
    lkp = k.shape[2]
    hg = _chunk_head_group(h)
    qspec = pl.BlockSpec((1, hg, lqp, d), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hg, lkp, d), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, lkp), lambda bi, hi, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, hg, lqp, 1), lambda bi, hi, *_: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_chunk_bwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg),
            in_specs=[qspec, kspec, kspec, mspec, lspec, lspec, qspec],
            out_specs=[qspec, kspec, kspec],
        ),
        # dq is f32: its VMEM output block doubles as the cross-k-chunk
        # accumulator, rounded to the io dtype exactly once below
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, lkp, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lkp, d), v.dtype)],
        interpret=interpret,
    )(seed, q, k, v, mask3, lse[..., None], delta[..., None], g)
    return dq.astype(q.dtype), dk, dv


@functools.lru_cache(maxsize=None)
def _partitioned_chunk_fwd(rate, interpret):
    def impl(seed, q, k, v, mask3):
        return _chunk_fwd_pallas(seed, q, k, v, mask3, rate, interpret)

    return _make_partitioned(
        impl, "b, b h q d, b h k d, b h k d, b m k -> b h q d, b h q", 2, 0)


@functools.lru_cache(maxsize=None)
def _partitioned_chunk_bwd(rate, interpret):
    def impl(seed, q, k, v, mask3, lse, delta, g):
        return _chunk_bwd_pallas(seed, q, k, v, mask3, lse, delta, g,
                                 rate, interpret)

    return _make_partitioned(
        impl,
        "b, b h q d, b h k d, b h k d, b m k, b h q, b h q, b h q d "
        "-> b h q d, b h k d, b h k d", 1, 2)


def _tiled_fwd_pallas(seed, q, k, v, mask3, rate, interpret):
    b, h, lqp, d = q.shape
    lkp = k.shape[2]
    hg = _head_group(h)
    bq, bk = min(_TILE_Q, lqp), min(_TILE_K, lkp)
    grid = (b, h // hg, lqp // bq, lkp // bk)
    qspec = pl.BlockSpec((1, hg, bq, d),
                         lambda bi, hi, i, j, *_: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hg, bk, d),
                         lambda bi, hi, i, j, *_: (bi, hi, j, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, bk), lambda bi, hi, i, j, *_: (bi, 0, j),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, hg, bq), lambda bi, hi, i, j, *_: (bi, hi, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tiled_fwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kspec, kspec, mspec],
            out_specs=[qspec, lspec],
            scratch_shapes=[pltpu.VMEM((hg, bq), jnp.float32),
                            pltpu.VMEM((hg, bq), jnp.float32),
                            pltpu.VMEM((hg, bq, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lqp), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, mask3)


def _tiled_bwd_pallas(seed, q, k, v, mask3, lse, delta, g, rate, interpret):
    b, h, lqp, d = q.shape
    lkp = k.shape[2]
    hg = _head_group(h)
    bq, bk = min(_TILE_Q, lqp), min(_TILE_K, lkp)
    qspec = pl.BlockSpec((1, hg, bq, d),
                         lambda bi, hi, i, j, *_: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hg, bk, d),
                         lambda bi, hi, i, j, *_: (bi, hi, j, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, bk), lambda bi, hi, i, j, *_: (bi, 0, j),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, hg, bq), lambda bi, hi, i, j, *_: (bi, hi, i),
                         memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_tiled_dq_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg, lqp // bq, lkp // bk),
            in_specs=[qspec, kspec, kspec, mspec, lspec, lspec, qspec],
            out_specs=[qspec],
            scratch_shapes=[pltpu.VMEM((hg, bq, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype)],
        interpret=interpret,
    )(seed, q, k, v, mask3, lse, delta, g)[0]

    # k-major grid: swap the index maps' tile roles (i streams innermost)
    qspec2 = pl.BlockSpec((1, hg, bq, d),
                          lambda bi, hi, j, i, *_: (bi, hi, i, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, hg, bk, d),
                          lambda bi, hi, j, i, *_: (bi, hi, j, 0),
                          memory_space=pltpu.VMEM)
    mspec2 = pl.BlockSpec((1, 1, bk), lambda bi, hi, j, i, *_: (bi, 0, j),
                          memory_space=pltpu.VMEM)
    lspec2 = pl.BlockSpec((1, hg, bq),
                          lambda bi, hi, j, i, *_: (bi, hi, i),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_tiled_dkv_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg, lkp // bk, lqp // bq),
            in_specs=[qspec2, kspec2, kspec2, mspec2, lspec2, lspec2, qspec2],
            out_specs=[kspec2, kspec2],
            scratch_shapes=[pltpu.VMEM((hg, bk, d), jnp.float32),
                            pltpu.VMEM((hg, bk, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, lkp, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lkp, d), v.dtype)],
        interpret=interpret,
    )(seed, q, k, v, mask3, lse, delta, g)
    return dq, dk, dv


@functools.lru_cache(maxsize=None)
def _partitioned_tiled_fwd(rate, interpret):
    def impl(seed, q, k, v, mask3):
        return _tiled_fwd_pallas(seed, q, k, v, mask3, rate, interpret)

    return _make_partitioned(
        impl, "b, b h q d, b h k d, b h k d, b m k -> b h q d, b h q", 2, 0)


@functools.lru_cache(maxsize=None)
def _partitioned_tiled_bwd(rate, interpret):
    def impl(seed, q, k, v, mask3, lse, delta, g):
        return _tiled_bwd_pallas(seed, q, k, v, mask3, lse, delta, g,
                                 rate, interpret)

    return _make_partitioned(
        impl,
        "b, b h q d, b h k d, b h k d, b m k, b h q, b h q, b h q d "
        "-> b h q d, b h k d, b h k d", 1, 2)


def _pad_axis(x, axis, to):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return -(-n // m) * m


def _dim0_spec(shapes):
    """Batch-axis entry of the q operand's sharding spec (None if
    replicated/unsharded)."""
    sharding = shapes[1].sharding
    spec = getattr(sharding, "spec", None)
    return spec[0] if spec else None


def _make_partitioned(impl, rule, n_q_outs, n_k_outs):
    """Wrap a pallas caller with a GSPMD/Shardy batch-partitioning rule:
    every operand/result — including the [B] per-example seed array — is
    sharded on dim 0 exactly like q.  Without this, XLA treats the pallas
    custom call as opaque and replicates it (all-gathering every operand)
    on multi-device meshes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = custom_partitioning(impl)

    def result_shardings(mesh, b_axis):
        return tuple(NamedSharding(mesh, P(b_axis))
                     for _ in range(n_q_outs + n_k_outs))

    def infer(mesh, shapes, result_shape):
        return result_shardings(mesh, _dim0_spec(shapes))

    def part(mesh, shapes, result_shape):
        b_axis = _dim0_spec(shapes)
        arg_sh = tuple(
            NamedSharding(mesh, P(b_axis)) for _ in range(len(shapes)))
        return mesh, impl, result_shardings(mesh, b_axis), arg_sh

    fn.def_partition(partition=part, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(rate, interpret):
    def impl(seed, q, k, v, mask3):
        return _fwd_pallas(seed, q, k, v, mask3, rate, interpret)

    return _make_partitioned(
        impl, "b, b h q d, b h k d, b h k d, b m k -> b h q d, b h q", 2, 0)


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(rate, interpret):
    def impl(seed, q, k, v, mask3, lse, g):
        return _bwd_pallas(seed, q, k, v, mask3, lse, g, rate, interpret)

    return _make_partitioned(
        impl,
        "b, b h q d, b h k d, b h k d, b m k, b h q, b h q d "
        "-> b h q d, b h k d, b h k d", 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_tower_attention(q, k, v, padding_mask, seed,
                          dropout_rate=0.0, interpret=False):
    """softmax dropout attention, fused per batch item.

    q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; padding_mask: [B, Lk]
    (nonzero/True = PADDING) or None; seed: int32 scalar, expanded to a
    [B] per-example seed array inside (ignored when dropout_rate == 0).
    Returns [B, H, Lq, D] in q.dtype.

    Dispatch is internal: shapes whose score tile fits VMEM use the
    single-block kernel; longer sequences (ViT-L/14 @336 = 577 tokens)
    stream over (q, k) tiles — the flag never silently disengages.
    """
    assert dropout_rate < 1.0, "dropout_rate must be < 1.0"
    out, _ = _flash_fwd(q, k, v, padding_mask, seed, dropout_rate, interpret)
    return out


def _example_seeds(seed, b):
    # [B] per-example seeds: globally unique across a sharded batch (the
    # array is sharded like q, so shard-local program i reads global seed
    # base + global_row(i) — uncorrelated masks on every device)
    return (jnp.asarray(seed, jnp.int32).reshape(())
            + jnp.arange(b, dtype=jnp.int32) * jnp.int32(-1640531527))


def _flash_fwd(q, k, v, padding_mask, seed, dropout_rate, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if padding_mask is None:
        padding_mask = jnp.zeros((b, lk), jnp.int32)
    padding_mask = padding_mask.astype(jnp.int32)[:, None, :]
    seed = _example_seeds(seed, b)
    if fits_vmem(h, lq, lk, d):
        out, lse = _partitioned_fwd(float(dropout_rate), interpret)(
            seed, q, k, v, padding_mask)
        return out, (q, k, v, padding_mask, seed, lse, None)
    # chunked/tiled paths: pad both sequence axes to tile multiples (padded
    # keys are masked; padded query rows are sliced off, their grads zero)
    lqp, lkp = _round_up(lq, _TILE_Q), _round_up(lk, _TILE_K)
    qp = _pad_axis(q, 2, lqp)
    kp = _pad_axis(k, 2, lkp)
    vp = _pad_axis(v, 2, lkp)
    maskp = _pad_axis(padding_mask, 2, lkp)
    if lkp != lk:
        maskp = maskp.at[:, :, lk:].set(1)
    if fits_chunked(h, lq, lk, d, q.dtype.itemsize):
        fwd = _partitioned_chunk_fwd(float(dropout_rate), interpret)
    else:
        fwd = _partitioned_tiled_fwd(float(dropout_rate), interpret)
    outp, lsep = fwd(seed, qp, kp, vp, maskp)
    out = outp[:, :, :lq]
    # residuals keep the UNPADDED operands (bwd re-pads) so dq/dk/dv slice
    # back trivially; `out` rides along for the delta = rowsum(g * out)
    # flash-bwd identity (valid with dropout: delta = sum_k pd . dpd)
    return out, (q, k, v, padding_mask, seed, lsep, out)


def _flash_fwd_vjp(q, k, v, padding_mask, seed, dropout_rate, interpret):
    out, res = _flash_fwd(q, k, v, padding_mask, seed, dropout_rate,
                          interpret)
    return out, res


def _flash_bwd(dropout_rate, interpret, res, g):
    q, k, v, padding_mask, seed, lse, out = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if out is None:  # single-block path
        dq, dk, dv = _partitioned_bwd(float(dropout_rate), interpret)(
            seed, q, k, v, padding_mask, lse, g)
        return dq, dk, dv, None, None
    lqp, lkp = _round_up(lq, _TILE_Q), _round_up(lk, _TILE_K)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    qp = _pad_axis(q, 2, lqp)
    kp = _pad_axis(k, 2, lkp)
    vp = _pad_axis(v, 2, lkp)
    maskp = _pad_axis(padding_mask, 2, lkp)
    if lkp != lk:
        maskp = maskp.at[:, :, lk:].set(1)
    gp = _pad_axis(g, 2, lqp)
    deltap = _pad_axis(delta, 2, lqp)
    if fits_chunked(h, lq, lk, d, q.dtype.itemsize):
        bwd = _partitioned_chunk_bwd(float(dropout_rate), interpret)
    else:
        bwd = _partitioned_tiled_bwd(float(dropout_rate), interpret)
    dq, dk, dv = bwd(seed, qp, kp, vp, maskp, lse, deltap, gp)
    return dq[:, :, :lq], dk[:, :, :lk], dv[:, :, :lk], None, None


flash_tower_attention.defvjp(_flash_fwd_vjp, _flash_bwd)
