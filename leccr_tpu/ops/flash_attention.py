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
    tokens and a 21 MiB f32 score tile alone)."""
    tiles = 3 * h * lq * lk * 4          # s/p + dP + keep (bwd worst case)
    qkv = 3 * h * max(lq, lk) * d * 4
    return tiles + qkv <= _VMEM_BUDGET


def _keep_mask(seed_ref, h, lq, lk, rate, interpret):
    """Regenerable dropout keep-mask in {0, 1/(1-rate)} (f32).

    On hardware this is the TPU PRNG (pltpu.prng_*), re-seeded identically
    in the backward kernel so the mask is never stored.  Interpreter mode
    (CPU tests) falls back to a counter-based avalanche hash with the same
    determinism contract."""
    if interpret:
        n = h * lq * lk
        ctr = jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 0) * (lq * lk)
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 1) * lk
        ctr += jax.lax.broadcasted_iota(jnp.uint32, (h, lq, lk), 2)
        x = (ctr + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(n)
             + seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        # murmur3 finalizer
        x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        keep = x >= jnp.uint32(int(rate * 4294967296.0))
    else:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((h, lq, lk))  # int32 reinterpretation
        thresh = int(rate * 4294967296.0) - 2147483648  # as int32
        keep = bits >= jnp.int32(thresh)
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref,
                *, rate, interpret):
    q = q_ref[0].astype(jnp.float32)  # [H, L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
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
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, rate, interpret):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)  # [H, Lq, D]
    h, lq, d = q.shape
    lk = k.shape[1]
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
        pd, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dPd = g Vᵀ ; dP = dPd ∘ keep ; softmax bwd
    dpd = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dp = dpd * keep if keep is not None else dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
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


def _dim0_spec(shapes):
    """Batch-axis entry of the q operand's sharding spec (None if
    replicated/unsharded)."""
    sharding = shapes[1].sharding
    spec = getattr(sharding, "spec", None)
    return spec[0] if spec else None


def _make_partitioned(impl, rule, n_q_outs, n_k_outs):
    """Wrap a pallas caller with a GSPMD/Shardy batch-partitioning rule:
    every tensor operand/result is sharded on dim 0 exactly like q; the
    seed stays replicated.  Without this, XLA treats the pallas custom
    call as opaque and replicates it (all-gathering every operand) on
    multi-device meshes."""
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
            NamedSharding(mesh, P() if i == 0 else P(b_axis))
            for i in range(len(shapes)))
        return mesh, impl, result_shardings(mesh, b_axis), arg_sh

    fn.def_partition(partition=part, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(rate, interpret):
    def impl(seed, q, k, v, mask3):
        return _fwd_pallas(seed, q, k, v, mask3, rate, interpret)

    return _make_partitioned(
        impl, "i, b h q d, b h k d, b h k d, b m k -> b h q d, b h q", 2, 0)


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(rate, interpret):
    def impl(seed, q, k, v, mask3, lse, g):
        return _bwd_pallas(seed, q, k, v, mask3, lse, g, rate, interpret)

    return _make_partitioned(
        impl,
        "i, b h q d, b h k d, b h k d, b m k, b h q, b h q d "
        "-> b h q d, b h k d, b h k d", 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_tower_attention(q, k, v, padding_mask, seed,
                          dropout_rate=0.0, interpret=False):
    """softmax dropout attention, fused per batch item.

    q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; padding_mask: [B, Lk]
    (nonzero/True = PADDING) or None; seed: int32 scalar (ignored when
    dropout_rate == 0).  Returns [B, H, Lq, D] in q.dtype.
    """
    out, _ = _flash_fwd(q, k, v, padding_mask, seed, dropout_rate, interpret)
    return out


def _flash_fwd(q, k, v, padding_mask, seed, dropout_rate, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if padding_mask is None:
        padding_mask = jnp.zeros((b, lk), jnp.int32)
    padding_mask = padding_mask.astype(jnp.int32)[:, None, :]
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    out, lse = _partitioned_fwd(float(dropout_rate), interpret)(
        seed, q, k, v, padding_mask)
    return out, (q, k, v, padding_mask, seed, lse)


def _flash_fwd_vjp(q, k, v, padding_mask, seed, dropout_rate, interpret):
    out, res = _flash_fwd(q, k, v, padding_mask, seed, dropout_rate,
                          interpret)
    return out, res


def _flash_bwd(dropout_rate, interpret, res, g):
    q, k, v, padding_mask, seed, lse = res
    dq, dk, dv = _partitioned_bwd(float(dropout_rate), interpret)(
        seed, q, k, v, padding_mask, lse, g)
    return dq, dk, dv, None, None


flash_tower_attention.defvjp(_flash_fwd_vjp, _flash_bwd)
