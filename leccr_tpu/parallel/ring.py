"""Ring InfoNCE: global-negative contrastive loss without materializing the
global logits matrix.

The reference builds the (B·W)² logits by all-gathering every feature
(models/xvlm.py:50-70, 271-273).  At the scale target (32k global negatives,
BASELINE.json config #5) that matrix is 4 GB in fp32 — it must be computed
blockwise and sharded over ICI.  This module runs InfoNCE as a ring
reduction under shard_map: each device keeps its feature shard, `ppermute`s
the other side's shard around the ring, and accumulates a streaming
logsumexp plus the positive-pair statistics.  Communication per step is one
[b_local, E] block riding ICI while the [b_local, b_local] block matmul
overlaps with it; peak memory is O(B²/W²) instead of O(B²).

Numerics: exactly soft_label_contrastive_loss (models/losses.py) — verified
shard-vs-global in tests/test_parallel.py — including duplicate-idx soft
labels, which require the GLOBAL positive counts (accumulated in the same
ring pass).  Gradients flow through ppermute (its transpose is the reverse
permute), reproducing the reference AllGather backward for free.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
def shard_map(f, mesh, in_specs, out_specs):
    """Version shim: jax.shard_map (>=0.8, keyword-only) vs
    jax.experimental.shard_map."""
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def _ring_half(
    q: jax.Array,
    k: jax.Array,
    idx_q: jax.Array,
    idx_k: jax.Array,
    inv_temp: jax.Array,
    axis_name: str,
):
    """Per-row loss of rows `q` against ALL `k` shards around the ring.

    Returns the summed (not averaged) loss over local q rows:
        sum_i [ logsumexp_j(l_ij) - (1/c_i) * sum_{j: idx_j==idx_i} l_ij ]
    with l = (q @ k_all.T) * inv_temp and c_i the global positive count.
    """
    world = jax.lax.psum(1, axis_name)
    b = q.shape[0]

    def block_stats(k_shard, idx_shard, carry):
        m, s, pos_sum, pos_cnt = carry
        logits = (q @ k_shard.T) * inv_temp  # [b, b_k]
        blk_max = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, blk_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=1)
        pos = (idx_q[:, None] == idx_shard[None, :]).astype(logits.dtype)
        pos_sum = pos_sum + jnp.sum(logits * pos, axis=1)
        pos_cnt = pos_cnt + jnp.sum(pos, axis=1)
        return new_m, s, pos_sum, pos_cnt

    def body(i, state):
        k_shard, idx_shard, carry = state
        carry = block_stats(k_shard, idx_shard, carry)
        # rotate shards to the next device; skipped on the last step
        perm = [(d, (d + 1) % world)
                for d in range(world)]
        k_next = jax.lax.ppermute(k_shard, axis_name, perm)
        idx_next = jax.lax.ppermute(idx_shard, axis_name, perm)
        return k_next, idx_next, carry

    neg_inf = jnp.full((b,), -jnp.inf, q.dtype)
    init = (k, idx_k,
            (neg_inf, jnp.zeros((b,), q.dtype), jnp.zeros((b,), q.dtype),
             jnp.zeros((b,), q.dtype)))
    k_last, idx_last, carry = jax.lax.fori_loop(
        0, world - 1, body, init) if world > 1 else init
    m, s, pos_sum, pos_cnt = block_stats(k_last, idx_last, carry)
    lse = m + jnp.log(s)
    loss_rows = lse - pos_sum / jnp.maximum(pos_cnt, 1.0)
    return jnp.sum(loss_rows)


# ------------------------------------------------- fused (Pallas) ring

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_half_fused(q, k, idx_q, idx_k, axis_name, impl, interpret, temp):
    loss, _ = _ring_half_fused_fwd(
        q, k, idx_q, idx_k, axis_name, impl, interpret, temp)
    return loss


def _ring_half_fused_fwd(q, k, idx_q, idx_k, axis_name, impl, interpret,
                         temp):
    """Forward ring: per rotation, the fused InfoNCE stats kernel
    (ops/infonce.py) consumes the visiting k shard — logits exist only as
    VMEM tiles even at the per-device block size — and the per-row
    (lse, pos_sum, pos_cnt) streams merge with logaddexp."""
    from leccr_tpu.ops.infonce import infonce_stats

    world = jax.lax.psum(1, axis_name)
    b = q.shape[0]
    inv_temp = 1.0 / temp
    perm = [(d, (d + 1) % world) for d in range(world)]

    def body(i, state):
        k_shard, idx_shard, (lse, ps, pc) = state
        lse_b, ps_b, pc_b = infonce_stats(
            q, k_shard, idx_q, idx_shard, inv_temp, impl, interpret)
        carry = (jnp.logaddexp(lse, lse_b), ps + ps_b, pc + pc_b)
        k_next = jax.lax.ppermute(k_shard, axis_name, perm)
        idx_next = jax.lax.ppermute(idx_shard, axis_name, perm)
        return k_next, idx_next, carry

    neg_inf = jnp.full((b,), -jnp.inf, jnp.float32)
    zero = jnp.zeros((b,), jnp.float32)
    state = (k, idx_k, (neg_inf, zero, zero))
    # one extra rotation vs the dense ring so k lands back home — the
    # backward pass re-rings from the home position
    state = jax.lax.fori_loop(0, world, body, state) if world > 1 else (
        body(0, state))
    _, _, (lse, ps, pc) = state
    loss = jnp.sum(lse - ps / jnp.maximum(pc, 1.0))
    return loss, (q, k, idx_q, idx_k, temp, lse, pc)


def _ring_half_fused_bwd(axis_name, impl, interpret, res, g):
    """Backward ring: k blocks (with their dk accumulators) rotate around
    the ring; each device adds its flash-style recomputed contribution
    (ops/infonce.py infonce_bwd_raw) as the block visits.  After a full
    cycle every dk shard is home.  d_temp falls out of dq_raw·q."""
    from leccr_tpu.ops.infonce import infonce_bwd_raw

    q, k, idx_q, idx_k, temp, lse, pc = res
    world = jax.lax.psum(1, axis_name)
    inv_temp = 1.0 / temp
    perm = [(d, (d + 1) % world) for d in range(world)]

    def body(i, state):
        k_shard, idx_shard, dk_shard, dq_raw = state
        dq_b, dk_b = infonce_bwd_raw(
            q, k_shard, idx_q, idx_shard, inv_temp, lse, pc,
            impl=impl, interpret=interpret)
        dq_raw = dq_raw + dq_b
        dk_shard = dk_shard + dk_b
        k_next = jax.lax.ppermute(k_shard, axis_name, perm)
        idx_next = jax.lax.ppermute(idx_shard, axis_name, perm)
        dk_next = jax.lax.ppermute(dk_shard, axis_name, perm)
        return k_next, idx_next, dk_next, dq_raw

    state = (k, idx_k, jnp.zeros_like(k, jnp.float32),
             jnp.zeros_like(q, jnp.float32))
    if world > 1:
        state = jax.lax.fori_loop(0, world, body, state)
    else:
        state = body(0, state)
    _, _, dk_raw, dq_raw = state
    scale = g * inv_temp
    # Σ_i dq_raw_i·q_i = Σ_ij w_ij (q_i·k_j); d temp = -g·Σ w·(q·k)/temp².
    # temp enters shard_map replicated, so its per-shard cotangents are
    # psum'd by the shard_map transpose itself.
    d_temp = -g * jnp.sum(dq_raw * q) * inv_temp * inv_temp
    return (dq_raw * scale, dk_raw * scale, None, None,
            jnp.asarray(d_temp, jnp.float32))


_ring_half_fused.defvjp(_ring_half_fused_fwd, _ring_half_fused_bwd)


def ring_infonce_local(
    feat_a: jax.Array,
    feat_b: jax.Array,
    temp: jax.Array,
    idx: Optional[jax.Array],
    axis_name: str = "data",
    impl: str = "dense",
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional soft-label InfoNCE on LOCAL shards inside shard_map.

    Exactly equals models/losses.soft_label_contrastive_loss applied to the
    gathered global batch.  impl='dense' computes each per-rotation block
    with plain XLA ops; impl='fused'/'pallas'/'xla' routes the blocks
    through the fused InfoNCE kernels (ops/infonce.py) with a hand-written
    ring VJP — at the 32k scale target each per-device block is
    [4k, 4k] and the kernel keeps its logits in VMEM."""
    b_local = feat_a.shape[0]
    world = jax.lax.psum(1, axis_name)
    if idx is None:
        rank = jax.lax.axis_index(axis_name)
        idx = rank * b_local + jnp.arange(b_local)
    if impl == "dense":
        inv_temp = 1.0 / temp
        loss_a = _ring_half(feat_a, feat_b, idx, idx, inv_temp, axis_name)
        loss_b = _ring_half(feat_b, feat_a, idx, idx, inv_temp, axis_name)
    else:
        block_impl = "auto" if impl == "fused" else impl
        loss_a = _ring_half_fused(feat_a, feat_b, idx, idx, axis_name,
                                  block_impl, interpret, temp)
        loss_b = _ring_half_fused(feat_b, feat_a, idx, idx, axis_name,
                                  block_impl, interpret, temp)
    total_rows = b_local * world
    return jax.lax.psum(loss_a + loss_b, axis_name) / (2.0 * total_rows)


def ring_infonce(
    mesh: Mesh,
    feat_a: jax.Array,
    feat_b: jax.Array,
    temp: jax.Array,
    idx: Optional[jax.Array] = None,
    axis_name: str = "data",
    impl: str = "dense",
    interpret: bool = False,
) -> jax.Array:
    """Convenience wrapper: global [B, E] inputs sharded over `axis_name`."""
    if idx is None:
        idx = jnp.arange(feat_a.shape[0])
    fn = shard_map(
        functools.partial(ring_infonce_local, axis_name=axis_name,
                          impl=impl, interpret=interpret),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(axis_name)),
        out_specs=P(),
    )
    return fn(feat_a, feat_b, temp, idx)
