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


def ring_infonce_local(
    feat_a: jax.Array,
    feat_b: jax.Array,
    temp: jax.Array,
    idx: Optional[jax.Array],
    axis_name: str = "data",
) -> jax.Array:
    """Bidirectional soft-label InfoNCE on LOCAL shards inside shard_map.

    Exactly equals models/losses.soft_label_contrastive_loss applied to the
    gathered global batch."""
    b_local = feat_a.shape[0]
    world = jax.lax.psum(1, axis_name)
    if idx is None:
        rank = jax.lax.axis_index(axis_name)
        idx = rank * b_local + jnp.arange(b_local)
    inv_temp = 1.0 / temp
    loss_a = _ring_half(feat_a, feat_b, idx, idx, inv_temp, axis_name)
    loss_b = _ring_half(feat_b, feat_a, idx, idx, inv_temp, axis_name)
    total_rows = b_local * world
    return jax.lax.psum(loss_a + loss_b, axis_name) / (2.0 * total_rows)


def ring_infonce(
    mesh: Mesh,
    feat_a: jax.Array,
    feat_b: jax.Array,
    temp: jax.Array,
    idx: Optional[jax.Array] = None,
    axis_name: str = "data",
) -> jax.Array:
    """Convenience wrapper: global [B, E] inputs sharded over `axis_name`."""
    if idx is None:
        idx = jnp.arange(feat_a.shape[0])
    fn = shard_map(
        functools.partial(ring_infonce_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(axis_name)),
        out_specs=P(),
    )
    return fn(feat_a, feat_b, temp, idx)
