"""Fused blockwise InfoNCE statistics: sim matrix + streaming logsumexp +
positive-pair accumulation in one pass, never materializing [M, N] logits.

This is the Pallas hot-loop BASELINE.json asks for ("dense similarity matrix
+ InfoNCE implemented as Pallas kernels").  The reference computes the full
(B·W)² logits then softmaxes (models/xvlm.py:271-289); at 32k global
negatives that matrix is 4 GB.  Here the loss needs only three per-row
statistics:

    lse_i     = logsumexp_j((q_i · k_j) / temp)
    pos_sum_i = sum_{j: idx_j == idx_i} (q_i · k_j) / temp
    pos_cnt_i = #{j: idx_j == idx_i}

from which  loss_i = lse_i - pos_sum_i / pos_cnt_i  (soft-label InfoNCE with
duplicate-idx labels — exactly losses.soft_label_contrastive_loss).

Two implementations with identical semantics:
- `_stats_pallas`: TPU kernel, grid (row tiles × col tiles), col-fastest;
  running (m, s, pos) state lives in VMEM scratch across the col loop and is
  flushed on the last column tile.  Logits exist only as one [BQ, BK] VMEM
  tile feeding the MXU.
- `_stats_xla`: lax.scan over column blocks (CPU tests + non-TPU backends).

`infonce_loss` wraps the stats in a custom VJP whose backward recomputes the
probability blocks (flash-attention-style) instead of saving them.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, multiple, axis, value=0.0):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------- XLA path

def _stats_xla(q, k, idx_q, idx_k, inv_temp, block_k: int = 512):
    n = k.shape[0]
    block_k = min(block_k, n)
    kp = _pad_to(k, block_k, 0)
    idx_kp = _pad_to(idx_k, block_k, 0, value=-1)
    nb = kp.shape[0] // block_k
    k_blocks = kp.reshape(nb, block_k, k.shape[1])
    idx_blocks = idx_kp.reshape(nb, block_k)
    valid_blocks = (jnp.arange(nb * block_k) < n).reshape(nb, block_k)

    def body(carry, blk):
        m, s, ps, pc = carry
        k_b, idx_b, val_b = blk
        logits = (q @ k_b.T) * inv_temp
        logits = jnp.where(val_b[None, :], logits, -jnp.inf)
        blk_max = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, blk_max)
        # guard fully-masked blocks (new_m == -inf)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        s = s * jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        s = s + jnp.sum(jnp.where(val_b[None, :],
                                  jnp.exp(logits - safe_m[:, None]), 0.0),
                        axis=1)
        pos = (idx_q[:, None] == idx_b[None, :]) & val_b[None, :]
        ps = ps + jnp.sum(jnp.where(pos, logits, 0.0), axis=1)
        pc = pc + jnp.sum(pos, axis=1).astype(ps.dtype)
        return (new_m, s, ps, pc), None

    m0 = jnp.full((q.shape[0],), -jnp.inf, jnp.float32)
    z0 = jnp.zeros((q.shape[0],), jnp.float32)
    (m, s, ps, pc), _ = jax.lax.scan(
        jax.checkpoint(body), (m0, z0, z0, z0),
        (k_blocks, idx_blocks, valid_blocks))
    return m + jnp.log(s), ps, pc


# ------------------------------------------------------------- Pallas path

def _stats_kernel(inv_temp_ref, q_ref, k_ref, idxq_ref, idxk_ref, nvalid_ref,
                  lse_ref, ps_ref, pc_ref,
                  m_scr, s_scr, ps_scr, pc_scr):
    j = pl.program_id(1)
    nk = pl.num_programs(1)
    inv_temp = inv_temp_ref[0]
    n_valid = nvalid_ref[0]
    bk = k_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        ps_scr[:] = jnp.zeros_like(ps_scr)
        pc_scr[:] = jnp.zeros_like(pc_scr)

    logits = jnp.dot(q_ref[:], k_ref[:].T,
                     preferred_element_type=jnp.float32) * inv_temp
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < n_valid
    logits = jnp.where(valid, logits, -jnp.inf)

    m_old = m_scr[:, 0]
    blk_max = jnp.max(logits, axis=1)
    m_new = jnp.maximum(m_old, blk_max)
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    scale = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - safe_m), 0.0)
    expl = jnp.where(valid, jnp.exp(logits - safe_m[:, None]), 0.0)
    s_scr[:, 0] = s_scr[:, 0] * scale + jnp.sum(expl, axis=1)
    m_scr[:, 0] = m_new

    pos = (idxq_ref[:, 0][:, None] == idxk_ref[:, 0][None, :]) & valid
    ps_scr[:, 0] = ps_scr[:, 0] + jnp.sum(
        jnp.where(pos, logits, 0.0), axis=1)
    pc_scr[:, 0] = pc_scr[:, 0] + jnp.sum(pos, axis=1).astype(jnp.float32)

    @pl.when(j == nk - 1)
    def _flush():
        lse_ref[:, 0] = m_scr[:, 0] + jnp.log(s_scr[:, 0])
        ps_ref[:, 0] = ps_scr[:, 0]
        pc_ref[:, 0] = pc_scr[:, 0]


def _stats_pallas(q, k, idx_q, idx_k, inv_temp,
                  block_q: int = 256, block_k: int = 512,
                  interpret: bool = False):
    m, e = q.shape
    n = k.shape[0]
    block_q = min(block_q, max(8, 1 << (m - 1).bit_length()))
    block_q = min(block_q, 256)
    block_k = min(block_k, max(128, 1 << (n - 1).bit_length()))
    qp = _pad_to(q, block_q, 0)
    kp = _pad_to(k, block_k, 0)
    idx_qp = _pad_to(idx_q.astype(jnp.int32), block_q, 0, value=-2)
    idx_kp = _pad_to(idx_k.astype(jnp.int32), block_k, 0, value=-3)
    mp, np_ = qp.shape[0], kp.shape[0]
    grid = (mp // block_q, np_ // block_k)

    out_shape = [
        jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        jax.ShapeDtypeStruct((mp, 1), jnp.float32),
    ]
    kernel = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_temp (1,)
            pl.BlockSpec((block_q, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (1,)
        ],
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )
    inv_t = jnp.asarray([inv_temp], jnp.float32).reshape(1)
    nv = jnp.asarray([n], jnp.int32).reshape(1)
    lse, ps, pc = kernel(inv_t, qp, kp, idx_qp[:, None], idx_kp[:, None], nv)
    return lse[:m, 0], ps[:m, 0], pc[:m, 0]


def infonce_stats(q, k, idx_q, idx_k, inv_temp, impl: str = "auto",
                  interpret: bool = False):
    """(lse, pos_sum, pos_cnt) per q row against all k rows."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _stats_pallas(q, k, idx_q, idx_k, inv_temp,
                             interpret=interpret)
    return _stats_xla(q, k, idx_q, idx_k, inv_temp)


# ------------------------------------------------------ Pallas backward

def _bwd_dq_kernel(invt_ref, q_ref, k_ref, idxq_ref, idxk_ref, lse_ref,
                   pc_ref, nvalid_ref, dq_ref, acc):
    j = pl.program_id(1)
    nk = pl.num_programs(1)
    inv_temp = invt_ref[0]
    n_valid = nvalid_ref[0]
    bk = k_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    logits = jnp.dot(q_ref[:], k_ref[:].T,
                     preferred_element_type=jnp.float32) * inv_temp
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < n_valid
    p = jnp.where(valid, jnp.exp(logits - lse_ref[:, 0][:, None]), 0.0)
    pos = (idxq_ref[:, 0][:, None] == idxk_ref[:, 0][None, :]) & valid
    w = p - pos.astype(jnp.float32) / jnp.maximum(pc_ref[:, 0], 1.0)[:, None]
    acc[:] = acc[:] + jnp.dot(w, k_ref[:],
                              preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _flush():
        dq_ref[:] = acc[:]


def _bwd_dk_kernel(invt_ref, q_ref, k_ref, idxq_ref, idxk_ref, lse_ref,
                   pc_ref, nvalid_ref, dk_ref, acc):
    i = pl.program_id(1)
    nq = pl.num_programs(1)
    inv_temp = invt_ref[0]
    n_valid = nvalid_ref[0]  # valid q rows
    bq = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    logits = jnp.dot(q_ref[:], k_ref[:].T,
                     preferred_element_type=jnp.float32) * inv_temp
    row = i * bq + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    valid = row < n_valid
    p = jnp.where(valid, jnp.exp(logits - lse_ref[:, 0][:, None]), 0.0)
    pos = (idxq_ref[:, 0][:, None] == idxk_ref[:, 0][None, :]) & valid
    w = p - jnp.where(
        valid, pos.astype(jnp.float32)
        / jnp.maximum(pc_ref[:, 0], 1.0)[:, None], 0.0)
    w = jnp.where(valid, w, 0.0)
    acc[:] = acc[:] + jnp.dot(w.T, q_ref[:],
                              preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _flush():
        dk_ref[:] = acc[:]


def _bwd_raw_pallas(q, k, idx_q, idx_k, inv_temp, lse, pc,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool = False):
    """Unscaled (dq_raw, dk_raw) = (w @ k, w.T @ q) with
    w = softmax - labels, via two Pallas passes; logits/probabilities exist
    only as VMEM tiles (flash-style recompute).  Callers apply the cotangent
    and 1/temp scaling (and derive d_temp from dq_raw·q)."""
    m, e = q.shape
    n = k.shape[0]
    block_q = min(block_q, max(8, 1 << (m - 1).bit_length()), 256)
    block_k = min(block_k, max(128, 1 << (n - 1).bit_length()))
    qp = _pad_to(q, block_q, 0)
    kp = _pad_to(k, block_k, 0)
    idx_qp = _pad_to(idx_q.astype(jnp.int32), block_q, 0, value=-2)[:, None]
    idx_kp = _pad_to(idx_k.astype(jnp.int32), block_k, 0, value=-3)[:, None]
    # padded q rows: lse=+inf → p=0; pc=1 → pos/cnt=0 since idx -2 != -3
    lse_p = _pad_to(lse, block_q, 0, value=jnp.inf)[:, None]
    pc_p = _pad_to(pc, block_q, 0, value=1.0)[:, None]
    mp, np_ = qp.shape[0], kp.shape[0]
    invt = jnp.asarray([inv_temp], jnp.float32)
    nv_n = jnp.asarray([n], jnp.int32)
    nv_m = jnp.asarray([m], jnp.int32)

    dq_pad = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(mp // block_q, np_ // block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_q, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_q, e), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, e), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, e), jnp.float32),
        ],
        interpret=interpret,
    )(invt, qp, kp, idx_qp, idx_kp, lse_p, pc_p, nv_n)

    dk_pad = pl.pallas_call(
        _bwd_dk_kernel,
        grid=(np_ // block_k, mp // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_q, e), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, e), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_k, e), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_k, e), jnp.float32)],
        interpret=interpret,
    )(invt, qp, kp, idx_qp, idx_kp, lse_p, pc_p, nv_m)

    return dq_pad[:m], dk_pad[:n]


def _bwd_raw_xla(q, k_b, idx_q, idx_b, inv_temp, lse, pc):
    """Dense single-block (dq_raw, dk_raw) — the non-TPU path for small
    per-rotation blocks (ring fused mode on CPU tests)."""
    logits = (q @ k_b.T) * inv_temp
    p = jnp.exp(logits - lse[:, None])
    pos = (idx_q[:, None] == idx_b[None, :]).astype(jnp.float32)
    w = p - pos / jnp.maximum(pc, 1.0)[:, None]
    return w @ k_b, w.T @ q


def infonce_bwd_raw(q, k, idx_q, idx_k, inv_temp, lse, pc,
                    impl: str = "auto", interpret: bool = False):
    """Unscaled backward block: (w @ k, w.T @ q), w = softmax - labels."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _bwd_raw_pallas(q, k, idx_q, idx_k, inv_temp, lse, pc,
                               interpret=interpret)
    return _bwd_raw_xla(q, k, idx_q, idx_k, inv_temp, lse, pc)


def _bwd_pallas(q, k, idx, temp, lse, pc, coef, interpret: bool = False):
    """(dq, dk, d_temp) for the full loss via the raw Pallas passes."""
    inv_temp = 1.0 / temp
    dq_raw, dk_raw = _bwd_raw_pallas(q, k, idx, idx, inv_temp, lse, pc,
                                     interpret=interpret)
    scale = coef * inv_temp
    # dq_raw_i·q_i = Σ_j w_ij (q_i·k_j), so the temperature cotangent falls
    # out of dq without any extra kernel output:
    # d temp = -coef·Σ w·(q·k)·inv_temp²
    d_temp = -coef * jnp.sum(dq_raw * q) * inv_temp * inv_temp
    return dq_raw * scale, dk_raw * scale, d_temp


# --------------------------------------------------------------- the loss

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _half_loss(q, k, idx, impl, interpret, temp):
    lse, ps, pc = infonce_stats(q, k, idx, idx, 1.0 / temp, impl, interpret)
    return jnp.mean(lse - ps / jnp.maximum(pc, 1.0))


def _half_fwd(q, k, idx, impl, interpret, temp):
    lse, ps, pc = infonce_stats(q, k, idx, idx, 1.0 / temp, impl, interpret)
    loss = jnp.mean(lse - ps / jnp.maximum(pc, 1.0))
    return loss, (q, k, idx, temp, lse, pc)


def _half_bwd(impl, interpret, res, g):
    q, k, idx, temp, lse, pc = res
    m = q.shape[0]
    inv_temp = 1.0 / temp
    coef = g / m  # d(mean)/d(row)

    resolved = impl
    if resolved == "auto":
        resolved = "pallas" if jax.default_backend() == "tpu" else "xla"
    if resolved == "pallas":
        dq, dk, d_temp = _bwd_pallas(q, k, idx, temp, lse, pc, coef,
                                     interpret=interpret)
        return dq, dk, None, jnp.asarray(d_temp, jnp.float32)

    # blockwise backward: p_ij = exp(l_ij - lse_i); label_ij = pos_ij / cnt_i
    def body(carry, blk):
        dq, d_invt_qk = carry
        k_b, idx_b = blk
        logits = (q @ k_b.T) * inv_temp
        p = jnp.exp(logits - lse[:, None])
        pos = (idx[:, None] == idx_b[None, :]).astype(jnp.float32)
        lab = pos / jnp.maximum(pc, 1.0)[:, None]
        w = p - lab  # [m, bk]
        dq = dq + w @ k_b
        dk_b = w.T @ q
        d_invt_qk = d_invt_qk + jnp.sum(w * (q @ k_b.T))
        return (dq, d_invt_qk), dk_b

    block_k = 512
    n = k.shape[0]
    bk = min(block_k, n)
    kp = _pad_to(k, bk, 0)
    idx_kp = _pad_to(idx, bk, 0, value=-3)
    nb = kp.shape[0] // bk
    (dq_raw, d_invt_qk), dk_blocks = jax.lax.scan(
        jax.checkpoint(body),
        (jnp.zeros_like(q), jnp.float32(0.0)),
        (kp.reshape(nb, bk, -1), idx_kp.reshape(nb, bk)))
    dq = dq_raw * (coef * inv_temp)
    dk = dk_blocks.reshape(-1, k.shape[1])[: n] * (coef * inv_temp)
    # d/dtemp of l = (q·k)/temp is -(q·k)/temp²; d_invt_qk holds Σ w·(q·k)
    d_temp = -coef * d_invt_qk * inv_temp * inv_temp
    return dq, dk, None, jnp.asarray(d_temp, jnp.float32)


_half_loss.defvjp(_half_fwd, _half_bwd)


def infonce_loss(feat_a, feat_b, temp, idx=None, impl: str = "auto",
                 interpret: bool = False):
    """Bidirectional soft-label InfoNCE, fused/blockwise.  Numerically equals
    losses.soft_label_contrastive_loss without materializing logits."""
    if idx is None:
        idx = jnp.arange(feat_a.shape[0])
    la = _half_loss(feat_a, feat_b, idx, impl, interpret, temp)
    lb = _half_loss(feat_b, feat_a, idx, impl, interpret, temp)
    return (la + lb) / 2.0
