"""Probe: can Mosaic lower a flash kernel that takes q/k/v in the towers'
natural [B, L, H, D] layout (killing the 25-36 ms/step of HBM head-
transpose copies around the [B, H, L, D] kernel at bs128 — round-2 measured
cost)?  Two candidate mechanisms, each tested forward-only on the chip:

  A. in-kernel transpose: load block [bq, H, D], jnp.transpose to
     [H, bq, D], then the existing 3D batched dots;
  B. non-leading batch dot: dot_general with batch dim 1 on [bq, H, D]
     tiles directly.

Prints which variants lower + per-call timings vs the [B, H, L, D] kernel.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, L, D = 128, 12, 145, 64  # flagship vision tower shape


def kernel_transpose(q_ref, k_ref, v_ref, out_ref):
    q = jnp.transpose(q_ref[0].astype(jnp.float32), (1, 0, 2))  # [H,L,D]
    k = jnp.transpose(k_ref[0].astype(jnp.float32), (1, 0, 2))
    v = jnp.transpose(v_ref[0].astype(jnp.float32), (1, 0, 2))
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (D ** 0.5))
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = jnp.transpose(o, (1, 0, 2)).astype(out_ref.dtype)


def kernel_batchdim1(q_ref, k_ref, v_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)  # [L, H, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # batch dim = 1 (heads), contract D: -> [H, Lq, Lk]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((1,), (1,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (D ** 0.5))
    p = jax.nn.softmax(s, axis=-1)
    # [H, Lq, Lk] x [Lk, H, D] contract Lk batch H(0 vs 1) -> [H, Lq, D]
    o = jax.lax.dot_general(p, v, (((2,), (0,)), ((0,), (1,))),
                            preferred_element_type=jnp.float32)
    out_ref[0] = jnp.transpose(o, (1, 0, 2)).astype(out_ref.dtype)


def call_blhd(kernel):
    spec = pl.BlockSpec((1, L, H, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, H, D), jnp.bfloat16))


def kernel_bhld(q_ref, k_ref, v_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / (D ** 0.5))
    p = jax.nn.softmax(s, axis=-1)
    out_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def main():
    assert jax.default_backend() == "tpu"
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, L, H, D), jnp.bfloat16)
    xt = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,L,D]

    spec_t = pl.BlockSpec((1, H, L, D), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    base = pl.pallas_call(
        kernel_bhld, grid=(B,), in_specs=[spec_t] * 3, out_specs=spec_t,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), jnp.bfloat16))

    ref = None
    for name, fn, arg in [("bhld-baseline", base, xt),
                          ("blhd-transpose", call_blhd(kernel_transpose), x),
                          ("blhd-batchdim1", call_blhd(kernel_batchdim1), x)]:
        try:
            jfn = jax.jit(lambda a, f=fn: f(a, a, a))
            out = jfn(arg)
            out.block_until_ready()
            val = np.asarray(out, np.float32)
            if name == "bhld-baseline":
                ref = np.transpose(val, (0, 2, 1, 3))
            else:
                err = np.max(np.abs(val - ref))
                print(f"{name}: maxdiff vs baseline {err}")
            t0 = time.time()
            n = 20
            for _ in range(n):
                out = jfn(arg)
            out.block_until_ready()
            _ = float(jnp.sum(out.astype(jnp.float32)))
            print(f"{name}: {(time.time()-t0)/n*1000:.3f} ms/call")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED to lower/run: {type(exc).__name__}: "
                  f"{str(exc)[:300]}")


if __name__ == "__main__":
    main()
